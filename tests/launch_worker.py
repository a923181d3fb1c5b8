"""Worker for the two-process launch test (NOT a pytest module).

Each process is one "machine" in the reference's launch topology
(reference engines/launch.py:36-137 forks per GPU and wires NCCL; ours
initializes the distributed JAX runtime and lets GSPMD shard inside jit).
The worker goes through `engines.launch.launch` — the real entrypoint —
then exercises every multi-process surface VERDICT r4 flagged as
unexecuted:

  * jax.distributed init (coordinator rendezvous)
  * utils.comm: world/rank queries, barrier, object all_gather,
    reduce_dict, shared_random_seed
  * a global 2-process device mesh + 2 sharded train steps whose grad
    psum crosses the process boundary (GSPMD over gloo CPU collectives)
  * rank-0 gating: only the main process writes its artifact

Usage: python launch_worker.py <rank> <world> <port> <outdir>
"""

import json
import os
import sys


def main(rank: int, world: int, port: str, outdir: str):
    # one virtual CPU device per process: any cross-device collective is
    # then necessarily a cross-PROCESS collective
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
    )
    os.environ["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "1"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pointcloudpdf_tpu.engines.launch import launch

    def main_func():
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax
        from flax import linen as nn
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from pointcloudpdf_tpu.utils import comm

        assert comm.get_world_size() == world, comm.get_world_size()
        assert comm.get_rank() == rank, comm.get_rank()
        assert comm.is_main_process() == (rank == 0)
        comm.synchronize()

        # picklable-object all_gather across processes (reference
        # utils/comm.py gloo gather parity)
        gathered = comm.all_gather({"rank": rank, "tag": f"proc{rank}"})
        assert [g["rank"] for g in gathered] == list(range(world)), gathered

        reduced = comm.reduce_dict({"loss": float(rank + 1)})
        assert abs(reduced["loss"] - (world + 1) / 2.0) < 1e-6, reduced

        seed = comm.shared_random_seed()
        seeds = comm.all_gather(seed)
        assert all(s == seeds[0] for s in seeds), seeds

        # --- 2 sharded train steps over the global mesh ------------------
        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        batch_sh = NamedSharding(mesh, P("data"))
        repl_sh = NamedSharding(mesh, P())

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(16)(x)
                x = nn.relu(x)
                return nn.Dense(4)(x)

        model = Tiny()
        rng = jax.random.PRNGKey(0)
        x_local = np.random.RandomState(rank).rand(4, 8).astype(np.float32)
        y_local = np.random.RandomState(100 + rank).randint(
            0, 4, size=(4,)
        ).astype(np.int32)

        # global (world*4, 8) batch assembled from per-process shards —
        # the multi-host data path the trainer uses on a pod
        from jax.experimental import multihost_utils

        x = multihost_utils.host_local_array_to_global_array(
            x_local, mesh, P("data")
        )
        y = multihost_utils.host_local_array_to_global_array(
            y_local, mesh, P("data")
        )

        params = jax.jit(
            model.init, out_shardings=repl_sh
        )({"params": rng}, np.zeros((1, 8), np.float32))
        tx = optax.sgd(0.1)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, x, y):
            def loss_fn(p):
                logits = model.apply(p, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        x = jax.device_put(x, batch_sh)
        losses = []
        for _ in range(2):
            params, opt_state, loss = step(params, opt_state, x, y)
            losses.append(float(jax.device_get(loss)))
        assert losses[1] < losses[0], losses  # it trained

        # replicated params must be identical across processes after the
        # cross-process grad psum
        p0 = np.asarray(
            jax.device_get(params["params"]["Dense_0"]["kernel"])
        )
        digests = comm.all_gather(float(np.abs(p0).sum()))
        assert all(abs(d - digests[0]) < 1e-6 for d in digests), digests

        # rank-0 gating (checkpoint/log write paths)
        if comm.is_main_process():
            with open(os.path.join(outdir, "result.json"), "w") as f:
                json.dump({"losses": losses, "world": world}, f)
        comm.synchronize()

    launch(
        main_func,
        num_machines=world,
        machine_rank=rank,
        dist_url=f"tcp://127.0.0.1:{port}",
    )


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
