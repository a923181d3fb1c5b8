"""Model-level golden forward parity: the reference's OWN ST-v1m1 vs ours.

Completes VERDICT r4 missing #1 for the PDF paper's headline backbone:
the reference ``StratifiedTransformer`` (pointcept/models/
stratified_transformer/stratified_transformer_v1m1_origin.py:664-860)
runs forward on CPU with every native dependency replaced by a
functional stub implementing its documented contract:

- ``tp.ball_query``        torch_points_kernels partial_dense radius
  query (idx padded with -1); the stub returns in-radius points sorted
  by distance — the cloud is sized so every ball holds fewer than
  ``kp_max_neighbor`` points, making the neighbor SETS exhaustive and
  the selection-order freedom of the real kernel irrelevant,
- ``KPConvLayer``          torch_points3d kernels.py: linear influence
  ``relu(1 - d/point_influence)``, sum aggregation, shadow row for
  idx -1 (zero feature, far coord) — the same math as the numpy ground
  truth in test_import_reference._np_kpconv,
- ``FastBatchNorm1d``      BatchNorm1d under a ``batch_norm`` child,
- ``scatter_softmax``      torch_scatter: per-index softmax along dim 0,
- ``voxel_grid``           torch_geometric: per-batch integer voxel of
  ``floor((pos - start) / size)`` with ``start = pos.min(0)`` when None,
- ``pointops2.pointops``   furthestsampling / knnquery (sqrt dists) /
  queryandgroup / interpolation (contracts: libs/pointops2/functions/
  pointops.py:16-58, 964-1003, 1113-1129) and the rpe_v2 attention
  family (CUDA kernels libs/pointops2/src/rpe_v2/
  relative_pos_encoding_cuda_kernel_v2.cu:248-283 et al.):
    attention_step1_v2        out[m,h] = sum_d q[i0(m),h,d] k[i1[m],h,d]
    dot_prod_with_idx_v3      out[m,h] = sum_d q[i0,h,d]*Tq[r,h,d,:].sum
                                       + k[i1,h,d]*Tk[r,h,d,:].sum
    attention_step2_with_rel_pos_value_v2
                              out[i0,h,d] += attn[m,h]*(v[i1,h,d]
                                       + Tv[r,h,d,:].sum)
  where i0(m) is the query owning pair m under index_0_offsets.

The reference state_dict (BN affines AND running stats randomized) is
translated by tools/import_reference_checkpoint into our tree, and our
ST — configured for exactness (sequential FPS via fps_group_steps,
reference downsample counts via ref_exact_counts, per-layer key
capacities = the full point/downsample counts so the fixed-K key sets
equal the reference's variable-length pair lists) — must produce the
same seg_logits.
"""

import functools
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


# --------------------------------------------------------------------------
# functional stubs
# --------------------------------------------------------------------------

def _install_st_stubs():
    import torch
    import torch.nn as nn

    from tests.test_reference_parity import _stub_missing
    from tests.test_model_forward_parity import _fps_np, _knn_query_np

    _stub_missing()

    # .cuda() no-ops (get_indice_pairs/grid_sample call it on CPU tensors)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.IntTensor = lambda data: torch.tensor(data,
                                                     dtype=torch.int32)
    if not hasattr(torch.cuda, "FloatTensor"):
        torch.cuda.FloatTensor = torch.FloatTensor

    # ---- torch_scatter.scatter_softmax --------------------------------
    def scatter_softmax(src, index, dim=0):
        assert dim == 0
        n = int(index.max().item()) + 1
        big = torch.full((n,) + src.shape[1:], -1e30)
        big.index_reduce_(0, index, src, "amax", include_self=True)
        ex = torch.exp(src - big[index])
        den = torch.zeros_like(big).index_add_(0, index, ex)
        return ex / den[index]

    sys.modules["torch_scatter"].scatter_softmax = scatter_softmax

    # ---- torch_geometric voxel_grid -----------------------------------
    def voxel_grid(pos, batch, size, start=None):
        size = torch.as_tensor(size, dtype=pos.dtype)
        if size.numel() == 1:
            size = size.repeat(3)
        if start is None:
            start = pos.min(dim=0)[0]
        c = torch.floor((pos - start) / size).long()          # [N, 3]
        c = c - c.min(dim=0)[0]
        ext = c.max(dim=0)[0] + 1
        lin = (c[:, 0] * ext[1] + c[:, 1]) * ext[2] + c[:, 2]
        return batch.long() * int(ext.prod().item()) + lin

    sys.modules["torch_geometric.nn.pool"].voxel_grid = voxel_grid

    # ---- timm DropPath / trunc_normal_ --------------------------------
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            m = torch.bernoulli(torch.full((x.shape[0], 1), keep)) / keep
            return x * m

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
        return tensor

    tl = sys.modules["timm.models.layers"]
    tl.DropPath = DropPath
    tl.trunc_normal_ = trunc_normal_

    # ---- torch_points_kernels.ball_query ------------------------------
    def ball_query(radius, nsample, x, y, mode="partial_dense",
                   batch_x=None, batch_y=None):
        xn = x.detach().numpy()
        yn = y.detach().numpy()
        bx = batch_x.detach().numpy()
        by = batch_y.detach().numpy()
        m = yn.shape[0]
        idx = np.full((m, nsample), -1, np.int64)
        dist = np.full((m, nsample), -1.0, np.float32)
        for i in range(m):
            same = np.where(bx == by[i])[0]
            d2 = ((xn[same] - yn[i]) ** 2).sum(-1)
            inr = np.where(d2 <= radius * radius)[0]
            order = inr[np.argsort(d2[inr], kind="stable")][:nsample]
            idx[i, :len(order)] = same[order]
            dist[i, :len(order)] = np.sqrt(d2[order])
        return torch.from_numpy(idx), torch.from_numpy(dist)

    sys.modules["torch_points_kernels"].ball_query = ball_query

    # ---- torch_points3d KPConvLayer / FastBatchNorm1d -----------------
    class FastBatchNorm1d(nn.Module):
        def __init__(self, num_features, momentum=0.1):
            super().__init__()
            self.batch_norm = nn.BatchNorm1d(num_features,
                                             momentum=momentum)

        def forward(self, x):
            return self.batch_norm(x)

    class KPConvLayer(nn.Module):
        """torch_points3d kernels.py semantics: 15 kernel points, linear
        influence relu(1 - d/point_influence), sum aggregation,
        add_one=False; neighbor index -1 gathers the appended shadow
        row (far coord, zero feature)."""

        def __init__(self, num_inputs, num_outputs, point_influence,
                     add_one=False, **kw):
            super().__init__()
            assert not add_one
            self.point_influence = point_influence
            n_kp = 15
            kp = torch.randn(n_kp, 3) * (0.3 * 1.5 * point_influence)
            self.K_points = nn.Parameter(kp, requires_grad=False)
            self.weight = nn.Parameter(
                torch.randn(n_kp, num_inputs, num_outputs) * 0.1)

        def forward(self, query_points, support_points, neighbors, x):
            sup = torch.cat(
                [support_points,
                 torch.full_like(support_points[:1], 1e6)], 0)
            feats = torch.cat([x, torch.zeros_like(x[:1])], 0)
            nb = neighbors.long()                      # -1 -> last row
            nb_pts = sup[nb] - query_points.unsqueeze(1)      # [n, k, 3]
            diff = nb_pts.unsqueeze(2) - self.K_points        # [n,k,p,3]
            dist = diff.square().sum(-1).sqrt()
            infl = torch.relu(1.0 - dist / self.point_influence)
            nb_x = feats[nb]                                  # [n, k, c]
            per_kp = torch.einsum("nkp,nkc->npc", infl, nb_x)
            return torch.einsum("npc,pco->no", per_kp, self.weight)

    sys.modules[
        "torch_points3d.modules.KPConv.kernels"].KPConvLayer = KPConvLayer
    sys.modules[
        "torch_points3d.core.common_modules"
    ].FastBatchNorm1d = FastBatchNorm1d

    # ---- pointops2.pointops -------------------------------------------
    po = types.ModuleType("pointops2.pointops")

    def furthestsampling(xyz, offset, new_offset):
        picks = _fps_np(xyz.detach().numpy(), offset.detach().numpy(),
                        new_offset.detach().numpy())
        return torch.from_numpy(picks).int()

    def knnquery(nsample, xyz, new_xyz, offset, new_offset):
        idx, dist = _knn_query_np(
            nsample, xyz.detach().numpy(), offset.detach().numpy(),
            None if new_xyz is None else new_xyz.detach().numpy(),
            None if new_offset is None else new_offset.detach().numpy())
        return torch.from_numpy(idx).int(), torch.from_numpy(dist)

    def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset,
                      new_offset, use_xyz=True, return_indx=False):
        if new_xyz is None:
            new_xyz = xyz
        if idx is None:
            idx, _ = knnquery(nsample, xyz, new_xyz, offset, new_offset)
        m = new_xyz.shape[0]
        grouped_feat = feat[idx.view(-1).long()].view(m, nsample, -1)
        if use_xyz:
            grouped_xyz = xyz[idx.view(-1).long()].view(
                m, nsample, 3) - new_xyz.unsqueeze(1)
            out = torch.cat((grouped_xyz, grouped_feat), -1)
        else:
            out = grouped_feat
        return (out, idx) if return_indx else out

    def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
        idx, dist = knnquery(k, xyz, new_xyz, offset, new_offset)
        recip = 1.0 / (dist + 1e-8)
        weight = recip / recip.sum(1, keepdim=True)
        out = torch.zeros(new_xyz.shape[0], feat.shape[1])
        for i in range(k):
            out += feat[idx[:, i].long()] * weight[:, i].unsqueeze(-1)
        return out

    def _i0_of(index_0_offsets, m):
        """Query id per pair from the cumulative-count offsets."""
        off = index_0_offsets.detach().numpy()
        return np.searchsorted(off[1:], np.arange(m), side="right")

    def attention_step1_v2(q, k, index1, index0_offsets, n_max):
        qn = q.detach().numpy()
        kn = k.detach().numpy()
        m = index1.shape[0]
        i0 = _i0_of(index0_offsets, m)
        i1 = index1.detach().numpy().astype(np.int64)
        out = np.einsum("mhd,mhd->mh", qn[i0], kn[i1])
        return torch.from_numpy(out.astype(np.float32))

    def dot_prod_with_idx_v3(q, index_q_offsets, n_max, k, index_k,
                             table_q, table_k, rel_idx):
        qn = q.detach().numpy()
        kn = k.detach().numpy()
        tq = table_q.detach().numpy()        # (L, h, hdim, 3)
        tk = table_k.detach().numpy()
        r = rel_idx.detach().numpy().astype(np.int64)   # (M, 3)
        m = index_k.shape[0]
        i0 = _i0_of(index_q_offsets, m)
        i1 = index_k.detach().numpy().astype(np.int64)
        tq_sel = (tq[r[:, 0], :, :, 0] + tq[r[:, 1], :, :, 1]
                  + tq[r[:, 2], :, :, 2])               # (M, h, hdim)
        tk_sel = (tk[r[:, 0], :, :, 0] + tk[r[:, 1], :, :, 1]
                  + tk[r[:, 2], :, :, 2])
        out = (np.einsum("mhd,mhd->mh", qn[i0], tq_sel)
               + np.einsum("mhd,mhd->mh", kn[i1], tk_sel))
        return torch.from_numpy(out.astype(np.float32))

    def attention_step2_with_rel_pos_value_v2(attn, v, index0_offsets,
                                              n_max, index1, table,
                                              rel_idx):
        an = attn.detach().numpy()
        vn = v.detach().numpy()
        tv = table.detach().numpy()
        r = rel_idx.detach().numpy().astype(np.int64)
        m = attn.shape[0]
        i0 = _i0_of(index0_offsets, m)
        i1 = index1.detach().numpy().astype(np.int64)
        tv_sel = (tv[r[:, 0], :, :, 0] + tv[r[:, 1], :, :, 1]
                  + tv[r[:, 2], :, :, 2])               # (M, h, hdim)
        contrib = an[:, :, None] * (vn[i1] + tv_sel)    # (M, h, hdim)
        out = np.zeros_like(vn)
        np.add.at(out, i0, contrib)
        return torch.from_numpy(out.astype(np.float32))

    po.furthestsampling = furthestsampling
    po.knnquery = knnquery
    po.queryandgroup = queryandgroup
    po.interpolation = interpolation
    po.attention_step1_v2 = attention_step1_v2
    po.dot_prod_with_idx_v3 = dot_prod_with_idx_v3
    po.attention_step2_with_rel_pos_value_v2 = (
        attention_step2_with_rel_pos_value_v2)
    sys.modules["pointops2.pointops"] = po
    sys.modules["pointops2"].pointops = po


@pytest.fixture(scope="module")
def ref_st():
    _install_st_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from pointcept.models.stratified_transformer import (
        stratified_transformer_v1m1_origin as m)

    return m


def _randomized_state(model, seed=0):
    """Randomize every BN affine + running stats so the import mapping
    is load-bearing (mirrors test_model_forward_parity)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    bn_stems = {k[: -len(".running_mean")] for k in sd
                if k.endswith(".running_mean")}
    new = {}
    for k, v in sd.items():
        stem = k.rsplit(".", 1)[0]
        leaf = k.rsplit(".", 1)[1]
        if stem in bn_stems and leaf in ("running_mean", "running_var",
                                         "weight", "bias"):
            if leaf == "running_mean":
                new[k] = torch.randn(v.shape, generator=g) * 0.2
            elif leaf == "running_var":
                new[k] = torch.rand(v.shape, generator=g) + 0.5
            elif leaf == "weight":
                new[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                new[k] = torch.randn(v.shape, generator=g) * 0.1
        else:
            new[k] = v
    model.load_state_dict(new)
    return new


def test_st_v1m1_forward_parity(ref_st):
    import torch

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pointcloudpdf_tpu.models import build_model
    from tools.import_reference_checkpoint import import_checkpoint

    n, in_ch, k_cls = 256, 6, 5
    rng = np.random.RandomState(11)
    coord = (rng.rand(n, 3) * 1.0).astype(np.float32)
    feat = rng.randn(n, in_ch).astype(np.float32)

    ds_scale = 8
    ratio = 0.25
    kp_radius, kp_max = 0.22, 64
    # exhaustive-ball precondition: every neighborhood fits the cap, so
    # the stub's nearest-first pick equals the kernel's arbitrary pick
    d2 = ((coord[None] - coord[:, None]) ** 2).sum(-1)
    assert (d2 <= kp_radius ** 2).sum(1).max() < kp_max

    depths = [0, 2, 1]            # layers 1..2 run; layer 0 is the stem
    channels = [16, 32, 64]
    heads = [2, 2, 4]
    window_size = [0.3, 0.35, 0.7]
    quant_sizes = [0.03, 0.035, 0.07]
    common = dict(
        downsample_scale=ds_scale, depths=depths, channels=channels,
        num_heads=heads, window_size=window_size, up_k=3,
        grid_sizes=[0.1, 0.1, 0.2], quant_sizes=quant_sizes,
        rel_query=True, rel_key=True, rel_value=True,
        drop_path_rate=0.0, num_layers=3, concat_xyz=True,
        num_classes=k_cls, ratio=ratio, k=16, prev_grid_size=0.1,
        sigma=1.0, stem_transformer=False, kp_ball_radius=kp_radius,
        kp_max_neighbor=kp_max,
    )

    torch.manual_seed(7)
    ref_model = ref_st.StratifiedTransformer(**common).eval()
    state = _randomized_state(ref_model, seed=7)

    with torch.no_grad():
        want = ref_model({
            "feat": torch.from_numpy(feat),
            "coord": torch.from_numpy(coord),
            "offset": torch.tensor([n]),
        }).numpy()

    # reference level sizes: stem_down -> int(256*.25)+1 = 65, down1 ->
    # int(65*.25)+1 = 17; stratified FPS counts: 65//8+1 = 9, 17//8+1 = 3
    n1 = int(n * ratio) + 1
    n2 = int(n1 * ratio) + 1
    ours = build_model(dict(
        type="DefaultSegmentor",
        backbone=dict(
            type="ST-v1m1", **common,
            # exactness knobs: sequential FPS, reference counts, and key
            # capacities = the full candidate counts per layer so the
            # fixed-K sets hold every reference pair
            fps_group_steps=1 << 20, ref_exact_counts=True,
            k_local=(0, n1, n2),
            k_sparse=(0, n1 // ds_scale + 1, n2 // ds_scale + 1),
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
    ))
    batch = dict(coord=coord[None], feat=feat[None],
                 mask=np.ones((1, n), bool))
    variables = jax.jit(functools.partial(ours.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, batch)
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))

    torch_state = {}
    for k, v in state.items():
        # KPConvResBlock.bn is dead in the reference forward (:648-660
        # never calls it) — drop rather than force a phantom mapping
        if k.startswith("stem_layer.1.bn."):
            continue
        torch_state["backbone." + k] = v.numpy()
    payload, report = import_checkpoint(torch_state, "st-v1m1", variables)
    assert report["unmapped"] == [], report["unmapped"][:5]
    assert report["unfilled_target"] == [], report["unfilled_target"][:5]

    out = jax.jit(functools.partial(ours.apply, train=False))(
        {"params": payload["state"]["params"],
         "batch_stats": payload["state"]["batch_stats"]}, batch)
    got = np.asarray(out["seg_logits"])[0]

    assert got.shape == want.shape
    diff = np.abs(got - want)
    scale = np.abs(want).max()
    assert np.quantile(diff, 0.99) < 2e-3 * scale, (
        np.quantile(diff, 0.99), scale)
    assert np.median(diff) < 2e-4 * scale
    agree = float((got.argmax(-1) == want.argmax(-1)).mean())
    assert agree >= 0.996, agree
    corr = float(np.corrcoef(got.ravel(), want.ravel())[0, 1])
    assert corr > 0.9999, corr
