"""Reference-checkpoint importer: coverage, transposes, loadability.

The inverse generators here are written BY HAND from the reference
module definitions (point_transformer_seg.py:195-327,
stratified_transformer_v1m1_origin.py:664-770) — independently of the
importer's own mapping tables — so a typo in either side fails the
round trip.  Real reference .pth files aren't available on this box;
these tests synthesize torch-layout state dicts with the reference's
exact key names and shapes.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.models import build_model
from pointcloudpdf_tpu.utils.checkpoint import flatten_tree

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from import_reference_checkpoint import import_checkpoint  # noqa: E402


def _init_vars(model, in_ch, n=1024):
    batch = dict(coord=jnp.zeros((1, n, 3), jnp.float32),
                 feat=jnp.zeros((1, n, in_ch), jnp.float32),
                 mask=jnp.ones((1, n), bool))
    v = jax.jit(functools.partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, batch)
    return jax.tree_util.tree_map(np.asarray, dict(v))


def _rng_like(rng, shape):
    return rng.randn(*shape).astype(np.float32)


def _torch_linear(rng, sd, key, kernel_shape, bias=True):
    """kernel_shape is OUR (in, out); torch stores (out, in)."""
    sd[key + ".weight"] = _rng_like(rng, kernel_shape[::-1])
    if bias:
        sd[key + ".bias"] = _rng_like(rng, (kernel_shape[1],))


def _torch_bn(rng, sd, key, c):
    sd[key + ".weight"] = _rng_like(rng, (c,))
    sd[key + ".bias"] = _rng_like(rng, (c,))
    sd[key + ".running_mean"] = _rng_like(rng, (c,))
    sd[key + ".running_var"] = np.abs(_rng_like(rng, (c,))) + 0.5
    sd[key + ".num_batches_tracked"] = np.asarray(7)


def _torch_ln(rng, sd, key, c):
    sd[key + ".weight"] = _rng_like(rng, (c,))
    sd[key + ".bias"] = _rng_like(rng, (c,))


def _ptv1_reference_state(rng):
    """Hand-built reference Seg26 state dict (blocks=[1]*5, in=6, cls=4)."""
    planes = [32, 64, 128, 256, 512]
    sd = {}
    in_p = 6
    for L in range(1, 6):
        p = planes[L - 1]
        # TransitionDown: stride-1 stage 1 takes in_p, strided take 3+in_p
        lin_in = in_p if L == 1 else 3 + in_p
        _torch_linear(rng, sd, f"backbone.enc{L}.0.linear", (lin_in, p),
                      bias=False)
        _torch_bn(rng, sd, f"backbone.enc{L}.0.bn", p)
        # one Bottleneck
        b = f"backbone.enc{L}.1"
        _torch_linear(rng, sd, b + ".linear1", (p, p), bias=False)
        _torch_bn(rng, sd, b + ".bn1", p)
        for nm in ("linear_q", "linear_k"):
            _torch_linear(rng, sd, f"{b}.transformer.{nm}", (p, p))
        _torch_linear(rng, sd, b + ".transformer.linear_v", (p, p))
        _torch_linear(rng, sd, b + ".transformer.linear_p.0", (3, 3))
        _torch_bn(rng, sd, b + ".transformer.linear_p.1", 3)
        _torch_linear(rng, sd, b + ".transformer.linear_p.3", (3, p))
        _torch_bn(rng, sd, b + ".transformer.linear_w.0", p)
        _torch_linear(rng, sd, b + ".transformer.linear_w.2", (p, p // 8))
        _torch_bn(rng, sd, b + ".transformer.linear_w.3", p // 8)
        _torch_linear(rng, sd, b + ".transformer.linear_w.5",
                      (p // 8, p // 8))
        _torch_bn(rng, sd, b + ".bn2", p)
        _torch_linear(rng, sd, b + ".linear3", (p, p), bias=False)
        _torch_bn(rng, sd, b + ".bn3", p)
        in_p = p
    for L in range(5, 0, -1):
        p = planes[L - 1]
        d = f"backbone.dec{L}.0"
        if L == 5:
            _torch_linear(rng, sd, d + ".linear1", (2 * p, p))
            _torch_bn(rng, sd, d + ".linear1.1", p)
            # head linear2: Sequential(Linear, ReLU)
            _torch_linear(rng, sd, d + ".linear2.0", (p, p))
            # fix linear1 key layout: Sequential -> .0
            sd[d + ".linear1.0.weight"] = sd.pop(d + ".linear1.weight")
            sd[d + ".linear1.0.bias"] = sd.pop(d + ".linear1.bias")
        else:
            up_in = planes[L]
            _torch_linear(rng, sd, d + ".linear1.0", (p, p))
            _torch_bn(rng, sd, d + ".linear1.1", p)
            _torch_linear(rng, sd, d + ".linear2.0", (up_in, p))
            _torch_bn(rng, sd, d + ".linear2.1", p)
        b = f"backbone.dec{L}.1"
        _torch_linear(rng, sd, b + ".linear1", (p, p), bias=False)
        _torch_bn(rng, sd, b + ".bn1", p)
        for nm in ("linear_q", "linear_k", "linear_v"):
            _torch_linear(rng, sd, f"{b}.transformer.{nm}", (p, p))
        _torch_linear(rng, sd, b + ".transformer.linear_p.0", (3, 3))
        _torch_bn(rng, sd, b + ".transformer.linear_p.1", 3)
        _torch_linear(rng, sd, b + ".transformer.linear_p.3", (3, p))
        _torch_bn(rng, sd, b + ".transformer.linear_w.0", p)
        _torch_linear(rng, sd, b + ".transformer.linear_w.2", (p, p // 8))
        _torch_bn(rng, sd, b + ".transformer.linear_w.3", p // 8)
        _torch_linear(rng, sd, b + ".transformer.linear_w.5",
                      (p // 8, p // 8))
        _torch_bn(rng, sd, b + ".bn2", p)
        _torch_linear(rng, sd, b + ".linear3", (p, p), bias=False)
        _torch_bn(rng, sd, b + ".bn3", p)
    _torch_linear(rng, sd, "backbone.cls.0", (32, 32))
    _torch_bn(rng, sd, "backbone.cls.1", 32)
    _torch_linear(rng, sd, "backbone.cls.3", (32, 4))
    return sd


def test_pt_v1_full_round_trip():
    model = build_model(dict(
        type="DefaultSegmentor",
        backbone=dict(type="PointTransformer-Seg26", in_channels=6,
                      num_classes=4),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
    ))
    variables = _init_vars(model, 6)
    sd = _ptv1_reference_state(np.random.RandomState(0))
    payload, report = import_checkpoint(sd, "pt-v1", variables)

    assert not report["unmapped"], report["unmapped"][:5]
    assert not report.get("no_target"), report.get("no_target")[:5]
    # every framework tensor filled: the PT-v1 map is exact
    assert not report["unfilled_target"], report["unfilled_target"][:8]

    # transpose spot check: torch (out, in) -> flax kernel (in, out)
    got = payload["state"]["params"]["backbone_module"]["enc2"]["down"][
        "linear"]["kernel"]
    want = sd["backbone.enc2.0.linear.weight"].T
    np.testing.assert_array_equal(np.asarray(got), want)
    # BN stats landed in batch_stats
    bs = payload["state"]["batch_stats"]["backbone_module"]["enc3"][
        "block0"]["bn2"]
    np.testing.assert_array_equal(
        np.asarray(bs["mean"]), sd["backbone.enc3.1.bn2.running_mean"])

    # imported payload must run through the model
    batch = dict(coord=jnp.zeros((1, 1024, 3), jnp.float32),
                 feat=jnp.zeros((1, 1024, 6), jnp.float32),
                 mask=jnp.ones((1, 1024), bool))
    out = jax.jit(functools.partial(model.apply, train=False))(
        {"params": payload["state"]["params"],
         "batch_stats": payload["state"]["batch_stats"]}, batch)
    assert np.isfinite(np.asarray(out["seg_logits"])).all()


def _st_reference_state(rng, depths, channels, heads, num_layers, l2=16,
                        num_classes=4):
    sd = {}
    c0 = channels[0]
    # stems (torch_points3d: FastBatchNorm1d nests .batch_norm; the
    # kernel-point disposition is a frozen K_points parameter in
    # ABSOLUTE units, spread within 1.5 * point_influence)
    kp_scale = 1.5 * 0.1  # prev_grid_size=0.1, sigma=1.0 in the config
    sd["backbone.stem_layer.0.kpconv.K_points"] = (
        _rng_like(rng, (15, 3)) * 0.3 * kp_scale)
    sd["backbone.stem_layer.0.kpconv.weight"] = _rng_like(rng, (15, 6, c0))
    _torch_bn(rng, sd, "backbone.stem_layer.0.bn.batch_norm", c0)
    d2 = c0 // 4
    _torch_linear(rng, sd, "backbone.stem_layer.1.unary_1.0", (c0, d2),
                  bias=False)
    _torch_bn(rng, sd, "backbone.stem_layer.1.unary_1.1.batch_norm", d2)
    sd["backbone.stem_layer.1.kpconv.K_points"] = (
        _rng_like(rng, (15, 3)) * 0.3 * kp_scale)
    sd["backbone.stem_layer.1.kpconv.weight"] = _rng_like(rng, (15, d2, d2))
    _torch_linear(rng, sd, "backbone.stem_layer.1.unary_2.0", (d2, c0),
                  bias=False)
    _torch_bn(rng, sd, "backbone.stem_layer.1.unary_2.1.batch_norm", c0)
    _torch_ln(rng, sd, "backbone.downsample.norm", c0)
    _torch_linear(rng, sd, "backbone.downsample.linear",
                  (c0, channels[1]), bias=False)
    for li in range(num_layers - 1):
        i = li + 1
        c = channels[i]
        h = heads[i]
        L = f"backbone.layers.{li}"
        for d in range(depths[i]):
            blk = f"{L}.blocks.{d}"
            _torch_ln(rng, sd, blk + ".norm1", c)
            _torch_ln(rng, sd, blk + ".norm2", c)
            _torch_linear(rng, sd, blk + ".attn.qkv", (c, 3 * c))
            _torch_linear(rng, sd, blk + ".attn.proj", (c, c))
            for t in ("query", "key", "value"):
                sd[f"{blk}.attn.relative_pos_{t}_table"] = _rng_like(
                    rng, (l2, h, c // h, 3))
            _torch_linear(rng, sd, blk + ".mlp.fc1", (c, 4 * c))
            _torch_linear(rng, sd, blk + ".mlp.fc2", (4 * c, c))
        if i < num_layers - 1:
            _torch_ln(rng, sd, L + ".downsample.norm", c)
            _torch_linear(rng, sd, L + ".downsample.linear",
                          (c, channels[i + 1]), bias=False)
    # upsamples.{j}: i_ref = num_layers-1-j
    for j in range(num_layers - 1):
        i_ref = num_layers - 1 - j
        cin, cout = channels[i_ref], channels[i_ref - 1]
        U = f"backbone.upsamples.{j}"
        _torch_ln(rng, sd, U + ".linear1.0", cout)
        _torch_linear(rng, sd, U + ".linear1.1", (cout, cout))
        _torch_ln(rng, sd, U + ".linear2.0", cin)
        _torch_linear(rng, sd, U + ".linear2.1", (cin, cout))
    _torch_linear(rng, sd, "backbone.classifier.0", (c0, c0))
    _torch_bn(rng, sd, "backbone.classifier.1", c0)
    _torch_linear(rng, sd, "backbone.classifier.3", (c0, num_classes))
    return sd


def test_st_v1m1_round_trip():
    depths = [1, 1, 1]
    channels = [16, 32, 64]
    heads = [2, 2, 4]
    model = build_model(dict(
        type="DefaultSegmentor",
        backbone=dict(
            type="ST-v1m1", downsample_scale=4, depths=depths,
            channels=channels, num_heads=heads,
            window_size=[0.4, 0.4, 0.8], up_k=3,
            grid_sizes=[0.1, 0.1, 0.2], quant_sizes=[0.05, 0.05, 0.1],
            rel_query=True, rel_key=True, rel_value=True,
            drop_path_rate=0.0, num_layers=3, num_classes=4, ratio=0.25,
            k=8, prev_grid_size=0.1, sigma=1.0, stem_transformer=False,
            kp_ball_radius=0.25, kp_max_neighbor=16,
        ),
        criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0,
                       ignore_index=-1)],
    ))
    variables = _init_vars(model, 6)
    # 2L for ws=0.4, qs=0.05: int((2*0.4+1e-4)//0.05)*2 = 16*2 -> table
    # rows 2L; read the true value off the target tree
    t = flatten_tree(variables["params"])
    l2 = [v.shape[0] for kk, v in t.items()
          if kk.endswith("attn/rel_query_table")][0]
    sd = _st_reference_state(np.random.RandomState(1), depths, channels,
                             heads, num_layers=3, l2=l2)
    payload, report = import_checkpoint(sd, "st-v1m1", variables)

    assert not report["unmapped"], report["unmapped"][:8]
    assert not report.get("no_target"), report.get("no_target")[:8]
    # round-4: the ST map is EXACT — zero framework tensors left at init
    assert not report["unfilled_target"], report["unfilled_target"][:8]

    # cRPE tables copy verbatim
    got = payload["state"]["params"]["backbone_module"]["layer1_block0"][
        "attn"]["rel_key_table"]
    np.testing.assert_array_equal(
        np.asarray(got),
        sd["backbone.layers.0.blocks.0.attn.relative_pos_key_table"])

    batch = dict(coord=jnp.asarray(
        np.random.RandomState(2).rand(1, 128, 3).astype(np.float32)),
        feat=jnp.zeros((1, 128, 6), jnp.float32),
        mask=jnp.ones((1, 128), bool))
    out = jax.jit(functools.partial(model.apply, train=False))(
        {"params": payload["state"]["params"],
         "batch_stats": payload["state"]["batch_stats"]}, batch)
    assert np.isfinite(np.asarray(out["seg_logits"])).all()


# -- stem forward equivalence against a hand-built reference forward --------


def _np_bn_eval(sd, key, x, eps=1e-5):
    return ((x - sd[key + ".running_mean"])
            / np.sqrt(sd[key + ".running_var"] + eps)
            * sd[key + ".weight"] + sd[key + ".bias"])


def _np_leaky(x, slope=0.2):
    return np.where(x > 0, x, slope * x)


def _np_kpconv(coord, feat, kp, w, radius, sigma_r):
    """Reference KPConvLayer forward (torch_points3d kernels.py; linear
    influence, sum aggregation, add_one=False) with an exhaustive ball
    neighborhood — the ground truth both the torch stem and ours
    approximate with capped neighbor lists."""
    n = coord.shape[0]
    out = np.zeros((n, w.shape[2]), np.float64)
    for i in range(n):
        rel = coord - coord[i]
        nb = np.where((rel ** 2).sum(1) <= radius * radius)[0]
        for p in range(kp.shape[0]):
            dist = np.sqrt(((rel[nb] - kp[p]) ** 2).sum(1))
            infl = np.maximum(1.0 - dist / sigma_r, 0.0)
            out[i] += (infl[:, None] * feat[nb]).sum(0) @ w[p]
    return out.astype(np.float32)


def test_st_stem_forward_matches_reference_math():
    """Imported stem weights must reproduce the reference stem forward
    (KPConvSimpleBlock + KPConvResBlock, stratified_transformer_v1m1_
    origin.py:581-662) computed independently in numpy: kpconv with the
    checkpoint's own K_points -> BN -> LeakyReLU(0.2), then the res
    block unary_1 -> kpconv -> unary_2 -> += shortcut (identity here;
    no mid BN, no post-add activation)."""
    from pointcloudpdf_tpu.models.stratified_transformer import st as stm

    rng = np.random.RandomState(3)
    c0, n = 16, 64
    prev_grid_size, sigma = 0.1, 1.0
    sigma_r = sigma * prev_grid_size          # reference point_influence
    radius = 0.25                             # kp_ball_radius
    sd = {}
    kp0 = (rng.randn(15, 3) * 0.3 * 1.5 * sigma_r).astype(np.float32)
    kp1 = (rng.randn(15, 3) * 0.3 * 1.5 * sigma_r).astype(np.float32)
    sd["backbone.stem_layer.0.kpconv.K_points"] = kp0
    sd["backbone.stem_layer.0.kpconv.weight"] = _rng_like(rng, (15, 6, c0))
    _torch_bn(rng, sd, "backbone.stem_layer.0.bn.batch_norm", c0)
    d2 = c0 // 4
    _torch_linear(rng, sd, "backbone.stem_layer.1.unary_1.0", (c0, d2),
                  bias=False)
    _torch_bn(rng, sd, "backbone.stem_layer.1.unary_1.1.batch_norm", d2)
    sd["backbone.stem_layer.1.kpconv.K_points"] = kp1
    sd["backbone.stem_layer.1.kpconv.weight"] = _rng_like(rng, (15, d2, d2))
    _torch_linear(rng, sd, "backbone.stem_layer.1.unary_2.0", (d2, c0),
                  bias=False)
    _torch_bn(rng, sd, "backbone.stem_layer.1.unary_2.1.batch_norm", c0)

    coord = rng.rand(n, 3).astype(np.float32) * 0.6
    feat = rng.randn(n, 6).astype(np.float32)

    # --- numpy reference forward ---------------------------------------
    B0 = "backbone.stem_layer.0"
    y = _np_kpconv(coord, feat, kp0, sd[B0 + ".kpconv.weight"],
                   radius, sigma_r)
    y = _np_leaky(_np_bn_eval(sd, B0 + ".bn.batch_norm", y))
    B1 = "backbone.stem_layer.1"
    shortcut = y
    h = y @ sd[B1 + ".unary_1.0.weight"].T
    h = _np_leaky(_np_bn_eval(sd, B1 + ".unary_1.1.batch_norm", h))
    h = _np_kpconv(coord, h, kp1, sd[B1 + ".kpconv.weight"],
                   radius, sigma_r)
    h = h @ sd[B1 + ".unary_2.0.weight"].T
    h = _np_leaky(_np_bn_eval(sd, B1 + ".unary_2.1.batch_norm", h))
    want = h + shortcut

    # --- our stem with imported params (XLA ball-query path; the cap is
    # above the densest neighborhood so the neighbor sets are exhaustive)
    counts = ((coord[None] - coord[:, None]) ** 2).sum(-1) <= radius ** 2
    assert counts.sum(1).max() < 60
    blocks = []
    for name, residual, cin in (("stem0", False, 6), ("stem1", True, c0)):
        blocks.append(stm.KPConvBlock(
            cin, c0, prev_grid_size, sigma, residual=residual,
            kp_radius=radius / prev_grid_size, max_neighbor=60,
            name=name))

    cj = jnp.asarray(coord)[None]
    mj = jnp.ones((1, n), bool)
    variables0 = jax.jit(lambda: blocks[0].init(
        jax.random.PRNGKey(0), jnp.asarray(feat)[None], cj, mj, False))()
    variables1 = jax.jit(lambda: blocks[1].init(
        jax.random.PRNGKey(1), jnp.zeros((1, n, c0)), cj, mj, False))()

    from import_reference_checkpoint import translate
    ours, _ = translate(sd, "st-v1m1")

    def fill(variables, stem):
        v = jax.tree_util.tree_map(np.asarray, dict(variables))
        pref = f"backbone_module/{stem}/"
        for path, arr in ours.items():
            coll, rest = path.split("/", 1)
            if not rest.startswith(pref):
                continue
            keys = rest[len(pref):].split("/")
            node = v[coll]
            for kk in keys[:-1]:
                node = node[kk]
            assert node[keys[-1]].shape == arr.shape, (path, arr.shape)
            node[keys[-1]] = arr
        return v

    old = stm.FUSED_KPCONV
    stm.FUSED_KPCONV = "off"
    try:
        v0 = fill(variables0, "stem0")
        out0 = jax.jit(lambda v: blocks[0].apply(
            v, jnp.asarray(feat)[None], cj, mj, False))(v0)
        v1 = fill(variables1, "stem1")
        out1 = jax.jit(lambda v, f: blocks[1].apply(v, f, cj, mj, False))(
            v1, out0)
    finally:
        stm.FUSED_KPCONV = old

    got0 = np.asarray(out0)[0]
    np.testing.assert_allclose(
        got0, _np_leaky(_np_bn_eval(sd, B0 + ".bn.batch_norm", _np_kpconv(
            coord, feat, kp0, sd[B0 + ".kpconv.weight"], radius, sigma_r))),
        rtol=2e-4, atol=2e-4)
    got = np.asarray(out1)[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-4)
