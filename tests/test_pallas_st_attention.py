"""Fused Pallas ST window attention vs the XLA einsum path.

Interpret mode emulates the MXU by rounding dot inputs AND outputs to
bf16, so equality tolerances are relative ~1e-2 (BASELINE.md microbench
gotcha); the structural agreement (masking, softmax, cRPE wiring) is
what these tests pin down — on-chip exactness is asserted by bench.py's
live ST path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.models.stratified_transformer import st as stm
from conftest import jit_apply, jit_init


def _mk_inputs(rng, b=2, n=96, k=12, c=32):
    coord = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    feat = jnp.asarray(rng.rand(b, n, c).astype(np.float32) - 0.5)
    mask = jnp.asarray(rng.rand(b, n) > 0.1)
    key_idx = jnp.asarray(rng.randint(0, n, (b, n, k)).astype(np.int32))
    key_mask = jnp.asarray(rng.rand(b, n, k) > 0.2)
    return feat, coord, key_idx, key_mask, mask


@pytest.mark.parametrize("rel", [(True, True, True), (True, False, False)])
def test_fused_matches_xla(rel):
    rng = np.random.RandomState(0)
    feat, coord, key_idx, key_mask, mask = _mk_inputs(rng)
    attn = stm.StratifiedWindowAttention(
        dim=32, num_heads=4, window_size=0.2, quant_size=0.01,
        rel_query=rel[0], rel_key=rel[1], rel_value=rel[2])

    old = stm.FUSED_ST_ATTENTION
    try:
        stm.FUSED_ST_ATTENTION = "off"
        v = jit_init(attn, jax.random.PRNGKey(0), feat, coord, key_idx,
                     key_mask, mask, train=False)
        ref = np.asarray(jit_apply(attn, v, feat, coord, key_idx,
                                   key_mask, mask, train=False))
        stm.FUSED_ST_ATTENTION = "interpret"
        got = np.asarray(jit_apply(attn, v, feat, coord, key_idx,
                                   key_mask, mask, train=False))
    finally:
        stm.FUSED_ST_ATTENTION = old

    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 2e-2
    # valid rows should correlate near-perfectly despite bf16 emulation
    m = np.asarray(mask)
    assert np.corrcoef(got[m].ravel(), ref[m].ravel())[0, 1] > 0.999


def test_fused_chunked_matches_single():
    """The lax.map query-chunked path must equal the one-shot path."""
    rng = np.random.RandomState(1)
    feat, coord, key_idx, key_mask, mask = _mk_inputs(rng, n=96)
    big = stm.StratifiedWindowAttention(
        dim=32, num_heads=4, window_size=0.2, quant_size=0.01,
        query_chunk=4096)
    small = stm.StratifiedWindowAttention(
        dim=32, num_heads=4, window_size=0.2, quant_size=0.01,
        query_chunk=32)

    old = stm.FUSED_ST_ATTENTION
    try:
        stm.FUSED_ST_ATTENTION = "interpret"
        v = jit_init(big, jax.random.PRNGKey(0), feat, coord, key_idx,
                     key_mask, mask, train=False)
        a = np.asarray(jit_apply(big, v, feat, coord, key_idx,
                                 key_mask, mask, train=False))
        b = np.asarray(jit_apply(small, v, feat, coord, key_idx,
                                 key_mask, mask, train=False))
    finally:
        stm.FUSED_ST_ATTENTION = old
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_fused_masks_invalid():
    """All-invalid key rows and invalid queries come out zero."""
    rng = np.random.RandomState(2)
    feat, coord, key_idx, key_mask, mask = _mk_inputs(rng)
    key_mask = key_mask.at[:, 0, :].set(False)
    attn = stm.StratifiedWindowAttention(
        dim=32, num_heads=4, window_size=0.2, quant_size=0.01)

    old = stm.FUSED_ST_ATTENTION
    try:
        stm.FUSED_ST_ATTENTION = "interpret"
        v = jit_init(attn, jax.random.PRNGKey(0), feat, coord, key_idx,
                     key_mask, mask, train=False)
        out = np.asarray(jit_apply(attn, v, feat, coord, key_idx,
                                   key_mask, mask, train=False))
    finally:
        stm.FUSED_ST_ATTENTION = old
    # invalid queries are zeroed by the output mask
    assert np.abs(out[~np.asarray(mask)]).max() == 0.0
    assert np.isfinite(out).all()
