"""Pallas FPS kernel vs the lax-loop reference (interpreter mode on CPU).

The op-vs-naive-composition contract mirrors the reference's pointops2
test scripts (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointcloudpdf_tpu.ops.pallas_fps import farthest_point_sampling_pallas
from pointcloudpdf_tpu.ops.sampling import farthest_point_sampling


@pytest.mark.parametrize("n,m,valid", [(256, 32, 200), (512, 128, 512)])
def test_matches_lax_reference(n, m, valid, rng):
    coord = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    mask = jnp.asarray(np.arange(n) < valid)
    ref = np.asarray(farthest_point_sampling(coord, m, mask))
    got = np.asarray(
        farthest_point_sampling_pallas(coord, m, mask, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_never_picks_invalid(rng):
    coord = jnp.asarray(rng.rand(256, 3).astype(np.float32))
    mask = jnp.asarray(np.arange(256) < 64)
    got = np.asarray(
        farthest_point_sampling_pallas(coord, 64, mask, interpret=True)
    )
    assert (got < 64).all()
    assert len(set(got.tolist())) == 64  # all distinct while valid remain
