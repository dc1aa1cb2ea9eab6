"""Pallas rasterizer (interpret mode) vs the XLA golden kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from head_detector_tpu.ops.rasterize import rasterize_zbuffer
from head_detector_tpu.ops.rasterize_pallas import rasterize_zbuffer_pallas
from test_rasterize import _random_mesh


@pytest.mark.parametrize("seed,size", [(0, 100), (1, 64), (2, 130)])
def test_pallas_matches_xla_kernel(seed, size):
    rng = np.random.RandomState(seed)
    vertices, triangles, colors = _random_mesh(rng, 40, 200, size)
    v = jnp.asarray(vertices)
    t = jnp.asarray(triangles, jnp.int32)
    c = jnp.asarray(colors)

    ref_c, ref_h = rasterize_zbuffer(v, t, c, height=size, width=size)
    pal_c, pal_h = rasterize_zbuffer_pallas(
        v, t, c, height=size, width=size, tile=64, chunk=128, interpret=True
    )
    ref_c, ref_h, pal_c, pal_h = map(np.asarray, (ref_c, ref_h, pal_c, pal_h))
    assert (ref_h == pal_h).mean() > 0.999
    common = ref_h & pal_h
    if common.any():
        assert np.abs(ref_c - pal_c)[common].max() < 1e-4


def test_pallas_reverse_and_empty():
    v = jnp.asarray([[2, 2, 0.5], [30, 2, 0.5], [2, 10, 0.5]], jnp.float32)
    t = jnp.asarray([[0, 1, 2]], jnp.int32)
    c = jnp.ones((3, 3), jnp.float32)
    a, ha = rasterize_zbuffer_pallas(v, t, c, height=32, width=32, tile=32,
                                     chunk=128, interpret=True)
    b, hb = rasterize_zbuffer_pallas(v, t, c, height=32, width=32, tile=32,
                                     chunk=128, reverse=True, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a)[::-1])
    # empty mesh: nothing hit
    t0 = jnp.zeros((0, 3), jnp.int32)
    _, h = rasterize_zbuffer_pallas(
        jnp.zeros((1, 3)), t0, jnp.zeros((1, 3)), height=32, width=32,
        tile=32, chunk=128, interpret=True,
    )
    assert not bool(np.asarray(h).any())
