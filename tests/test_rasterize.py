"""Rasterizer pixel-exactness vs a direct numpy port of the C++ kernel spec.

The numpy reference below transliterates the scan-line semantics of
``/root/reference/head_detector/Sim3DR/lib/rasterize_kernel.cpp:219-292``
(sequential triangles, ceil/floor bbox, strict w>0 inside test, strict
depth > buffer test, alpha blend, uint8 cast) and serves as the golden
implementation for the tiled TPU kernel.
"""

import numpy as np
import pytest

from head_detector_tpu.ops.rasterize import get_normal, rasterize


def _weights(px, py, p0, p1, p2):
    # float64 golden: the true barycentric membership, against which both the
    # C++ float32 kernel and the XLA float32(+FMA) kernel are approximations.
    v0 = (p2 - p0).astype(np.float64)
    v1 = (p1 - p0).astype(np.float64)
    v2 = np.array([px, py], np.float64) - p0
    dot00 = v0 @ v0
    dot01 = v0 @ v1
    dot02 = v0 @ v2
    dot11 = v1 @ v1
    dot12 = v1 @ v2
    deno = dot00 * dot11 - dot01 * dot01
    if deno <= 1e-6 * dot00 * dot11:  # degenerate guard (see ops/rasterize.py)
        return np.array([1.0, 0.0, 0.0]), True
    u = (dot11 * dot02 - dot01 * dot12) / deno
    v = (dot00 * dot12 - dot01 * dot02) / deno
    return np.array([1 - u - v, v, u]), False


def reference_rasterize(vertices, triangles, colors, bg, alpha=1.0, reverse=False):
    """Sequential scan-line golden + per-pixel ambiguity mask.

    A pixel is *ambiguous* when float32-vs-FMA rounding can legitimately
    change the outcome: some triangle's barycentric weight is within 1e-3 of
    the strict >0 inside test, or the top-two candidate depths are within
    1e-4 of each other (winner flips on rounding).  Non-ambiguous pixels
    must match the TPU kernel exactly.
    """
    h, w, c = bg.shape
    image = bg.copy()
    depth_buffer = np.full((h, w), -1e8)
    second_depth = np.full((h, w), -1e8)
    ambiguous = np.zeros((h, w), bool)
    for tri in triangles:
        p = vertices[tri, :2]
        z = vertices[tri, 2].astype(np.float64)
        x_min = max(int(np.ceil(p[:, 0].min())), 0)
        x_max = min(int(np.floor(p[:, 0].max())), w - 1)
        y_min = max(int(np.ceil(p[:, 1].min())), 0)
        y_max = min(int(np.floor(p[:, 1].max())), h - 1)
        if x_max < x_min or y_max < y_min:
            continue
        for y in range(y_min, y_max + 1):
            for x in range(x_min, x_max + 1):
                weight, degenerate = _weights(float(x), float(y), p[0], p[1], p[2])
                if degenerate:
                    continue  # deterministically skipped by both kernels
                if np.abs(weight).min() < 1e-3:
                    ambiguous[y, x] = True
                if weight[0] > 0 and weight[1] > 0 and weight[2] > 0:
                    p_depth = float(weight @ z)
                    if p_depth > depth_buffer[y, x]:
                        second_depth[y, x] = depth_buffer[y, x]
                        color = weight @ colors[tri]
                        row = h - 1 - y if reverse else y
                        image[row, x, :] = (
                            (1 - alpha) * image[row, x, :] + alpha * 255 * color
                        ).astype(np.uint8)
                        depth_buffer[y, x] = p_depth
                    elif p_depth > second_depth[y, x]:
                        second_depth[y, x] = p_depth
    ambiguous |= (second_depth > -1e8) & ((depth_buffer - second_depth) < 1e-4)
    if reverse:
        ambiguous = ambiguous[::-1]
    return image, ambiguous


def _random_mesh(rng, n_verts, n_tris, size):
    vertices = np.stack(
        [
            rng.uniform(-5, size + 5, n_verts),
            rng.uniform(-5, size + 5, n_verts),
            rng.uniform(-1, 1, n_verts),
        ],
        axis=1,
    ).astype(np.float32)
    triangles = rng.randint(0, n_verts, (n_tris, 3)).astype(np.int32)
    colors = rng.rand(n_verts, 3).astype(np.float32)
    return vertices, triangles, colors


def _backends():
    from head_detector_tpu import native

    return ["xla", "native"] if native.available() else ["xla"]


@pytest.mark.parametrize("backend", _backends())
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rasterize_pixel_exact_vs_cpp_spec(seed, backend, monkeypatch):
    monkeypatch.setenv("HDT_RASTERIZER", backend)
    rng = np.random.RandomState(seed)
    size = 48
    vertices, triangles, colors = _random_mesh(rng, 30, 40, size)
    bg = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)

    got = rasterize(vertices, triangles, colors, bg=bg.copy())
    want, ambiguous = reference_rasterize(vertices, triangles, colors, bg.copy())

    # exact match (up to the uint8 truncation boundary, +-2) everywhere
    # except sub-pixel-ambiguous edge/tie pixels
    delta = np.abs(got.astype(int) - want.astype(int)).max(-1)
    bad = (delta > 2) & ~ambiguous
    assert bad.sum() == 0, f"{bad.sum()} mismatching non-ambiguous pixels"
    # and the ambiguous set must stay a thin sliver of the canvas
    assert ambiguous.mean() < 0.25


def test_rasterize_depth_tie_prefers_first_triangle():
    # two identical triangles, different colors: the first must win
    vertices = np.array(
        [[2, 2, 0.5], [30, 2, 0.5], [2, 30, 0.5], [2, 2, 0.5], [30, 2, 0.5], [2, 30, 0.5]],
        np.float32,
    )
    triangles = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    colors = np.zeros((6, 3), np.float32)
    colors[:3] = [1.0, 0.0, 0.0]
    colors[3:] = [0.0, 1.0, 0.0]
    bg = np.zeros((32, 32, 3), np.uint8)
    out = rasterize(vertices, triangles, colors, bg=bg)
    assert out[10, 10, 0] == 255 and out[10, 10, 1] == 0


def test_rasterize_reverse_flips_rows():
    vertices = np.array([[2, 2, 0.5], [30, 2, 0.5], [2, 10, 0.5]], np.float32)
    triangles = np.array([[0, 1, 2]], np.int32)
    colors = np.ones((3, 3), np.float32)
    bg = np.zeros((32, 32, 3), np.uint8)
    normal = rasterize(vertices, triangles, colors, bg=bg.copy())
    flipped = rasterize(vertices, triangles, colors, bg=bg.copy(), reverse=True)
    assert (flipped == normal[::-1]).all()


def test_get_normal_unit_length_and_orientation():
    # single CCW triangle in z=0 plane -> +z normal at all three corners
    vertices = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    triangles = np.array([[0, 1, 2]], np.int32)
    n = np.asarray(get_normal(vertices, triangles))
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
    assert np.allclose(n[:, 2], 1.0, atol=1e-6)
