"""Pallas TPU rasterizer: tiled z-buffer with per-tile triangle-chunk culling.

Same math and output contract as :func:`head_detector_tpu.ops.rasterize.
rasterize_zbuffer` (the C++-spec golden), written as an explicit Mosaic
kernel:

* grid = (tiles, chunks): the chunk axis is a standard TPU reduction — the
  z/color buffers live in VMEM scratch, initialised at chunk 0 and flushed to
  the output block at the last chunk, while Mosaic double-buffers the chunk
  DMAs,
* a precomputed [tiles, chunks] overlap bitmap rides scalar prefetch; chunks
  whose triangle bboxes all miss the tile skip their compute via ``pl.when``
  (a real scalar branch),
* no gathers and no in-kernel rank changes (Mosaic layout inference rejects
  2D<->1D reshapes): pixels are a [T*T, 1] column, per-chunk math is [T*T, C],
  the winning triangle is selected with a masked index-min one-hot, and the
  output blocks are flat [1, T*T, C] tiles reassembled by XLA outside,
* triangle records are stored [12, C] / colors [9, C] so the lane dimension
  is the chunk size (128-multiple), not the tiny field count.

Winner rule matches the golden's lexicographic (depth, -index): within a
chunk the LOWEST-index triangle at max depth wins (masked index-min), and the
strict ``>`` against the running buffer keeps earlier chunks on ties.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_DEPTH = -1e8


def _raster_kernel(
    overlap_ref,  # scalar prefetch [tiles, chunks] int32
    tri_ref,  # block [1, 12, C]: p0x p0y p1x p1y p2x p2y z0 z1 z2 valid pad pad
    col_ref,  # block [1, 9, C]: c0.rgb c1.rgb c2.rgb
    color_out_ref,  # block [1, T*T, 3]
    depth_out_ref,  # block [1, T*T, 1]
    zbuf,  # VMEM scratch [T*T, 1]
    cbuf,  # VMEM scratch [T*T, 3]
    *,
    tile: int,
    gw: int,
    height: int,
    width: int,
):
    t = tile
    p = t * t
    tile_idx = pl.program_id(0)
    ci = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(ci == 0)
    def _init():
        zbuf[:] = jnp.full((p, 1), NEG_DEPTH, jnp.float32)
        cbuf[:] = jnp.zeros((p, 3), jnp.float32)

    @pl.when(overlap_ref[tile_idx, ci] > 0)
    def _chunk():
        y0 = (tile_idx // gw) * t
        x0 = (tile_idx % gw) * t
        # linear pixel index -> (row, col), all [P, 1] int32 (Mosaic iota is
        # integer-only and rank changes are not supported in-kernel)
        lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        py = (y0 + lin // t).astype(jnp.float32)
        px = (x0 + lin % t).astype(jnp.float32)
        in_canvas = (py <= height - 1) & (px <= width - 1)  # [P, 1]

        rec = tri_ref[0]  # [12, C]
        p0x, p0y = rec[0:1], rec[1:2]  # [1, C]
        p1x, p1y = rec[2:3], rec[3:4]
        p2x, p2y = rec[4:5], rec[5:6]
        z0, z1, z2 = rec[6:7], rec[7:8], rec[8:9]
        valid = rec[9:10] > 0.5

        # barycentric weights [P, C] (C++ get_point_weight formula with the
        # relative degenerate guard; see ops/rasterize.py)
        v0x, v0y = p2x - p0x, p2y - p0y  # [1, C]
        v1x, v1y = p1x - p0x, p1y - p0y
        v2x = px - p0x  # [P, C]
        v2y = py - p0y

        dot00 = v0x * v0x + v0y * v0y
        dot01 = v0x * v1x + v0y * v1y
        dot11 = v1x * v1x + v1y * v1y
        dot02 = v0x * v2x + v0y * v2y
        dot12 = v1x * v2x + v1y * v2y

        deno = dot00 * dot11 - dot01 * dot01
        degenerate = deno <= 1e-6 * dot00 * dot11
        inver = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, deno))
        u = (dot11 * dot02 - dot01 * dot12) * inver
        v = (dot00 * dot12 - dot01 * dot02) * inver
        w0 = 1.0 - u - v

        inside = (w0 > 0) & (v > 0) & (u > 0)
        inside &= valid & in_canvas

        depth = w0 * z0 + v * z1 + u * z2
        depth = jnp.where(inside, depth, NEG_DEPTH)

        # first (lowest-index) maximum via masked index-min — no argmax/gather
        best_depth = jnp.max(depth, axis=1, keepdims=True)  # [P, 1]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1)
        is_max = depth == best_depth
        big = jnp.int32(depth.shape[1])
        best_idx = jnp.min(jnp.where(is_max, c_iota, big), axis=1, keepdims=True)
        onehot = (c_iota == best_idx).astype(jnp.float32)  # [P, C]

        bw0 = jnp.sum(w0 * onehot, axis=1, keepdims=True)
        bw1 = jnp.sum(v * onehot, axis=1, keepdims=True)
        bw2 = jnp.sum(u * onehot, axis=1, keepdims=True)
        # colors: onehot [P, C] x col [9, C]^T -> [P, 9] on the MXU
        cols9 = jax.lax.dot_general(
            onehot, col_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        color = (
            bw0 * cols9[:, 0:3] + bw1 * cols9[:, 3:6] + bw2 * cols9[:, 6:9]
        )

        win = best_depth > zbuf[:]  # [P, 1]
        zbuf[:] = jnp.where(win, best_depth, zbuf[:])
        cbuf[:] = jnp.where(win, color, cbuf[:])

    @pl.when(ci == n_chunks - 1)
    def _flush():
        color_out_ref[0] = cbuf[:]
        depth_out_ref[0] = zbuf[:]


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "chunk", "reverse", "interpret"),
)
def rasterize_zbuffer_pallas(
    vertices: jnp.ndarray,  # [V, 3]
    triangles: jnp.ndarray,  # [F, 3] int32
    colors: jnp.ndarray,  # [V, 3] in [0, 1]
    height: int,
    width: int,
    tile: int = 64,
    chunk: int = 256,
    reverse: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (color [H, W, 3] float, hit [H, W] bool) — identical contract
    to ops.rasterize.rasterize_zbuffer."""
    f = triangles.shape[0]
    if f == 0:  # static empty mesh: nothing to render
        return (
            jnp.zeros((height, width, 3), jnp.float32),
            jnp.zeros((height, width), jnp.bool_),
        )
    pad_f = (-f) % chunk
    tri = jnp.pad(triangles, ((0, pad_f), (0, 0)))
    tri_valid = jnp.pad(jnp.ones((f,), jnp.float32), (0, pad_f))
    n_chunks = tri.shape[0] // chunk

    tv = vertices[tri].astype(jnp.float32)  # [F', 3, 3]
    rec = jnp.stack(
        [
            tv[:, 0, 0], tv[:, 0, 1],
            tv[:, 1, 0], tv[:, 1, 1],
            tv[:, 2, 0], tv[:, 2, 1],
            tv[:, 0, 2], tv[:, 1, 2], tv[:, 2, 2],
            tri_valid,
            jnp.zeros_like(tri_valid),
            jnp.zeros_like(tri_valid),
        ],
        axis=0,
    )  # [12, F']
    rec = rec.reshape(12, n_chunks, chunk).transpose(1, 0, 2)  # [chunks, 12, C]
    col = jnp.concatenate(
        [colors[tri[:, 0]], colors[tri[:, 1]], colors[tri[:, 2]]], axis=1
    ).astype(jnp.float32)  # [F', 9]
    col = col.T.reshape(9, n_chunks, chunk).transpose(1, 0, 2)  # [chunks, 9, C]

    # [tiles, chunks] overlap bitmap from per-triangle pixel bboxes
    xs = tv[..., 0]
    ys = tv[..., 1]
    x_min = jnp.ceil(xs.min(-1))
    x_max = jnp.floor(xs.max(-1))
    y_min = jnp.ceil(ys.min(-1))
    y_max = jnp.floor(ys.max(-1))

    gh = -(-height // tile)
    gw = -(-width // tile)
    tx0 = (jnp.arange(gw) * tile).astype(jnp.float32)
    ty0 = (jnp.arange(gh) * tile).astype(jnp.float32)
    ox = (x_max[None, None, :] >= tx0[None, :, None]) & (
        x_min[None, None, :] <= tx0[None, :, None] + tile - 1
    )
    oy = (y_max[None, None, :] >= ty0[:, None, None]) & (
        y_min[None, None, :] <= ty0[:, None, None] + tile - 1
    )
    ov = (ox & oy & (tri_valid[None, None, :] > 0.5)).reshape(
        gh * gw, n_chunks, chunk
    )
    overlap = ov.any(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gh * gw, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 12, chunk), lambda ti, ci, *_: (ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 9, chunk), lambda ti, ci, *_: (ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile * tile, 3), lambda ti, ci, *_: (ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile * tile, 1), lambda ti, ci, *_: (ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile * tile, 1), jnp.float32),
            pltpu.VMEM((tile * tile, 3), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _raster_kernel, tile=tile, gw=gw, height=height, width=width
    )
    color_t, depth_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((gh * gw, tile * tile, 3), jnp.float32),
            jax.ShapeDtypeStruct((gh * gw, tile * tile, 1), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # the [P, C] weight/depth intermediates exceed the 16M default
            # scoped-vmem budget; the kernel fits comfortably in ~half VMEM
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(overlap, rec, col)

    # reassemble tiles outside the kernel (XLA handles the rank changes)
    canvas = color_t.reshape(gh, gw, tile, tile, 3).transpose(0, 2, 1, 3, 4)
    canvas = canvas.reshape(gh * tile, gw * tile, 3)[:height, :width]
    depth = depth_t.reshape(gh, gw, tile, tile).transpose(0, 2, 1, 3)
    depth = depth.reshape(gh * tile, gw * tile)[:height, :width]
    hits = depth > NEG_DEPTH
    if reverse:
        canvas = canvas[::-1]
        hits = hits[::-1]
    return canvas, hits
