"""Pre-render a synthetic VGGHeads-layout dataset to disk (CPU, native raster).

Writes the exact on-disk contract the training datasets read
(``{split}/images/NNNNNN.jpg`` + ``{split}/annotations/NNNNNN.npz`` with keys
``3dmm_params`` [N, 413], ``bbox`` [N, 4] xywh, ``extended_bbox`` [N, 4]) —
the layout of the reference's pseudo-annotation factory
(``data_generator/mesh_dataset.py:37-246``), with annotations in the DAD
convention (``yolo_head_training/yolo_head/dataset_parsing.py:170-189``:
``scale' = scale + 1``, ``projected = (R v s' + t + 1)/2 * 256`` in the crop,
absolute = projected + extended-bbox origin; extended boxes here are
256 x 256 crops so the origin shift is exact).

Scenes are FLAME heads rendered with NCC colors (the PNCC color code —
``pncc_processor.py:40-64``) at random poses/scales over low-frequency
backgrounds.  Rendering uses the native C++ z-buffer rasterizer on the host:
the TPU is left free for training, and 16k scenes render in minutes.

Usage (CPU-only process)::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/render_synthetic_dataset.py \
        --out /root/data/synth512 --split train --count 16384 --image-size 512
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def euler_rotation(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """R = Rz(roll) @ Ry(yaw) @ Rx(pitch), angles in radians."""
    cr, sr = np.cos(roll), np.sin(roll)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    return rz @ ry @ rx


def make_background(rng: np.random.RandomState, s: int) -> np.ndarray:
    """Low-frequency two-color gradient + gaussian noise, dim-ish."""
    c0 = rng.uniform(30, 110, 3)
    c1 = rng.uniform(30, 110, 3)
    theta = rng.uniform(0, 2 * np.pi)
    xx, yy = np.meshgrid(np.linspace(0, 1, s), np.linspace(0, 1, s))
    t = (np.cos(theta) * xx + np.sin(theta) * yy)
    t = (t - t.min()) / max(t.max() - t.min(), 1e-6)
    img = c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]
    img = img + rng.normal(0, 6.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--count", type=int, default=16384)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-heads", type=int, default=3)
    ap.add_argument("--start", type=int, default=0, help="resume index")
    ap.add_argument("--min-visibility", type=float, default=0.25,
                    help="drop a head's annotation when less than this "
                         "fraction of its solo pixels survives occlusion")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.assets_io import load_flame_assets
    from head_detector_tpu.flame import FlameModel, flame_vertices
    from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams
    from head_detector_tpu.native import rasterize_zbuffer_native
    from head_detector_tpu.pncc import compute_ncc_color_codes

    flame = FlameModel.from_assets()
    assets = load_flame_assets()
    faces = np.ascontiguousarray(assets.faces, np.int32)
    colors = np.ascontiguousarray(
        compute_ncc_color_codes(assets.v_template.astype(np.float64)), np.float32
    )

    pad_n = 4  # fixed compile width for the canonical decode

    @jax.jit
    def canonical_verts(params):
        p = FlameParams.from_3dmm(params, FLAME_CONSTS)
        return flame_vertices(flame, p, zero_rot=True)

    img_dir = os.path.join(args.out, args.split, "images")
    ann_dir = os.path.join(args.out, args.split, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    s = args.image_size
    import zlib

    split_salt = zlib.crc32(args.split.encode()) % (2**31)  # process-stable
    for i in range(args.start, args.count):
        rng = np.random.RandomState(
            (args.seed * 1000003 + split_salt * 7919 + i) % (2**31)
        )
        n = int(rng.choice(np.arange(1, args.max_heads + 1)))

        params = np.zeros((pad_n, 413), np.float32)
        params[:, :300] = rng.normal(0, 0.3, (pad_n, 300))
        params[:, 300:400] = rng.normal(0, 0.3, (pad_n, 100))
        # jaw: mostly-closed to open (axis-angle, x = opening)
        params[:, 400] = np.abs(rng.normal(0, 0.12, pad_n))
        params[:, 401:403] = rng.normal(0, 0.03, (pad_n, 2))

        rots = np.stack(
            [
                euler_rotation(
                    np.radians(rng.uniform(-45, 45)),
                    np.radians(rng.uniform(-50, 50)),
                    np.radians(rng.uniform(-75, 75)),
                )
                for _ in range(pad_n)
            ]
        )
        # 6dof = first two columns of R (ops/rotation.py layout)
        params[:, 403:409] = rots[:, :, :2].transpose(0, 2, 1).reshape(pad_n, 6)

        verts = np.asarray(canonical_verts(jnp.asarray(params)))  # [pad_n,V,3]

        image = make_background(rng, s)
        bboxes, exts = [], []
        all_v = []
        for h in range(n):
            rv0 = verts[h] @ rots[h].T  # [V, 3] rotated canonical
            ext_xy = max(
                rv0[:, 0].max() - rv0[:, 0].min(),
                rv0[:, 1].max() - rv0[:, 1].min(),
            )
            target_px = float(np.exp(rng.uniform(np.log(56), np.log(300))))
            target_px = min(target_px, s * 0.55)
            scale_p = target_px / (ext_xy * 128.0)
            rv = rv0 * scale_p
            center = (rv.max(0) + rv.min(0)) / 2.0
            t = -center
            t[2] = 0.0
            rv = rv + t
            params[h, 409:412] = t
            params[h, 412] = scale_p - 1.0  # DAD stores scale' - 1

            proj = (rv + 1.0) / 2.0 * 256.0  # crop coords, z same scale
            half = target_px / 2.0
            cx = rng.uniform(half + 4, s - half - 4)
            cy = rng.uniform(half + 4, s - half - 4)
            origin = np.array([cx, cy]) - 128.0  # proj center sits at 128
            v_img = proj.copy()
            v_img[:, :2] += origin
            v_img[:, 2] *= -1.0  # camera-facing depth (PNCC path convention)
            all_v.append(np.ascontiguousarray(v_img, np.float32))

            x1, y1 = v_img[:, 0].min(), v_img[:, 1].min()
            x2, y2 = v_img[:, 0].max(), v_img[:, 1].max()
            bboxes.append([x1, y1, x2 - x1, y2 - y1])
            exts.append([origin[0], origin[1], 256.0, 256.0])

        # ONE shared z-buffer across all heads: overlapping heads occlude by
        # DEPTH (the old per-head compositing painted later heads over nearer
        # earlier ones regardless of depth).
        nv = all_v[0].shape[0]
        scene_v = np.concatenate(all_v, 0)
        scene_f = np.concatenate([faces + h * nv for h in range(n)], 0)
        scene_c = np.concatenate([colors] * n, 0)
        canvas, hit = rasterize_zbuffer_native(
            scene_v, scene_f, scene_c, height=s, width=s)
        m = hit.astype(bool)
        image[m] = np.clip(canvas[m] * 255.0, 0, 255).astype(np.uint8)

        if n > 1:
            # ownership map (head id as flat color) -> per-head visibility;
            # drop annotations for heads mostly hidden behind another head
            id_colors = np.concatenate([
                np.full((nv, 3), (h + 1) / (n + 1), np.float32)
                for h in range(n)
            ], 0)
            own, _ = rasterize_zbuffer_native(
                scene_v, scene_f, id_colors, height=s, width=s)
            own_ids = np.rint(own[..., 0] * (n + 1)).astype(np.int32)
            keep = []
            for h in range(n):
                solo_hit = rasterize_zbuffer_native(
                    all_v[h], faces, colors, height=s, width=s)[1]
                solo = max(int(solo_hit.sum()), 1)
                visible = int(((own_ids == h + 1) & m).sum())
                if visible / solo >= args.min_visibility:
                    keep.append(h)
            if not keep:  # degenerate full-overlap scene: keep one head
                keep = [0]
            keep = np.asarray(keep)
            params_out = params[keep]
            bboxes = [bboxes[k] for k in keep]
            exts = [exts[k] for k in keep]
            n = len(keep)
        else:
            params_out = params[:n]

        name = f"{i:06d}"
        cv2.imwrite(
            os.path.join(img_dir, name + ".jpg"), image,
            [cv2.IMWRITE_JPEG_QUALITY, 92],
        )
        np.savez(
            os.path.join(ann_dir, name + ".npz"),
            **{
                "3dmm_params": params_out,
                "bbox": np.asarray(bboxes, np.float32),
                "extended_bbox": np.asarray(exts, np.float32),
            },
        )
        if (i + 1) % 500 == 0:
            print(f"[{args.split}] {i + 1}/{args.count}", flush=True)

    print(f"[{args.split}] done: {args.count} scenes at {args.out}")


if __name__ == "__main__":
    main()
