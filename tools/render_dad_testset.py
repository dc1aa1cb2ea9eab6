"""Render a DAD-3DHeads-format stand-in test set (CPU, native raster).

The DAD academic test set cannot be downloaded in this environment, but the
full DAD protocol (``evaluation/evaluate_dad.py``: NME-2D, Z_n, rot/angle
error, Procrustes-aligned chamfer, attribute breakdown) can be exercised on
rendered FLAME-head scenes whose GT follows the ``DadSample`` schema
(ref ``evaluation/evaluate_dad.py:86-316`` + dataset JSON fields).

Frame conventions (verified by
``tests/test_evaluate_dad.py::test_rendered_dad_gt_conventions_oracle``):

* predictions live in image coords (x right, y down, z = model projection
  depth); the DAD world frame relates by the proper rotation diag(1,-1,-1)
  (y up, z toward viewer) — the same 180-degree pre-rotation the evaluator
  applies to the model-view matrix (``ROT_180``).
* ``model_view_matrix[:3,:3] = diag(1,-1,-1) @ R_gt`` so the evaluator's
  ``r_kt`` recovers exactly the renderer's head rotation.
* ``vertices_3d = (x, -y, -z_model)`` of the absolute projected vertices.
* ``landmarks_68_2d`` are the 68-landmark rows of the absolute projection.

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/render_dad_testset.py \
        --out /root/data/dad_standin --count 256 --image-size 512
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from render_synthetic_dataset import euler_rotation, make_background  # noqa: E402


def build_scene(rng, flame_decode, faces, colors, lmk68, image_size,
                max_heads=1):
    """Render one scene; returns (image_u8, [per-head DadSample cfg dicts]).

    Geometry matches tools/render_synthetic_dataset.py (same pose/scale
    distributions, shared z-buffer) with per-head DAD-schema GT attached.
    """
    s = image_size
    n = int(rng.choice(np.arange(1, max_heads + 1)))
    pad_n = max_heads

    params = np.zeros((pad_n, 413), np.float32)
    params[:, :300] = rng.normal(0, 0.3, (pad_n, 300))
    params[:, 300:400] = rng.normal(0, 0.3, (pad_n, 100))
    params[:, 400] = np.abs(rng.normal(0, 0.12, pad_n))
    params[:, 401:403] = rng.normal(0, 0.03, (pad_n, 2))
    rpy_deg = np.stack([
        rng.uniform(-45, 45, pad_n),   # roll
        rng.uniform(-50, 50, pad_n),   # pitch
        rng.uniform(-75, 75, pad_n),   # yaw
    ], 1)
    rots = np.stack([
        euler_rotation(np.radians(r), np.radians(p), np.radians(y))
        for r, p, y in rpy_deg
    ])
    params[:, 403:409] = rots[:, :, :2].transpose(0, 2, 1).reshape(pad_n, 6)

    verts = flame_decode(params)  # [pad_n, V, 3] canonical (zero rotation)

    image = make_background(rng, s)
    cfgs, all_v = [], []
    for h in range(n):
        rv = verts[h] @ rots[h].T
        ext_xy = max(rv[:, 0].max() - rv[:, 0].min(),
                     rv[:, 1].max() - rv[:, 1].min())
        target_px = float(np.exp(rng.uniform(np.log(72), np.log(300))))
        target_px = min(target_px, s * 0.55)
        rv = rv * (target_px / (ext_xy * 128.0))
        center = (rv.max(0) + rv.min(0)) / 2.0
        rv = rv + np.array([-center[0], -center[1], 0.0])

        proj = (rv + 1.0) / 2.0 * 256.0
        half = target_px / 2.0
        cx = rng.uniform(half + 4, s - half - 4)
        cy = rng.uniform(half + 4, s - half - 4)
        origin = np.array([cx, cy]) - 128.0
        abs_v = proj.copy()
        abs_v[:, :2] += origin  # absolute image coords, z = projection depth

        raster_v = abs_v.copy()
        raster_v[:, 2] *= -1.0  # rasterizer wants camera-facing depth
        all_v.append(np.ascontiguousarray(raster_v, np.float32))

        x1, y1 = abs_v[:, 0].min(), abs_v[:, 1].min()
        x2, y2 = abs_v[:, 0].max(), abs_v[:, 1].max()

        mv = np.eye(4)
        mv[:3, :3] = np.diag([1.0, -1.0, -1.0]) @ rots[h]
        world_v = abs_v * np.array([1.0, -1.0, -1.0])  # module doc conventions
        yaw = rpy_deg[h, 2]
        cfgs.append({
            "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
            "model_view_matrix": mv.tolist(),
            "landmarks_68_2d": abs_v[lmk68, :2].tolist(),
            "vertices_3d": world_v.tolist(),
            "attributes": {
                "quality": str(rng.choice(["good", "mid"])),
                "gender": str(rng.choice(["female", "male"])),
                "expression": str(rng.choice(["none", "smile", "surprise"])),
                "age": str(rng.choice(["20-30", "30-50", "50+"])),
                "occlusions": "none" if n == 1 else "head",
                "pose": "frontal" if abs(yaw) < 30 else "profile",
                "standard light": "yes",
            },
            # extra fields for oracle/conversion tools (ignored by DadSample)
            "_params_dad": params[h].tolist(),
        })

    from head_detector_tpu.native import rasterize_zbuffer_native

    nv = all_v[0].shape[0]
    scene_v = np.concatenate(all_v, 0)
    scene_f = np.concatenate([faces + h * nv for h in range(n)], 0)
    scene_c = np.concatenate([colors] * n, 0)
    canvas, hit = rasterize_zbuffer_native(scene_v, scene_f, scene_c,
                                           height=s, width=s)
    m = hit.astype(bool)
    image[m] = np.clip(canvas[m] * 255.0, 0, 255).astype(np.uint8)
    return image, cfgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--count", type=int, default=256)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--max-heads", type=int, default=1,
                    help=">1 renders distractor heads; only head 0 is "
                         "annotated (exercises the IoU selection path)")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.assets_io import load_flame_assets
    from head_detector_tpu.evaluation.dad_metrics import get_68_landmark_indices
    from head_detector_tpu.flame import FlameModel, flame_vertices
    from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams
    from head_detector_tpu.pncc import compute_ncc_color_codes

    flame = FlameModel.from_assets()
    assets = load_flame_assets()
    faces = np.ascontiguousarray(assets.faces, np.int32)
    colors = np.ascontiguousarray(
        compute_ncc_color_codes(assets.v_template.astype(np.float64)), np.float32
    )
    lmk68 = get_68_landmark_indices()

    @jax.jit
    def _decode(params):
        p = FlameParams.from_3dmm(params, FLAME_CONSTS)
        return flame_vertices(flame, p, zero_rot=True)

    def flame_decode(params):
        return np.asarray(_decode(jnp.asarray(params)))

    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    index = {"standin": []}
    for i in range(args.count):
        rng = np.random.RandomState((args.seed * 1000003 + i) % (2 ** 31))
        image, cfgs = build_scene(
            rng, flame_decode, faces, colors, lmk68, args.image_size,
            max_heads=args.max_heads,
        )
        rel = os.path.join("images", f"{i:05d}.png")
        # PNG: the GT landmarks are exact projections; JPEG blocking would
        # add a fixed noise floor under every metric
        cv2.imwrite(os.path.join(args.out, rel),
                    cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
        cfg = dict(cfgs[0])  # DAD annotates one head per sample
        cfg["image_path"] = rel
        index["standin"].append(cfg)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{args.count}", flush=True)

    with open(os.path.join(args.out, "dataset.json"), "w") as f:
        json.dump(index, f)
    print(f"done: {args.count} samples at {args.out}/dataset.json")


if __name__ == "__main__":
    main()
