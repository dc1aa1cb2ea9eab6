"""Headline benchmark: images/sec/chip at 640px, detect + FLAME mesh decode.

Default mode measures the full on-device inference pipeline on the flagship
YoloHeads-L in bfloat16 with the deploy-fused (single-conv QARepVGG) graph:
uint8 batch -> normalize -> backbone/neck/heads decode -> fixed-shape NMS
(keep 100) -> FLAME mesh decode of every kept detection.  This is
BASELINE.json's metric ("images/sec/chip at 640px detect+mesh decode").

Extra modes via HDT_BENCH_MODE (the other BASELINE.json configs):
  pipeline  (default) config 1/2 — fused preprocess + on-device NMS + meshes
  crops     config 3 — + batched aligned-crop warp of every detection
  pncc      config 4 — rasterizer rendering all detected meshes
  streaming config 5 — 1024px shard pipeline (StreamingDetector)

The reference repo publishes no throughput numbers (BASELINE.md); the
baseline anchor is this benchmark's own first recorded run, stored in
``BENCH_BASELINE.json`` — ``vs_baseline`` is the speedup ratio against that
anchor (1.0 on the anchoring run).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("HDT_BENCH_BATCH", "32"))
SIZE = int(os.environ.get("HDT_BENCH_SIZE", "640"))
WARMUP = int(os.environ.get("HDT_BENCH_WARMUP", "3"))
ITERS = int(os.environ.get("HDT_BENCH_ITERS", "10"))
MODEL = os.environ.get("HDT_BENCH_MODEL", "yolo_heads_l")
MODE = os.environ.get("HDT_BENCH_MODE", "pipeline")
BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)


def _build_fused(jnp):
    import jax

    from head_detector_tpu.export import build_deploy
    from head_detector_tpu.models import build_model, init_model

    train_model = build_model(MODEL, dtype=jnp.bfloat16)
    variables = init_model(train_model, jax.random.PRNGKey(0), (SIZE, SIZE), batch=2)
    return build_deploy(MODEL, variables)


def _bench_pipeline(mode: str) -> float:
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.flame import FlameModel, fused_project_vertices
    from head_detector_tpu.ops.nms import batched_nms

    model, variables = _build_fused(jnp)
    flame = FlameModel.from_assets(dtype=jnp.float32)

    if mode == "pncc":
        from head_detector_tpu.assets_io import load_flame_assets
        from head_detector_tpu.ops.rasterize_pallas import rasterize_zbuffer_pallas
        from head_detector_tpu.pncc import compute_ncc_color_codes

        assets = load_flame_assets()
        idx_set = set(int(i) for i in assets.head_w_ears_indices)
        pncc_tris = jnp.asarray(
            np.array([t for t in assets.faces if all(int(v) in idx_set for v in t)],
                     np.int32)
        )
        pncc_colors = jnp.asarray(
            compute_ncc_color_codes(
                assets.v_template.astype(np.float64), assets.head_w_ears_indices
            ).astype(np.float32)
        )

    if mode == "crops":
        from head_detector_tpu.ops.warp import scaled_crops_matmul

    @jax.jit
    def step(images_u8):
        images = images_u8.astype(jnp.float32) / 255.0
        decoded, _ = model.apply(variables, images, train=False)
        res = batched_nms(
            decoded.boxes_xyxy,
            decoded.scores,
            decoded.flame_params,
            confidence_threshold=0.5,
            iou_threshold=0.5,
            pre_nms_max=1000,
            post_nms_max=100,
        )
        b, k, p = res.flame_params.shape
        flat = res.flame_params.reshape(b * k, p)
        _, verts = fused_project_vertices(flame, flat, to_2d=False)
        verts = verts.reshape(b, k, -1, 3)

        if mode == "crops":
            # batched warp: 256px crops of the top-10 boxes per image
            # (config 3; 100 crops/image would be 2.5 GB of output alone).
            # Separable matmul warp — the gather-based path measured 16 img/s.
            kc = 10
            boxes = jnp.clip(res.boxes[:, :kc], 1.0, None)  # [B, kc, 4]
            crops = jax.vmap(
                lambda img, bxs: scaled_crops_matmul(img, bxs, out_size=256)
            )(images, boxes)
            return res.boxes, res.scores, res.valid, verts, crops

        if mode == "pncc":
            # render the best head of each image onto its canvas (config 4)
            # via the Pallas kernel, sequentially per image (lax.map keeps
            # the scalar-prefetch grid per render)
            best_verts = verts[:, 0]  # [B, V, 3]
            flipped = best_verts.at[:, :, 2].multiply(-1.0)
            render = jax.lax.map(
                lambda v: rasterize_zbuffer_pallas(
                    v, pncc_tris, pncc_colors, height=SIZE, width=SIZE
                )[0],
                flipped,
            )
            return res.boxes, res.scores, res.valid, render

        return res.boxes, res.scores, res.valid, verts

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    )

    for _ in range(WARMUP):
        out = step(images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def _bench_latency() -> float:
    """p50 single-image end-to-end latency (ms) through the public
    HeadDetector API — uint8 image in, HeadMetadata list out."""
    import numpy as np

    from head_detector_tpu.detector import HeadDetector

    det = HeadDetector(model=MODEL, image_size=SIZE)
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (480, SIZE, 3), dtype=np.uint8)
    for _ in range(max(WARMUP, 2)):
        det(image, confidence_threshold=0.5)
    times = []
    for _ in range(max(ITERS, 20)):
        t0 = time.perf_counter()
        det(image, confidence_threshold=0.5)
        times.append((time.perf_counter() - t0) * 1000.0)
    return float(np.percentile(times, 50))


def _bench_streaming() -> float:
    from head_detector_tpu.pipeline import StreamingDetector

    det = StreamingDetector(
        model_name=MODEL,
        image_size=int(os.environ.get("HDT_BENCH_SIZE", "1024")),
        batch_size=BATCH,
    )
    return det.throughput(num_images=BATCH * max(ITERS, 4))


def main():
    import jax

    # NO persistent compilation cache here: deserialized executables run
    # ~20x slow on the axon backend and CPU entries carry machine-feature
    # mismatch (SIGILL) warnings. The benchmark always compiles fresh.
    _ = jax  # backend selected by the environment

    if MODE == "latency":
        p50_ms = _bench_latency()
        print(
            json.dumps(
                {
                    "metric": f"p50 single-image latency @{SIZE}px ({MODEL}, e2e HeadDetector)",
                    "value": round(p50_ms, 2),
                    "unit": "ms",
                    "vs_baseline": 1.0,
                }
            )
        )
        return

    if MODE == "streaming":
        images_per_sec = _bench_streaming()
        size = int(os.environ.get("HDT_BENCH_SIZE", "1024"))
        metric = f"images/sec streaming @{size}px ({MODEL}, bf16, batch {BATCH})"
    else:
        images_per_sec = _bench_pipeline(MODE)
        suffix = {"pipeline": "detect+mesh decode", "crops": "detect+mesh+crops",
                  "pncc": "detect+mesh+PNCC render"}[MODE]
        metric = f"images/sec/chip @{SIZE}px {suffix} ({MODEL}, bf16 fused, batch {BATCH})"

    baseline = None
    if os.path.isfile(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                baseline = float(json.load(f)["value"])
        except Exception:
            baseline = None
    if baseline is None:
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump(
                    {"value": images_per_sec, "batch": BATCH, "size": SIZE,
                     "model": MODEL, "mode": MODE, "device": str(jax.devices()[0])},
                    f,
                )
        except OSError:
            pass
        baseline = images_per_sec

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
