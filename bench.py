"""Headline benchmark: images/sec/chip at 640px, detect + FLAME mesh decode.

Measures the full on-device inference pipeline on the flagship YoloHeads-L in
bfloat16: uint8 batch -> normalize -> backbone/neck/heads decode -> fixed-
shape NMS (keep 100) -> FLAME mesh decode of every kept detection -> boxes +
scores + 5023-vertex meshes.  This is BASELINE.json's metric
("images/sec/chip at 640px detect+mesh decode").

The reference repo publishes no throughput numbers (BASELINE.md); the
baseline anchor is this benchmark's own first recorded run, stored in
``BENCH_BASELINE.json`` — ``vs_baseline`` is the speedup ratio against that
anchor (1.0 on the anchoring run).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
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
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the (minutes-long)
    # first compile of the L model
    jax.config.update("jax_compilation_cache_dir", "/tmp/hdt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from head_detector_tpu.flame import FlameModel, reproject_spatial_vertices
    from head_detector_tpu.models import build_model, init_model
    from head_detector_tpu.ops.nms import batched_nms

    model = build_model(MODEL, dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), (SIZE, SIZE), batch=2)
    flame = FlameModel.from_assets(dtype=jnp.float32)

    @jax.jit
    def pipeline(images_u8):
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
        flat = res.flame_params.reshape(-1, res.flame_params.shape[-1])
        _, _, verts = reproject_spatial_vertices(flame, flat, to_2d=False)
        return res.boxes, res.scores, res.valid, verts

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    )

    for _ in range(WARMUP):
        out = pipeline(images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = pipeline(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt

    baseline = None
    if os.path.isfile(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                baseline = float(json.load(f)["value"])
        except Exception:
            baseline = None
    if baseline is None:
        # first recorded run anchors the baseline
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump(
                    {"value": images_per_sec, "batch": BATCH, "size": SIZE,
                     "model": MODEL, "device": str(jax.devices()[0])},
                    f,
                )
        except OSError:
            pass
        baseline = images_per_sec

    print(
        json.dumps(
            {
                "metric": f"images/sec/chip @{SIZE}px detect+mesh decode ({MODEL}, bf16, batch {BATCH})",
                "value": round(images_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
