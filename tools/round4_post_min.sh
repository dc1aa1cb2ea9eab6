#!/bin/bash
# Minimal round-4 post-campaign sequence (the time-critical subset of
# round4_post_campaign.sh — strictly serial, one TPU program at a time):
#   1. score the best EMA checkpoint on held-out val + export f32 msgpack
#   2. CPU-only f16 re-export -> checkpoints/flagship_ema.msgpack
#      (bench.py's loaded-regime default; no TPU time spent)
#   3. DAD protocol numbers over the rendered stand-in set
#   4. FDDB-style COCO AP over rendered scenes
#   5. loaded-regime headline bench (driver's number of record)
# Extended probes (latency, space-to-depth, b64) live in
# round4_post_campaign.sh steps 6-7 and run only if the session has time.
set -u
cd "$(dirname "$0")/.."
CKPT=${1:-runs/campaign/flagship_r4}
ARCH=${2:-yolo_heads_m}
SIZE=${3:-512}
DATA=${HDT_CAMPAIGN_DATA:-/root/data/synth512}
OUT=${HDT_ROUND4_OUT:-/tmp/round4}
mkdir -p "$OUT" checkpoints

BEST_STEP=$(python3 -c "import json;print(json.load(open('$CKPT/best.json'))['step'])")
echo "=== 1. best EMA checkpoint (step $BEST_STEP): score + f32 export ==="
python tools/eval_checkpoint.py --ckpt-dir "$CKPT" --step "$BEST_STEP" \
  --arch "$ARCH" --image-size "$SIZE" --data-dir "$DATA" --which ema \
  --export-msgpack "$OUT/best_ema_f32.msgpack" \
  2>&1 | tee "$OUT/eval_best.log"

echo "=== 2. in-repo f16 checkpoint (CPU-only export) ==="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python tools/eval_checkpoint.py --ckpt-dir "$CKPT" --step "$BEST_STEP" \
  --arch "$ARCH" --image-size "$SIZE" --no-eval --which ema \
  --export-msgpack checkpoints/flagship_ema.msgpack --export-dtype f16 \
  2>&1 | tee "$OUT/export_f16.log"

echo "=== 3. DAD protocol over the rendered stand-in set ==="
python -m head_detector_tpu.evaluation.evaluate_dad \
  --dataset-json /root/data/dad_standin/dataset.json \
  --base-path /root/data/dad_standin \
  --model "$ARCH" --checkpoint "$OUT/best_ema_f32.msgpack" \
  --image-size "$SIZE" 2>&1 | tee "$OUT/dad.log"

echo "=== 4. FDDB-style COCO AP over rendered scenes ==="
python -m head_detector_tpu.evaluation.evaluate_fddb \
  --data-dir /root/data/fddb_standin \
  --model "$ARCH" --checkpoint "$OUT/best_ema_f32.msgpack" \
  --image-size "$SIZE" 2>&1 | tee "$OUT/fddb.log"

echo "=== 5. loaded-regime headline (bench.py default with the ckpt) ==="
python bench.py 2>&1 | tee "$OUT/bench_headline.log"

echo "=== done; logs in $OUT ==="
