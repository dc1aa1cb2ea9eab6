#!/bin/bash
# Round-4 post-campaign sequence (strictly serial — one TPU program at a
# time; compiles on the one chip serialize).  Run AFTER the 20-epoch
# flagship campaign completes:
#
#   nohup bash tools/round4_post_campaign.sh > /tmp/round4_post.log 2>&1 &
#
# Produces:
#   1. best-checkpoint + average-best scores on the held-out val split
#   2. checkpoints/flagship_ema.msgpack (f16 + sidecar) — bench.py's
#      loaded-regime default (VERDICT r3 item 3)
#   3. DAD-protocol numbers over the rendered stand-in set (item 4)
#   4. FDDB-style COCO AP over rendered scenes (item 4)
#   5. loaded-regime headline bench + empty floor (item 3)
#   6. batch-1 latency probes: packed-params vs default (item 5)
#   7. space-to-depth stem A/B on the headline graph (item 6)
set -u
cd "$(dirname "$0")/.."
CKPT=${1:-runs/campaign/flagship_campaign}
ARCH=${2:-yolo_heads_m}
SIZE=${3:-512}
DATA=${HDT_CAMPAIGN_DATA:-/root/data/synth512}
OUT=${HDT_ROUND4_OUT:-/tmp/round4}
mkdir -p "$OUT" checkpoints

BEST_STEP=$(python -c "import json;print(json.load(open('$CKPT/best.json'))['step'])")
echo "=== 1. best single checkpoint (step $BEST_STEP, raw + EMA) ==="
python tools/eval_checkpoint.py --ckpt-dir "$CKPT" --step "$BEST_STEP" \
  --arch "$ARCH" --image-size "$SIZE" --data-dir "$DATA" \
  --export-msgpack "$OUT/best_ema_f32.msgpack" --which ema \
  2>&1 | tee "$OUT/eval_best.log"

echo "=== 1b. average_best_models (top 5) ==="
python tools/eval_checkpoint.py --ckpt-dir "$CKPT" --average-best 5 \
  --arch "$ARCH" --image-size "$SIZE" --data-dir "$DATA" \
  --export-msgpack "$OUT/avg5_ema.msgpack" --which ema \
  2>&1 | tee "$OUT/eval_avg5.log"

echo "=== 2. in-repo f16 checkpoint for bench.py's loaded default ==="
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

echo "=== 6. batch-1 latency: default vs packed params (S @640) ==="
HDT_BENCH_MODE=latency HDT_BENCH_LAT=device HDT_BENCH_MODEL=yolo_heads_s \
  python bench.py 2>&1 | tee "$OUT/lat_default.log"
HDT_BENCH_MODE=latency HDT_BENCH_LAT=device HDT_BENCH_MODEL=yolo_heads_s \
  HDT_BENCH_PACKED=1 python bench.py 2>&1 | tee "$OUT/lat_packed.log"
HDT_BENCH_MODE=latency HDT_BENCH_LAT=device HDT_BENCH_MODEL=yolo_heads_s \
  HDT_BENCH_PACKED=1 HDT_BENCH_PIPELINED=1 python bench.py \
  2>&1 | tee "$OUT/lat_packed_pipelined.log"

echo "=== 6b. packed + right-sized NMS budgets (128/32) ==="
HDT_BENCH_MODE=latency HDT_BENCH_LAT=device HDT_BENCH_MODEL=yolo_heads_s \
  HDT_BENCH_PACKED=1 HDT_BENCH_PRE=128 HDT_BENCH_POST=32 python bench.py \
  2>&1 | tee "$OUT/lat_packed_128_32.log"

echo "=== 6c. e2e sync p50: default vs serving config (packed + compact wire) ==="
HDT_BENCH_MODE=latency HDT_BENCH_MODEL=yolo_heads_s \
  python bench.py 2>&1 | tee "$OUT/lat_e2e_default.log"
HDT_BENCH_MODE=latency HDT_BENCH_MODEL=yolo_heads_s \
  HDT_BENCH_PACKED=1 HDT_BENCH_WIREM=16 HDT_BENCH_WDT=f16 \
  HDT_BENCH_PRE=128 HDT_BENCH_POST=32 python bench.py \
  2>&1 | tee "$OUT/lat_e2e_serving.log"

echo "=== 7. space-to-depth stem A/B (L empty regime @640) ==="
HDT_BENCH_CKPT=none HDT_BENCH_INPUT=noise HDT_BENCH_MODEL=yolo_heads_l \
  HDT_BENCH_S2D=1 python bench.py 2>&1 | tee "$OUT/bench_l_s2d.log"

echo "=== 7b. batch-64 loaded headline (saturation re-check w/ sparse towers) ==="
HDT_BENCH_BATCH=64 python bench.py 2>&1 | tee "$OUT/bench_headline_b64.log"

echo "=== done; logs in $OUT ==="
