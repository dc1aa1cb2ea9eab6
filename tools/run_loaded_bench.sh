#!/bin/bash
# Loaded-regime benchmark session (VERDICT r2 item 2): re-measure the
# per-detection BASELINE configs with a TRAINED checkpoint on rendered
# scenes (>=1 head/image) plus a 5-head stress case, reporting the measured
# detections/image beside each img/s number.
#
# Usage (after the flagship campaign):
#   tools/run_loaded_bench.sh runs/campaign/flagship_campaign [yolo_heads_m]
# Runs ONE TPU compile at a time; writes JSON lines to /tmp/loaded_bench.jsonl
set -u
cd "$(dirname "$0")/.."
CKPT_DIR=${1:?checkpoint dir}
ARCH=${2:-yolo_heads_m}
STEP=${3:-}
OUT=/tmp/loaded_bench.jsonl
MSGPACK=/tmp/campaign_${ARCH}.msgpack

if [ ! -f "$MSGPACK" ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/eval_checkpoint.py \
    --ckpt-dir "$CKPT_DIR" ${STEP:+--step $STEP} --arch "$ARCH" \
    --which ema --export-msgpack "$MSGPACK" --no-eval 2>&1 | tail -2
fi

run() {
  desc=$1; shift
  echo "=== $desc $(date) ==="
  env "$@" HDT_BENCH_MODEL=$ARCH HDT_BENCH_CKPT=$MSGPACK HDT_BENCH_INPUT=render \
    python bench.py 2>/tmp/loaded_bench_err.log | tail -1 | tee -a "$OUT"
}

: > "$OUT"
run "pipeline loaded (<=3 heads)"
run "pipeline loaded stress (<=5 heads)" HDT_BENCH_HEADS=5
run "crops loaded" HDT_BENCH_MODE=crops
run "pncc loaded" HDT_BENCH_MODE=pncc
echo "=== done $(date); results in $OUT ==="
