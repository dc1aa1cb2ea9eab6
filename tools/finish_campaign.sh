#!/bin/bash
# End-of-campaign sequence: score best + average-best checkpoints on the
# held-out val split (TPU), export the winner as msgpack, then run the
# loaded-regime benches with it.  One TPU program at a time (compiles
# serialize on the one chip).
#
# Usage: bash tools/finish_campaign.sh [ckpt_dir] [arch] [image_size]
set -eu
cd "$(dirname "$0")/.."
CKPT=${1:-runs/campaign/flagship_campaign}
ARCH=${2:-yolo_heads_m}
SIZE=${3:-512}
DATA=${HDT_CAMPAIGN_DATA:-/root/data/synth512}
OUT=${HDT_CAMPAIGN_OUT:-/tmp/finish_campaign}
mkdir -p "$OUT"

echo "=== best single checkpoint (raw + EMA), on-disk val split ==="
python tools/eval_checkpoint.py --ckpt-dir "$CKPT" \
  --step "$(python -c "import json;print(json.load(open('$CKPT/best.json'))['step'])")" \
  --arch "$ARCH" --image-size "$SIZE" --data-dir "$DATA" \
  --export-msgpack "$OUT/best_ema.msgpack" --which ema \
  2>&1 | tee "$OUT/eval_best.log"

echo "=== average_best_models (top 10 by KeypointsNME) ==="
python tools/eval_checkpoint.py --ckpt-dir "$CKPT" --average-best 10 \
  --arch "$ARCH" --image-size "$SIZE" --data-dir "$DATA" \
  --export-msgpack "$OUT/avg10_ema.msgpack" --which ema \
  2>&1 | tee "$OUT/eval_avg10.log"

echo "=== loaded-regime benches with the campaign checkpoint ==="
for MODE in pipeline crops pncc; do
  HDT_BENCH_MODE=$MODE HDT_BENCH_INPUT=render HDT_BENCH_CKPT="$OUT/best_ema.msgpack" \
  HDT_BENCH_MODEL="$ARCH" python bench.py 2>&1 | tee "$OUT/bench_$MODE.log"
done
echo "=== done; logs in $OUT ==="
