#!/bin/bash
# Chunked campaign driver: each chunk is one fresh process running
# training_hyperparams.epochs_per_run epochs, then exiting so the axon
# relay's per-upload host-RSS leak is released (CLAUDE.md).  Re-invoked with
# resume until the configured max_epochs are done.
#
# Usage: nohup bash tools/run_campaign.sh > /tmp/campaign_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
CONFIG=${1:-flagship_campaign}
LAST_EPOCH=${2:-11}
shift 2 2>/dev/null || shift $# 2>/dev/null
EXTRA=("$@")   # e.g. training_hyperparams.max_epochs=15 for an extension
LOG=${CAMPAIGN_LOG_DIR:-/tmp/campaign_r3}
mkdir -p "$LOG"

for chunk in 0 1 2 3 4 5 6 7; do
  [ -s "$LOG/chunk_$chunk.log" ] && continue   # resume driver: skip done chunks
  echo "=== chunk $chunk start $(date) ==="
  # nice -n 19: the campaign is TPU/relay-paced; yielding the single host
  # core keeps driver windows (bench.py, dryrun_multichip) from timing out
  # beside it (VERDICT r3 weak 1/4).  The trainer also takes
  # /tmp/hdt_campaign.lock so those entry points can detect/report us.
  nice -n 19 timeout 14400 python -m head_detector_tpu.train --config-name "$CONFIG" \
    training_hyperparams.resume=true ${EXTRA[@]+"${EXTRA[@]}"} \
    > "$LOG/chunk_$chunk.log" 2>&1
  rc=$?
  echo "=== chunk $chunk exit $rc $(date) ==="
  tail -3 "$LOG/chunk_$chunk.log"
  if grep -q "\[epoch $LAST_EPOCH\] val" "$LOG/chunk_$chunk.log"; then
    echo "=== campaign complete ==="
    break
  fi
  if [ $rc -ne 0 ] && ! grep -q "epochs_per_run" "$LOG/chunk_$chunk.log"; then
    echo "=== chunk failed without progress marker; aborting driver ==="
    break
  fi
done
