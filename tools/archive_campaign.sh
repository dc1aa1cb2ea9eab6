#!/bin/bash
# Snapshot a campaign's provenance into the tracked campaigns/ directory so
# the curve behind any published number survives round resets that wipe the
# untracked runs/ tree (VERDICT r4 item 5 / weak 4).
set -eu
cd "$(dirname "$0")/.."
RUN=${1:-runs/campaign/flagship_r4}
NAME=$(basename "$RUN")
DST=campaigns/$NAME
mkdir -p "$DST"
cp "$RUN/metrics.jsonl" "$RUN/best.json" "$DST/" 2>/dev/null || true
# chunk/launch logs if present
for f in /tmp/campaign_r5.log /tmp/campaign_ext.log /tmp/finish_campaign.log; do
  [ -f "$f" ] && cp "$f" "$DST/$(basename "$f")"
done
ls -la "$DST"
