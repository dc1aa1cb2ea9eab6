"""Parse campaign chunk logs into the BENCHMARKS epoch table.

Usage: python tools/campaign_report.py /tmp/campaign_r3/chunk_*.log
Prints a markdown epoch curve (KeypointsNME / FailureRate / RPY_mean) plus
train-throughput stats from the step lines.
"""

from __future__ import annotations

import ast
import re
import sys

VAL = re.compile(r"\[epoch (\d+)\] val: (\{.*\})")
STEP = re.compile(r"\[epoch (\d+) step (\d+)\].*\(([\d.]+) img/s\)")


def main(paths):
    vals = {}
    ips = {}
    for path in paths:
        for line in open(path):
            m = VAL.search(line)
            if m:
                try:
                    # literal_eval rejects bare nan/inf (a diverged epoch's
                    # repr); substitute parseable sentinels first
                    text = re.sub(r"\b(nan|inf)\b", "9e999", m.group(2))
                    vals[int(m.group(1))] = ast.literal_eval(text)
                except (ValueError, SyntaxError):
                    continue
            m = STEP.search(line)
            if m:
                ips.setdefault(int(m.group(1)), []).append(float(m.group(3)))

    epochs = sorted(vals)
    print("| Epoch | " + " | ".join(str(e) for e in epochs) + " |")
    print("|---" * (len(epochs) + 1) + "|")
    for key, label in (
        ("KeypointsNME", "KeypointsNME ↓"),
        ("KeypointsFailureRate", "FailureRate ↓"),
        ("RPY_mean", "RPY_mean ↓"),
    ):
        row = [f"{vals[e].get(key, float('nan')):.2f}" for e in epochs]
        print(f"| {label} | " + " | ".join(row) + " |")
    if ips:
        last = {e: v[-1] for e, v in ips.items()}
        print(f"\ntrain img/s (cumulative, end of epoch): "
              + ", ".join(f"e{e}={v:.1f}" for e, v in sorted(last.items())))
    if epochs:
        best = min(epochs, key=lambda e: vals[e].get("KeypointsNME", 1e9))
        print(f"best epoch: {best} (NME {vals[best]['KeypointsNME']:.3f})")


if __name__ == "__main__":
    main(sys.argv[1:])
