"""Checkpoint / resume / transfer-learning restore.

Reference equivalents (SURVEY.md §5): SuperGradients checkpoint dirs with
``ckpt_best.pth`` selected by KeypointsNME, ``resume=True``, EMA weights
shipped, and transfer learning via ``strict_load: key_matching`` (partial
state-dict load by name intersection, ``configs/yolo_heads_l.yaml:22-28``).

TPU-native: orbax-backed checkpoints of the full TrainState (params, EMA,
optimizer state, BN stats, step) with:
* :func:`save` / :func:`restore` — resume-exact round trip,
* :func:`restore_key_matching` — name-intersection partial restore (shape-
  checked), the ``key_matching`` equivalent for warm starts,
* best-metric tracking helper mirroring ``metric_to_watch`` semantics.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    """Thin orbax wrapper with best-metric bookkeeping."""

    def __init__(self, ckpt_dir: str, metric_to_watch: str = "KeypointsNME",
                 greater_is_better: bool = False, max_to_keep: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.metric_to_watch = metric_to_watch
        self.greater_is_better = greater_is_better
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        self._best_path = os.path.join(self.ckpt_dir, "best.json")

    def save(self, step: int, tree: Dict[str, Any],
             metrics: Optional[Dict[str, float]] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_to_host(tree)))
        self._mgr.wait_until_finished()
        if metrics and self.metric_to_watch in metrics:
            value = float(metrics[self.metric_to_watch])
            best = self.best_metric()
            improved = (
                best is None
                or (value > best if self.greater_is_better else value < best)
            )
            if improved:
                with open(self._best_path, "w") as f:
                    json.dump({"step": step, "value": value}, f)

    def best_metric(self) -> Optional[float]:
        if os.path.isfile(self._best_path):
            with open(self._best_path) as f:
                return float(json.load(f)["value"])
        return None

    def best_step(self) -> Optional[int]:
        if os.path.isfile(self._best_path):
            with open(self._best_path) as f:
                return int(json.load(f)["step"])
        return None

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None,
                target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.ckpt_dir}")
        if target is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(_to_host(target))
            )
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()


def restore_key_matching(
    target: Dict[str, Any], source: Dict[str, Any]
) -> Tuple[Dict[str, Any], int, int]:
    """Copy leaves from ``source`` into ``target`` wherever the flattened key
    path AND shape match — the ``strict_load: key_matching`` transfer-learning
    semantics.  Returns (merged tree, matched count, total target leaves)."""
    src_flat = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_flatten_with_path(source)[0]
    }
    tgt_flat = jax.tree_util.tree_flatten_with_path(target)
    matched = 0
    out = []
    for key, leaf in tgt_flat[0]:
        ks = jax.tree_util.keystr(key)
        cand = src_flat.get(ks)
        if cand is not None and tuple(np.shape(cand)) == tuple(np.shape(leaf)):
            out.append(jax.numpy.asarray(cand, leaf.dtype) if hasattr(leaf, "dtype") else cand)
            matched += 1
        else:
            out.append(leaf)
    merged = jax.tree_util.tree_unflatten(tgt_flat[1], out)
    return merged, matched, len(out)
