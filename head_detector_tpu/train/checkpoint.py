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
* best-metric tracking helper mirroring ``metric_to_watch`` semantics,
* a per-save ``metrics.jsonl`` history + :func:`average_trees`, backing the
  reference's ``average_best_models: True`` (SG ModelWeightAveraging: the
  shipping model is the uniform weight-average of the N best checkpoints by
  ``metric_to_watch``, ``vgg_head_train_params.yaml``) — applied post-hoc by
  ``tools/eval_checkpoint.py --average-best N``.
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
                 greater_is_better: bool = False, max_to_keep: int = 10):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.metric_to_watch = metric_to_watch
        self.greater_is_better = greater_is_better
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        self._best_path = os.path.join(self.ckpt_dir, "best.json")
        self._history_path = os.path.join(self.ckpt_dir, "metrics.jsonl")

    def save(self, step: int, tree: Dict[str, Any],
             metrics: Optional[Dict[str, float]] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(_to_host(tree)))
        self._mgr.wait_until_finished()
        if metrics:
            with open(self._history_path, "a") as f:
                json.dump({"step": int(step),
                           **{k: float(v) for k, v in metrics.items()}}, f)
                f.write("\n")
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

    def metrics_history(self) -> list:
        """Per-save metric records ``[{"step": s, <metric>: v, ...}, ...]``.
        Tolerates a truncated record (a chunk kill can land mid-append)."""
        if not os.path.isfile(self._history_path):
            return []
        out = []
        with open(self._history_path) as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
        return out

    def best_steps(self, k: int) -> list:
        """The up-to-k best ON-DISK steps by ``metric_to_watch`` (the SG
        ``average_best_models`` selection set).  Non-finite metric values
        (a diverged epoch) are excluded."""
        on_disk = set(self._mgr.all_steps())
        recs = [r for r in self.metrics_history()
                if r.get("step") in on_disk
                and np.isfinite(r.get(self.metric_to_watch, np.nan))]
        # one record per step (a resumed epoch may re-log): keep the last
        by_step = {r["step"]: r[self.metric_to_watch] for r in recs}
        ranked = sorted(by_step, key=lambda s: by_step[s],
                        reverse=self.greater_is_better)
        return ranked[:k]

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


def average_trees(trees: list) -> Dict[str, Any]:
    """Uniform leaf-wise average of parameter trees (SG ModelWeightAveraging
    semantics: the ``average_model`` is the plain mean of the selected best
    checkpoints' weights).  Non-float leaves (e.g. step counters) take the
    first tree's value."""
    if not trees:
        raise ValueError("average_trees needs at least one tree")

    def avg(*leaves):
        first = np.asarray(leaves[0])
        if not np.issubdtype(first.dtype, np.floating):
            return first
        acc = np.zeros(first.shape, np.float64)
        for leaf in leaves:
            acc += np.asarray(leaf, np.float64)
        return (acc / len(leaves)).astype(first.dtype)

    return jax.tree_util.tree_map(avg, *trees)


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
