"""Training runtime: assigner, losses, optimizer/EMA, data-parallel train step.

The reference delegates all of this to SuperGradients (SURVEY.md §1); here it
is a first-class, TPU-native subsystem: the whole step — forward, target
assignment, FLAME decode on positives, loss, backward, AdamW update, EMA —
is one jitted XLA program, data-parallel over a ``jax.sharding.Mesh``.
"""

from head_detector_tpu.train.assigner import AssignmentResult, task_aligned_assigner
from head_detector_tpu.train.loss import LossConfig, Targets, yolo_heads_loss
from head_detector_tpu.train.trainer import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_loss_fn,
    make_train_step,
)

__all__ = [
    "AssignmentResult",
    "task_aligned_assigner",
    "LossConfig",
    "Targets",
    "yolo_heads_loss",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_loss_fn",
    "make_train_step",
    "Trainer",
    "RunConfig",
]


def __getattr__(name):
    # lazy: runner pulls in cv2/orbax/metrics
    if name in ("Trainer", "RunConfig"):
        from head_detector_tpu.train import runner

        return getattr(runner, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
