"""TPU-native training runtime: optimizer, EMA, LR schedule, sharded step.

The reference delegates all of this to SuperGradients' Trainer
(``train.py:9``, SURVEY.md §1/§2.3): AdamW (wd 1e-6,
``vgg_head_train_params.yaml:35-37``), cosine LR with linear warmup
(``:5-12``), EMA decay 0.9997 with exp/beta-50 ramp (``:40-44``), AMP, and
torch-DDP gradient sync.  Here the equivalents are explicit and fused into a
single jitted, mesh-sharded XLA program:

* optax AdamW with ``zero_weight_decay_on_bias_and_bn`` masking (``:15``),
* cosine schedule to ``cosine_final_lr_ratio * initial_lr`` with linear
  batch warmup,
* EMA as a parallel parameter pytree with the SG "exp" ramp
  ``decay * (1 - exp(-step * beta / total_steps))``,
* data parallelism as a ``NamedSharding`` over a 1-D ``data`` mesh axis —
  XLA inserts the gradient all-reduce over ICI (no NCCL analogue needed),
* mixed precision by building the model with ``dtype=bfloat16`` (params and
  optimizer state stay fp32 — the TPU-native AMP equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from head_detector_tpu.flame import FlameModel
from head_detector_tpu.models.yolo_heads import YoloHeads
from head_detector_tpu.train.loss import LossConfig, Targets, yolo_heads_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Knob names follow the reference training_hyperparams YAML."""

    initial_lr: float = 3e-4
    cosine_final_lr_ratio: float = 0.1
    warmup_initial_lr: float = 1e-6
    lr_warmup_steps: int = 128
    max_steps: int = 10000
    weight_decay: float = 1e-6
    zero_weight_decay_on_bias_and_bn: bool = True
    ema: bool = True
    ema_decay: float = 0.9997
    ema_beta: float = 50.0
    grad_clip_norm: Optional[float] = None


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Linear batch warmup -> cosine to final_ratio * initial_lr."""
    warmup = optax.linear_schedule(
        cfg.warmup_initial_lr, cfg.initial_lr, cfg.lr_warmup_steps
    )
    cosine_steps = max(cfg.max_steps - cfg.lr_warmup_steps, 1)
    cosine = optax.cosine_decay_schedule(
        cfg.initial_lr, cosine_steps, alpha=cfg.cosine_final_lr_ratio
    )
    return optax.join_schedules([warmup, cosine], [cfg.lr_warmup_steps])


def _wd_mask(params) -> Any:
    """No weight decay on biases, BN scales/biases, and scalar alphas
    (``zero_weight_decay_on_bias_and_bn: True``)."""

    def keep(path, leaf):
        names = {getattr(p, "key", None) for p in path}
        if leaf.ndim <= 1:
            return False
        if "bn" in names or "post_bn" in names or "branch_3x3_bn" in names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    tx = optax.adamw(
        schedule,
        weight_decay=cfg.weight_decay,
        mask=_wd_mask(params) if cfg.zero_weight_decay_on_bias_and_bn else None,
    )
    if cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def create_train_state(
    model: YoloHeads, variables: Dict[str, Any], cfg: TrainConfig
) -> TrainState:
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        tx=tx,
    )


def _ema_decay(step: jnp.ndarray, cfg: TrainConfig) -> jnp.ndarray:
    """SG 'exp' decay ramp: decay * (1 - exp(-step * beta / max_steps))."""
    x = step.astype(jnp.float32) / max(cfg.max_steps, 1)
    return cfg.ema_decay * (1.0 - jnp.exp(-x * cfg.ema_beta))


def make_loss_fn(
    model: YoloHeads,
    flame_model: FlameModel,
    loss_cfg: LossConfig,
    axis_name: Optional[str] = None,
) -> Callable:
    """The train-mode loss forward: ``(params, batch_stats, images, targets)
    -> (total, (components, new_batch_stats))``.

    Exposed separately from :func:`make_train_step` so callers that only need
    the loss VALUE (e.g. the driver's multi-chip parity dryrun, which
    certifies sharded-loss == global-loss) can jit a forward-only program —
    roughly half the compile cost of the full value_and_grad train step."""

    def loss_fn(params, batch_stats, images, targets):
        (decoded, raw), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        if not isinstance(targets, Targets):
            # params wire: decode GT FLAME on device (param_wire module doc)
            from head_detector_tpu.train.param_wire import decode_param_targets

            targets = decode_param_targets(flame_model, targets)
        total, components = yolo_heads_loss(
            flame_model, raw, targets, loss_cfg, axis_name=axis_name
        )
        return total, (components, mutated["batch_stats"])

    return loss_fn


def make_train_step(
    model: YoloHeads,
    flame_model: FlameModel,
    loss_cfg: LossConfig,
    train_cfg: TrainConfig,
    axis_name: Optional[str] = None,
) -> Callable:
    """Build the (un-jitted) train step.

    When sharded with pjit/NamedSharding, gradient reduction is inserted by
    XLA automatically — ``axis_name`` is only consumed by the loss's optional
    cross-replica score normalisation (``average_losses_in_ddp``).
    """

    loss_fn = make_loss_fn(model, flame_model, loss_cfg, axis_name=axis_name)

    def train_step(state: TrainState, images: jnp.ndarray, targets):
        # Compact wire format: callers may ship images as uint8 and (dense
        # wire only) the two large GT vertex tensors as float16, restored to
        # f32 here ON DEVICE.  This cuts host->device bytes ~4x — the math
        # below is identical.  (Motivation: the axon dev relay leaks every
        # upload's size in host RSS, so long campaigns are bounded by bytes
        # uploaded; on real hardware the same change is simply less PCIe
        # traffic.)  The params wire (ParamTargets) needs no restore: it
        # ships f32 parameter vectors and decodes GT vertices on device.
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        if isinstance(targets, Targets) and targets.gt_vertices_3d.dtype != jnp.float32:
            targets = targets._replace(
                gt_vertices_2d=targets.gt_vertices_2d.astype(jnp.float32),
                gt_vertices_3d=targets.gt_vertices_3d.astype(jnp.float32),
            )
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (components, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, images, targets
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if train_cfg.ema:
            d = _ema_decay(state.step + 1, train_cfg)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), state.ema_params, new_params
            )
        else:
            new_ema = state.ema_params

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, components

    return train_step


# --------------------------------------------------------------------------- #
# Data-parallel sharding helpers
# --------------------------------------------------------------------------- #


def make_data_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_train_step(
    train_step: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """jit the step with batch dims sharded over the mesh and state replicated.

    XLA turns the per-replica gradients into one ICI all-reduce — the
    TPU-native equivalent of the reference's DDP/NCCL sync (SURVEY.md §2.3).
    Shardings are established by placement (``device_put``); re-placing an
    already-placed array is a no-op, so the per-step overhead is nil.
    """
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))
    jitted = jax.jit(train_step, donate_argnums=(0,))

    def step(state: TrainState, images: jnp.ndarray, targets: Targets):
        state = jax.device_put(state, replicated)
        images = jax.device_put(images, batch_sharded)
        targets = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharded), targets
        )
        return jitted(state, images, targets)

    return step


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def put_batch_sharded(tree, mesh: Mesh, axis: str = "data"):
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))
