"""Training loop driver: the SuperGradients-Trainer equivalent.

Reference: ``train.py`` + SG ``Trainer.train_from_config`` (SURVEY.md §3.2) —
per-epoch train loop with loss-component logging, periodic validation
(post-prediction callback -> matched metrics), best-checkpoint selection by
KeypointsNME, EMA weights, resume.  All of that is explicit here; the hot
path is a single jitted data-parallel train step.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from head_detector_tpu.flame import FlameModel
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.post_prediction import YoloHeadsPostPredictionCallback
from head_detector_tpu.train.checkpoint import CheckpointManager, restore_key_matching
from head_detector_tpu.train.dataset import collate_samples
from head_detector_tpu.train.loss import LossConfig
from head_detector_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_data_mesh,
    make_train_step,
    shard_train_step,
)


@dataclasses.dataclass
class RunConfig:
    """Top-level run configuration (knob names follow the reference recipes)."""

    arch: object = "yolo_heads_l"  # preset name or an ArchCfg instance
    image_size: int = 640
    batch_size: int = 8  # global batch
    max_epochs: int = 50
    steps_per_epoch: Optional[int] = None  # None = full dataset
    max_gt_boxes: int = 30
    num_workers: int = 4
    mixed_precision: bool = True
    ckpt_dir: str = "checkpoints/run"
    resume: bool = False
    pretrained_weights: Optional[str] = None  # msgpack path, key_matching load
    metric_to_watch: str = "KeypointsNME"
    greater_metric_to_watch_is_better: bool = False
    # orbax retention window; size it >= the campaign length when the best
    # checkpoint must outlive later (worse) epochs and when post-hoc
    # average_best_models selection needs the candidate set on disk
    ckpt_max_to_keep: int = 10
    log_every: int = 50
    # compact wire format: uint8 images + (dense wire only) f16 GT vertex
    # transfer, restored to f32 on device inside the train step (~4x less
    # host->device traffic; also bounds the axon dev relay's per-upload
    # host-RSS leak).  None = auto: f16 GT only on the axon dev harness,
    # exact f32 elsewhere (VERDICT r2 weak 4 — the numerics deviation is a
    # harness mitigation, not the default of record).  The params wire
    # (ParamTargets) always ships exact f32 regardless.
    compact_wire: Optional[bool] = None
    # chunked campaigns: exit the epoch loop after this many epochs per
    # process invocation (None = run to max_epochs).  A driver loop re-invokes
    # with resume=True — bounds the per-process host RSS the axon relay's
    # upload leak can accumulate (CLAUDE.md).
    epochs_per_run: Optional[int] = None
    log_dir: Optional[str] = None  # TensorBoard scalars + extreme-batch panels
    visualization_frequency_epochs: int = 2
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


class _Prefetcher:
    """Thread-pool sample loader + collate (the DataLoader-worker analogue)."""

    def __init__(self, dataset, batch_size: int, max_boxes: int,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 wire_dtype=None, collate_fn=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.wire_dtype = wire_dtype
        self.collate_fn = collate_fn or collate_samples

    def __len__(self):
        """Number of batches one pass yields (tail included iff not drop_last)."""
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.random.RandomState(self.seed).permutation(len(self.dataset))
        q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = threading.Event()  # set by the consumer on early break

        def producer():
            import concurrent.futures as cf

            try:
                with cf.ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(len(self)):
                        idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                        samples = list(pool.map(self.dataset.__getitem__, idxs))
                        item = self.collate_fn(samples, self.max_boxes,
                                               wire_dtype=self.wire_dtype)
                        while not stop.is_set():
                            try:
                                q.put(item, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
            except BaseException as e:  # surface loader errors, don't hang
                q.put(e)
                return
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer broke early (steps_per_epoch cap / exception): unblock
            # and terminate the producer instead of leaking its pool + queue
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class Trainer:
    """Explicit trainer: build -> (optional restore) -> epochs of sharded steps
    -> validation metrics -> best checkpoint."""

    def __init__(self, cfg: RunConfig, train_dataset, val_dataset=None,
                 metrics_factory: Optional[Callable] = None):
        self.cfg = cfg
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.flame = FlameModel.from_assets()

        import jax.numpy as jnp

        dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        self.model = build_model(cfg.arch, dtype=dtype)
        variables = init_model(
            self.model, jax.random.PRNGKey(0), (cfg.image_size, cfg.image_size)
        )

        if cfg.pretrained_weights:
            from head_detector_tpu.detector import load_variables

            source = load_variables(cfg.pretrained_weights)
            variables, matched, total = restore_key_matching(variables, source)
            print(f"[trainer] key_matching restore: {matched}/{total} leaves")

        data_batches = max(len(train_dataset) // cfg.batch_size, 1)
        steps_per_epoch = cfg.steps_per_epoch or data_batches
        if steps_per_epoch > data_batches:
            # an over-ask would silently shorten epochs: resume arithmetic
            # (step // steps_per_epoch) and the cosine length both assume
            # every epoch runs exactly steps_per_epoch steps
            print(f"[trainer] steps_per_epoch {steps_per_epoch} exceeds the "
                  f"dataset's {data_batches} batches; clamping")
            steps_per_epoch = data_batches
        self.steps_per_epoch = steps_per_epoch
        total_steps = steps_per_epoch * cfg.max_epochs
        self.train_cfg = dataclasses.replace(cfg.train, max_steps=total_steps)

        self.state = create_train_state(self.model, variables, self.train_cfg)
        # the data axis must divide the global batch: use the largest
        # device-count divisor of batch_size
        ndev = len(jax.devices())
        use = max(d for d in range(1, ndev + 1) if cfg.batch_size % d == 0)
        self.mesh = make_data_mesh(jax.devices()[:use])
        self.step_fn = shard_train_step(
            make_train_step(self.model, self.flame, cfg.loss, self.train_cfg),
            self.mesh,
        )
        self.ckpt = CheckpointManager(
            cfg.ckpt_dir,
            metric_to_watch=cfg.metric_to_watch,
            greater_is_better=cfg.greater_metric_to_watch_is_better,
            max_to_keep=cfg.ckpt_max_to_keep,
        )
        self.metrics_factory = metrics_factory or self._default_metrics
        self.history: List[Dict[str, float]] = []

        # f16 GT-vertex wire policy (dense wire only): None = auto -> f16
        # only on the axon dev harness where upload bytes are the binding
        # constraint; exact f32 everywhere else.  Params-wire datasets ship
        # f32 parameter vectors regardless.
        if cfg.compact_wire is None:
            self._f16_gt_wire = jax.default_backend() == "axon"
        else:
            self._f16_gt_wire = bool(cfg.compact_wire)

        self.tb = None
        self.extreme_viz = None
        if cfg.log_dir:
            from head_detector_tpu.train.visualization import (
                ExtremeBatchVisualizationCallback,
                TensorBoardLogger,
            )

            self.tb = TensorBoardLogger(cfg.log_dir)
            self.extreme_viz = ExtremeBatchVisualizationCallback(
                cfg.log_dir, freq=cfg.visualization_frequency_epochs, logger=self.tb
            )

        if cfg.resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                restored = self.ckpt.restore(
                    latest,
                    target={
                        "params": self.state.params,
                        "batch_stats": self.state.batch_stats,
                        "ema_params": self.state.ema_params,
                        "opt_state": self.state.opt_state,
                        "step": np.asarray(self.state.step),
                    },
                )
                self.state = self.state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                    ema_params=restored["ema_params"],
                    opt_state=restored["opt_state"],
                    step=jax.numpy.asarray(restored["step"]),
                )
                print(f"[trainer] resumed from step {int(self.state.step)}")

    # ------------------------------------------------------------------ #
    def _default_metrics(self):
        callback = YoloHeadsPostPredictionCallback(
            flame_model=self.flame,
            confidence_threshold=0.5,
            nms_iou_threshold=0.7,
            pre_nms_max_predictions=300,
            post_nms_max_predictions=30,
        )
        from head_detector_tpu.metrics import (
            KeypointsFailureRate,
            KeypointsNME,
            RPYError,
        )

        return {
            "KeypointsNME": KeypointsNME(callback, indexes_subset="head"),
            "KeypointsFailureRate": KeypointsFailureRate(callback, indexes_subset="head"),
            "RPYError": RPYError(callback),
        }

    def _predict_for_viz(self, images: np.ndarray):
        """Decode the extreme batch with the current weights (boxes+scores)."""
        import jax.numpy as jnp

        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        decoded = self._forward_jit()(
            variables, jnp.asarray(images, jnp.float32) / 255.0
        )
        return np.asarray(decoded.boxes_xyxy), np.asarray(decoded.scores)[..., 0]

    def _forward_jit(self):
        """ONE jitted inference forward shared by validate() and the viz
        callback — two separately-jitted identical lambdas would compile the
        full detection graph twice (10-20 min each on axon, every chunk).
        Variables enter as an ARGUMENT: capturing them in the closure would
        bake the weights into the executable and recompile every epoch."""
        import jax

        if not hasattr(self, "_infer_jit"):
            self._infer_jit = jax.jit(
                lambda v, images: self.model.apply(v, images, train=False)[0]
            )
        return self._infer_jit

    def validate(self) -> Dict[str, float]:
        if self.val_dataset is None:
            return {}
        metrics = self.metrics_factory()
        loader = _Prefetcher(
            self.val_dataset, self.cfg.batch_size, self.cfg.max_gt_boxes,
            self.cfg.num_workers, seed=0,
        )
        eval_vars = {
            "params": self.state.ema_params if self.train_cfg.ema else self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        import jax.numpy as jnp

        for images, targets in loader:
            imgs = jnp.asarray(images, jnp.float32) / 255.0
            decoded = self._forward_jit()(eval_vars, imgs)
            # metrics consume per-image MeshEstimationSample GT; rebuild the
            # minimal fields from the padded targets
            gt_samples = _targets_to_samples(images, targets)
            for m in metrics.values():
                m.update(decoded, gt_samples)

        out: Dict[str, float] = {}
        for name, m in metrics.items():
            value = m.compute()
            if isinstance(value, dict):
                out.update(value)
                if name == "RPYError":
                    out[name] = value.get("RPY_mean", 0.0)
            else:
                out[name] = float(value)
        return out

    def train(self) -> Dict[str, float]:
        import jax

        from head_detector_tpu import hostlock

        if jax.default_backend() != "cpu":
            # advertise the campaign to bench.py / __graft_entry__ so driver
            # artifacts can record (and bound) host/TPU contention
            # (hostlock module doc; VERDICT r3 item 8)
            hostlock.acquire()
        try:
            return self._train_epochs()
        finally:
            hostlock.release()

    def _train_epochs(self) -> Dict[str, float]:
        cfg = self.cfg
        last_metrics: Dict[str, float] = {}
        start_epoch = int(self.state.step) // self.steps_per_epoch
        train_collate = None
        if _is_param_dataset(self.train_dataset):
            from head_detector_tpu.train.param_wire import collate_param_samples

            train_collate = collate_param_samples
        for epoch in range(start_epoch, cfg.max_epochs):
            if cfg.epochs_per_run and epoch - start_epoch >= cfg.epochs_per_run:
                print(f"[trainer] epochs_per_run={cfg.epochs_per_run} reached "
                      f"at epoch {epoch}; exiting for chunk restart")
                break
            if hasattr(self.train_dataset, "set_epoch"):
                # resume-aware aug seeding: without this, chunked campaigns
                # replay identical per-sample aug draws every chunk
                # (param_wire.RenderedHeadsDataset._rng_for)
                self.train_dataset.set_epoch(epoch)
            loader = _Prefetcher(
                self.train_dataset, cfg.batch_size, cfg.max_gt_boxes,
                cfg.num_workers, seed=epoch,
                wire_dtype=np.float16 if self._f16_gt_wire else None,
                collate_fn=train_collate,
            )
            t0 = time.time()
            seen = 0
            for bi, (images, targets) in enumerate(loader):
                import jax.numpy as jnp

                # images always ride the wire as uint8 (lossless; /255 on
                # device) — only the dense GT vertex dtype is policy
                imgs = jnp.asarray(images)
                self.state, comps = self.step_fn(self.state, imgs, targets)
                seen += images.shape[0]
                if (bi + 1) % cfg.log_every == 0:
                    c = {k: float(v) for k, v in comps.items()}
                    ips = seen / (time.time() - t0)
                    print(
                        f"[epoch {epoch} step {int(self.state.step)}] "
                        f"loss={c['loss']:.4f} cls={c['loss_cls']:.4f} "
                        f"iou={c['loss_iou']:.4f} pose={c['loss_pose_reg']:.4f} "
                        f"verts={c['loss_3d_vertices']:.4f} ({ips:.1f} img/s)"
                    )
                    if self.tb is not None:
                        self.tb.log_scalars(c, int(self.state.step), prefix="train/")
                        self.tb.log_scalars({"images_per_sec": ips}, int(self.state.step))
                    if self.extreme_viz is not None:
                        # sampled at the log cadence: a per-step float() on
                        # the loss would block on the device every step and
                        # defeat async dispatch of the train loop
                        self.extreme_viz.update(
                            c["loss"], images,
                            np.asarray(targets.gt_bboxes),
                            np.asarray(targets.pad_gt_mask)[..., 0],
                            gt_keypoints=(
                                np.asarray(targets.gt_vertices_2d)
                                if hasattr(targets, "gt_vertices_2d") else None
                            ),
                        )
                if cfg.steps_per_epoch and bi + 1 >= cfg.steps_per_epoch:
                    break

            if self.extreme_viz is not None:
                self.extreme_viz.on_epoch_end(epoch, predict_fn=self._predict_for_viz)
            last_metrics = self.validate()
            if self.tb is not None and last_metrics:
                self.tb.log_scalars(last_metrics, int(self.state.step), prefix="val/")
            if last_metrics:
                print(f"[epoch {epoch}] val: {last_metrics}")
            self.history.append(dict(last_metrics))
            self.ckpt.save(
                int(self.state.step),
                {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                    "ema_params": self.state.ema_params,
                    "opt_state": self.state.opt_state,
                    "step": np.asarray(self.state.step),
                },
                metrics=last_metrics,
            )
        return last_metrics


def _is_param_dataset(dataset) -> bool:
    """True when the dataset yields ParamSample (params-wire collate)."""
    from head_detector_tpu.train.param_wire import RenderedHeadsDataset

    return isinstance(dataset, RenderedHeadsDataset) or getattr(
        dataset, "params_wire", False
    )


def _targets_to_samples(images: np.ndarray, targets) -> List:
    """Padded device targets -> per-image MeshEstimationSample for metrics."""
    from head_detector_tpu.train.mesh_sample import MeshEstimationSample

    gt_bboxes = np.asarray(targets.gt_bboxes)
    gt_v2d = np.asarray(targets.gt_vertices_2d)
    gt_v3d = np.asarray(targets.gt_vertices_3d)
    gt_rot = np.asarray(targets.gt_rotations)
    mask = np.asarray(targets.pad_gt_mask)[..., 0] > 0

    samples = []
    for i in range(images.shape[0]):
        keep = mask[i]
        xyxy = gt_bboxes[i][keep]
        xywh = np.stack(
            [xyxy[:, 0], xyxy[:, 1], xyxy[:, 2] - xyxy[:, 0], xyxy[:, 3] - xyxy[:, 1]],
            axis=1,
        )
        samples.append(
            MeshEstimationSample(
                image=images[i],
                vertices_2d=gt_v2d[i][keep],
                vertices_3d=gt_v3d[i][keep],
                rotation_matrix=gt_rot[i][keep],
                areas=xywh[:, 2] * xywh[:, 3],
                bboxes_xywh=xywh,
                is_crowd=np.zeros(keep.sum(), bool),
            )
        )
    return samples
