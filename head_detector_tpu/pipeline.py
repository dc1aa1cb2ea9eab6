"""StreamingDetector: high-throughput batched inference over a device mesh.

BASELINE.json config 5 ("streaming throughput: LAION-style shard pipeline at
1024px on multi-chip v5e"): an iterator of images is letterboxed on host
threads, batched, and pushed through a single jitted program — forward +
fixed-shape NMS + FLAME decode — with the batch dimension sharded over a
``data`` mesh (pure data-parallel inference; params replicated, XLA handles
ICI placement).  Host I/O overlaps device compute via a bounded prefetch
queue, and arrays for step t+1 are uploaded while step t computes.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Iterable, Iterator, List, Optional, Tuple

try:  # host resize backend of choice; the native C++ letterbox covers
    import cv2  # environments without OpenCV (tests/test_native.py parity)
except ImportError:  # pragma: no cover
    cv2 = None
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from head_detector_tpu.flame import FlameModel, fused_project_vertices
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.ops.nms import batched_nms


class StreamingDetector:
    def __init__(
        self,
        model_name: str = "yolo_heads_l",
        image_size: int = 1024,
        batch_size: int = 32,
        variables: Optional[dict] = None,
        checkpoint: Optional[str] = None,
        mesh: Optional[Mesh] = None,
        confidence_threshold: float = 0.5,
        iou_threshold: float = 0.5,
        post_nms_max: int = 100,
        decode_meshes: bool = True,
        dtype: Any = jnp.bfloat16,
        prefetch: int = 3,
        workers: int = 8,
        pipeline_depth: int = 2,
        decode_budget: int = 256,
        mesh_subset: Optional[str] = "head",
        verts_dtype: Any = jnp.bfloat16,
    ):
        if image_size % 32:
            raise ValueError("image_size must be a multiple of 32")
        self.image_size = image_size
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.workers = workers
        self.pipeline_depth = max(1, pipeline_depth)

        devices = mesh.devices.reshape(-1) if mesh is not None else jax.devices()
        usable = max(d for d in range(1, len(devices) + 1) if batch_size % d == 0)
        self.mesh = mesh or Mesh(np.asarray(devices[:usable]), ("data",))
        self._batch_sharding = NamedSharding(self.mesh, P("data"))
        self._replicated = NamedSharding(self.mesh, P())

        if variables is None and checkpoint:
            from head_detector_tpu.detector import load_variables

            variables = load_variables(checkpoint)
        if variables is None:
            train_model = build_model(model_name, dtype=dtype)
            variables = init_model(
                train_model, jax.random.PRNGKey(0), (image_size, image_size)
            )

        # deploy-fuse + sparse FLAME towers: the dense forward carries no
        # tower work; valid detections are packed batch-wide (decode_budget
        # slots) and towers + mesh decode run only for those — identical
        # rows to the dense head (tests/test_sparse_towers.py)
        from head_detector_tpu.export import fuse_qarepvgg
        from head_detector_tpu.models.presets import get_arch
        from head_detector_tpu.ops.nms import compact_detections
        from head_detector_tpu.ops.sparse_towers import sparse_flame_rows

        def _is_deploy(tree) -> bool:
            if isinstance(tree, dict):
                return "rbr_reparam" in tree or any(
                    _is_deploy(v) for v in tree.values()
                )
            return False

        from head_detector_tpu.models.presets import ArchCfg

        self.arch = (
            model_name if isinstance(model_name, ArchCfg) else get_arch(model_name)
        )
        model_name = self.arch
        if not _is_deploy(variables.get("params", {})):
            variables = fuse_qarepvgg(variables, self.arch)
        self.model = build_model(
            model_name, deploy=True, dtype=dtype,
            defer_globalization=True, skip_flame=True,
        )
        self.variables = jax.device_put(variables, self._replicated)
        self.flame = FlameModel.from_assets()
        decode_flame = self.flame
        if mesh_subset:
            from head_detector_tpu.assets_io import get_indices

            decode_flame = self.flame.subset(get_indices()[mesh_subset])
        self.decode_budget = decode_budget

        conf = confidence_threshold
        iou = iou_threshold
        arch = self.arch

        def _step(images_u8):
            from head_detector_tpu.models.heads import globalize_flame

            images = images_u8.astype(jnp.float32) / 255.0
            decoded, raw, feats = self.model.apply(
                self.variables, images, train=False, return_feats=True
            )
            res = batched_nms(
                decoded.boxes_xyxy,
                decoded.scores,
                decoded.flame_params,
                confidence_threshold=conf,
                iou_threshold=iou,
                pre_nms_max=1000,
                post_nms_max=post_nms_max,
            )
            if decode_meshes:
                cres = compact_detections(res, decode_budget)
                rows = sparse_flame_rows(
                    self.variables, arch, feats,
                    cres.anchor_idx[None], batch_idx=cres.batch_idx[None],
                )[0]
                params = globalize_flame(
                    rows, cres.anchor_idx, raw.anchor_points, raw.stride_tensor
                )
                _, verts = fused_project_vertices(
                    decode_flame, params, to_2d=False
                )
                verts = verts.astype(verts_dtype)
                return (res.boxes, res.scores, res.valid,
                        (cres.batch_idx, cres.slot_idx, cres.valid, verts))
            return res.boxes, res.scores, res.valid, None

        self._step = jax.jit(_step)

    # ------------------------------------------------------------------ #
    def _letterbox_host(self, image: np.ndarray) -> Tuple[np.ndarray, float]:
        s = self.image_size
        if cv2 is None or os.environ.get("HDT_LETTERBOX") == "native":
            from head_detector_tpu.native import letterbox_native

            return letterbox_native(image, s)
        h, w = image.shape[:2]
        scale = min(s / h, s / w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = np.full((s, s, 3), 127, np.uint8)
        top, left = (s - nh) // 2, (s - nw) // 2
        out[top : top + nh, left : left + nw] = resized
        return out, scale

    def run(self, images: Iterable[np.ndarray]) -> Iterator[dict]:
        """Yield one dict per image: boxes_xyxy (letterbox space), scores,
        valid mask, vertices (when decode_meshes)."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def producer():
            import concurrent.futures as cf

            batch: List[np.ndarray] = []
            metas: List[float] = []
            with cf.ThreadPoolExecutor(self.workers) as pool:
                for canvas, scale in pool.map(self._letterbox_host, images):
                    batch.append(canvas)
                    metas.append(scale)
                    if len(batch) == self.batch_size:
                        q.put((np.stack(batch), list(metas)))
                        batch, metas = [], []
            if batch:  # pad the tail batch
                pad = self.batch_size - len(batch)
                batch = batch + [batch[-1]] * pad
                q.put((np.stack(batch), metas))
            q.put(None)

        threading.Thread(target=producer, daemon=True).start()

        # Double-buffered dispatch: step t+1 is uploaded and dispatched
        # BEFORE step t's (host-blocking) result materialisation, so the
        # host->device copy of the next batch overlaps the device compute of
        # the current one.  jax dispatch is async; the only blocking calls
        # are the np.asarray() of finished steps.
        import collections

        pending: "collections.deque" = collections.deque()
        while True:
            item = q.get()
            if item is None:
                break
            canvases, metas = item
            arr = jax.device_put(jnp.asarray(canvases), self._batch_sharding)
            pending.append((self._step(arr), metas))
            if len(pending) >= self.pipeline_depth:
                yield from self._emit(*pending.popleft())
        while pending:
            yield from self._emit(*pending.popleft())

    def _emit(self, outputs, metas) -> Iterator[dict]:
        boxes, scores, valid, mesh = outputs
        # Small outputs come to host; the packed mesh tensor stays a device
        # array — converting it here would serialise the pipeline on
        # device->host bandwidth (through the axon relay that alone was
        # measured to cap throughput at ~4 img/s @1024).
        boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
        if mesh is not None:
            batch_idx, slot_idx, mvalid, verts = mesh
            batch_idx, slot_idx, mvalid = map(
                np.asarray, (batch_idx, slot_idx, mvalid)
            )
            jax.block_until_ready(verts)
        for i, scale in enumerate(metas):
            vertices = None
            if mesh is not None:
                rows = np.flatnonzero(mvalid & (batch_idx == i))
                # {nms_slot: [V, 3] device array} for this image's detections
                vertices = {int(slot_idx[j]): verts[j] for j in rows}
            yield {
                "boxes_xyxy": boxes[i],
                "scores": scores[i],
                "valid": valid[i],
                "vertices": vertices,
                "scale": scale,
            }

    def throughput(
        self,
        num_images: int = 256,
        warmup_batches: int = 2,
        device_feed: bool = False,
    ) -> float:
        """Images/sec on synthetic data (used by bench.py mode=streaming).

        ``device_feed=True`` measures the pure device pipeline: one uint8
        batch is pre-placed on the mesh and the jitted step runs back to
        back with NO host uploads — the compute bound the host-fed number
        converges to once I/O rides real PCIe instead of the dev relay.
        """
        import time

        rng = np.random.RandomState(0)
        if device_feed:
            batch = rng.randint(
                0, 255,
                (self.batch_size, self.image_size, self.image_size, 3),
                np.uint8,
            )
            arr = jax.device_put(jnp.asarray(batch), self._batch_sharding)
            n_batches = max(1, num_images // self.batch_size)
            for _ in range(max(warmup_batches, 1)):
                out = self._step(arr)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n_batches):
                out = self._step(arr)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            return n_batches * self.batch_size / dt

        imgs = [
            rng.randint(0, 255, (self.image_size, self.image_size, 3), np.uint8)
            for _ in range(num_images)
        ]
        # warmup
        for _ in zip(range(warmup_batches * self.batch_size), self.run(imgs)):
            pass
        t0 = time.perf_counter()
        n = sum(1 for _ in self.run(imgs))
        dt = time.perf_counter() - t0
        return n / dt
