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

import queue
import threading
from typing import Any, Iterable, Iterator, List, Optional, Tuple

import cv2
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

        self.model = build_model(model_name, dtype=dtype)
        if variables is None and checkpoint:
            from head_detector_tpu.detector import load_variables

            variables = load_variables(checkpoint)
        if variables is None:
            variables = init_model(
                self.model, jax.random.PRNGKey(0), (image_size, image_size)
            )
        self.variables = jax.device_put(variables, self._replicated)
        self.flame = FlameModel.from_assets()

        conf = confidence_threshold
        iou = iou_threshold

        def _step(images_u8):
            images = images_u8.astype(jnp.float32) / 255.0
            decoded, _ = self.model.apply(self.variables, images, train=False)
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
                b, k, p = res.flame_params.shape
                _, verts = fused_project_vertices(
                    self.flame, res.flame_params.reshape(b * k, p), to_2d=False
                )
                verts = verts.reshape(b, k, -1, 3)
            else:
                verts = jnp.zeros((res.boxes.shape[0], 0, 0, 3))
            return res.boxes, res.scores, res.valid, verts

        self._step = jax.jit(_step)

    # ------------------------------------------------------------------ #
    def _letterbox_host(self, image: np.ndarray) -> Tuple[np.ndarray, float]:
        s = self.image_size
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
        boxes, scores, valid, verts = outputs
        # Small outputs come to host; the mesh tensor (e.g. 96 MB/batch at
        # K=100) stays a device array — converting it here would serialise
        # the pipeline on device->host bandwidth (through the axon relay
        # that alone was measured to cap throughput at ~4 img/s @1024).
        boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
        jax.block_until_ready(verts)
        for i, scale in enumerate(metas):
            yield {
                "boxes_xyxy": boxes[i],
                "scores": scores[i],
                "valid": valid[i],
                "vertices": verts[i] if verts.size else None,  # device array
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
