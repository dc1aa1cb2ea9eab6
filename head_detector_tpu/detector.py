"""HeadDetector: end-to-end single-image inference API.

Functional spec: reference ``head_detector/detector.py:18-102``.  Same public
surface — ``HeadDetector(model="vgg_heads_l")(image, confidence_threshold)``
returns a ``PredictionResult`` — but the whole compute path is two XLA
programs:

* **stage A** (per-input-shape, tiny): fused letterbox — uint8 HWC image ->
  resize(lanczos) + pad(127) + /255 -> [1, S, S, 3] float.
* **stage B** (compiled once): backbone -> neck -> DFL decode -> fixed-shape
  NMS -> FLAME LBS on the kept detections -> un-letterbox -> RPY.  Padding /
  scale / confidence enter as traced scalars so arbitrary input sizes reuse
  one compilation of the heavy program.

Host<->device traffic per call: one uint8 image upload, one fixed-size
results download.  Contrast with the reference call stack
(``detector.py:97-102``): cv2 host preprocessing, a TorchScript graph, a
native-op NMS, per-head host scipy RPY.

Weights: the reference downloads TorchScript weights from the HF hub
(``detector.py:25-30``).  This build has no network egress, so weights load
from a local flax msgpack checkpoint (``checkpoint=`` argument or the
``HDT_CHECKPOINT`` env var); otherwise the model runs with deterministic
random initialisation (seed 0) — every code path is identical, only the
numbers change when a trained checkpoint is supplied.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from head_detector_tpu.detection_result import PredictionResult
from head_detector_tpu.flame import FlameModel, fused_project_vertices
from head_detector_tpu.head_info import Bbox, FlameParams, HeadMetadata, RPY
from head_detector_tpu.models import build_model, init_model
from head_detector_tpu.models.heads import globalize_flame
from head_detector_tpu.ops.letterbox import (
    letterbox,
    letterbox_batch,
    letterbox_spec,
)
from head_detector_tpu.ops.nms import batched_nms
from head_detector_tpu.ops.rotation import rotation_mats_to_rpy


def _load_converter():
    """Import ``tools/convert_torch_checkpoint.py`` by explicit file path —
    no sys.path mutation, no generic-name shadowing risk."""
    import importlib.util

    mod_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "convert_torch_checkpoint.py",
    )
    spec = importlib.util.spec_from_file_location(
        "hdt_convert_torch_checkpoint", mod_path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_variables(path: str) -> Dict[str, Any]:
    """Load a checkpoint: flax msgpack (``save_variables``) or, when the
    path ends in ``.pth``/``.pt``/``.ckpt``, a torch/SuperGradients state
    dict converted on the fly (``tools/convert_torch_checkpoint.py``) — so a
    reference user's trained checkpoint plugs straight into
    ``HeadDetector(checkpoint=...)``."""
    if path.endswith((".pth", ".pt", ".ckpt")):
        import torch

        convert = _load_converter().convert

        # Safe-by-default deserialization: SG checkpoints are plain tensor
        # dicts, so weights_only=True works for them; full pickle loading
        # (arbitrary code execution for a malicious file!) requires the
        # explicit HDT_UNSAFE_TORCH_LOAD=1 opt-in.
        try:
            raw = torch.load(path, map_location="cpu", weights_only=True)
        except Exception as exc:
            if os.environ.get("HDT_UNSAFE_TORCH_LOAD") != "1":
                raise RuntimeError(
                    f"{path} is not loadable with weights_only=True. If you "
                    "trust this checkpoint, set HDT_UNSAFE_TORCH_LOAD=1 to "
                    "allow full (unsafe) pickle deserialization."
                ) from exc
            import warnings

            warnings.warn(
                f"HDT_UNSAFE_TORCH_LOAD=1: loading {path} with full pickle "
                "deserialization (arbitrary code execution risk)."
            )
            raw = torch.load(path, map_location="cpu", weights_only=False)
        tree, _ = convert(raw if isinstance(raw, dict) else raw.state_dict())
        return tree
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_variables(variables: Dict[str, Any], path: str) -> None:
    from flax import serialization

    variables = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))


class HeadDetector:
    """Detect human heads + FLAME meshes in one forward pass on TPU."""

    def __init__(
        self,
        model: str = "vgg_heads_l",
        image_size: int = 640,
        checkpoint: Optional[str] = None,
        dtype: Any = jnp.float32,
        pre_nms_max: int = 1000,
        post_nms_max: int = 100,
        iou_threshold: float = 0.5,
        deploy: bool = True,
        compact_wire: Optional[int] = None,
        wire_verts_dtype: str = "f32",
        param_fusion: bool = False,
        fusion_neighbors: int = 4,
        fusion_iou: float = 0.7,
    ):
        """``deploy=True`` (default) structurally reparameterises every
        QARepVGG block into a single conv (export.fuse_qarepvgg) — the
        inference-speed path; outputs agree with the training graph to
        float32 roundoff.  Checkpoints already in deploy layout (containing
        ``rbr_reparam`` scopes) are detected and used as-is.

        ``compact_wire=M`` switches the per-call device->host download from
        six dense ``[post_nms_max, ...]`` tensors (~6 MB, dominated by the
        ``[100, 5023, 3]`` f32 vertices) to TWO tensors covering only the top
        M slots ordered (valid desc, score desc): one ``[M, 422]`` f32
        metadata row (box, score, FLAME params, RPY, valid flag) and one
        ``[M, 5023, 3]`` vertex tensor (``wire_verts_dtype="f16"`` halves it
        again; vertices are in pixel units, so f16 costs <0.25 px below
        1024 px — opt-in).  The per-detection legs (sparse FLAME towers,
        LBS mesh decode) also shrink from post_nms_max rows to M.  The
        reference consumes results strictly per-kept-head
        (``head_detector/detector.py:61-90``), so for any image with <= M
        detections the observable ``PredictionResult`` is unchanged.

        ``param_fusion=True`` averages each kept head's FLAME params over
        its top-``fusion_neighbors`` suppressed neighbor anchors
        (score-weighted, WBF-style — ops/nms.py ``fuse_flame`` docstring):
        neighboring anchors regress the same head with independent ~5 px
        translation noise, so the mean is a better head than any single
        row.  Boxes/scores/detection set are unchanged.  In the sparse
        path the towers run at the [K, n] neighbor union (still tiny);
        fusion happens after per-anchor globalization, which is exactly
        equivalent to fusing globalized dense rows."""
        self._image_size = image_size
        self._pre_nms_max = pre_nms_max
        self._post_nms_max = post_nms_max
        self._iou_threshold = iou_threshold
        self._flame = FlameModel.from_assets(dtype=jnp.float32)

        checkpoint = checkpoint or os.environ.get("HDT_CHECKPOINT")
        if checkpoint:
            variables = load_variables(checkpoint)
        else:
            train_model = build_model(model, dtype=dtype)
            variables = init_model(
                train_model, jax.random.PRNGKey(0), (image_size, image_size)
            )

        def _is_deploy(tree) -> bool:
            if isinstance(tree, dict):
                return "rbr_reparam" in tree or any(
                    _is_deploy(v) for v in tree.values()
                )
            return False

        if deploy and not _is_deploy(variables.get("params", {})):
            from head_detector_tpu.export import fuse_qarepvgg
            from head_detector_tpu.models.presets import get_arch

            variables = fuse_qarepvgg(variables, get_arch(model))
        use_deploy = deploy or _is_deploy(variables.get("params", {}))
        # deferred FLAME globalisation: NMS selects anchor-local rows, then
        # globalize_flame touches the ~100 kept rows instead of all 8400.
        # With deploy weights the six FLAME towers are additionally removed
        # from the dense forward and re-run post-NMS as patch convolutions at
        # the kept anchors only (ops/sparse_towers.py; dense-row parity
        # tested) — the sparse path needs the fused rbr_reparam layout.
        self._sparse = use_deploy
        self._arch = None
        if self._sparse:
            from head_detector_tpu.models.presets import get_arch

            self._arch = get_arch(model)
        self._model = build_model(
            model,
            deploy=use_deploy,
            dtype=dtype,
            defer_globalization=True,
            skip_flame=self._sparse,
        )
        self._variables = variables
        self._param_fusion = bool(param_fusion)
        self._fusion_neighbors = int(fusion_neighbors)
        self._fusion_iou = float(fusion_iou)
        self._compact_wire = int(compact_wire) if compact_wire else 0
        if wire_verts_dtype not in ("f32", "f16"):
            raise ValueError(f"wire_verts_dtype must be f32|f16, got {wire_verts_dtype!r}")
        self._wire_vdtype = jnp.float16 if wire_verts_dtype == "f16" else jnp.float32
        # A packed-params dispatch form (one flat closed-over buffer
        # instead of ~800 parameter arrays) was built on the theory that
        # relay dispatch cost scales with argument-buffer count; measured
        # on the chip it LOST (42.1 vs 27.6 ms batch-1 sync p50 — the ~800
        # per-call unpack slice/reshape kernels cost more than they saved)
        # and was removed.  BENCHMARKS.md round-5 measurement sweep.
        self._detect = jax.jit(self._detect_fn)
        self._detect_batch = jax.jit(
            self._detect_batch_fn, static_argnames=("m",)
        )

    # ------------------------------------------------------------------ #
    def _fused_rows(
        self,
        variables,
        feats,
        decoded,
        nb_idx: jnp.ndarray,  # [K, n] neighbor anchor ids per output slot
        nb_w: jnp.ndarray,  # [K, n] fusion weights
        raw,
        batch_idx: Optional[jnp.ndarray] = None,  # [K] source image per slot
    ) -> jnp.ndarray:
        """Globalized, score-weighted-fused FLAME params [K, 413] (f32).

        Each neighbor row is globalized at its OWN anchor before averaging;
        weighted-mean of per-anchor globalizations equals fusing globalized
        dense rows, because globalization is a per-anchor affine on the same
        translation/scale slots (ops/nms.py NeighborInfo docstring)."""
        k, n = nb_idx.shape
        flat = nb_idx.reshape(k * n)
        if self._sparse:
            from head_detector_tpu.ops.sparse_towers import sparse_flame_rows

            bidx = (
                None
                if batch_idx is None
                else jnp.repeat(batch_idx, n).reshape(1, k * n)
            )
            rows = sparse_flame_rows(
                variables, self._arch, feats, flat[None], batch_idx=bidx
            )[0]
        else:
            dense = decoded.flame_params  # [B, A, P] anchor-local
            bidx = (
                jnp.zeros((k * n,), jnp.int32)
                if batch_idx is None
                else jnp.repeat(batch_idx, n)
            )
            rows = dense[bidx, flat].astype(jnp.float32)  # [k*n, P] small gather
        glob = globalize_flame(
            rows.reshape(k * n, -1).astype(jnp.float32),
            flat,
            raw.anchor_points,
            raw.stride_tensor,
        ).reshape(k, n, -1)
        wsum = jnp.maximum(nb_w.sum(axis=1, keepdims=True), 1e-12)
        return (nb_w[..., None] * glob).sum(axis=1) / wsum

    def _detect_fn(
        self,
        image: jnp.ndarray,  # [1, S, S, 3] float
        confidence_threshold: jnp.ndarray,  # scalar
        pad: jnp.ndarray,  # [2] (left, top)
        scale: jnp.ndarray,  # scalar
    ):
        variables = self._variables
        if self._sparse:
            decoded, raw, feats = self._model.apply(
                variables, image, train=False, return_feats=True
            )
        else:
            decoded, raw = self._model.apply(variables, image, train=False)
            feats = None
        nb = None
        res = batched_nms(
            decoded.boxes_xyxy,
            decoded.scores,
            decoded.flame_params,
            confidence_threshold=confidence_threshold,
            iou_threshold=self._iou_threshold,
            pre_nms_max=self._pre_nms_max,
            post_nms_max=self._post_nms_max,
            fusion_iou=self._fusion_iou,
            return_neighbors=self._fusion_neighbors if self._param_fusion else 0,
        )
        if self._param_fusion:
            res, nb = res
        if self._compact_wire:
            # compact wire: only the top-M (valid desc, score desc) slots get
            # the FLAME towers + mesh decode and ride the download
            from head_detector_tpu.ops.nms import compact_detections

            cres = compact_detections(res, self._compact_wire)
            if nb is not None:
                # single-image call: batch axis is 1, so compact slots map
                # straight back to NMS slots via slot_idx
                params = self._fused_rows(
                    variables, feats, decoded,
                    nb.anchor_idx[0][cres.slot_idx],
                    nb.weights[0][cres.slot_idx], raw,
                )
            else:
                if self._sparse:
                    from head_detector_tpu.ops.sparse_towers import sparse_flame_rows

                    rows = sparse_flame_rows(
                        variables, self._arch, feats,
                        cres.anchor_idx[None], batch_idx=cres.batch_idx[None],
                    )[0]
                else:
                    rows = cres.flame_params.astype(jnp.float32)
                params = globalize_flame(
                    rows, cres.anchor_idx, raw.anchor_points, raw.stride_tensor
                )
            boxes, scores, valid = cres.boxes, cres.scores, cres.valid
        else:
            if nb is not None:
                selected = self._fused_rows(
                    variables, feats, decoded, nb.anchor_idx[0],
                    nb.weights[0], raw,
                )[None]
            else:
                if self._sparse:
                    from head_detector_tpu.ops.sparse_towers import sparse_flame_rows

                    rows = sparse_flame_rows(
                        variables, self._arch, feats, res.anchor_idx
                    )
                else:
                    rows = res.flame_params.astype(jnp.float32)
                selected = globalize_flame(
                    rows,
                    res.anchor_idx,
                    raw.anchor_points,
                    raw.stride_tensor,
                )
            boxes, scores, params, valid = (
                res.boxes[0],
                res.scores[0],
                selected[0],
                res.valid[0],
            )

        # FLAME decode on the fixed-size kept set (ref detector.py:66);
        # fused path: the 6DoF transform rides the skinning einsum.
        R, verts = fused_project_vertices(self._flame, params, to_2d=False)

        # un-letterbox (ref detector.py:67-74): verts xy -= pad, all /= scale;
        # boxes clip to canvas, -= pad, /= scale.
        verts = verts.at[:, :, 0].add(-pad[0])
        verts = verts.at[:, :, 1].add(-pad[1])
        verts = verts / scale

        boxes = jnp.clip(boxes, 0, self._image_size)
        boxes = boxes.at[:, jnp.array([0, 2])].add(-pad[0])
        boxes = boxes.at[:, jnp.array([1, 3])].add(-pad[1])
        boxes = boxes / scale

        rpy = rotation_mats_to_rpy(R)
        if self._compact_wire:
            # ONE f32 metadata tensor + one (optionally f16) vertex tensor —
            # two device->host transfers per call instead of six
            meta = jnp.concatenate(
                [boxes, scores[:, None], params, rpy,
                 valid.astype(jnp.float32)[:, None]], axis=1,
            )
            return meta, verts.astype(self._wire_vdtype)
        return boxes, scores, params, verts, rpy, valid

    # ------------------------------------------------------------------ #
    def _detect_batch_fn(
        self,
        images: jnp.ndarray,  # [B, S, S, 3] float
        confidence_threshold: jnp.ndarray,  # scalar
        pads: jnp.ndarray,  # [B, 2] (left, top) per image
        scales: jnp.ndarray,  # [B] per image
        m: int,  # batch-wide detection budget (static)
    ):
        """Batched detection with a compact wire: the top-``m``
        (valid desc, score desc) detections batch-wide get the FLAME towers
        + mesh decode and ride home as ONE [m, 423] f32 metadata tensor
        (batch_idx, box, score, params, RPY, valid) plus one [m, V, 3]
        vertex tensor.  Per-image un-letterboxing gathers each row's own
        pad/scale.  The reference has no batch API (its detector loops
        host-side, ``head_detector/detector.py:97-102``); this is the
        TPU-serving-shaped equivalent of N independent calls."""
        variables = self._variables
        if self._sparse:
            decoded, raw, feats = self._model.apply(
                variables, images, train=False, return_feats=True
            )
        else:
            decoded, raw = self._model.apply(variables, images, train=False)
            feats = None
        nb = None
        res = batched_nms(
            decoded.boxes_xyxy,
            decoded.scores,
            decoded.flame_params,
            confidence_threshold=confidence_threshold,
            iou_threshold=self._iou_threshold,
            pre_nms_max=self._pre_nms_max,
            post_nms_max=self._post_nms_max,
            fusion_iou=self._fusion_iou,
            return_neighbors=self._fusion_neighbors if self._param_fusion else 0,
        )
        if self._param_fusion:
            res, nb = res
        from head_detector_tpu.ops.nms import compact_detections

        cres = compact_detections(res, m)
        if nb is not None:
            params = self._fused_rows(
                variables, feats, decoded,
                nb.anchor_idx[cres.batch_idx, cres.slot_idx],
                nb.weights[cres.batch_idx, cres.slot_idx], raw,
                batch_idx=cres.batch_idx,
            )
        elif self._sparse:
            from head_detector_tpu.ops.sparse_towers import sparse_flame_rows

            rows = sparse_flame_rows(
                variables, self._arch, feats,
                cres.anchor_idx[None], batch_idx=cres.batch_idx[None],
            )[0]
            params = globalize_flame(
                rows, cres.anchor_idx, raw.anchor_points, raw.stride_tensor
            )
        else:
            rows = cres.flame_params.astype(jnp.float32)
            params = globalize_flame(
                rows, cres.anchor_idx, raw.anchor_points, raw.stride_tensor
            )
        R, verts = fused_project_vertices(self._flame, params, to_2d=False)

        bi = cres.batch_idx
        pad = pads[bi]  # [m, 2]
        scale = scales[bi]  # [m]
        verts = verts.at[:, :, 0].add(-pad[:, 0:1])
        verts = verts.at[:, :, 1].add(-pad[:, 1:2])
        verts = verts / scale[:, None, None]

        boxes = jnp.clip(cres.boxes, 0, self._image_size)
        boxes = boxes.at[:, jnp.array([0, 2])].add(-pad[:, 0:1])
        boxes = boxes.at[:, jnp.array([1, 3])].add(-pad[:, 1:2])
        boxes = boxes / scale[:, None]

        rpy = rotation_mats_to_rpy(R)
        meta = jnp.concatenate(
            [bi.astype(jnp.float32)[:, None], boxes, cres.scores[:, None],
             params, rpy, cres.valid.astype(jnp.float32)[:, None]], axis=1,
        )
        return meta, verts.astype(self._wire_vdtype)

    def predict_batch(
        self,
        images: List[Union[str, Image.Image, np.ndarray]],
        confidence_threshold: float = 0.5,
        max_detections: Optional[int] = None,
    ) -> List[PredictionResult]:
        """Detect heads in a list of images with ONE device program.

        ``max_detections`` bounds the number of decoded detections across
        the whole batch (default ``16 * len(images)``, capped at
        ``post_nms_max * len(images)``) — the highest-score detections
        batch-wide win if the cap binds.  One jitted program per distinct
        (batch size, budget); results per image match ``__call__`` up to
        batching roundoff."""
        originals = [self._convert_image(im) for im in images]
        b = len(originals)
        # Group by input shape: ONE uint8 upload + ONE batched-lanczos
        # letterbox dispatch per distinct shape, instead of a full relay
        # round trip per image (which dominated serving latency: 183 ms/img
        # at b16 measured on axon, ~95% dispatch/upload overhead).  The
        # detector sees the images in group order; ``order[j]`` maps the
        # permuted row j back to the caller's index.
        by_shape: Dict[tuple, List[int]] = {}
        for i, im in enumerate(originals):
            by_shape.setdefault(im.shape, []).append(i)
        order, chunks, pads, scales = [], [], [], []
        for shape, idxs in by_shape.items():
            stack = np.stack([np.ascontiguousarray(originals[i]) for i in idxs])
            chunks.append(letterbox_batch(stack, self._image_size))
            spec = letterbox_spec(shape[0], shape[1], self._image_size)
            for i in idxs:
                order.append(i)
                pads.append((float(spec.pad_left), float(spec.pad_top)))
                scales.append(float(spec.scale))
        imgs = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
        m = min(
            max_detections or 16 * b,
            self._post_nms_max * b,
        )
        meta, verts = self._detect_batch(
            imgs,
            jnp.float32(confidence_threshold),
            jnp.asarray(pads, jnp.float32),
            jnp.asarray(scales, jnp.float32),
            m=m,
        )
        meta = np.asarray(meta)
        verts = np.asarray(verts).astype(np.float32)
        results = [None] * b
        for j, i in enumerate(order):  # j = permuted row fed to the model
            orig = originals[i]
            sel = (meta[:, 0].astype(np.int32) == j) & (meta[:, 422] > 0.5)
            results[i] = PredictionResult(
                original_image=orig,
                heads=self._build_heads(
                    meta[sel, 1:5],
                    meta[sel, 5],
                    meta[sel, 6:419],
                    verts[sel],
                    meta[sel, 419:422],
                    np.ones(int(sel.sum()), bool),
                    scales[j],
                ),
            )
        return results

    # ------------------------------------------------------------------ #
    @staticmethod
    def _convert_image(image: Union[str, Image.Image, np.ndarray]) -> np.ndarray:
        if isinstance(image, str):
            image = cv2.imread(image)
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        elif isinstance(image, Image.Image):
            image = np.array(image)
        return image

    def __call__(
        self,
        image: Union[str, Image.Image, np.ndarray],
        confidence_threshold: float = 0.5,
    ) -> PredictionResult:
        original_image = self._convert_image(image)
        img, (pad_l, pad_t), scale = letterbox(
            jnp.asarray(original_image), self._image_size
        )
        out = self._detect(
            img,
            jnp.float32(confidence_threshold),
            jnp.asarray([pad_l, pad_t], jnp.float32),
            jnp.float32(scale),
        )
        if self._compact_wire:
            meta = np.asarray(out[0])
            verts = np.asarray(out[1]).astype(np.float32)
            boxes, scores = meta[:, :4], meta[:, 4]
            params, rpy = meta[:, 5:418], meta[:, 418:421]
            valid = meta[:, 421] > 0.5
        else:
            boxes, scores, params, verts, rpy, valid = map(np.asarray, out)
        return PredictionResult(
            original_image=original_image,
            heads=self._build_heads(
                boxes, scores, params, verts, rpy, valid, scale
            ),
        )

    def _build_heads(
        self,
        boxes: np.ndarray,
        scores: np.ndarray,
        params: np.ndarray,
        verts: np.ndarray,
        rpy: np.ndarray,
        valid: np.ndarray,
        scale: float,
    ) -> List[HeadMetadata]:
        heads: List[HeadMetadata] = []
        boxes = np.rint(boxes).astype(int)
        for i in np.flatnonzero(valid):
            p = FlameParams.from_3dmm(params[i : i + 1])
            # only `scale` is rescaled on the host; translation stays in
            # letterbox space — exactly like ref detector.py:76-79
            p.scale = p.scale / scale
            box = boxes[i]
            heads.append(
                HeadMetadata(
                    bbox=Bbox(
                        x=box[0], y=box[1], w=box[2] - box[0], h=box[3] - box[1]
                    ),
                    score=float(scores[i]),
                    flame_params=p,
                    vertices_3d=verts[i],
                    head_pose=RPY(
                        roll=float(rpy[i, 0]),
                        pitch=float(rpy[i, 1]),
                        yaw=float(rpy[i, 2]),
                    ),
                )
            )
        return heads
