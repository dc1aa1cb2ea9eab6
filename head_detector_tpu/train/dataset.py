"""Dataset: VGGHeads/DAD-3DHeads directory layout reader + synthetic data.

Functional specs:
* directory layout + filtering — reference ``yolo_head_training/yolo_head/
  dataset.py:101-145`` (``{split}/images/*.jpg``, ``{split}/annotations/*.npz``,
  ``files.txt`` exclusion, ``{mode}_files.txt`` keep-list, corrupt-image
  random re-pick at ``:158-162``).
* annotation decode — ``dataset_parsing.py:170-189`` (``get_vertices``): the
  npz stores packed 413-float 3DMM params per head in the **DAD annotation
  convention**: ``scale' = clamp(scale + 1, 1e-8)`` (NOT the model-output
  convention!), ``translation.z = 0``, projected = ``(R v * scale' + t + 1)/2
  * 256`` then offset by the extended-bbox origin.

TPU-first delta: the reference decodes GT FLAME per head on CPU inside
DataLoader workers (the data-pipeline hot loop, SURVEY.md §3.2); here the
decode is one batched jitted program per annotation file (all heads at once),
and can optionally be deferred to the accelerator inside the train step.
"""

from __future__ import annotations

import functools
import os
import random
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from head_detector_tpu.flame import FlameModel, flame_vertices
from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams
from head_detector_tpu.ops.rotation import rot_mat_from_6dof
from head_detector_tpu.train.loss import Targets
from head_detector_tpu.train.mesh_sample import MeshEstimationSample
from head_detector_tpu.train.transforms import ComposeTransforms, PhotometricAugs

DAD_SIZE = 256


def decode_dad_annotation(
    flame_model: FlameModel, params: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched GT decode in the DAD annotation convention (see module doc).

    The head count is padded to the next power of two before the jitted
    decode so arbitrary per-image counts reuse a handful of compilations.

    :param params: [N, 413]
    :return: (canonical vertices [N, V, 3], projected [N, V, 2] in 256-crop
              coords, rotation matrices [N, 3, 3])
    """
    n = params.shape[0]
    padded = max(1, 1 << (n - 1).bit_length()) if n else 1
    if padded != n:
        params = jnp.pad(params, ((0, padded - n), (0, 0)))
    verts, proj, rot = _decode_dad_jit()(flame_model, params)
    return verts[:n], proj[:n], rot[:n]


_DECODE_DAD_JIT = None


def _decode_dad_jit():
    """The DAD GT decode, jitted onto the host CPU backend (lazily).

    ``decode_dad_annotation`` runs inside dataset ``__getitem__`` on
    _Prefetcher producer threads; dispatching it to the axon TPU relay from
    worker threads is both a per-sample round trip (round-3 loader lesson)
    and a wedge risk (round 4: cross-thread relay traffic froze a campaign
    mid-epoch).  GT decode is tiny — the host CPU backend is the right home.
    """
    global _DECODE_DAD_JIT
    if _DECODE_DAD_JIT is None:
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None  # CPU platform unavailable: fall back to default
        _DECODE_DAD_JIT = jax.jit(_decode_dad_body, device=cpu)
    return _DECODE_DAD_JIT


def _decode_dad_body(
    flame_model: FlameModel, params: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    p = FlameParams.from_3dmm(params, FLAME_CONSTS)
    vertices = flame_vertices(flame_model, p, zero_rot=True)
    rotation = rot_mat_from_6dof(p.rotation.astype(vertices.dtype))
    rot_vertices = jnp.einsum("nab,nvb->nva", rotation, vertices)
    scale = jnp.clip(p.scale[:, None] + 1.0, 1e-8, None)
    rot_vertices = rot_vertices * scale
    translation = p.translation.at[..., 2].set(0.0)
    rot_vertices = rot_vertices + translation[:, None]
    projected = (rot_vertices + 1.0) / 2.0 * DAD_SIZE
    return vertices, projected[..., :2], rotation


class DAD3DHeadsDataset:
    """Reader of the VGGHeads on-disk format, API-compatible in spirit with
    the reference ``DAD3DHeadsDataset``."""

    def __init__(
        self,
        data_dir: str,
        transforms: Optional[ComposeTransforms] = None,
        splits: Optional[List[str]] = None,
        mode: Optional[str] = None,
        photometric: Optional[PhotometricAugs] = None,
        flame_model: Optional[FlameModel] = None,
        min_bbox_area: float = 9.0,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.data_dir = data_dir
        self.transforms = transforms
        self.photometric = photometric
        self.flame_model = flame_model or FlameModel.from_assets()
        self.min_bbox_area = min_bbox_area
        self.rng = rng or np.random.RandomState()

        if splits is not None:
            images, ann_files = [], []
            for split in splits:
                s_imgs, s_anns = self.get_images_and_annotations(
                    os.path.join(data_dir, split)
                )
                images.extend(s_imgs)
                ann_files.extend(s_anns)
        else:
            images, ann_files = self.get_images_and_annotations(data_dir, mode=mode)

        self.images = np.array(images)
        self.ann_files = np.array(ann_files)

    def __len__(self):
        return len(self.images)

    @classmethod
    def get_images_and_annotations(
        cls, data_dir: str, mode: Optional[str] = None
    ) -> Tuple[List[str], List[str]]:
        data_dir = Path(data_dir)
        images_dir = data_dir / "images"
        excluded_path = data_dir / "files.txt"
        excluded = set()
        if excluded_path.exists():
            excluded = set(excluded_path.read_text().splitlines())

        images = [
            str(x)
            for x in sorted(images_dir.glob("*.jpg"))
            if os.path.basename(x) not in excluded
        ]
        ann_files = [
            x.replace("images", "annotations").replace(".jpg", ".npz") for x in images
        ]
        keep = [(i, a) for i, a in zip(images, ann_files) if os.path.exists(a)]
        images = [i for i, _ in keep]
        ann_files = [a for _, a in keep]

        if mode is not None:
            filelist = os.path.join(data_dir, f"{mode}_files.txt")
            with open(filelist) as f:
                stems = {os.path.basename(x).split(".")[0] for x in f.read().splitlines()}
            keep = [
                (i, a)
                for i, a in zip(images, ann_files)
                if os.path.basename(i).split(".")[0] in stems
            ]
            images = [i for i, _ in keep]
            ann_files = [a for _, a in keep]
        return images, ann_files

    def load_sample(self, index: int) -> MeshEstimationSample:
        image_path = self.images[index]
        ann_path = self.ann_files[index]
        image = cv2.imread(image_path, cv2.IMREAD_COLOR)
        if image is None:  # corrupt-image fallback (ref dataset.py:158-162)
            new_index = random.randint(0, max(len(self.images) - 1, 0))
            image_path = self.images[new_index]
            ann_path = self.ann_files[new_index]
            image = cv2.imread(image_path, cv2.IMREAD_COLOR)

        if self.photometric is not None:
            image = self.photometric(image)

        ann = np.load(ann_path)
        params = np.asarray(ann["3dmm_params"], np.float32).reshape(-1, 413)
        n = params.shape[0]
        verts3d, projected, rots = decode_dad_annotation(
            self.flame_model, jnp.asarray(params)
        )
        verts3d, projected, rots = map(np.asarray, (verts3d, projected, rots))

        bboxes_xywh = np.asarray(ann["bbox"], np.float32).reshape(n, 4)
        ext = np.asarray(ann["extended_bbox"], np.float32).reshape(n, 4)
        # absolute coords = projected + extended-bbox origin
        # (ref HeadAnnotation.get_reprojected_points_in_absolute_coords)
        joints = projected + ext[:, None, :2]
        joints = np.concatenate(
            [joints, np.ones((n, joints.shape[1], 1), joints.dtype)], axis=-1
        )

        return MeshEstimationSample(
            image=image,
            vertices_2d=joints,
            vertices_3d=verts3d,
            rotation_matrix=rots,
            areas=np.prod(bboxes_xywh[:, 2:], axis=1),
            bboxes_xywh=bboxes_xywh,
            is_crowd=np.zeros(n, bool),
        )

    def __getitem__(self, index: int) -> MeshEstimationSample:
        sample = self.load_sample(index)
        if self.transforms is not None:
            sample = self.transforms.apply_to_sample(sample)
        return sample.sanitize_sample().filter_by_bbox_area(self.min_bbox_area)


class SyntheticHeadsDataset:
    """Procedural dataset for tests/benchmarks: random FLAME heads as GT.

    ``render=False`` (default) pairs the GT with pure-noise images — exercises
    the target pipeline shape-wise, but detection is unlearnable.
    ``render=True`` rasterizes each head's mesh (NCC colors) onto the image
    with the on-device rasterizer, giving a fully LEARNABLE synthetic task:
    the model can be trained and evaluated end-to-end without the 187 GB
    VGGHeads download (unavailable in this environment).
    """

    def __init__(
        self,
        flame_model: Optional[FlameModel] = None,
        image_size: int = 640,
        length: int = 1024,
        max_heads: int = 3,
        seed: int = 0,
        render: bool = False,
    ):
        self.flame_model = flame_model or FlameModel.from_assets()
        self.image_size = image_size
        self.length = length
        self.max_heads = max_heads
        self.seed = seed
        self.render = render
        self._render_assets = None
        # samples are deterministic in (seed, index): cache rendered ones so
        # epochs after the first don't re-rasterize on the accelerator
        self._cache: dict = {}

    def __len__(self):
        return self.length

    def _get_render_assets(self):
        if self._render_assets is None:
            from head_detector_tpu.assets_io import load_flame_assets
            from head_detector_tpu.pncc import compute_ncc_color_codes

            assets = load_flame_assets()
            self._render_assets = (
                jnp.asarray(assets.faces, jnp.int32),
                jnp.asarray(
                    compute_ncc_color_codes(
                        assets.v_template.astype(np.float64)
                    ).astype(np.float32)
                ),
            )
        return self._render_assets

    def __getitem__(self, index: int) -> MeshEstimationSample:
        if self.render and index in self._cache:
            return self._cache[index]
        sample = self._make_sample(index)
        if self.render:
            self._cache[index] = sample
        return sample

    def _make_sample(self, index: int) -> MeshEstimationSample:
        rng = np.random.RandomState(self.seed * 100003 + index)
        s = self.image_size
        n = rng.randint(1, self.max_heads + 1)
        params = rng.randn(n, 413).astype(np.float32) * 0.1
        params[:, 409] = rng.uniform(0.2 * s, 0.8 * s, n)  # tx
        params[:, 410] = rng.uniform(0.2 * s, 0.8 * s, n)  # ty
        params[:, 411] = 0.0
        params[:, 412] = rng.uniform(0.2 * s, 0.6 * s, n)  # scale (pixels)

        from head_detector_tpu.flame import reproject_spatial_vertices

        verts, rots, proj = reproject_spatial_vertices(
            self.flame_model, jnp.asarray(params), to_2d=False
        )
        verts, rots, proj = map(np.asarray, (verts, rots, proj))

        joints = np.concatenate(
            [proj[..., :2], np.ones((n, proj.shape[1], 1), np.float32)], axis=-1
        )
        x1 = proj[..., 0].min(1)
        y1 = proj[..., 1].min(1)
        x2 = proj[..., 0].max(1)
        y2 = proj[..., 1].max(1)
        bboxes = np.stack([x1, y1, x2 - x1, y2 - y1], axis=1).astype(np.float32)

        image = (rng.rand(s, s, 3) * 60 + 40).astype(np.uint8)  # dim background
        if self.render:
            from head_detector_tpu.ops.rasterize import rasterize_zbuffer

            faces, colors = self._get_render_assets()
            for i in range(n):
                v = np.array(proj[i], np.float32, copy=True)
                v[:, 2] *= -1  # camera-facing depth like the PNCC path
                canvas, hit = rasterize_zbuffer(
                    jnp.asarray(v), faces, colors, height=s, width=s
                )
                canvas = np.asarray(canvas)
                hit = np.asarray(hit)
                image = np.where(
                    hit[..., None],
                    np.clip(canvas * 255.0, 0, 255).astype(np.uint8),
                    image,
                )

        return MeshEstimationSample(
            image=image,
            vertices_2d=joints,
            vertices_3d=verts,
            rotation_matrix=rots,
            areas=bboxes[:, 2] * bboxes[:, 3],
            bboxes_xywh=bboxes,
            is_crowd=np.zeros(n, bool),
        ).sanitize_sample()


# --------------------------------------------------------------------------- #
# Collate
# --------------------------------------------------------------------------- #


def collate_samples(
    samples: Sequence[MeshEstimationSample], max_boxes: int,
    wire_dtype=None,
) -> Tuple[np.ndarray, Targets]:
    """Stack images and pad per-image GT to ``max_boxes`` -> (images, Targets).

    The TPU-native replacement for the reference's flat collate + in-loss
    unpadding round trip (``vgg_head_collate_fn.py`` +
    ``yolo_head_loss.py:_unpack_flat_targets``): targets leave the host
    already in the fixed-shape layout the jitted loss consumes.

    ``wire_dtype`` (e.g. ``np.float16``): transfer dtype for the two large
    GT vertex tensors; the train step restores f32 on device (compact wire
    format — see trainer.make_train_step).
    """
    b = len(samples)
    k = samples[0].vertices_2d.shape[1] if len(samples[0].vertices_2d) else 5023
    v = samples[0].vertices_3d.shape[1] if len(samples[0].vertices_3d) else 5023

    images = np.stack([s.image for s in samples])
    gt_bboxes = np.zeros((b, max_boxes, 4), np.float32)
    gt_v2d = np.zeros((b, max_boxes, k, 3), np.float32)
    gt_v3d = np.zeros((b, max_boxes, v, 3), np.float32)
    gt_rot = np.tile(np.eye(3, dtype=np.float32), (b, max_boxes, 1, 1))
    mask = np.zeros((b, max_boxes, 1), np.float32)

    for i, s in enumerate(samples):
        n = min(len(s.bboxes_xywh), max_boxes)
        if n == 0:
            continue
        xywh = s.bboxes_xywh[:n]
        gt_bboxes[i, :n, 0] = xywh[:, 0]
        gt_bboxes[i, :n, 1] = xywh[:, 1]
        gt_bboxes[i, :n, 2] = xywh[:, 0] + xywh[:, 2]
        gt_bboxes[i, :n, 3] = xywh[:, 1] + xywh[:, 3]
        gt_v2d[i, :n] = s.vertices_2d[:n]
        gt_v3d[i, :n] = s.vertices_3d[:n]
        gt_rot[i, :n] = s.rotation_matrix[:n]
        mask[i, :n] = 1.0

    if wire_dtype is not None:
        gt_v2d = gt_v2d.astype(wire_dtype)
        gt_v3d = gt_v3d.astype(wire_dtype)
    # Host numpy leaves, NOT jnp: collate runs on _Prefetcher producer
    # threads, and host->device uploads from worker threads wedged the axon
    # relay mid-campaign (see collate_param_samples docstring).  jit dispatch
    # uploads numpy leaves from the main thread at call time.
    targets = Targets(
        gt_bboxes=gt_bboxes,
        gt_vertices_2d=gt_v2d,
        gt_vertices_3d=gt_v3d,
        gt_rotations=gt_rot,
        pad_gt_mask=mask,
    )
    return images, targets


def flat_collate_tensors_with_batch_index(
    tensors: Sequence[np.ndarray],
) -> np.ndarray:
    """Reference wire-format parity: concat per-image tensors with a leading
    batch-index column (``vgg_head_collate_fn.py:flat_collate...``)."""
    out = []
    for i, t in enumerate(tensors):
        idx = np.full(t.shape[:-1] + (1,), i, t.dtype)
        out.append(np.concatenate([idx, t], axis=-1))
    return np.concatenate(out, axis=0) if out else np.zeros((0, 1))


def undo_flat_collate_tensors_with_batch_index(
    flat: np.ndarray, batch_size: int
) -> List[np.ndarray]:
    first_col = flat.reshape(flat.shape[0], -1)[:, 0]
    return [flat[first_col == i][..., 1:] for i in range(batch_size)]
