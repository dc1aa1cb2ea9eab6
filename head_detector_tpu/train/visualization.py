"""Training observability: TensorBoard scalars + extreme-batch visualisation.

Reference equivalents: SG's TensorBoard scalar logging of the loss
``component_names`` and ``ExtremeBatchYoloHeadsVisualizationCallback``
(``yolo_head_visualization_callback.py:18-163``): track the max-loss batch of
each epoch and render GT vs predicted boxes/keypoints side by side.

Writers: ``torch.utils.tensorboard`` (torch-cpu is in the image); images also
land on disk as jpg so runs are inspectable without TB.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import cv2
import numpy as np


class TensorBoardLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir)

    def log_scalars(self, scalars: Dict[str, float], step: int, prefix: str = ""):
        for name, value in scalars.items():
            self.writer.add_scalar(f"{prefix}{name}", float(value), step)

    def log_image(self, tag: str, image: np.ndarray, step: int):
        self.writer.add_image(tag, image, step, dataformats="HWC")

    def close(self):
        self.writer.close()


def _draw_boxes(image: np.ndarray, boxes_xyxy: np.ndarray, color) -> np.ndarray:
    out = image.copy()
    for b in boxes_xyxy:
        cv2.rectangle(out, (int(b[0]), int(b[1])), (int(b[2]), int(b[3])), color, 2)
    return out


def _draw_keypoints(image: np.ndarray, kps: np.ndarray, color, stride: int = 50) -> np.ndarray:
    out = image.copy()
    for instance in kps:
        for pt in instance[::stride]:
            cv2.circle(out, (int(pt[0]), int(pt[1])), 1, color, -1)
    return out


class ExtremeBatchVisualizationCallback:
    """Track the worst (max-loss) batch per epoch and render GT|pred panels."""

    def __init__(self, log_dir: str, max_images: int = 16, freq: int = 1,
                 logger: Optional[TensorBoardLogger] = None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.max_images = max_images
        self.freq = freq
        self.logger = logger
        self._extreme_loss = -np.inf
        self._extreme = None

    def update(self, loss: float, images: np.ndarray, gt_boxes: np.ndarray,
               gt_mask: np.ndarray, gt_keypoints: Optional[np.ndarray] = None):
        """Track the max-loss batch; predictions are computed lazily at epoch
        end (the reference also defers decoding to the extreme batch)."""
        if loss > self._extreme_loss:
            self._extreme_loss = float(loss)
            n = min(len(images), self.max_images)
            self._extreme = (
                np.asarray(images[:n]),
                np.asarray(gt_boxes[:n]),
                np.asarray(gt_mask[:n]),
                np.asarray(gt_keypoints[:n]) if gt_keypoints is not None else None,
            )

    def on_epoch_end(self, epoch: int, predict_fn=None):
        """:param predict_fn: images -> (pred_boxes [B,N,4], pred_scores [B,N])
        run only on the stored extreme batch."""
        if self._extreme is None or epoch % self.freq:
            self._reset()
            return
        images, gt_boxes, gt_mask, gt_kps = self._extreme
        if predict_fn is not None:
            pred_boxes, pred_scores = predict_fn(images)
            pred_boxes = np.asarray(pred_boxes)
            pred_scores = np.asarray(pred_scores)
        else:
            pred_boxes = np.zeros((len(images), 0, 4), np.float32)
            pred_scores = np.zeros((len(images), 0), np.float32)
        panels: List[np.ndarray] = []
        for i in range(len(images)):
            img = images[i]
            if img.dtype != np.uint8:
                img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            gt_panel = _draw_boxes(img, gt_boxes[i][gt_mask[i] > 0], (0, 255, 0))
            if gt_kps is not None:
                gt_panel = _draw_keypoints(gt_panel, gt_kps[i][gt_mask[i] > 0], (0, 255, 0))
            keep = pred_scores[i].reshape(-1) > 0.3
            pred_panel = _draw_boxes(img, pred_boxes[i][keep], (255, 0, 0))
            panels.append(np.concatenate([gt_panel, pred_panel], axis=1))
        grid = np.concatenate(panels, axis=0)
        path = os.path.join(self.log_dir, f"extreme_batch_epoch{epoch}.jpg")
        cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
        if self.logger is not None:
            self.logger.log_image("extreme_batch", grid, epoch)
        self._reset()

    def _reset(self):
        self._extreme_loss = -np.inf
        self._extreme = None
