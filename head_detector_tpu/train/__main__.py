"""Training entry point (reference ``yolo_head_training/train.py``).

Usage::

    python -m head_detector_tpu.train --config-name yolo_heads_l \
        dataset_params.data_dir=/data/vggheads \
        dataset_params.train_splits='["split_00002"]' \
        dataset_params.val_splits='["split_00000"]'

With no ``data_dir`` the synthetic procedural dataset drives the loop (smoke
runs and benchmarks in environments without the 187 GB VGGHeads download).
"""

from __future__ import annotations

import argparse
import os

from head_detector_tpu.config import load_config, run_config_from_dict

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


class _CachedDataset:
    """In-memory sample cache for deterministic (val) datasets: the first
    epoch's host decode is reused by every later validation pass."""

    def __init__(self, dataset):
        self.dataset = dataset
        self._cache = {}

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index):
        if index not in self._cache:
            self._cache[index] = self.dataset[index]
        return self._cache[index]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-name", default="yolo_heads_l")
    ap.add_argument("--config-dir", default=CONFIG_DIR)
    ap.add_argument("overrides", nargs="*", help="key=value dot overrides")
    args = ap.parse_args()

    cfg = load_config(
        os.path.join(args.config_dir, f"{args.config_name}.yaml"), args.overrides
    )
    run_cfg = run_config_from_dict(cfg)

    ds_cfg = cfg.get("dataset_params", {})
    data_dir = ds_cfg.get("data_dir")
    image_size = ds_cfg.get("image_size", 640)

    if data_dir:
        from head_detector_tpu.train.dataset import DAD3DHeadsDataset
        from head_detector_tpu.train.transforms import (
            PhotometricAugs,
            default_train_transforms,
            default_val_transforms,
        )

        val_splits = ds_cfg.get("val_splits")
        if ds_cfg.get("params_wire"):
            # params-on-the-wire train path: GT FLAME decode happens on
            # device inside the train step (train/param_wire.py module doc)
            from head_detector_tpu.train.param_wire import (
                ConformalAugs,
                RenderedHeadsDataset,
            )

            train_ds = RenderedHeadsDataset(
                data_dir,
                splits=ds_cfg.get("train_splits"),
                augs=ConformalAugs(image_size),
                photometric=PhotometricAugs(),
            )
        else:
            train_ds = DAD3DHeadsDataset(
                data_dir,
                splits=ds_cfg.get("train_splits"),
                transforms=default_train_transforms(image_size),
                photometric=PhotometricAugs(),
            )
        val_ds = (
            _CachedDataset(
                DAD3DHeadsDataset(
                    data_dir, splits=val_splits,
                    transforms=default_val_transforms(image_size),
                )
            )
            if val_splits
            else None
        )
    else:
        print("[train] no dataset_params.data_dir — using the synthetic dataset")
        from head_detector_tpu.train.dataset import SyntheticHeadsDataset

        render = bool(ds_cfg.get("render", False))
        max_heads = int(ds_cfg.get("max_heads", 3))
        train_ds = SyntheticHeadsDataset(
            image_size=image_size,
            length=int(ds_cfg.get("train_length", 256)),
            max_heads=max_heads,
            render=render,
        )
        val_ds = SyntheticHeadsDataset(
            image_size=image_size,
            length=int(ds_cfg.get("val_length", 32)),
            max_heads=max_heads,
            seed=1,
            render=render,
        )

    from head_detector_tpu.train.runner import Trainer

    trainer = Trainer(run_cfg, train_ds, val_dataset=val_ds)
    metrics = trainer.train()
    print(f"[train] final metrics: {metrics}")


if __name__ == "__main__":
    main()
