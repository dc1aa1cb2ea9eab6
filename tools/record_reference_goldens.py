"""Record golden outputs from the reference's pure-torch code paths.

The reference's GPU/TorchScript model cannot run here, but its *utility
math* is plain torch/numpy and executes on CPU: the FlameParams wire codec
(``head_detector/head_info.py``), the 6DoF Gram-Schmidt rotation
(``head_detector/utils.py:120-128``), RPY extraction (``:146-156``), angle
wrapping (``:131-143``) and the bbox algebra (``:26-76``).  This script runs
THE REFERENCE CODE ITSELF on fixed random inputs and stores the outputs in
``tests/goldens/reference_utils.npz``; ``tests/test_reference_goldens.py``
then asserts the JAX ports reproduce them bit-for-bit / to 1e-6.

torchvision is not installed in this environment; ``head_detector.utils``
imports it at module scope only for its ``nms`` op, so a stub module is
injected (the nms golden is covered separately by the numpy greedy oracle in
tests/test_nms.py).

Run:  python tools/record_reference_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "reference_utils.npz")


def _stub_torchvision() -> None:
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")

    def _unavailable(*a, **k):
        raise NotImplementedError("torchvision stub: nms not recorded")

    boxes.nms = _unavailable
    ops.boxes = boxes
    tv.ops = ops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", ops)
    sys.modules.setdefault("torchvision.ops.boxes", boxes)


def _register_bare_package() -> None:
    """Make ``head_detector.*`` importable WITHOUT executing the package
    ``__init__`` (which chains into the compiled Sim3DR extension and the
    smplx-dependent FLAME layer — neither available nor needed here)."""
    import importlib.util

    pkg_dir = os.path.join(REFERENCE, "head_detector")
    spec = importlib.util.spec_from_file_location(
        "head_detector",
        os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir],
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules["head_detector"] = module  # registered but never exec'd


def main() -> int:
    sys.path.insert(0, REFERENCE)
    _stub_torchvision()
    _register_bare_package()

    import torch

    from head_detector.head_info import FLAME_CONSTS, FlameParams
    from head_detector.utils import (
        calculate_rpy,
        extend_bbox,
        extend_to_rect,
        limit_angle,
        refined_head_bbox,
        rot_mat_from_6dof,
    )

    rng = np.random.RandomState(20240816)
    out = {}

    # --- 6DoF -> rotation matrix (utils.py:120-128) ---------------------- #
    sixdof = rng.normal(size=(32, 6)).astype(np.float32)
    out["sixdof_in"] = sixdof
    out["sixdof_rot"] = rot_mat_from_6dof(torch.tensor(sixdof)).numpy()

    # --- FlameParams wire codec (head_info.py:45-107) -------------------- #
    total = sum(FLAME_CONSTS.values())
    wire = rng.normal(size=(8, total)).astype(np.float32)
    params = FlameParams.from_3dmm(torch.tensor(wire), FLAME_CONSTS)
    out["wire_in"] = wire
    for name in ("shape", "expression", "rotation", "jaw", "translation", "scale"):
        out[f"wire_{name}"] = getattr(params, name).numpy()
    out["wire_roundtrip"] = params.to_3dmm_tensor().numpy()

    # --- RPY from flame params (utils.py:146-156) ------------------------ #
    rpys = []
    for i in range(8):
        p = FlameParams.from_3dmm(torch.tensor(wire[i : i + 1]), FLAME_CONSTS)
        r = calculate_rpy(p)
        rpys.append([r.roll, r.pitch, r.yaw])
    out["wire_rpy"] = np.asarray(rpys, np.float64)

    # --- angle wrapping (utils.py:131-143) ------------------------------- #
    angles = np.concatenate(
        [rng.uniform(-1000, 1000, 64), [-180.0, 180.0, 360.0, -360.0, 540.0, 0.0]]
    )
    out["angles_in"] = angles
    out["angles_limited"] = np.asarray([limit_angle(a) for a in angles])

    # --- bbox algebra (utils.py:26-76) ----------------------------------- #
    xyxy = rng.uniform(0, 500, size=(16, 2)).astype(np.float32)
    boxes = np.concatenate([xyxy, xyxy + rng.uniform(10, 200, size=(16, 2))], axis=1)
    out["bbox_in"] = boxes
    out["bbox_extended"] = np.stack([extend_bbox(b, 0.1) for b in boxes])
    out["bbox_extended_tuple"] = np.stack(
        [extend_bbox(b, (0.1, 0.25, 0.1, 0.0)) for b in boxes]
    )
    out["bbox_rect"] = np.stack([extend_to_rect(b) for b in boxes])

    # --- refined head bbox from projected vertices (utils.py:26-35) ------ #
    verts = rng.uniform(0, 640, size=(4, 5023, 2)).astype(np.float32)
    out["verts_in"] = verts
    out["verts_bbox"] = np.stack(
        [np.asarray(refined_head_bbox(v), np.float64) for v in verts]
    )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")
    return 0


if __name__ == "__main__":
    sys.exit(main())
