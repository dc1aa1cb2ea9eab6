"""Layer-wise activation diff: flax model vs the live-torch mirror.

SURVEY hard-part 3 calls for validating the re-derived SuperGradients module
semantics "by layer-wise activation diff against the TorchScript model".
This tool does exactly that for any checkpoint: it runs the same input
through the flax model (capture_intermediates) and the torch mirror
(forward hooks) and reports max|diff| per stage — so when a real reference
checkpoint is converted (tools/convert_torch_checkpoint.py), any numeric
divergence is localised to the first disagreeing stage instead of showing up
only in the final boxes.

Usage::

    python tools/layer_diff.py --arch yolo_heads_n [--ckpt ckpt.pth] \
        [--size 64] [--seed 0]

Without --ckpt the mirror is randomly initialised and its converted state
dict drives the flax model (self-contained round-trip, same as the tests).

Compared stages: backbone c2/c3/c4/c5(SPP), neck p3/p4/p5, and the decoded
(boxes, scores, flame) outputs.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def collect_torch_stages(mirror, img_nchw) -> Tuple[Dict[str, np.ndarray], tuple]:
    """Run the mirror with hooks on backbone stages + neck outputs.
    Returns ({stage: NHWC activation}, (boxes, scores, flame))."""
    import torch

    acts: Dict[str, np.ndarray] = {}

    def hook(name):
        def fn(mod, inp, out):
            t = out[-1] if isinstance(out, tuple) else out
            acts[name] = t.detach().numpy().transpose(0, 2, 3, 1)
        return fn

    handles = [
        mirror.backbone.stage1.register_forward_hook(hook("c2")),
        mirror.backbone.stage2.register_forward_hook(hook("c3")),
        mirror.backbone.stage3.register_forward_hook(hook("c4")),
        mirror.backbone.context_module.register_forward_hook(hook("c5")),
        mirror.neck.neck2.register_forward_hook(hook("p3")),
        mirror.neck.neck3.register_forward_hook(hook("p4")),
        mirror.neck.neck4.register_forward_hook(hook("p5")),
    ]
    try:
        with torch.no_grad():
            out = mirror(torch.from_numpy(img_nchw))
    finally:
        for h in handles:
            h.remove()
    return acts, tuple(o.numpy() for o in out)


def collect_flax_stages(model, variables, img_nhwc) -> Tuple[Dict[str, np.ndarray], tuple]:
    import jax.numpy as jnp

    decoded, _ = model.apply(variables, jnp.asarray(img_nhwc), train=False)
    # capture module-call outputs
    _, state = model.apply(
        variables, jnp.asarray(img_nhwc), train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    inter = state["intermediates"]

    def get(path: List[str]):
        node = inter
        for p in path:
            node = node[p]
        out = node["__call__"][0]
        return out[-1] if isinstance(out, tuple) else out

    acts = {
        "c2": get(["backbone", "stage1"]),
        "c3": get(["backbone", "stage2"]),
        "c4": get(["backbone", "stage3"]),
        "c5": get(["backbone", "context_module"]),
    }
    acts["p3"], acts["p4"], acts["p5"] = inter["neck"]["__call__"][0]
    acts = {k: np.asarray(v, np.float32) for k, v in acts.items()}
    return acts, (
        np.asarray(decoded.boxes_xyxy),
        np.asarray(decoded.scores),
        np.asarray(decoded.flame_params),
    )


def diff_report(arch: str, ckpt: str = None, size: int = 64, seed: int = 0,
                print_fn=print) -> Dict[str, float]:
    import torch

    from convert_torch_checkpoint import convert
    from head_detector_tpu.models import build_model
    from head_detector_tpu.torch_mirror import build_torch_mirror

    mirror = build_torch_mirror(arch)
    if ckpt:
        raw = torch.load(ckpt, map_location="cpu", weights_only=False)
        sd = raw.get("net", raw) if isinstance(raw, dict) else raw.state_dict()
        mirror.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    else:
        g = torch.Generator().manual_seed(seed)
        state = mirror.state_dict()
        for key, t in state.items():
            if key.endswith("num_batches_tracked"):
                continue
            if t.ndim == 0 or key.endswith("running_var") or (
                    "bn" in key.rsplit(".", 2)[-2] and key.endswith("weight")):
                state[key] = torch.rand(t.shape, generator=g) + 0.5
            else:
                state[key] = torch.randn(t.shape, generator=g) * 0.05
        mirror.load_state_dict(state)
    mirror.eval()

    tree, _ = convert(mirror.state_dict())
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = build_model(arch)

    rng = np.random.RandomState(seed)
    img = rng.rand(1, size, size, 3).astype(np.float32)

    tacts, tout = collect_torch_stages(mirror, img.transpose(0, 3, 1, 2))
    facts, fout = collect_flax_stages(model, variables, img)

    diffs: Dict[str, float] = {}
    print_fn(f"{'stage':<10}{'shape':<22}{'max|diff|':>12}")
    for name in ("c2", "c3", "c4", "c5", "p3", "p4", "p5"):
        d = float(np.abs(facts[name] - tacts[name]).max())
        diffs[name] = d
        print_fn(f"{name:<10}{str(facts[name].shape):<22}{d:>12.3e}")
    for name, f, t in zip(("boxes", "scores", "flame"), fout, tout):
        d = float(np.abs(f - t).max())
        diffs[name] = d
        print_fn(f"{name:<10}{str(f.shape):<22}{d:>12.3e}")
    return diffs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--arch", default="yolo_heads_n")
    ap.add_argument("--ckpt", default=None, help="torch checkpoint (.pth)")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    diff_report(args.arch, args.ckpt, args.size, args.seed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
