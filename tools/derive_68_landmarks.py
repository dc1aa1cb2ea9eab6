"""Derive a deterministic iBUG-68 landmark vertex set from shipped topology.

The reference's evaluate_dad extracts 68 landmarks through FLAME's official
barycentric embeddings, loaded from dataset-server paths NOT present in the
repo (``evaluation/dad_utils.py:56-66`` reads
``/mnt/pinatanas/.../flame_static_embedding.pkl``).  With no network egress
those files cannot be fetched, so this tool derives a deterministic
68-vertex landmark set from data that DOES ship: the 191-keypoint semantic
region indices (``face_keypoints/keypoints_191/*.npy``, each an ordered
polyline over template vertices) plus the template geometry.

Layout follows the iBUG-68 convention group-for-group:

====== ======================= =========================================
 0-16  jaw contour             right_contour(ear->chin) + left_contour
                               (chin->ear) chained, 17 evenly sampled
17-21  first eyebrow (x<0)     brow_top outer->inner, 5 sampled
22-26  second eyebrow (x>0)    brow_top inner->outer, 5 sampled
27-30  nose bridge             nose_front_bridge nasion->tip, 4 sampled
31-35  nose base               left wing, philtrum (subnasale = #33),
                               right wing
36-41  first eye (x<0)         [outer, top x2, inner, bottom x2]
42-47  second eye (x>0)        mirrored order
48-59  outer mouth             corners + 5 upper + 5 lower arc points
60-67  inner mouth             corners + 3 upper + 3 lower arc points
====== ======================= =========================================

The Procrustes 7-landmark subset [36, 39, 42, 45, 33, 48, 54] (eye corners,
subnasale, mouth corners — ``dad_utils.py:159``) therefore lands on the
correct semantic points.  This is a DOCUMENTED DELTA vs the official
barycentric embedding: landmarks are mesh vertices, not in-triangle points.
Both GT and predictions pass through the same extractor, so NME/Chamfer
protocols remain internally consistent.

Run: python tools/derive_68_landmarks.py
Writes: head_detector_tpu/assets/flame_indices/landmarks_68.npy
"""

from __future__ import annotations

import os

import numpy as np

ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "head_detector_tpu", "assets",
)


def _region(name: str) -> dict:
    d = np.load(
        os.path.join(ASSETS, "face_keypoints", "keypoints_191", f"{name}.npy"),
        allow_pickle=True,
    )[()]
    return {k: np.asarray(v, np.int64) for k, v in d.items()}


def _sample(arr: np.ndarray, n: int) -> np.ndarray:
    """n points evenly along an ordered polyline, endpoints included."""
    pos = np.linspace(0, len(arr) - 1, n)
    return arr[np.round(pos).astype(int)]


def derive() -> np.ndarray:
    v = np.load(os.path.join(ASSETS, "v_template.npy"))
    contour = _region("contour")
    brows = _region("brows")
    nose = _region("nose")
    eyes = _region("eyes")
    lips = _region("lips")

    def xsign(idx):
        return float(np.mean(v[idx, 0]))

    out = np.zeros(68, np.int64)

    # 0-16 jaw: right_contour runs ear->chin, left_contour chin->ear (template
    # y: ears high, chin low) — chained they trace one ear-to-ear arc
    jaw_chain = np.concatenate([contour["right_contour"], contour["left_contour"]])
    out[0:17] = _sample(jaw_chain, 17)

    # 17-26 brows: the x<0 brow first (outer->inner), then x>0 (inner->outer)
    lb, rb = brows["left_brow_top"], brows["right_brow_top"]
    first, second = (lb, rb) if xsign(lb) < xsign(rb) else (rb, lb)
    out[17:22] = _sample(first, 5)  # regions are ordered outer->inner
    out[22:27] = _sample(second, 5)[::-1]  # inner->outer

    # 27-30 nose bridge: nasion -> tip
    out[27:31] = _sample(nose["nose_front_bridge"], 4)

    # 31-35 nose base: left nostril, left inner, subnasale, right inner,
    # right nostril.  Wings are ordered top->bottom; index 2 is the widest
    # point, 4 the lowest inner point; philtrum[0] is the subnasale.
    lw, rw = nose["nose_left_wing"], nose["nose_right_wing"]
    if xsign(lw) > xsign(rw):
        lw, rw = rw, lw
    out[31] = lw[2]
    out[32] = lw[4]
    out[33] = nose["nose_philtrum"][0]
    out[34] = rw[4]
    out[35] = rw[2]

    # 36-47 eyes.  Regions run outer->inner along the top lid and
    # inner->outer along the bottom; corners are polyline endpoints.
    # iBUG first eye (36-41): [outer, top1, top2, inner, bottom1, bottom2];
    # second eye (42-47) mirrors: [inner, top2', top1', outer, bottom1',
    # bottom2'] so the arc runs nose-side -> temple-side like iBUG.
    def eye_first(top, bottom):
        return np.array(
            [top[0], top[len(top) // 3], top[2 * len(top) // 3],
             bottom[0], bottom[len(bottom) // 3], bottom[2 * len(bottom) // 3]]
        )

    def eye_second(top, bottom):
        return np.array(
            [bottom[0], top[2 * len(top) // 3], top[len(top) // 3],
             top[0], bottom[2 * len(bottom) // 3], bottom[len(bottom) // 3]]
        )

    lt, lb_, rt, rb_ = (eyes["left_eye_top"], eyes["left_eye_bottom"],
                        eyes["right_eye_top"], eyes["right_eye_bottom"])
    if xsign(lt) > xsign(rt):
        lt, lb_, rt, rb_ = rt, rb_, lt, lb_
    out[36:42] = eye_first(lt, lb_)
    out[42:48] = eye_second(rt, rb_)

    # 48-59 outer mouth: corners are the upper_lip_out endpoints (left first)
    uo, lo = lips["upper_lip_out"], lips["lower_lip_out"]
    if v[uo[0], 0] > v[uo[-1], 0]:
        uo = uo[::-1]
    if v[lo[0], 0] > v[lo[-1], 0]:
        lo = lo[::-1]
    out[48] = uo[0]
    out[49:54] = _sample(uo[1:-1], 5)
    out[54] = uo[-1]
    out[55:60] = _sample(lo[1:-1], 5)[::-1]  # right->left along the lower arc

    # 60-67 inner mouth
    ui, li = lips["upper_lip_in"], lips["lower_lip_in"]
    if v[ui[0], 0] > v[ui[-1], 0]:
        ui = ui[::-1]
    if v[li[0], 0] > v[li[-1], 0]:
        li = li[::-1]
    out[60] = ui[0]
    out[61:64] = _sample(ui[1:-1], 3)
    out[64] = ui[-1]
    out[65:68] = _sample(li[1:-1], 3)[::-1]

    return _symmetrize(v, out)


# iBUG left/right flip pairs, 1-based — the reference's own table
# (yolo_head_training/yolo_head/dataset_parsing.py:86-116,
# FACE_KEYPOINTS_FLIP_INDEXES).  Landmarks in no pair are midline points.
FLIP_PAIRS_1BASED = (
    (1, 17), (2, 16), (3, 15), (4, 14), (5, 13), (6, 12), (7, 11), (8, 10),
    (18, 27), (19, 26), (20, 25), (21, 24), (22, 23),
    (37, 46), (38, 45), (39, 44), (40, 43), (42, 47), (41, 48),
    (32, 36), (33, 35),
    (49, 55), (50, 54), (61, 65), (60, 56),
    (51, 53), (62, 64), (68, 66), (59, 57),
)


def _symmetrize(v: np.ndarray, out: np.ndarray) -> np.ndarray:
    """Enforce iBUG left/right flip consistency on the vertex picks.

    The region-sampling picks land within ~0.03 of perfect mirror symmetry
    (vs face half-width ~0.073) because polyline sampling quantizes
    differently per side.  For every flip pair the two picks are re-snapped
    to the template vertices nearest the pair's symmetrized midpoint (and
    its mirror); midline landmarks snap to the vertex nearest their x=0
    projection.  Residual asymmetry is then bounded by local vertex spacing
    plus the template's own intrinsic asymmetry (tested: < 0.008).
    """
    out = out.copy()
    mirror = np.array([-1.0, 1.0, 1.0])

    def nearest(target: np.ndarray, exclude: set) -> int:
        d = np.linalg.norm(v - target[None], axis=1)
        for idx in np.argsort(d)[:16]:
            if int(idx) not in exclude:
                return int(idx)
        return int(np.argmin(d))

    taken: set = set()
    pairs0 = [(a - 1, b - 1) for a, b in FLIP_PAIRS_1BASED]
    paired = {i for p in pairs0 for i in p}
    for a, b in pairs0:
        target = (v[out[a]] + v[out[b]] * mirror) / 2.0
        ia = nearest(target, taken)
        taken.add(ia)
        ib = nearest(target * mirror, taken)
        taken.add(ib)
        out[a], out[b] = ia, ib
    for m in range(68):
        if m in paired:
            continue
        target = v[out[m]].copy()
        target[0] = 0.0
        im = nearest(target, taken)
        taken.add(im)
        out[m] = im
    return out


def main() -> int:
    idx = derive()
    assert idx.shape == (68,)
    path = os.path.join(ASSETS, "flame_indices", "landmarks_68.npy")
    np.save(path, idx)
    print(f"wrote {path}: {len(np.unique(idx))} unique vertices")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
