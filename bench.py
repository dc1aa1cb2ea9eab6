"""Headline benchmark: images/sec/chip at 640px, detect + FLAME mesh decode.

Default mode measures the full on-device inference pipeline on the flagship
YoloHeads-L in bfloat16 with the deploy-fused (single-conv QARepVGG) graph:
uint8 batch -> normalize -> backbone/neck/heads decode -> fixed-shape NMS
(keep 100) -> FLAME mesh decode of every kept detection.  This is
BASELINE.json's metric ("images/sec/chip at 640px detect+mesh decode").

Extra modes via HDT_BENCH_MODE (the other BASELINE.json configs):
  pipeline  (default) config 1/2 — fused preprocess + on-device NMS + meshes
  crops     config 3 — + batched aligned-crop warp of every detection
  pncc      config 4 — rasterizer rendering all detected meshes
  streaming config 5 — 1024px shard pipeline (StreamingDetector)

The reference repo publishes no throughput numbers (BASELINE.md); the
baseline anchors are this benchmark's own first recorded runs, stored in
``BENCH_BASELINE.json`` keyed by model|mode|size|batch|regime —
``vs_baseline`` is the speedup ratio against the anchor measured on the
SAME config (1.0 + ``anchored_this_run`` on the anchoring run; never a
cross-architecture or cross-regime ratio — ADVICE r4).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

_MODE_ENV = os.environ.get("HDT_BENCH_MODE", "pipeline")
# config 3 of BASELINE.json specifies batch-64; other modes measured at 32
BATCH = int(
    os.environ.get("HDT_BENCH_BATCH", "64" if _MODE_ENV == "crops" else "32")
)
SIZE = int(os.environ.get("HDT_BENCH_SIZE", "640"))
WARMUP = int(os.environ.get("HDT_BENCH_WARMUP", "3"))
ITERS = int(os.environ.get("HDT_BENCH_ITERS", "10"))
MODE = os.environ.get("HDT_BENCH_MODE", "pipeline")

# Loaded-regime default (VERDICT r3 item 3): when the in-repo flagship EMA
# checkpoint exists, the headline measures the PRODUCT regime — a trained
# net over rendered >=1-head scenes, so the per-detection legs (sparse
# towers, FLAME decode, selection) run at workload density instead of the
# empty regime (~0.06 det/img through a random-init net).  Explicit env
# vars still override everything; the empty-regime forward/NMS floor is
# retained as a secondary JSON field (same compiled step, noise input).
_DEFAULT_CKPT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "checkpoints", "flagship_ema.msgpack",
)
_ckpt_meta = {}
if os.environ.get("HDT_BENCH_CKPT", "").lower() in ("0", "none"):
    # explicit opt-out from the in-repo default (empty-regime A/B rows)
    os.environ["HDT_BENCH_CKPT"] = ""
elif not os.environ.get("HDT_BENCH_CKPT") and os.path.isfile(_DEFAULT_CKPT):
    os.environ["HDT_BENCH_CKPT"] = _DEFAULT_CKPT
    os.environ.setdefault("HDT_BENCH_INPUT", "render")
    try:
        with open(_DEFAULT_CKPT + ".json") as f:
            _ckpt_meta = json.load(f)
    except (OSError, ValueError):
        _ckpt_meta = {}

MODEL = os.environ.get(
    "HDT_BENCH_MODEL", _ckpt_meta.get("arch", "yolo_heads_l")
)
BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)
_FLOPS_PER_IMAGE = 0.0  # set by _bench_pipeline (HLO cost analysis)
_DETS_PER_IMAGE = -1.0  # measured valid detections/image (set by pipeline)
_CONTENDED = False  # a campaign held the host lock while measuring
_EMPTY_REGIME_IPS = 0.0  # forward/NMS floor (same step, noise input)


def _make_inputs() -> np.ndarray:
    """Benchmark input batch.

    Default: random uint8 noise (the empty-pipeline regime — ~0 detections
    through a random-init net; fine for the forward/NMS floor, misleading
    for per-detection legs).  ``HDT_BENCH_INPUT=render`` builds rendered
    FLAME-head scenes (>=1 head/image; ``HDT_BENCH_HEADS`` heads max, 5 =
    the stress case) so that with a trained ``HDT_BENCH_CKPT`` the
    per-detection legs run at workload density (VERDICT r2 item 2; the
    reference's workload is >=1 head/image, detector.py:97-102).
    """
    rng = np.random.RandomState(0)
    if os.environ.get("HDT_BENCH_INPUT") != "render":
        return rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)

    from head_detector_tpu.train.dataset import SyntheticHeadsDataset

    max_heads = int(os.environ.get("HDT_BENCH_HEADS", "3"))
    ds = SyntheticHeadsDataset(
        image_size=SIZE, length=BATCH, max_heads=max_heads, seed=11,
        render=True,
    )
    return np.stack([ds[i].image for i in range(BATCH)])


def _build_fused(jnp, skip_flame: bool = False):
    import jax

    from head_detector_tpu.export import build_deploy
    from head_detector_tpu.models import build_model, init_model

    ckpt = os.environ.get("HDT_BENCH_CKPT")
    if ckpt:
        # loaded-regime benchmarking: a trained checkpoint produces real
        # detections on rendered inputs (HDT_BENCH_INPUT=render), so the
        # per-detection legs (FLAME decode, crops, PNCC) run at workload
        # density instead of the empty-pipeline regime
        from head_detector_tpu.detector import load_variables
        from head_detector_tpu.train.checkpoint import restore_key_matching

        train_model = build_model(MODEL, dtype=jnp.bfloat16)
        variables = init_model(
            train_model, jax.random.PRNGKey(0), (SIZE, SIZE), batch=2
        )
        source = load_variables(ckpt)
        # the in-repo shipping format stores f16 leaves (half the artifact);
        # params are f32 at compute time as everywhere else
        source = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32)
            if np.asarray(x).dtype == np.float16 else x,
            source,
        )
        variables, matched, total = restore_key_matching(variables, source)
        print(f"# ckpt restore: {matched}/{total} leaves", file=sys.stderr)
    else:
        train_model = build_model(MODEL, dtype=jnp.bfloat16)
        variables = init_model(
            train_model, jax.random.PRNGKey(0), (SIZE, SIZE), batch=2
        )
    # deferred FLAME globalisation: the dense [B, A, 413] tensor stays in
    # bf16 anchor-local form; the ~K kept rows are globalised after NMS
    # (bit-identical in f32, no dense f32 materialisation).  skip_flame
    # additionally removes the six dense FLAME towers — the sparse path
    # re-runs them post-NMS on patches at the kept anchors only.
    # HDT_BENCH_S2D=1 rebuilds the stem in space-to-depth form (same
    # arithmetic, 4x the MXU contraction lanes — export.s2d_stem_kernel).
    return build_deploy(
        MODEL, variables, defer_globalization=True, skip_flame=skip_flame,
        s2d_stem=os.environ.get("HDT_BENCH_S2D") == "1",
    )


def _bench_pipeline(mode: str) -> float:
    global _DETS_PER_IMAGE, _FLOPS_PER_IMAGE
    import jax
    import jax.numpy as jnp

    from head_detector_tpu.assets_io import get_indices
    from head_detector_tpu.flame import FlameModel, fused_project_vertices
    from head_detector_tpu.models.heads import globalize_flame
    from head_detector_tpu.models.presets import get_arch
    from head_detector_tpu.ops.nms import batched_nms, compact_detections
    from head_detector_tpu.ops.sparse_towers import sparse_flame_rows

    # "sparse" (pipeline default): the dense forward skips the six FLAME
    # towers entirely; post-NMS the towers run as patch convolutions at the
    # compacted kept anchors only (exactness vs the dense rows is tested).
    towers = os.environ.get(
        "HDT_BENCH_TOWERS", "sparse" if MODE == "pipeline" else "dense"
    )
    model, variables = _build_fused(jnp, skip_flame=(towers == "sparse"))
    arch = get_arch(MODEL)
    flame = FlameModel.from_assets(dtype=jnp.float32)

    # Default mesh output for the headline mode: the "head" vertex subset
    # (2470 of 5023 — the subset the reference's own metrics and losses use,
    # yolo_head_loss.py:309-320) in bf16.  Opt into the full mesh / f32 with
    # HDT_BENCH_VERTS=full / HDT_BENCH_VDTYPE=f32.  pncc/crops modes keep the
    # full f32 mesh (the renderer indexes full-mesh vertex ids).
    verts_subset = os.environ.get("HDT_BENCH_VERTS", "head")
    vdtype_name = os.environ.get("HDT_BENCH_VDTYPE", "bf16")
    compact = int(os.environ.get("HDT_BENCH_COMPACT", "0"))
    if mode == "pipeline" and verts_subset == "head":
        decode_flame = flame.subset(get_indices()["head"])
    else:
        decode_flame = flame
    vdtype = (
        jnp.bfloat16 if (mode == "pipeline" and vdtype_name == "bf16")
        else jnp.float32
    )

    if mode == "pncc":
        from head_detector_tpu.assets_io import load_flame_assets
        from head_detector_tpu.ops.rasterize_pallas import rasterize_zbuffer_pallas
        from head_detector_tpu.pncc import compute_ncc_color_codes

        assets = load_flame_assets()
        idx_set = set(int(i) for i in assets.head_w_ears_indices)
        pncc_tris = jnp.asarray(
            np.array([t for t in assets.faces if all(int(v) in idx_set for v in t)],
                     np.int32)
        )
        pncc_colors = jnp.asarray(
            compute_ncc_color_codes(
                assets.v_template.astype(np.float64), assets.head_w_ears_indices
            ).astype(np.float32)
        )

    if mode == "crops":
        from head_detector_tpu.ops.warp import aligned_crops_matmul

    @jax.jit
    def step(images_u8):
        images = images_u8.astype(jnp.float32) / 255.0
        if towers == "sparse":
            decoded, raw, feats = model.apply(
                variables, images, train=False, return_feats=True
            )
        else:
            decoded, raw = model.apply(variables, images, train=False)
        res = batched_nms(
            decoded.boxes_xyxy,
            decoded.scores,
            decoded.flame_params,
            # 0.5 = the reference protocol threshold; HDT_BENCH_CONF lowers it
            # for loaded-regime stress rows (more valid detections/image)
            confidence_threshold=float(os.environ.get("HDT_BENCH_CONF", "0.5")),
            iou_threshold=0.5,
            pre_nms_max=1000,
            post_nms_max=100,
        )

        if towers == "sparse":
            # production-shaped decode: pack the valid detections batch-wide
            # (budget = compact or 256 — >100x the measured density on this
            # input), run the FLAME towers on 7x7 patches at those anchors,
            # globalize, and mesh-decode only those rows.
            m = compact or 256
            cres = compact_detections(res, m)
            rows = sparse_flame_rows(
                variables, arch, feats,
                cres.anchor_idx[None], batch_idx=cres.batch_idx[None],
            )[0]
            params = globalize_flame(
                rows, cres.anchor_idx, raw.anchor_points, raw.stride_tensor
            )
            _, verts = fused_project_vertices(decode_flame, params, to_2d=False)
            return (res.boxes, res.scores, res.valid, cres.batch_idx,
                    cres.slot_idx, cres.valid, verts.astype(vdtype))

        if compact and mode == "pipeline":
            # decode only the top `compact` valid slots batch-wide instead of
            # all B*K — packed [M, ...] outputs + (batch_idx, slot_idx)
            cres = compact_detections(res, compact)
            params = globalize_flame(
                cres.flame_params.astype(jnp.float32), cres.anchor_idx,
                raw.anchor_points, raw.stride_tensor,
            )
            _, verts = fused_project_vertices(decode_flame, params, to_2d=False)
            return (res.boxes, res.scores, res.valid, cres.batch_idx,
                    cres.slot_idx, cres.valid, verts.astype(vdtype))

        if mode == "crops":
            # config 3: roll-ALIGNED 256px crops + OBJ export of EVERY
            # detection.  Valid detections are packed batch-wide
            # (compact_detections, budget 64 — measured density on this
            # input is ~0.06 valid/image, so >10x margin) and ONLY those
            # rows get the full-mesh decode; the packed [M, V, 3] tensor is
            # what the host downloads in ONE transfer for OBJ export (the
            # previous per-row np.asarray() paid one dev-relay round trip
            # per detection and capped this config at ~13 img/s).
            # Alignment follows get_aligned_heads (detection_result.py):
            # rotate by roll, gated on |yaw| < 60; here as the 3-shear
            # batched-matmul rotation.
            from head_detector_tpu.ops.rotation import rotation_mats_to_rpy

            b, k = res.scores.shape
            cres = compact_detections(res, 64)
            cparams = globalize_flame(
                cres.flame_params.astype(jnp.float32), cres.anchor_idx,
                raw.anchor_points, raw.stride_tensor,
            )
            rot_mats, verts = fused_project_vertices(
                decode_flame, cparams, to_2d=False
            )  # [M, 3, 3], [M, V, 3] — packed valid-first
            rpy = rotation_mats_to_rpy(rot_mats)  # [M, 3]
            roll = jnp.where(jnp.abs(rpy[:, 2]) < 60.0, rpy[:, 0], 0.0)
            # scatter packed roll angles back onto the dense [B, K] slots
            # the warp consumes.  Invalid compact rows carry batch_idx ==
            # slot_idx == 0 — route them out of bounds and drop, so they
            # cannot clobber a real detection living at slot (0, 0).
            bi = jnp.where(cres.valid, cres.batch_idx, b)
            angles = (
                jnp.zeros((b, k), jnp.float32)
                .at[bi, cres.slot_idx]
                .set(roll, mode="drop")
            )
            # crops/image budget: default 8 covers the workload's p100
            # (scenes carry <=5 heads — density measured + reported in the
            # JSON line); HDT_BENCH_KC lifts it up to post_nms_max for the
            # literal every-NMS-slot case
            kc = int(os.environ.get("HDT_BENCH_KC", "8"))
            boxes = jnp.clip(res.boxes[:, :kc], 1.0, None)  # [B, kc, 4]
            # The warp runs as a SECOND jitted program (see warp_step below):
            # fused into this graph, XLA's schedule collapsed the whole step
            # to 45 img/s (vs 503 without the warp and ~30 ms for the warp
            # alone) — the two-program split restores both numbers.
            # one small metadata tensor -> ONE host transfer beside the
            # packed verts (every blocking D2H is a ~0.5 s relay round trip
            # on the dev harness)
            meta = jnp.stack([
                cres.batch_idx.astype(jnp.int32),
                cres.slot_idx.astype(jnp.int32),
                cres.valid.astype(jnp.int32),
            ])
            return res.boxes, res.scores, res.valid, meta, verts, (
                boxes, angles[:, :kc])

        params = globalize_flame(
            res.flame_params.astype(jnp.float32), res.anchor_idx,
            raw.anchor_points, raw.stride_tensor,
        )
        b, k, p = params.shape
        rot_mats, verts = fused_project_vertices(
            decode_flame, params.reshape(b * k, p), to_2d=False
        )
        verts = verts.reshape(b, k, -1, 3).astype(vdtype)

        if mode == "pncc":
            # config 4: render ALL valid detections of every image, each head
            # composited onto the accumulating canvas in score order — the
            # reference semantics (pncc_processor.py:66-73: fresh z-buffer per
            # head, canvas pixels replaced where the head rendered).  Invalid
            # slots are skipped at runtime via lax.cond, so wall time tracks
            # the number of real detections, not the 100 NMS slots.
            def render_image(args):
                verts_i, valid_i = args  # [K, V, 3], [K]

                def body(k, canvas):
                    def do(canvas):
                        v = verts_i[k].at[:, 2].multiply(-1.0)
                        color, hit = rasterize_zbuffer_pallas(
                            v, pncc_tris, pncc_colors, height=SIZE, width=SIZE
                        )
                        return jnp.where(hit[..., None], color, canvas)

                    return jax.lax.cond(valid_i[k], do, lambda c: c, canvas)

                return jax.lax.fori_loop(
                    0, verts_i.shape[0], body,
                    jnp.zeros((SIZE, SIZE, 3), jnp.float32),
                )

            render = jax.lax.map(render_image, (verts, res.valid))
            return res.boxes, res.scores, res.valid, render

        return res.boxes, res.scores, res.valid, verts

    images = jnp.asarray(_make_inputs())

    if mode == "crops":
        # config 3 also times OBJ mesh export of every valid detection
        import tempfile

        from head_detector_tpu.detection_result import MeshSaver

        saver = MeshSaver()
        objdir = tempfile.mkdtemp(prefix="hdt_bench_obj_")

        warp_on = os.environ.get("HDT_BENCH_CROPS", "1") != "0"

        @jax.jit
        def warp_step(images_u8, boxes, angles):
            imgs = images_u8.astype(jnp.float32) / 255.0
            return jax.vmap(
                lambda img, bxs, ang: aligned_crops_matmul(
                    img, bxs, ang, out_size=256
                )
            )(imgs, boxes, angles)

        # HDT_BENCH_OBJ=0 skips the export leg entirely — isolates the
        # device step from the relay-bound host transfers for analysis
        obj_export = os.environ.get("HDT_BENCH_OBJ", "1") != "0"

        def export_objs(out, it):
            boxes, scores, valid, meta, verts, (cboxes, cangles) = out
            crops = (
                warp_step(images, cboxes, cangles) if warp_on else cboxes
            )
            if not obj_export:
                jax.block_until_ready(crops)
                return 0
            # TWO blocking transfers per iteration: the packed [M, V, 3]
            # verts and one int32 metadata stack (the previous per-row
            # np.asarray paid one relay round trip PER DETECTION)
            m = np.asarray(meta)  # [3, M]
            rows = np.asarray(verts, np.float64)  # [M, V, 3]
            bidx, sidx, mvalid = m[0], m[1], m[2].astype(bool)
            n = int(mvalid.sum())
            if n == 0:
                return 0
            saver.save_many(
                rows[:n],
                [
                    os.path.join(objdir, f"i{it}_b{bi}_k{si}.obj")
                    for bi, si in zip(bidx[:n], sidx[:n])
                ],
            )
            jax.block_until_ready(crops)  # the warp program counts too
            return n

        for _ in range(WARMUP):
            out = step(images)
        jax.block_until_ready(out)
        export_objs(out, -1)

        # Double-buffered: the (host) export of iteration t-1 runs while the
        # device computes iteration t — every iteration's OBJs are written
        # INSIDE the timed window (the tail export drains before the clock
        # stops), so the export wall time is fully included; it just
        # overlaps device compute, exactly like the streaming pipeline's
        # upload overlap.
        t0 = time.perf_counter()
        prev = None
        for it in range(ITERS):
            out = step(images)
            if prev is not None:
                export_objs(prev, it - 1)
            prev = out
        export_objs(prev, ITERS - 1)
        dt = time.perf_counter() - t0
        _DETS_PER_IMAGE = float(np.asarray(out[2]).sum()) / BATCH
        return BATCH * ITERS / dt

    # FLOPs accounting (VERDICT r2 item 4): HLO cost analysis of the step —
    # no extra device compile (Lowered-level), divided per image for MFU
    from head_detector_tpu.profiling import flops_estimate

    _FLOPS_PER_IMAGE = flops_estimate(step, images) / BATCH

    for _ in range(WARMUP):
        out = step(images)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    _DETS_PER_IMAGE = float(np.asarray(out[2]).sum()) / BATCH

    if mode == "pipeline" and os.environ.get("HDT_BENCH_INPUT") == "render":
        # secondary: the empty-regime forward/NMS floor through the SAME
        # compiled step — noise input produces ~0 detections, isolating the
        # detector+NMS cost from the loaded per-detection legs
        global _EMPTY_REGIME_IPS
        rng = np.random.RandomState(1)
        noise = jnp.asarray(
            rng.randint(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
        )
        nout = step(noise)
        jax.block_until_ready(nout)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            nout = step(noise)
        jax.block_until_ready(nout)
        _EMPTY_REGIME_IPS = BATCH * ITERS / (time.perf_counter() - t0)

    return BATCH * ITERS / dt


def _bench_latency() -> float:
    """p50 single-image end-to-end latency (ms) through the public
    HeadDetector API — uint8 image in, HeadMetadata list out.

    ``HDT_BENCH_LAT=device`` measures the device program alone (letterboxed
    tensor pre-staged, outputs block_until_ready'd but not downloaded): the
    p50 a real TPU VM's PCIe-attached host approaches.  The default e2e
    number on the dev harness is dominated by relay round trips (~6 MB of
    vertex downloads per call)."""
    import numpy as np

    from head_detector_tpu.detector import HeadDetector

    # single-image program budgets (VERDICT r2 item 5): the default 1000/100
    # NMS budgets are batch-serving-shaped; HDT_BENCH_PRE/POST specialize the
    # program for one image (e.g. 128/32)
    pre = int(os.environ.get("HDT_BENCH_PRE", "1000"))
    post = int(os.environ.get("HDT_BENCH_POST", "100"))
    lat_mode = os.environ.get("HDT_BENCH_LAT")

    class _Noop:
        pass

    det = _Noop() if lat_mode == "noop" else HeadDetector(
        model=MODEL, image_size=SIZE, pre_nms_max=pre, post_nms_max=post,
        # HDT_BENCH_WIREM=16: compact download wire — top-M slots only, TWO
        # transfers (f32 meta + HDT_BENCH_WDT verts) instead of six dense
        # [post_nms_max, ...] tensors; the serving configuration of record
        compact_wire=int(os.environ.get("HDT_BENCH_WIREM", "0")) or None,
        wire_verts_dtype=os.environ.get("HDT_BENCH_WDT", "f16"),
    )
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (480, SIZE, 3), dtype=np.uint8)

    if lat_mode in ("device", "forward", "noop"):
        import jax
        import jax.numpy as jnp

        from head_detector_tpu.ops.letterbox import letterbox

        if lat_mode == "noop":
            # harness floor: the dispatch+sync round trip of a trivial
            # program — no detector anywhere. On the axon relay this is
            # the lower bound ANY p50 above inherits; on a PCIe-attached
            # TPU VM host it is ~0.1 ms.
            det._detect = jax.jit(lambda x: x + 1.0)
            args = (jnp.zeros((8,), jnp.float32),)
        elif lat_mode == "forward":
            img, (pad_l, pad_t), scale = letterbox(jnp.asarray(image), SIZE)
            # component isolation: the conv forward alone (scores out)
            fwd = jax.jit(
                lambda x: det._model.apply(det._variables, x, train=False)[0].scores
            )
            det._detect = fwd
            args = (img,)
        else:
            img, (pad_l, pad_t), scale = letterbox(jnp.asarray(image), SIZE)
            args = (
                img,
                jnp.float32(0.5),
                jnp.asarray([pad_l, pad_t], jnp.float32),
                jnp.float32(scale),
            )
        for _ in range(max(WARMUP, 2)):
            out = det._detect(*args)
        jax.block_until_ready(out)
        if os.environ.get("HDT_BENCH_PIPELINED"):
            # per-call DEVICE occupancy: dispatch N calls back-to-back and
            # sync once — the per-call dispatch round trip overlaps with
            # device compute, so the amortized time is the device-side cost
            # a queue-fed server pays per image (RTT excluded).
            n = max(ITERS, 50)
            t0 = time.perf_counter()
            for _ in range(n):
                out = det._detect(*args)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) * 1000.0 / n
        times = []
        for _ in range(max(ITERS, 50)):
            t0 = time.perf_counter()
            out = det._detect(*args)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) * 1000.0)
        return float(np.percentile(times, 50))

    for _ in range(max(WARMUP, 2)):
        det(image, confidence_threshold=0.5)
    times = []
    for _ in range(max(ITERS, 20)):
        t0 = time.perf_counter()
        det(image, confidence_threshold=0.5)
        times.append((time.perf_counter() - t0) * 1000.0)
    return float(np.percentile(times, 50))


def _bench_streaming() -> float:
    from head_detector_tpu.pipeline import StreamingDetector

    det = StreamingDetector(
        model_name=MODEL,
        image_size=int(os.environ.get("HDT_BENCH_SIZE", "1024")),
        batch_size=BATCH,
    )
    # HDT_BENCH_FEED=device: no host uploads — the pure compute bound the
    # host-fed pipeline approaches on real PCIe (the dev relay caps uploads)
    device_feed = os.environ.get("HDT_BENCH_FEED", "host") == "device"
    return det.throughput(num_images=BATCH * max(ITERS, 4), device_feed=device_feed)


def main():
    import jax

    # NO persistent compilation cache here: deserialized executables run
    # ~20x slow on the axon backend and CPU entries carry machine-feature
    # mismatch (SIGILL) warnings. The benchmark always compiles fresh.
    _ = jax  # backend selected by the environment

    # A running training campaign contends for the single host core AND the
    # TPU (round-3 lesson: the driver bench measured ~3.5% low beside a
    # campaign chunk).  Wait a bounded time for it to finish, then proceed
    # and record the residual contention state in the JSON line.
    from head_detector_tpu import hostlock

    global _CONTENDED
    _CONTENDED = hostlock.wait_until_free(
        float(os.environ.get("HDT_LOCK_WAIT_S", "900"))
    )
    if _CONTENDED:
        print("# bench running beside an active campaign (lock held) — "
              "numbers may read low", file=sys.stderr)

    if MODE == "latency":
        p50_ms = _bench_latency()
        flavor = {
            "device": "device program", "forward": "forward only",
            "noop": "noop dispatch floor",
        }.get(os.environ.get("HDT_BENCH_LAT", ""), "e2e HeadDetector")
        if os.environ.get("HDT_BENCH_PIPELINED"):
            flavor += ", pipelined"
        if os.environ.get("HDT_BENCH_PRE") or os.environ.get("HDT_BENCH_POST"):
            flavor += (
                f", nms {os.environ.get('HDT_BENCH_PRE', '1000')}"
                f"/{os.environ.get('HDT_BENCH_POST', '100')}"
            )
        if os.environ.get("HDT_BENCH_WIREM"):
            flavor += (
                f", compact wire M={os.environ['HDT_BENCH_WIREM']}"
                f"/{os.environ.get('HDT_BENCH_WDT', 'f16')}"
            )
        print(
            json.dumps(
                {
                    "metric": f"p50 single-image latency @{SIZE}px ({MODEL}, {flavor})",
                    "value": round(p50_ms, 2),
                    "unit": "ms",
                    "vs_baseline": 1.0,
                    "contended": _CONTENDED,
                }
            )
        )
        return

    if MODE == "streaming":
        images_per_sec = _bench_streaming()
        size = int(os.environ.get("HDT_BENCH_SIZE", "1024"))
        metric = f"images/sec streaming @{size}px ({MODEL}, bf16, batch {BATCH})"
    else:
        images_per_sec = _bench_pipeline(MODE)
        suffix = {"pipeline": "detect+mesh decode", "crops": "detect+mesh+crops",
                  "pncc": "detect+mesh+PNCC render"}[MODE]
        regime = (
            ", trained ckpt, rendered scenes"
            if os.environ.get("HDT_BENCH_CKPT")
            and os.environ.get("HDT_BENCH_INPUT") == "render" else ""
        )
        metric = (f"images/sec/chip @{SIZE}px {suffix} "
                  f"({MODEL}, bf16 fused, batch {BATCH}{regime})")

    # Per-config baseline anchors (ADVICE r4): a speedup ratio is only
    # meaningful against an anchor measured on the SAME model/mode/size/
    # batch/input-regime — the r4 headline silently divided a loaded-regime
    # yolo_heads_m run by the empty-regime yolo_heads_l anchor.  The anchor
    # file now maps config keys to values; the legacy flat record migrates
    # to its own key (it was the empty-regime L@640 b32 pipeline run).
    loaded = bool(os.environ.get("HDT_BENCH_CKPT")) and \
        os.environ.get("HDT_BENCH_INPUT") == "render"
    key = f"{MODEL}|{MODE}|{SIZE}|b{BATCH}|{'loaded' if loaded else 'empty'}"
    anchors = {}
    if os.path.isfile(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                rec = json.load(f)
            anchors = rec.get("anchors", {})
            if not anchors and "value" in rec:  # legacy flat record
                legacy = (f"{rec.get('model', MODEL)}|{rec.get('mode', 'pipeline')}"
                          f"|{rec.get('size', SIZE)}|b{rec.get('batch', BATCH)}|empty")
                anchors = {legacy: float(rec["value"])}
        except Exception:
            anchors = {}
    anchored_this_run = key not in anchors
    if anchored_this_run:
        anchors[key] = images_per_sec
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump({"anchors": anchors,
                           "device": str(jax.devices()[0])}, f, indent=1)
        except OSError:
            pass

    payload = {
        "metric": metric,
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / anchors[key], 3),
        "baseline_key": key,
        "contended": _CONTENDED,
    }
    if anchored_this_run:
        payload["anchored_this_run"] = True
    if _FLOPS_PER_IMAGE > 0:
        from head_detector_tpu.profiling import V5E_BF16_PEAK_FLOPS, mfu

        payload["gflops_per_image"] = round(_FLOPS_PER_IMAGE / 1e9, 2)
        if str(jax.devices()[0].platform) != "cpu":
            payload["bf16_mfu_pct"] = round(
                100.0 * mfu(_FLOPS_PER_IMAGE, images_per_sec), 2
            )
    if _DETS_PER_IMAGE >= 0:
        # workload density the per-detection legs actually saw — ~0 on the
        # default noise input through a random-init net (empty-pipeline
        # regime), >=1 with HDT_BENCH_INPUT=render + a trained HDT_BENCH_CKPT
        payload["detections_per_image"] = round(_DETS_PER_IMAGE, 2)
    if _EMPTY_REGIME_IPS > 0:
        payload["empty_regime_img_s"] = round(_EMPTY_REGIME_IPS, 2)
    if _ckpt_meta:
        payload["ckpt"] = {
            "arch": _ckpt_meta.get("arch"), "step": _ckpt_meta.get("step"),
            "which": _ckpt_meta.get("which"),
        }
    print(json.dumps(payload))


if __name__ == "__main__":
    sys.exit(main())
