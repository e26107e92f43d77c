#!/usr/bin/env python
"""Headline benchmark: map-build throughput (frames/sec) + MFU + e2e fps.

Measures the full TPU map-construction step on the reference's dataset
geometry — 720x1080 RGB-D frames, LSeg ViT-L/16 (bf16 compute, Pallas flash
attention) over the 2-crop sliding window, h*w/100 sampled points per frame,
scatter-accumulate into a gs=1000, vh=30 voxel grid (BASELINE.json config
#2).  Three measurements:

* device fps — the compiled map-update step with frames resident in HBM;
* e2e fps    — the same step fed by PrefetchLoader from real PNG/npy files
  on disk via canvas transport (decode -> host canvas resize + per-point
  gathers -> lean H2D), the pipeline number a user actually sees;
* MFU        — XLA-counted FLOPs per step / elapsed / chip peak.

Also runs an on-chip kernel-parity pass (compiled vs f32 references) so the
benchmark config is numerically validated on the hardware it reports for.

Prints ONE JSON line:
  {"metric": "map_build_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": R, "device_fps": N, "e2e_fps": N, "mfu": F,
   "chip": "...", "kernel_parity": "pass|fail"}

``vs_baseline`` compares against a *measured* reference-style implementation
(the reference repo publishes no numbers — BASELINE.md): a torch-CPU LSeg
forward (same architecture, tools/torch_reference) plus the reference's
per-point Python voxel loop, timed on this host and cached in
tools/baseline_measured.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_CACHE = REPO / "tools" / "baseline_measured.json"

H, W = 720, 1080
DEPTH_SAMPLE_RATE = 100
MAX_PTS = (H * W) // DEPTH_SAMPLE_RATE  # 7776
GS, CS, VH = 1000, 0.05, 30
CAPACITY = 1_000_000
# device batch 8 amortises per-step dispatch/DMA ramp best on v5e: full
# bench measured 56 fps (B=4) -> 62 fps parity and 80 -> 120 fps
# whole-canvas; B=16 adds ~2% more for 2x the step latency (r3 A/B)
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
# whole-canvas is the throughput mode: its step is prep/dispatch-heavier
# per FLOP, so larger batches keep paying (r5 sweep: 144.7 @ B=8 ->
# 153.4 @ B=16 -> 154.9 @ B=32, saturating); B=16 takes most of the win
# at half the latency/HBM of B=32.  Parity mode stays at BATCH.
WHOLE_BATCH = int(os.environ.get("BENCH_WHOLE_BATCH", "16"))
WARMUP_STEPS = 2
TIMED_STEPS = 6
E2E_FRAMES = int(os.environ.get("BENCH_E2E_FRAMES", "64"))

# peak dense bf16 TFLOP/s per chip (public TPU specs)
PEAK_TFLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
}


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat bench runs skip the multi-
    minute ViT-L compiles (first run per machine still pays them)."""
    import jax

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _build_step_and_inputs():
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.map.vlmap_builder import (
        make_frame_step_canvas, make_frame_step_device_sampled)
    from avlmaps_tpu.models.lseg import LSegNet, LSegConfig
    from avlmaps_tpu.models.lseg.window import plan_windows
    from avlmaps_tpu.ops.voxel_fusion import init_fusion_state

    cfg = LSegConfig.vitl16(dtype=jnp.bfloat16)
    model = LSegNet(cfg)
    # device-side init: host->device transfer through the tunnel is slow
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 480, 480, 3), jnp.float32))
    from avlmaps_tpu.models.lseg.model import cast_params_for_inference
    params = cast_params_for_inference(params)

    calib = np.array([[540, 0, 540], [0, 540, 360], [0, 0, 1]], np.float64)
    half_apply = lambda p, x: model.apply(p, x, upsample=False)  # noqa: E731
    # canvas transport (pipeline/transport.py): the production build config —
    # the device consumes the resized canvas + per-point depth/colour gathers
    step = make_frame_step_canvas(half_apply, gs=GS, cs=CS, vh=VH,
                                  calib_mat=calib, image_hw=(H, W),
                                  half_res_apply=True)
    step = jax.jit(step, donate_argnums=(0,))
    # fast mode: one forward over the whole canvas (~2.4x fewer encoder
    # FLOPs; NOT reference-parity — reported as a secondary metric)
    step_whole = make_frame_step_canvas(half_apply, gs=GS, cs=CS, vh=VH,
                                        calib_mat=calib, image_hw=(H, W),
                                        half_res_apply=True,
                                        lseg_eval="whole")
    step_whole = jax.jit(step_whole, donate_argnums=(0,))
    # serving mode: whole-canvas forward + ON-DEVICE point sampling
    # (VERDICT r3 #2) — the producer ships canvas + full-res u16 depth only
    step_whole_ds = make_frame_step_device_sampled(
        half_apply, gs=GS, cs=CS, vh=VH, calib_mat=calib, image_hw=(H, W),
        half_res_apply=True, lseg_eval="whole", max_pts=MAX_PTS)
    step_whole_ds = jax.jit(step_whole_ds, donate_argnums=(0,))
    state = init_fusion_state(GS, VH, 512, CAPACITY)
    ch, cw, _, _, _ = plan_windows(H, W)
    return step, step_whole, step_whole_ds, state, params, (ch, cw)


def measure_device(step, state, params, canvas_hw, batch=None) -> dict:
    """Compiled-step fps with inputs resident in HBM, plus model FLOPs ->
    MFU.  FLOPs = XLA's compiled cost analysis (which counts Pallas custom
    calls as ZERO) + the kernels' own trace-time FLOP log
    (ops/fused_vit.FLOP_LOG) — r3: counted flops collapsed 6.69e12 ->
    1.74e12 when the fused-block kernels landed while the step got FASTER,
    so the custom-call share must be added back explicitly.

    ``batch`` overrides the global BATCH for this leg (the whole-canvas
    throughput mode amortises prep/dispatch further at larger batches —
    r5 sweep in docs/PROFILE.md — while parity mode saturates at 8)."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.map.vlmap_builder import sample_pixels

    BATCH = batch or globals()["BATCH"]  # noqa: N806 - local shadow
    rng = np.random.default_rng(0)
    ch, cw = canvas_hw
    canvas = jnp.asarray(rng.integers(0, 255, (BATCH, ch, cw, 3)), jnp.uint8)
    z_mm = jnp.asarray((rng.uniform(0.3, 5.0, (BATCH, MAX_PTS)) * 1000.0
                        ).astype(np.uint16))
    rgb_pts = jnp.asarray(rng.integers(0, 255, (BATCH, MAX_PTS, 3)),
                          jnp.uint8)
    poses = np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1))
    poses[:, 0, 3] = 0.1 * np.arange(BATCH)
    pose = jnp.asarray(poses)
    fvalid = jnp.ones((BATCH,), bool)

    flops_per_step = None
    try:
        from avlmaps_tpu.ops import fused_vit

        idx0 = jnp.asarray(sample_pixels(rng, H, W, DEPTH_SAMPLE_RATE,
                                         MAX_PTS, BATCH))
        fused_vit.FLOP_LOG.clear()
        cost = step.lower(state, params, canvas, z_mm, rgb_pts, pose, idx0,
                          fvalid).compile().cost_analysis()
        pallas_flops = sum(fused_vit.FLOP_LOG)
        if cost and "flops" in cost:
            flops_per_step = float(cost["flops"]) + pallas_flops
    except Exception:
        pass

    # Pre-stage one index buffer per step in HBM: sample_pixels costs
    # ~3 ms/call of host RNG and the (BATCH, MAX_PTS) upload pays tunnel
    # latency — inside the timed loop both show up as dispatch gaps
    # (traced r3: ~12 ms/step between compute lines), which is pipeline
    # overlap the production loader does on the producer thread and
    # measure_e2e measures separately.  Distinct buffers per step keep
    # the scatter pattern realistic (new voxels every step).
    idx_pool = [
        jax.device_put(sample_pixels(rng, H, W, DEPTH_SAMPLE_RATE,
                                     MAX_PTS, BATCH))
        for _ in range(WARMUP_STEPS + TIMED_STEPS)
    ]
    jax.block_until_ready(idx_pool)

    def one_step(state, k):
        return step(state, params, canvas, z_mm, rgb_pts, pose,
                    idx_pool[k], fvalid)

    # BENCH_SCAN=K > 1: chain K steps inside ONE dispatch with lax.scan
    # over K pre-staged FULL input sets — measures the per-dispatch
    # overhead share (VERDICT r3 #3b).  The production serving loop can do
    # the same with a K-deep staging pipeline; kept as a bench knob since
    # it trades feed latency for dispatch amortisation.  Every per-frame
    # input (canvas included) must vary across the K chained steps:
    # anything loop-invariant gets hoisted out of the scan by XLA and the
    # encoder — the FLOPs — would run once per chain instead of once per
    # step (observed: "MFU 1.38" with a shared canvas).
    scan_k = int(os.environ.get("BENCH_SCAN", "1"))
    total_steps = WARMUP_STEPS + TIMED_STEPS
    if scan_k > 1 and (total_steps % scan_k != 0
                       or total_steps // scan_k < 2):
        # the chain split needs scan_k | total and >= 1 warm + 1 timed
        # chain (BENCH_SCAN=3 crashed the idx reshape; =8 timed an empty
        # loop and reported device_fps=0)
        print(f"BENCH_SCAN={scan_k} invalid for {total_steps} steps "
              f"(must divide it, with >= 2 chains); running unchained",
              file=sys.stderr)
        scan_k = 1
    if scan_k > 1:
        def chain(state, params, xs, fvalid):
            def body(s, x):
                return step(s, params, x["canvas"], x["z"], x["rgb"],
                            x["pose"], x["idx"], fvalid), None
            s, _ = jax.lax.scan(body, state, xs)
            return s

        chain = jax.jit(chain, donate_argnums=(0,))
        n_chain = (WARMUP_STEPS + TIMED_STEPS) // scan_k
        warm_chains = max(1, WARMUP_STEPS // scan_k)
        idx_stack = jnp.stack(idx_pool).reshape(
            -1, scan_k, *idx_pool[0].shape)[:n_chain]
        stacks = []  # one full input set per chain, distinct per scan slot
        for c in range(n_chain):
            r = np.random.default_rng(100 + c)
            stacks.append({
                "canvas": jnp.asarray(
                    r.integers(0, 255, (scan_k, BATCH, ch, cw, 3)),
                    jnp.uint8),
                "z": jnp.asarray((r.uniform(0.3, 5.0, (scan_k, BATCH,
                                                       MAX_PTS)) * 1000.0
                                  ).astype(np.uint16)),
                "rgb": jnp.asarray(
                    r.integers(0, 255, (scan_k, BATCH, MAX_PTS, 3)),
                    jnp.uint8),
                "pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                            (scan_k, BATCH, 1, 1))),
                "idx": idx_stack[c],
            })
        jax.block_until_ready(stacks)

        def one_chain(state, c):
            return chain(state, params, stacks[c], fvalid)

        for c in range(warm_chains):
            state = one_chain(state, c)
        np.asarray(jax.device_get(state.n_slots))  # prime D2H (see below)
        jax.block_until_ready(jax.tree.leaves(state))
        t0 = time.perf_counter()
        for c in range(warm_chains, n_chain):
            state = one_chain(state, c)
        jax.block_until_ready(jax.tree.leaves(state))
        elapsed = time.perf_counter() - t0
        return {
            "device_fps": (n_chain - warm_chains) * scan_k * BATCH / elapsed,
            "chip": jax.devices()[0].device_kind,
            "flops_per_step": flops_per_step,
            "mfu": (flops_per_step * (n_chain - warm_chains) * scan_k
                    / elapsed / PEAK_TFLOPS[jax.devices()[0].device_kind]
                    if flops_per_step and
                    jax.devices()[0].device_kind in PEAK_TFLOPS else None),
            "state": state,
        }

    for k in range(WARMUP_STEPS):
        state = one_step(state, k)
    # prime the tunnel's D2H channel with a real scalar fetch: before the
    # first device_get of a process, block_until_ready can return at
    # DISPATCH (docs/PROFILE.md "Measurement hygiene" #1) — observed r5:
    # an unprimed standalone measure_device read 52k fps.  main()'s
    # earlier phases used to prime this implicitly; do it explicitly so
    # standalone A/B calls measure truthfully too.
    np.asarray(jax.device_get(state.n_slots))
    jax.block_until_ready(jax.tree.leaves(state))  # full-state sync

    t0 = time.perf_counter()
    for k in range(TIMED_STEPS):
        state = one_step(state, WARMUP_STEPS + k)
    jax.block_until_ready(jax.tree.leaves(state))
    elapsed = time.perf_counter() - t0

    chip = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(chip)
    mfu = None
    if flops_per_step and peak:
        mfu = flops_per_step * TIMED_STEPS / elapsed / peak
    return {
        "device_fps": TIMED_STEPS * BATCH / elapsed,
        "chip": chip,
        "flops_per_step": flops_per_step,
        "mfu": mfu,
        "state": state,
    }


_E2E_SCENE = None  # (TemporaryDirectory, Path) — shared by all e2e modes


def _e2e_scene() -> Path:
    """Synthetic on-disk scene for the e2e measurements, generated ONCE:
    three measure_e2e calls (parity / packed / whole-canvas) re-writing
    64 PNGs + 64 npy files each cost ~1-2 min of redundant 1-core host
    work per bench run."""
    global _E2E_SCENE
    if _E2E_SCENE is not None:
        return _E2E_SCENE[1]
    import tempfile

    import cv2

    rng = np.random.default_rng(1)
    tmp = tempfile.TemporaryDirectory()
    root = Path(tmp.name)
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    for i in range(E2E_FRAMES):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"), rgb)
        np.save(root / "depth" / f"{i:06d}.npy",
                rng.uniform(0.3, 5.0, (H, W)).astype(np.float32))
    _E2E_SCENE = (tmp, root)
    return root


def measure_device_sampled(step_ds, state, params, canvas_hw) -> float:
    """Compiled-step fps for the device-sampling serving step with inputs
    resident in HBM (canvas + full-res u16 depth; sampling/gathers on
    device)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    ch, cw = canvas_hw
    canvas = jnp.asarray(rng.integers(0, 255, (BATCH, ch, cw, 3)), jnp.uint8)
    depth = jnp.asarray((rng.uniform(0.3, 5.0, (BATCH, H, W)) * 1000.0
                         ).astype(np.uint16))
    poses = np.tile(np.eye(4, dtype=np.float32), (BATCH, 1, 1))
    poses[:, 0, 3] = 0.1 * np.arange(BATCH)
    pose = jnp.asarray(poses)
    fvalid = jnp.ones((BATCH,), bool)
    fid_pool = [jnp.asarray(np.arange(BATCH, dtype=np.int32) + k * BATCH)
                for k in range(WARMUP_STEPS + TIMED_STEPS)]
    jax.block_until_ready(fid_pool)

    for k in range(WARMUP_STEPS):
        state = step_ds(state, params, canvas, depth, pose, fid_pool[k],
                        fvalid)
    jax.block_until_ready(jax.tree.leaves(state))
    t0 = time.perf_counter()
    for k in range(TIMED_STEPS):
        state = step_ds(state, params, canvas, depth, pose,
                        fid_pool[WARMUP_STEPS + k], fvalid)
    jax.block_until_ready(jax.tree.leaves(state))
    return TIMED_STEPS * BATCH / (time.perf_counter() - t0)


def measure_e2e_device_sampled(step_ds, state, params, canvas_hw) -> float:
    """Serving-mode e2e: packed scene -> RawCanvasBatch (pure memmap copy,
    ZERO per-point host work) -> device-sampled step.  The configuration
    VERDICT r3 #2 calls for."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.pipeline.packed import (PackedLoader, PackedScene,
                                             pack_scene)

    root = _e2e_scene()
    pack_path = root / "scene_raw.avpack"
    if not pack_path.exists():
        pack_scene(sorted((root / "rgb").glob("*.png")),
                   sorted((root / "depth").glob("*.npy")),
                   pack_path, canvas_hw=canvas_hw)
    pose_tfs = [np.eye(4, dtype=np.float32) for _ in range(E2E_FRAMES)]
    loader = PackedLoader(PackedScene(pack_path), pose_tfs,
                          batch_size=BATCH, raw_canvas=True,
                          device_put=True)

    def run_epoch():
        nonlocal state
        done = 0
        t0 = None
        for batch in loader:
            state = step_ds(state, params, jnp.asarray(batch.canvas),
                            jnp.asarray(batch.depth_mm),
                            jnp.asarray(batch.pose_tf),
                            jnp.asarray(batch.frame_ids),
                            jnp.asarray(batch.frame_ids >= 0))
            if t0 is None:
                jax.block_until_ready(jax.tree.leaves(state))
                t0 = time.perf_counter()
                continue
            done += int((batch.frame_ids >= 0).sum())
        jax.block_until_ready(jax.tree.leaves(state))
        return done / (time.perf_counter() - t0)

    rates = sorted(run_epoch() for _ in range(3))
    return {"median": rates[1], "min": rates[0], "max": rates[2], "n": 3}


def measure_e2e(step, state, params, canvas_hw, device_put=True,
                packed=False) -> float:
    """End-to-end pipeline fps: PNG/npy decode + canvas prep on the host
    (PrefetchLoader + canvas transform on the producer thread) -> lean
    transfer -> compiled step.  The number a map build sees.

    ``device_put=True`` ships batches to the device on the producer thread
    (overlapping H2D with the next batch's decode) — the production
    configuration.

    ``packed=True`` measures the packed-scene ingestion path instead
    (pipeline/packed.py): the scene is converted once (untimed — a real
    deployment packs a scene once and builds from it repeatedly) and
    streamed via PackedLoader with zero decode/resize work per build."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.map.vlmap_builder import sample_pixels
    from avlmaps_tpu.pipeline.loader import PrefetchLoader
    from avlmaps_tpu.pipeline.transport import make_canvas_transform

    rng = np.random.default_rng(1)
    root = _e2e_scene()
    pose_tfs = [np.eye(4, dtype=np.float32) for _ in range(E2E_FRAMES)]

    if packed:
        from avlmaps_tpu.pipeline.packed import (PackedLoader, PackedScene,
                                                 pack_scene)

        pack_path = pack_scene(sorted((root / "rgb").glob("*.png")),
                               sorted((root / "depth").glob("*.npy")),
                               root / "scene.avpack", canvas_hw=canvas_hw)
        loader = PackedLoader(
            PackedScene(pack_path), pose_tfs, batch_size=BATCH,
            sampler=lambda b: sample_pixels(rng, H, W, DEPTH_SAMPLE_RATE,
                                            MAX_PTS, b),
            device_put=device_put)
    else:
        transform = make_canvas_transform(
            lambda b: sample_pixels(rng, H, W, DEPTH_SAMPLE_RATE, MAX_PTS, b),
            canvas_hw)
        loader = PrefetchLoader(
            sorted((root / "rgb").glob("*.png")),
            sorted((root / "depth").glob("*.npy")),
            pose_tfs, batch_size=BATCH, normalize=False, transform=transform,
            device_put=device_put)

    # steady-state rate: the first batch of each epoch absorbs the
    # producer-thread spin-up (queue fill, page-cache warm) and is excluded
    # from the timed window — a real build amortises it over thousands of
    # frames.  Three epochs, median + min/max (VERDICT r4 #7): the ~2 s
    # timed window per epoch is exposed to axon-tunnel tenancy stalls
    # (observed ±30% run-to-run), and a single best-of point estimate made
    # round-over-round regressions indistinguishable from noise.
    def run_epoch():
        nonlocal state
        done = 0
        t0 = None
        for batch in loader:
            state = step(state, params, jnp.asarray(batch.canvas),
                         jnp.asarray(batch.z_mm), jnp.asarray(batch.rgb_pts),
                         jnp.asarray(batch.pose_tf),
                         jnp.asarray(batch.sample_idx),
                         jnp.asarray(batch.frame_ids >= 0))
            if t0 is None:  # first (warmup) batch: start the clock after it
                jax.block_until_ready(jax.tree.leaves(state))
                t0 = time.perf_counter()
                continue
            done += int((batch.frame_ids >= 0).sum())
        jax.block_until_ready(jax.tree.leaves(state))
        return done / (time.perf_counter() - t0)

    rates = sorted(run_epoch() for _ in range(3))
    return {"median": rates[1], "min": rates[0], "max": rates[2], "n": 3}


def measure_queries() -> dict:
    """Open-vocabulary indexing throughput (BASELINE.md metric #2):
    score a 1M-voxel map against a 21-category (+other) text matrix with
    the fused normalize+matmul+argmax kernel (ops.similarity.score_argmax)
    — the reference's index_map hot path (avlmaps/map/vlmap.py:104-125,
    utils/clip_utils.py:196-242, CPU numpy there).  Also measures the
    reference-style numpy matmul once on this host for the ratio."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.ops.similarity import score_argmax

    n_vox, n_cat = 1_000_000, 22
    rng = np.random.default_rng(2)
    # synthesize the 2 GB map ON DEVICE: shipping it host->device through
    # the axon tunnel took minutes and was the single longest bench phase
    feats = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(2), (n_vox, 512),
                                  jnp.float32))()
    texts = jnp.asarray(rng.normal(size=(8, n_cat, 512)).astype(np.float32))

    def one_query(feats, text):
        return score_argmax(feats, text, normalize_map=True,
                            normalize_text=True)

    # warm/compile; the np.asarray also primes the tunnel's D2H channel —
    # before the first device_get, block_until_ready can return early and
    # timings read as pure dispatch
    np.asarray(one_query(feats, texts[0])[:1])
    # dispatch a stream of queries and block once: amortises the tunnel
    # round-trip like a real interactive session (per-call sync would
    # measure mostly RTT)
    t0 = time.perf_counter()
    outs = [one_query(feats, texts[i]) for i in range(8)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 8

    # host-side numpy reference (one rep is enough — seconds per query).
    # Independent host-generated values: fetching a slice of the device
    # array back through the tunnel cost ~200 MB of D2H for a pure
    # throughput comparator
    f_np = rng.normal(size=(100_000, 512)).astype(np.float32)
    t_np = np.asarray(texts[0])
    t0 = time.perf_counter()
    fn = f_np / np.linalg.norm(f_np, axis=1, keepdims=True)
    tn = t_np / np.linalg.norm(t_np, axis=1, keepdims=True)
    (fn @ tn.T).argmax(axis=1)
    host_per_query = (time.perf_counter() - t0) * (n_vox / 100_000)

    return {
        "query_qps": 1.0 / dt,
        "query_ms": dt * 1e3,
        "query_vs_host_numpy": host_per_query / dt,
    }


def measure_full_query() -> dict:
    """BASELINE.md metric #2 measured as it is *named*: the FULL
    ``index_object`` query at production scale, in its SERVING form
    (VERDICT r4 #1) — one fused device program per query (CLIP text encode
    of the 64-template ensemble -> score+argmax against the resident
    category matrix -> banded dense 3D EDT heat -> goal + top-k delivery
    heads, ops/delivery.make_text_object_query), pipelined with async
    fetches of the ~1 KB payloads.  The reference's counterpart is a torch
    text encode + CPU numpy matmul + the O(N*M) Python heat loop
    (avlmaps/utils/{clip_utils.py:229, visualize_utils.py:29-49}),
    measured on this host in tools/baseline_measured.json ["query"].

    ``full_query_qps`` = the goal/top-k-delivered serving rate (median
    over 3 epochs, with min/max spread — VERDICT r4 #7); the f32-density
    and u8-density delivered rates and the per-stage decomposition are
    reported alongside."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.clip import ClipEncoder
    from avlmaps_tpu.ops.delivery import (fetch_np, fused_goal_pick,
                                          make_text_object_query,
                                          quantize_heat_u8)
    from avlmaps_tpu.ops.heatmap import (decayed_point_heatmap_2d,
                                         heatmap_from_mask_2d,
                                         heatmap_from_mask_3d)
    from avlmaps_tpu.ops.similarity import score_argmax

    n_vox, n_cat = 1_000_000, 22
    rng = np.random.default_rng(4)
    key = jax.random.PRNGKey(4)
    feats = jax.jit(lambda: jax.random.normal(key, (n_vox, 512),
                                              jnp.float32))()
    grid_pos = jax.jit(lambda: jnp.stack([
        jax.random.randint(jax.random.fold_in(key, 1), (n_vox,), 0, GS),
        jax.random.randint(jax.random.fold_in(key, 2), (n_vox,), 0, GS),
        jax.random.randint(jax.random.fold_in(key, 3), (n_vox,), 0, VH),
    ], axis=1).astype(jnp.int32))()
    texts = jnp.asarray(rng.normal(size=(n_cat, 512)).astype(np.float32))
    other = texts[1:]  # resident category matrix the query competes with
    jax.block_until_ready((feats, grid_pos, texts))
    out = {}

    def timed(fn, reps=4):
        # best of two pipelined passes (reps stay unsynced inside a pass so
        # dispatch overlaps execution): tunnel tenancy stalls only ever
        # slow a pass down (observed 2x on the heat legs vs controlled
        # standalone runs), so the faster pass is the honest capability
        # estimate — same reasoning as measure_e2e's epochs
        fn()  # warm/compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rs = [fn() for _ in range(reps)]
            jax.block_until_ready(rs)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    enc = ClipEncoder("ViT-B/32")
    words = ["chair", "table", "sofa", "bed", "plant", "toilet", "tv",
             "sink"]

    # ---- the named metric: fused serving query, lean delivery ----------
    query = make_text_object_query(enc, (GS, GS, VH), cell_size=CS,
                                   decay_rate=0.01, k=64, with_topk=True)

    def serving_epoch(fetch_keys=("goal_pos", "topk_vals", "topk_pos")):
        t0 = time.perf_counter()
        outs = []
        for w in words:
            o = query(w, feats, grid_pos, other)
            for kk in fetch_keys:
                start = getattr(o[kk], "copy_to_host_async", None)
                if start:
                    start()
            outs.append(o)
        for o in outs:
            fetch_np(*(o[kk] for kk in fetch_keys))
        return len(words) / (time.perf_counter() - t0)

    serving_epoch()  # compile + warm
    rates = sorted(serving_epoch() for _ in range(3))
    out["full_query_qps"] = round(rates[1], 2)
    out["full_query_qps_spread"] = {"min": round(rates[0], 2),
                                    "max": round(rates[-1], 2), "n": 3}
    out["full_query_sync_latency_ms"] = round(timed(
        lambda: fetch_np(query(words[0], feats, grid_pos,
                               other)["goal_pos"]), reps=3), 2)

    # device-goal parity: the fused program's goal == host argmax over the
    # host-delivered f32 heat (the contract tests/test_delivery.py pins at
    # small scale, re-checked at production scale on this chip)
    o = query(words[0], feats, grid_pos, other)
    heat_host, goal_dev = fetch_np(o["heat"], o["goal_pos"])
    goal_host = np.asarray(grid_pos[int(np.argmax(heat_host))])
    out["goal_parity"] = "pass" if np.array_equal(goal_dev, goal_host) \
        else f"FAIL dev={goal_dev.tolist()} host={goal_host.tolist()}"

    # u8 density delivery (visualisation-grade, 1 MB/query on the wire)
    query_u8 = make_text_object_query(enc, (GS, GS, VH), cell_size=CS,
                                      decay_rate=0.01, with_u8=True,
                                      with_topk=False)

    def u8_epoch():
        t0 = time.perf_counter()
        outs = []
        for w in words[:4]:
            o = query_u8(w, feats, grid_pos, other)
            start = getattr(o["heat_u8"], "copy_to_host_async", None)
            if start:
                start()
            outs.append(o)
        for o in outs:
            fetch_np(o["heat_u8"])
        return 4 / (time.perf_counter() - t0)

    u8_epoch()
    out["full_query_qps_u8"] = round(max(u8_epoch(), u8_epoch()), 2)

    # on-device cross-modal goal pick over resident per-modality heats
    # (reference get_map_3d x get_major_map_3d -> get_max_pos_3d)
    heat_a = o["heat"]  # resident f32 heat from the parity query above
    heat_b = jax.jit(lambda k: jax.random.uniform(k, (n_vox,)))(
        jax.random.fold_in(key, 9))
    out["goal_pick_ms"] = round(timed(
        lambda: fetch_np(fused_goal_pick([heat_a, heat_b], grid_pos)[0]),
        reps=4), 2)

    # ---- per-stage decomposition (the staged path, for the profile) ----
    out["text_encode_ms"] = round(timed(
        lambda: enc.get_text_feats_multiple_templates(["chair"],
                                                      as_device=True),
        reps=3), 2)

    @jax.jit
    def query_mask(f, t):
        return score_argmax(f, t, normalize_map=True,
                            normalize_text=True) == 0

    out["score_mask_ms"] = round(timed(lambda: query_mask(feats, texts)), 2)
    mask_real = query_mask(feats, texts)
    jax.block_until_ready(mask_real)
    m_real = int(jax.device_get(mask_real.sum()))

    heat_kw = dict(cell_size=CS, decay_rate=0.01, method="dense",
                   lattice_unit=1.0, grid_shape=(GS, GS, VH))
    out["heat_ms_device"] = round(timed(
        lambda: heatmap_from_mask_3d(grid_pos, mask_real, as_device=True,
                                     **heat_kw)), 2)
    out["heat_ms_host"] = round(timed(
        lambda: heatmap_from_mask_3d(grid_pos, mask_real, **heat_kw),
        reps=3), 2)
    out["heat_targets"] = m_real

    # heat-stage scaling at controlled target sizes (auto path choice)
    for m_t in (1_000, 10_000, 100_000):
        mask_m = jnp.arange(n_vox) < m_t
        jax.block_until_ready(mask_m)
        out[f"heat_ms_m{m_t}"] = round(timed(
            lambda: heatmap_from_mask_3d(grid_pos, mask_m, cell_size=CS,
                                         decay_rate=0.01, lattice_unit=1.0,
                                         as_device=True), reps=3), 2)

    # legacy composite: f32 density delivered to host numpy (the r3/r4
    # full_query_qps definition, kept for round-over-round comparability)
    enc_ms = out.get("text_encode_ms", 0.0)
    out["full_query_qps_f32"] = round(
        1e3 / (out["score_mask_ms"] + out["heat_ms_host"] + enc_ms), 2)
    out["full_query_qps_device_cached_text"] = round(
        1e3 / (out["score_mask_ms"] + out["heat_ms_device"]), 2)

    # D2H diagnostics: one fresh 4 MB f32 and 1 MB u8 through this host's
    # link — the gap between device and host-delivered density rates is
    # this transfer, not kernel time (~100 ms fixed-ish on the axon
    # tunnel regardless of 1 vs 4 MB; PCIe hosts see <1 ms)
    fresh = [jax.jit(lambda k: jax.random.normal(k, (n_vox,)))(
        jax.random.fold_in(key, 100 + i)) for i in range(3)]
    jax.block_until_ready(fresh)
    t0 = time.perf_counter()
    for a in fresh:
        np.asarray(jax.device_get(a))
    out["d2h_4mb_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)
    fresh8 = [jax.jit(lambda k: (jax.random.uniform(k, (n_vox,)) * 255
                                 ).astype(jnp.uint8))(
        jax.random.fold_in(key, 200 + i)) for i in range(3)]
    jax.block_until_ready(fresh8)
    t0 = time.perf_counter()
    for a in fresh8:
        np.asarray(jax.device_get(a))
    out["d2h_1mb_u8_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)

    # ---- 2D query legs at the production grid (VERDICT r4 #3) ----------
    # device composites (one fused program each, normalisation included —
    # what the robot fusion path consumes) and the u8-wire delivered
    # variants (floor-bound by the link: see d2h_1mb_u8_ms)
    tracks = [rng.uniform(0, GS, (16, 2)).astype(np.float32)
              for _ in range(8)]
    confs = rng.uniform(0.2, 1.0, 8).astype(np.float32)
    out["sound_query_ms_device"] = round(timed(
        lambda: decayed_point_heatmap_2d((GS, GS), tracks, confs, 0.01,
                                         combine="sum", normalize=True,
                                         as_device=True), reps=3), 2)
    out["sound_query_ms"] = round(timed(
        lambda: np.asarray(quantize_heat_u8(decayed_point_heatmap_2d(
            (GS, GS), tracks, confs, 0.01, combine="sum", normalize=True,
            as_device=True))), reps=3), 2)
    mask2d = np.zeros((GS, GS), bool)
    mask2d[rng.integers(0, GS, 400), rng.integers(0, GS, 400)] = True
    out["edt2d_ms_device"] = round(timed(
        lambda: heatmap_from_mask_2d(mask2d, cell_size=CS,
                                     decay_rate=0.01, as_device=True),
        reps=3), 2)
    out["edt2d_ms"] = round(timed(
        lambda: np.asarray(quantize_heat_u8(heatmap_from_mask_2d(
            mask2d, cell_size=CS, decay_rate=0.01, as_device=True))),
        reps=3), 2)
    return out


def measure_audio() -> dict:
    """AudioCLIP sound-encoding throughput (driver config #3): the
    reference encodes 5 s 44.1 kHz clips in batches of 10 through
    ESResNeXt-FBSP on the host/GPU (avlmaps/utils/audio_utils.py:612-625,
    sound_map.py:41-47); here the full tower runs jitted on the chip."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.audioclip import AudioClip, AudioClipConfig

    cfg = AudioClipConfig()
    model = AudioClip(cfg)
    B, L = 10, 220500  # reference batch size x 5 s @ 44.1 kHz
    rng = np.random.default_rng(3)
    clips = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    params = jax.jit(lambda k, x: model.init(
        k, x, method=AudioClip.encode_audio))(jax.random.PRNGKey(0), clips)
    fwd = jax.jit(lambda p, x: model.apply(
        p, x, method=AudioClip.encode_audio))
    np.asarray(fwd(params, clips)[:1])  # compile + prime D2H sync
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fwd(params, clips))
    dt = (time.perf_counter() - t0) / reps
    return {"audio_clips_per_sec": B / dt,
            "audio_batch_ms": dt * 1e3}


def kernel_parity() -> dict:
    """On-chip numerics: compiled kernels vs f32 references (VERDICT item
    2).  Runs on whatever backend bench runs on — the real chip."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.lseg.vit import ViTBlock
    from avlmaps_tpu.ops.similarity import score_features
    from avlmaps_tpu.ops.voxel_fusion import (
        fuse_points, init_fusion_state, export_fusion_state)

    rng = np.random.default_rng(0)
    out = {}

    # 1. fused score kernel vs f32 jnp
    feats = rng.normal(size=(4096, 512)).astype(np.float32)
    text = rng.normal(size=(16, 512)).astype(np.float32)
    got = np.asarray(score_features(jnp.asarray(feats), jnp.asarray(text),
                                    normalize_map=True, normalize_text=True))
    fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    tn = text / np.linalg.norm(text, axis=1, keepdims=True)
    out["score_kernel_max_err"] = float(np.abs(got - fn @ tn.T).max())

    # 2. one fuse_points step vs the numpy oracle
    n, d = 4096, 64
    vids = rng.integers(0, 50 * 50 * 8, n).astype(np.int32)
    f = rng.normal(size=(n, d)).astype(np.float32)
    rgbs = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    alphas = rng.uniform(0.1, 1.0, n).astype(np.float32)
    valid = rng.uniform(size=n) < 0.9
    st = init_fusion_state(50, 8, d, 8192)
    st = fuse_points(st, jnp.asarray(vids), jnp.asarray(f),
                     jnp.asarray(rgbs), jnp.asarray(alphas),
                     jnp.asarray(valid), gs=50, vh=8)
    gf, gp, wt, occ, _ = export_fusion_state(st, 50, 8)
    # numpy oracle: associative weighted mean per voxel id
    acc: dict = {}
    for i in np.nonzero(valid)[0]:
        sf, sw = acc.get(vids[i], (0.0, 0.0))
        acc[vids[i]] = (sf + alphas[i] * f[i], sw + alphas[i])
    errs = []
    for vid, (sf, sw) in acc.items():
        r, c, hh = (vid // (50 * 8), (vid // 8) % 50, vid % 8)
        slot = occ[r, c, hh]
        errs.append(np.abs(gf[slot] - sf / sw).max())
    out["fusion_max_err"] = float(np.max(errs))
    out["fusion_voxels"] = len(acc)

    # 3. flash attention vs f32 einsum at the eval shape.  Inputs are
    # scaled to a trained ViT-L's residual-stream RMS (~2.5 at depth for
    # CLIP-pretrained backbones) rather than unit-normal noise, and the
    # error is reported RELATIVE to the output RMS — an absolute bf16 error
    # alone overstates precision on small-magnitude outputs and understates
    # it on large ones (VERDICT r2 next #10).
    trained_rms = 2.5
    blk_flash = ViTBlock(256, 4, 4, 1e-6, jnp.bfloat16, attn_impl="flash")
    blk_ein = ViTBlock(256, 4, 4, 1e-6, jnp.bfloat16, attn_impl="einsum")
    x = jnp.asarray(rng.normal(size=(2, 901, 256)).astype(np.float32)
                    * trained_rms, jnp.bfloat16)
    variables = blk_flash.init(jax.random.PRNGKey(0), x)
    a = np.asarray(blk_flash.apply(variables, x), np.float32)
    b = np.asarray(blk_ein.apply(variables, x), np.float32)
    out["flash_attn_max_err"] = float(np.abs(a - b).max())
    out_rms = float(np.sqrt(np.mean(b * b)))
    out["flash_attn_rel_err"] = out["flash_attn_max_err"] / max(out_rms,
                                                                1e-12)
    out["flash_attn_out_rms"] = out_rms

    # 4. fully-fused block (ops/fused_vit.py — the production default) vs
    # the same einsum reference, same trained-RMS inputs.  The fused path
    # runs at the token count padded to the next 8-multiple (Mosaic sublane
    # constraint; DenseViT pads before the first block), so pad here the
    # same way and compare only the real rows.
    blk_fused = ViTBlock(256, 4, 4, 1e-6, jnp.bfloat16, attn_impl="fused")
    t_real = x.shape[1]
    xp = jnp.pad(x, [(0, 0), (0, (-t_real) % 8), (0, 0)])
    c = np.asarray(blk_fused.apply(variables, xp, t_real),
                   np.float32)[:, :t_real]
    out["fused_block_max_err"] = float(np.abs(c - b).max())
    out["fused_block_rel_err"] = out["fused_block_max_err"] / max(out_rms,
                                                                  1e-12)

    # 5. sorted-segment dedup scatter (the TPU-default fusion scatter) vs
    # the XLA scatter on identical batches; real slots must match exactly
    # up to f32 add order.  d=128 so the accumulator width (d+128) is a
    # lane multiple — the compiled-kernel path, as in production (d=512)
    d5 = 128
    f5 = rng.normal(size=(n, d5)).astype(np.float32)
    st_ref5 = init_fusion_state(50, 8, d5, 8192)
    st_ref5 = fuse_points(st_ref5, jnp.asarray(vids), jnp.asarray(f5),
                          jnp.asarray(rgbs), jnp.asarray(alphas),
                          jnp.asarray(valid), gs=50, vh=8)
    st_ded = init_fusion_state(50, 8, d5, 8192)
    st_ded = fuse_points(st_ded, jnp.asarray(vids), jnp.asarray(f5),
                         jnp.asarray(rgbs), jnp.asarray(alphas),
                         jnp.asarray(valid), gs=50, vh=8,
                         dedup_scatter=True)
    n_slots = int(st_ref5.n_slots)
    out["dedup_scatter_max_err"] = float(np.abs(
        np.asarray(st_ded.accum)[:n_slots]
        - np.asarray(st_ref5.accum)[:n_slots]).max())

    ok = (out["score_kernel_max_err"] < 5e-2
          and out["fusion_max_err"] < 1e-3
          and out["flash_attn_rel_err"] < 0.05
          and out["fused_block_rel_err"] < 0.05
          and out["dedup_scatter_max_err"] < 1e-3)
    out["status"] = "pass" if ok else "fail"
    return out


def measure_reference_baseline() -> dict:
    """Reference-style per-frame cost on this host (cached once).

    = torch-CPU LSeg forward over the 2 sliding-window crops
      (reference lseg_utils.py:77-96)
    + the per-point Python voxel-update loop over h*w/100 points
      (reference vlmap_builder.py:136-178).
    """
    import torch
    from tools.torch_reference.lseg_torch import (
        TorchLSegSpec, build_torch_lseg,
    )

    torch.set_num_threads(os.cpu_count() or 1)
    model = build_torch_lseg(TorchLSegSpec(), seed=0)
    x = torch.randn(1, 3, 480, 480)
    with torch.no_grad():
        t0 = time.perf_counter()
        model(x)
        lseg_s = time.perf_counter() - t0

    # reference inner loop semantics on MAX_PTS points
    rng = np.random.default_rng(0)
    pc_local = rng.uniform(-2, 2, (MAX_PTS, 3))
    pc_global = pc_local + np.array([1.0, 2.0, 0.5])
    feats = rng.normal(size=(512, 347, 520)).astype(np.float32)
    calib = np.array([[540, 0, 540], [0, 540, 360], [0, 0, 1]], np.float64)
    feat_intr = np.array([[260, 0, 260], [0, 260, 173.5], [0, 0, 1]])
    grid_feat = np.zeros((CAPACITY, 512), np.float32)
    grid_rgb = np.zeros((CAPACITY, 3), np.float32)
    weight = np.zeros((CAPACITY,), np.float32)
    grid_pos = np.zeros((CAPACITY, 3), np.int32)
    occupied = -np.ones((200, 200, VH), np.int32)
    rgbim = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    max_id = 0
    t0 = time.perf_counter()
    for i in range(MAX_PTS):
        p, pl = pc_global[i], pc_local[i]
        row = int(200 / 2 - int(p[0] / CS))
        col = int(200 / 2 - int(p[1] / CS))
        hh = int(p[2] / CS)
        if row < 0 or row >= 200 or col < 0 or col >= 200 or hh < 0 \
                or hh >= VH:
            continue
        q = calib @ pl.reshape(3, 1)
        px, py = int(q[0, 0] / q[2, 0] - 0.5), int(q[1, 0] / q[2, 0] - 0.5)
        rgb_v = rgbim[py % H, px % W]
        q = feat_intr @ pl.reshape(3, 1)
        px, py = int(q[0, 0] / q[2, 0] - 0.5), int(q[1, 0] / q[2, 0] - 0.5)
        if px < 0 or py < 0 or px >= 520 or py >= 347:
            continue
        feat = feats[:, py, px]
        alpha = float(np.exp(-np.sum(np.square(pl)) / 1.2))
        oid = occupied[row, col, hh]
        if oid == -1:
            occupied[row, col, hh] = max_id
            grid_feat[max_id] = feat * alpha
            grid_rgb[max_id] = rgb_v
            weight[max_id] += alpha
            grid_pos[max_id] = [row, col, hh]
            max_id += 1
        else:
            grid_feat[oid] = (grid_feat[oid] * weight[oid] + feat * alpha) \
                / (weight[oid] + alpha)
            weight[oid] += alpha
    loop_s = time.perf_counter() - t0

    n_crops = 2  # plan_windows(720, 1080) -> 2 windows
    per_frame = lseg_s * n_crops + loop_s
    return {
        "lseg_forward_s_per_crop": lseg_s,
        "python_voxel_loop_s_per_frame": loop_s,
        "crops_per_frame": n_crops,
        "reference_s_per_frame": per_frame,
        "reference_fps": 1.0 / per_frame,
        "host": "cpu",
        "note": "reference repo publishes no benchmarks; this is the "
                "reference-style pipeline (torch LSeg fwd + python voxel "
                "loop) measured on this host's CPU",
    }


def measure_reference_query_baseline() -> dict:
    """Reference-style FULL index_object query cost on this host (metric #2's
    denominator, cached once — VERDICT r4 #2).

    = torch-CPU CLIP text encode of the 64-template ensemble
      (reference get_text_feats_multiple_templates,
       avlmaps/utils/clip_utils.py:133-159, per query)
    + numpy normalise + ``map_feats @ text_feats.T`` + argmax at N=1e6, C=22
      (avlmaps/utils/clip_utils.py:229, avlmaps/map/vlmap.py:123)
    + the O(N*M) per-point Python heat loop at M=N/22 targets
      (avlmaps/utils/visualize_utils.py:29-49), timed on a subsample and
      extrapolated linearly (the loop is embarrassingly per-point).
    """
    import torch
    from tools.torch_reference.clip_torch import TorchClipText

    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    model = TorchClipText().eval()
    tokens = torch.randint(1, 49406, (64, 77))
    with torch.no_grad():
        model(tokens[:8])  # warm
        t0 = time.perf_counter()
        model(tokens)
        text_s = time.perf_counter() - t0

    n_vox, n_cat, d = 1_000_000, 22, 512
    rng = np.random.default_rng(0)
    n_sub = 200_000  # matmul cost is linear in N; 2 GB of f32 rows is slow
    f = rng.normal(size=(n_sub, d)).astype(np.float32)
    t = rng.normal(size=(n_cat, d)).astype(np.float32)
    t0 = time.perf_counter()
    fn = f / np.linalg.norm(f, axis=1, keepdims=True)
    tn = t / np.linalg.norm(t, axis=1, keepdims=True)
    (fn @ tn.T).argmax(axis=1)
    score_s = (time.perf_counter() - t0) * (n_vox / n_sub)

    # heat loop: per non-target point, min distance over ALL target points
    m = n_vox // n_cat  # argmax mask size at C=22
    n_probe = 2_000
    targets = rng.uniform(0, 1000, (m, 3)).astype(np.float32)
    probes = rng.uniform(0, 1000, (n_probe, 3)).astype(np.float32)
    cs, decay = 0.05, 0.01
    t0 = time.perf_counter()
    for i in range(n_probe):
        dist = np.sqrt(((targets - probes[i]) ** 2).sum(axis=1)).min()
        max(1.0 - dist / cs * decay, 0.0)
    heat_s = (time.perf_counter() - t0) * ((n_vox - m) / n_probe)

    total = text_s + score_s + heat_s
    return {
        "text_encode_s": text_s,
        "score_argmax_s": score_s,
        "heat_loop_s": heat_s,
        "heat_loop_probe_points": n_probe,
        "heat_targets": m,
        "reference_query_s": total,
        "reference_query_qps": 1.0 / total,
        "host": "cpu",
        "note": "reference repo publishes no benchmarks; this is the "
                "reference-style full index_object query (torch CLIP text "
                "encode + numpy score/argmax + O(N*M) python heat loop) "
                "measured on this host's CPU, heat loop extrapolated from "
                "a subsample",
    }


def get_baseline() -> dict:
    baseline = {}
    if BASELINE_CACHE.exists():
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)
    dirty = False
    if "reference_fps" not in baseline:
        baseline.update(measure_reference_baseline())
        dirty = True
    if "query" not in baseline:
        baseline["query"] = measure_reference_query_baseline()
        dirty = True
    if dirty:
        BASELINE_CACHE.parent.mkdir(exist_ok=True)
        with open(BASELINE_CACHE, "w") as f:
            json.dump(baseline, f, indent=2)
    return baseline


def main():
    import signal

    t_start = time.perf_counter()
    _last = [t_start]

    def _phase(name):
        now = time.perf_counter()
        print(f"[bench] {name}: {now - _last[0]:.1f}s "
              f"(total {now - t_start:.1f}s)", file=sys.stderr, flush=True)
        _last[0] = now

    # metrics land in `out` as each phase finishes; a timeout kill
    # (SIGTERM) emits whatever is complete so the headline device number
    # survives tunnel-tenancy collapses that stretch the tail phases
    # (observed: identical code ran 4.8 min and >10 min hours apart)
    out = {"metric": "map_build_fps", "value": None, "unit": "frames/sec",
           "vs_baseline": None, "vs_baseline_query": None,
           "device_fps": None, "e2e_fps": None,
           "e2e_fps_packed": None, "mfu": None, "flops_per_step": None,
           "chip": None, "device_fps_whole_canvas": None,
           "e2e_fps_whole_canvas": None, "device_fps_whole_canvas_ds": None,
           "e2e_fps_whole_canvas_ds": None,
           "e2e_fps_whole_canvas_decode": None, "query_qps": None,
           "full_query_qps": None, "full_query_detail": None,
           "audio_clips_per_sec": None, "query_vs_host_numpy": None,
           "kernel_parity": None, "kernel_parity_detail": None}
    emitted = [False]

    def _emit():
        if not emitted[0]:
            emitted[0] = True
            print(json.dumps(out), flush=True)

    def _on_term(signum, frame):
        print(f"[bench] signal {signum}: emitting partial result",
              file=sys.stderr, flush=True)
        _emit()
        os._exit(0)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, OSError):
        pass  # non-main thread / restricted env: emit-on-finish only

    _enable_compile_cache()
    (step, step_whole, step_whole_ds, state, params,
     canvas_hw) = _build_step_and_inputs()
    _phase("build+init")
    dev = measure_device(step, state, params, canvas_hw)
    out["value"] = out["device_fps"] = round(dev["device_fps"], 3)
    out["mfu"] = round(dev["mfu"], 4) if dev.get("mfu") else None
    out["flops_per_step"] = dev.get("flops_per_step")
    out["chip"] = dev.get("chip")
    baseline = None
    try:
        baseline = get_baseline()
        out["vs_baseline"] = round(
            dev["device_fps"] / baseline["reference_fps"], 2)
    except Exception as e:  # noqa: BLE001 - never fail the bench on baseline
        print(f"baseline measurement failed: {e}", file=sys.stderr)
    _phase("device parity")
    whole = None
    try:
        from avlmaps_tpu.ops.voxel_fusion import init_fusion_state

        wstate = init_fusion_state(GS, VH, 512, CAPACITY)
        whole = measure_device(step_whole, wstate, params, canvas_hw,
                               batch=WHOLE_BATCH)
        whole.pop("state", None)
        out["device_fps_whole_canvas"] = round(whole["device_fps"], 3)
        out["whole_canvas_batch"] = WHOLE_BATCH
    except Exception as e:  # noqa: BLE001 - secondary metric only
        print(f"whole-canvas measurement failed: {e}", file=sys.stderr)
    _phase("device whole-canvas")
    try:
        parity = kernel_parity()
    except Exception as e:  # noqa: BLE001
        parity = {"status": f"error: {e}"}
    out["kernel_parity"] = parity.get("status")
    out["kernel_parity_detail"] = {k: v for k, v in parity.items()
                                   if k != "status"}
    _phase("kernel parity")
    def _set_e2e(key, stats):
        out[key] = round(stats["median"], 3)
        out[key + "_spread"] = {"min": round(stats["min"], 3),
                                "max": round(stats["max"], 3),
                                "n": stats["n"]}

    try:
        _set_e2e("e2e_fps",
                 measure_e2e(step, dev.pop("state"), params, canvas_hw))
    except Exception as e:  # noqa: BLE001 - report device fps regardless
        dev.pop("state", None)
        print(f"e2e measurement failed: {e}", file=sys.stderr)
    _phase("e2e parity")
    try:
        from avlmaps_tpu.ops.voxel_fusion import init_fusion_state

        _set_e2e("e2e_fps_packed",
                 measure_e2e(step, init_fusion_state(GS, VH, 512, CAPACITY),
                             params, canvas_hw, packed=True))
    except Exception as e:  # noqa: BLE001 - secondary metric only
        print(f"packed e2e measurement failed: {e}", file=sys.stderr)
    _phase("e2e packed")
    if whole is not None:
        # serving mode (VERDICT r3 #2).  Three producers for the whole-
        # canvas step, fastest first on THIS box:
        #  * packed canvas loader (0.6 MB/frame + O(points) host gathers)
        #    — measured 136.7 fps vs 138.7 device: the link-starved tunnel
        #    host is bytes-bound, so the lean transport wins;
        #  * device-sampled raw transport (2.1 MB/frame, ZERO host
        #    per-point work) — the right config for PCIe hosts with slow
        #    CPUs; on the ~35 MB/s tunnel it is link-bound (~10 fps);
        #  * the PNG-decode producer (what r3 reported as
        #    e2e_fps_whole_canvas, 49.3).
        try:
            from avlmaps_tpu.ops.voxel_fusion import init_fusion_state

            _set_e2e("e2e_fps_whole_canvas",
                     measure_e2e(step_whole,
                                 init_fusion_state(GS, VH, 512, CAPACITY),
                                 params, canvas_hw, packed=True))
        except Exception as e:  # noqa: BLE001
            print(f"packed whole-canvas e2e failed: {e}", file=sys.stderr)
        try:
            from avlmaps_tpu.ops.voxel_fusion import init_fusion_state

            out["device_fps_whole_canvas_ds"] = round(measure_device_sampled(
                step_whole_ds, init_fusion_state(GS, VH, 512, CAPACITY),
                params, canvas_hw), 3)
            _set_e2e("e2e_fps_whole_canvas_ds",
                     measure_e2e_device_sampled(
                         step_whole_ds,
                         init_fusion_state(GS, VH, 512, CAPACITY),
                         params, canvas_hw))
        except Exception as e:  # noqa: BLE001
            print(f"device-sampled whole-canvas failed: {e}",
                  file=sys.stderr)
        try:
            from avlmaps_tpu.ops.voxel_fusion import init_fusion_state

            _set_e2e("e2e_fps_whole_canvas_decode",
                     measure_e2e(step_whole,
                                 init_fusion_state(GS, VH, 512, CAPACITY),
                                 params, canvas_hw))
        except Exception as e:  # noqa: BLE001
            print(f"whole-canvas e2e failed: {e}", file=sys.stderr)
    _phase("e2e whole-canvas")
    queries = {}
    try:
        queries = measure_queries()
        out["query_qps"] = round(queries["query_qps"], 2)
        out["query_vs_host_numpy"] = round(queries["query_vs_host_numpy"], 1)
    except Exception as e:  # noqa: BLE001 - secondary metric only
        print(f"query measurement failed: {e}", file=sys.stderr)
    _phase("queries")
    try:
        fq = measure_full_query()
        out["full_query_qps"] = fq.get("full_query_qps")
        out["full_query_detail"] = fq
        if baseline and "query" in baseline and fq.get("full_query_qps"):
            # the measured reference-style query takes reference_query_s
            # per query on this host (metric #2's denominator)
            out["vs_baseline_query"] = round(
                fq["full_query_qps"]
                * baseline["query"]["reference_query_s"], 1)
    except Exception as e:  # noqa: BLE001 - secondary metric only
        print(f"full-query measurement failed: {e}", file=sys.stderr)
    _phase("full query")
    try:
        audio = measure_audio()
        out["audio_clips_per_sec"] = round(audio["audio_clips_per_sec"], 2)
    except Exception as e:  # noqa: BLE001 - secondary metric only
        print(f"audio measurement failed: {e}", file=sys.stderr)
    _phase("audio")
    _emit()


if __name__ == "__main__":
    main()
