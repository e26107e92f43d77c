#!/usr/bin/env python
"""Per-segment profile of the parity-mode map-build step (VERDICT r2 #1).

Times each stage of the device step separately on the real chip, with the
bench's measurement hygiene (warmup + D2H prime + single block per timed
region).  Segments are selectable via argv (compiles on this 1-core host
take minutes, so run them in separate invocations; the persistent compile
cache makes re-runs cheap):

  python tools/profile_step.py step fusion   # cached-compile segments
  python tools/profile_step.py lseg          # full LSeg fwd (1 compile)
  python tools/profile_step.py vit           # ViT attention impl A/B

Segments:
  step     — the full frame step (geometry + lseg + gather + fusion)
  fusion   — fuse_points alone at the bench geometry (31104 pts, cap 1M)
  lseg     — full LSegNet forward, upsample=False (ViT + DPT + head)
  vit      — DenseViT backbone alone, flash vs xla vs einsum attention

Run on an otherwise-idle chip; numbers from different runs are not
comparable (axon tunnel variance).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (repo root)


def timed(fn, *args, reps=6, warmup=2, label="", flops=None):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # D2H prime
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    eff = ""
    if flops:
        mfu = flops / (ms * 1e-3) / 197e12
        eff = f"  mfu={mfu:.3f}"
    print(f"{label:12s} {ms:8.2f} ms{eff}", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    segs = set(sys.argv[1:]) or {"step", "fusion", "lseg", "vit"}
    if any(a.startswith("vit:") for a in segs):
        segs.add("vit")  # `vit:flash` alone must select the vit segment
    bench._enable_compile_cache()

    from avlmaps_tpu.models.lseg import LSegConfig, LSegNet
    from avlmaps_tpu.models.lseg.vit import DenseViT
    from avlmaps_tpu.models.lseg.window import plan_windows
    from avlmaps_tpu.ops.voxel_fusion import fuse_points, init_fusion_state

    B = bench.BATCH
    n_crops = 2
    crops_b = B * n_crops
    rng = np.random.default_rng(0)

    cfg = LSegConfig.vitl16(dtype=jnp.bfloat16)
    model = LSegNet(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 480, 480, 3), jnp.float32))
    from avlmaps_tpu.models.lseg.model import cast_params_for_inference
    params = cast_params_for_inference(params)

    x = jnp.asarray(rng.normal(size=(crops_b, 480, 480, 3))
                    .astype(np.float32))

    # FLOPs accounting (dense matmuls only, per crop at T=901)
    T, D = 901, 1024
    vit_dense = 24 * T * 2 * D * (3 * D + D + 4 * D + 4 * D)
    vit_attn = 24 * 4 * 1024 * 1024 * D  # padded flash shape
    vit_flops = crops_b * (vit_dense + vit_attn)

    if "step" in segs or "step_dedup" in segs:
        from avlmaps_tpu.map.vlmap_builder import (make_frame_step_canvas,
                                                   sample_pixels)

        calib = np.array([[540, 0, 540], [0, 540, 360], [0, 0, 1]],
                         np.float64)
        half_apply = lambda p, xx: model.apply(p, xx, upsample=False)  # noqa
        step = jax.jit(make_frame_step_canvas(
            half_apply, gs=bench.GS, cs=bench.CS, vh=bench.VH,
            calib_mat=calib, image_hw=(bench.H, bench.W),
            half_res_apply=True, dedup_scatter="step_dedup" in segs),
            donate_argnums=(0,))
        ch, cw, _, _, _ = plan_windows(bench.H, bench.W)
        canvas = jnp.asarray(rng.integers(0, 255, (B, ch, cw, 3)),
                             jnp.uint8)
        z_mm = jnp.asarray((rng.uniform(0.3, 5.0, (B, bench.MAX_PTS)) * 1e3)
                           .astype(np.uint16))
        rgb_pts = jnp.asarray(rng.integers(0, 255, (B, bench.MAX_PTS, 3)),
                              jnp.uint8)
        pose = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
        idx = jnp.asarray(sample_pixels(rng, bench.H, bench.W, 100,
                                        bench.MAX_PTS, B))
        fvalid = jnp.ones((B,), bool)
        state = init_fusion_state(bench.GS, bench.VH, 512, bench.CAPACITY)

        for _ in range(2):
            state = step(state, params, canvas, z_mm, rgb_pts, pose, idx,
                         fvalid)
        jax.block_until_ready(jax.tree.leaves(state))
        t0 = time.perf_counter()
        reps = 6
        for _ in range(reps):
            state = step(state, params, canvas, z_mm, rgb_pts, pose, idx,
                         fvalid)
        jax.block_until_ready(jax.tree.leaves(state))
        step_ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{'step':12s} {step_ms:8.2f} ms  "
              f"(fps={B / (step_ms * 1e-3):.1f})", flush=True)

    if "fusion" in segs:
        n_pts = B * bench.MAX_PTS
        vids = jnp.asarray(rng.integers(0, bench.GS * bench.GS * bench.VH,
                                        n_pts).astype(np.int32))
        feats = jnp.asarray(rng.normal(size=(n_pts, 512)).astype(np.float32))
        rgbs = jnp.asarray(rng.uniform(0, 255, (n_pts, 3))
                           .astype(np.float32))
        alphas = jnp.asarray(rng.uniform(0.1, 1, n_pts).astype(np.float32))
        valid = jnp.ones((n_pts,), bool)
        fstate = init_fusion_state(bench.GS, bench.VH, 512, bench.CAPACITY)

        def run_fuse(s):
            return fuse_points(s, vids, feats, rgbs, alphas, valid,
                               gs=bench.GS, vh=bench.VH)

        for _ in range(2):
            fstate = run_fuse(fstate)
        jax.block_until_ready(jax.tree.leaves(fstate))
        t0 = time.perf_counter()
        reps = 6
        for _ in range(reps):
            fstate = run_fuse(fstate)
        jax.block_until_ready(jax.tree.leaves(fstate))
        print(f"{'fusion':12s} "
              f"{(time.perf_counter() - t0) / reps * 1e3:8.2f} ms",
              flush=True)

    if "lseg" in segs:
        lseg = jax.jit(lambda p, xx: model.apply(p, xx, upsample=False))
        timed(lseg, params, x, label="lseg")

    if "vit" in segs:
        import dataclasses

        impls = [a for a in sys.argv[1:] if a.startswith("vit:")]
        impls = ([a.split(":", 1)[1] for a in impls]
                 or ["flash", "splash", "xla", "einsum"])
        for impl in impls:
            vcfg = dataclasses.replace(cfg.vit, attn_impl=impl)
            vit = DenseViT(vcfg)
            vparams = {"params": params["params"]["backbone"]}
            f = jax.jit(lambda p, xx, vit=vit: vit.apply(p, xx))
            try:
                timed(f, vparams, x, label=f"vit_{impl}", flops=vit_flops)
            except Exception as e:  # noqa: BLE001
                print(f"vit_{impl}: failed: {e}")


if __name__ == "__main__":
    main()
