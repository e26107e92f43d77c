"""A/B the whole-canvas fusion-prep chain on the real chip (VERDICT r4 #6).

The lseg_eval="whole" serving step spends ~10 ms/step (18%) in the
fusion-state prep: slot-table gather -> composite argsort -> allocation
vector ops -> occupied scatter -> payload gather/assemble -> windowed
dedup scatter (docs/PROFILE.md).  This harness times

* the full ``fuse_points`` at the bench geometry (B=8 x 7776 rows,
  realistic ~9x slot collisions) for each design variant:
  - dedup scatter, one-hot per row (r3 kernel)
  - dedup scatter, run-length per-slot accumulate (r5, ``rle=True``)
  - plain XLA scatter (``dedup_scatter=False``)
  - rle at block_rows 64 / 128 / 256
* the isolated chain stages (slot gather, argsort, payload gather,
  update assemble) so the binding constant of each is named.

Usage:  python tools/ab_fusion_prep.py [--reps 6]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.ops.voxel_fusion import fuse_points, init_fusion_state

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    GS, VH, D, CAP = 1000, 30, 512, 1_000_000
    B = 8 * 7776  # bench geometry: BATCH x MAX_PTS rows per step
    rng = np.random.default_rng(0)

    # realistic collision structure: points cluster on ~B/9 voxels inside
    # a frustum-sized neighbourhood (overlapping frames see shared voxels)
    n_vox_seen = B // 9
    centers = np.stack([rng.integers(300, 700, n_vox_seen),
                        rng.integers(300, 700, n_vox_seen),
                        rng.integers(0, VH, n_vox_seen)], 1)
    pick = rng.integers(0, n_vox_seen, B)
    vids = (centers[pick, 0] * GS * VH + centers[pick, 1] * VH
            + centers[pick, 2]).astype(np.int32)
    # bf16, as the production encoder emits (the split kernel streams it
    # raw; the assembled path casts to f32 first)
    feats = rng.normal(size=(B, D)).astype(np.float32)
    rgbs = rng.uniform(0, 255, (B, 3)).astype(np.float32)
    alphas = rng.uniform(0.1, 1.0, B).astype(np.float32)
    valid = rng.uniform(size=B) < 0.97

    dv = {k: jnp.asarray(v) for k, v in
          dict(vids=vids, feats=feats, rgbs=rgbs, alphas=alphas,
               valid=valid).items()}
    dv["feats"] = dv["feats"].astype(jnp.bfloat16)
    np.asarray(dv["vids"][:1])  # prime D2H

    def timed(make_state, fn, reps):
        st = make_state()
        st = fn(st)  # compile + warm (fresh state: allocation path hot)
        jax.block_until_ready(jax.tree.leaves(st))
        st = make_state()
        jax.block_until_ready(jax.tree.leaves(st))
        t0 = time.perf_counter()
        for _ in range(reps):
            st = fn(st)
        jax.block_until_ready(jax.tree.leaves(st))
        return (time.perf_counter() - t0) / reps * 1e3

    mk = lambda: init_fusion_state(GS, VH, D, CAP)  # noqa: E731

    def fuse(dedup, rle=True, block_rows=64, split=False):
        def fn(st):
            return fuse_points(st, dv["vids"], dv["feats"], dv["rgbs"],
                               dv["alphas"], dv["valid"], gs=GS, vh=VH,
                               dedup_scatter=dedup, scatter_rle=rle,
                               scatter_block_rows=block_rows,
                               scatter_split=split)
        return fn

    print(f"rows={B}  unique_voxels~{n_vox_seen}  D={D}", flush=True)
    for name, dedup, rle, split in [("xla_scatter", False, True, False),
                                    ("dedup_onehot(r3)", True, False, False),
                                    ("dedup_rle(r5)", True, True, False),
                                    ("dedup_rle_split(r5)", True, True,
                                     True)]:
        ms = timed(mk, fuse(dedup, rle, split=split), args.reps)
        print(f"fuse_points {name:20s} {ms:7.2f} ms/step", flush=True)

    for br in (128, 192):
        # block_rows > ~192 is uncompilable on v5e: the kernel's two
        # (rows,) DMA semaphore arrays live in sflag scoped memory (2 KB
        # capacity) — 2 x 256 x 4 B overflows it (measured: "Exceeded
        # sflag capacity by 88B")
        try:
            ms = timed(mk, fuse(True, True, block_rows=br), args.reps)
            print(f"fuse_points rle block_rows={br:3d} {ms:7.2f} ms/step",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"fuse_points rle block_rows={br:3d} FAILED: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)

    # ---- isolated chain stages ----------------------------------------
    st = mk()
    st = fuse(True, True)(st)
    jax.block_until_ready(jax.tree.leaves(st))
    occ = st.occupied_flat

    def stage_timed(fn, reps):
        fn()
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        jax.block_until_ready(rs)
        return (time.perf_counter() - t0) / reps * 1e3

    g = jax.jit(lambda o, v: o[v])
    print(f"stage slot_gather      {stage_timed(lambda: g(occ, dv['vids']), args.reps):7.2f} ms", flush=True)
    srt = jax.jit(lambda k: jnp.argsort(k))
    key = jnp.asarray(rng.integers(0, 30_000_000, B).astype(np.int32))
    print(f"stage argsort          {stage_timed(lambda: srt(key), args.reps):7.2f} ms", flush=True)
    perm = jnp.asarray(rng.permutation(B).astype(np.int32))
    pg = jax.jit(lambda f, p: f[p])
    print(f"stage payload_gather   {stage_timed(lambda: pg(dv['feats'], perm), args.reps):7.2f} ms", flush=True)
    w = jnp.asarray(alphas)

    @jax.jit
    def assemble(f, p, ww):
        fp = f[p]
        return jnp.concatenate([ww[p][:, None] * fp,
                                jnp.zeros((B, 128), jnp.float32)], axis=1)

    print(f"stage gather+assemble  {stage_timed(lambda: assemble(dv['feats'], perm, w), args.reps):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
