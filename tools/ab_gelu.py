#!/usr/bin/env python
"""A/B the gelu_matmul GELU-prologue chunking on the real chip.

The erf prologue serialises VPU before MXU inside each grid step
(docs/PROFILE.md headroom #1, ~0.13 ms/layer).  Chunking the x block into
independent row sub-blocks inside the kernel lets Mosaic overlap one
sub-block's VPU polynomial with the previous sub-block's matmul.

Usage: python tools/ab_gelu.py [chunk counts...]   (default 1 2 4)
Shapes match the production bench step: M = 16 crops x 904 tokens,
K = 4096 (ViT-L mlp hidden), N = 1024.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

bench._enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from avlmaps_tpu.ops import fused_vit  # noqa: E402


def _ab(label, build, set_chunks, chunk_list, flops):
    ref = None
    for c in chunk_list:
        set_chunks(c)
        f, args = build()
        out = None
        for _ in range(3):
            out = f(*args)
        jax.block_until_ready(out)
        o = np.asarray(out, np.float32)
        if ref is None:
            ref = o
        else:
            # tight-but-not-bitwise: the compiler doesn't guarantee
            # identical f32 accumulation order across sub-block shapes
            err = np.max(np.abs(o - ref))
            tol = 1e-5 * max(float(np.sqrt(np.mean(ref * ref))), 1.0)
            assert err <= tol, f"{label} chunks={c} diverged: {err} > {tol}"
        t0 = time.perf_counter()
        reps = 30
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label} chunks={c}: {ms:7.3f} ms  "
              f"mfu={flops / (ms*1e-3) / 197e12:.3f}", flush=True)


def main():
    chunk_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4]
    which = {a for a in sys.argv[1:] if not a.isdigit()} or {"gelu", "ln"}
    rng = np.random.default_rng(0)
    m = 16 * 904

    if "gelu" in which:
        k, n = 4096, 1024
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02,
                        jnp.bfloat16)
        b = jnp.zeros((n,), jnp.bfloat16)
        _ab("gelu", lambda: (jax.jit(fused_vit.gelu_matmul), (x, w, b)),
            lambda c: setattr(fused_vit, "GELU_CHUNKS", c),
            chunk_list, 2 * m * k * n)

    if "ln" in which:
        for n in (3072, 4096):  # qkv / fc production shapes
            k = 1024
            x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                            jnp.bfloat16)
            w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32)
                            * 0.02, jnp.bfloat16)
            g = jnp.ones((k,), jnp.bfloat16)
            c0 = jnp.zeros((k,), jnp.bfloat16)
            b = jnp.zeros((n,), jnp.bfloat16)
            _ab(f"ln(n={n})",
                lambda: (jax.jit(functools.partial(
                    fused_vit.ln_matmul, eps=1e-6)), (x, g, c0, w, b)),
                lambda c: setattr(fused_vit, "LN_CHUNKS", c),
                chunk_list, 2 * m * k * n)


if __name__ == "__main__":
    main()
