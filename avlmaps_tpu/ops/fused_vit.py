"""Fused Pallas kernels for the ViT-L encoder hot loop.

Three forward-only kernels that remove the HBM round-trips XLA leaves on
the table in the LSeg backbone (reference hot loop:
avlmaps/utils/lseg_utils.py:77-96; reference runs the stock timm ViT).
Profiled motivation (docs/PROFILE.md, r3): of the ~62 ms ViT forward at
the bench shape, only ~26 ms is dense matmul at MFU 0.86 — the rest is
attention glue (BTHD transposes, 901->1024 pad copies, flash's online-
softmax passes) and unfused LN/GELU elementwise round-trips.

- ``mha_oneshot``: multi-head attention that consumes the *fused* qkv
  projection output ``(B, T, 3W)`` directly.  Per (batch, head) grid cell
  the whole T=901 sequence fits in VMEM (~115 KB/tensor), so softmax is a
  plain 3-pass computation (max, exp, sum) with no online rescaling, no
  XLA-level transpose or pad, and the output lands pre-merged in
  ``(B, T, W)`` ready for the output projection.
- ``ln_matmul``: LayerNorm fused into the prologue of the following
  dense layer (qkv / mlp_fc) — the normalised activations never revisit
  HBM.
- ``gelu_matmul``: exact-erf GELU fused into the prologue of mlp_proj —
  saves a full (B, T, 4W) round-trip per layer (~59 MB at the bench
  shape).

All kernels compute matmuls with f32 accumulation on bf16 operands and
match the unfused flax path within bf16 tolerance (tests/test_fused_vit.py
runs them in interpreter mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this to run the fused block path on CPU through the Pallas
# interpreter (the production gate requires a real TPU backend).
FORCE_INTERPRET = False

# Trace-time FLOP accounting: XLA's cost analysis sees Pallas kernels as
# opaque zero-FLOP custom calls, so every kernel in this module (and the
# attention kernels in models/lseg/vit.py) appends its matmul FLOPs here
# when traced.  bench.py clears the log, lowers the step once, and adds the
# sum to XLA's own count to get an honest MFU.
FLOP_LOG: list = []

# Row sub-blocks per gelu_matmul grid step (see _gelu_matmul_kernel): >1
# interleaves the VPU erf prologue of one sub-block with the MXU matmul of
# the previous one.  A/B-tunable at import time; chunk values {1, 2} are
# parity-tested in interpret mode (tests/test_fused_vit.py chunk params).
# r4, with the manual two-stage prologue pipeline inside the kernel:
# chunks=1 is fastest at the production M=16x904 shape (1.72/1.79 ms vs
# 2.1-2.5 ms for 2/4, tools/ab_gelu.py x2 runs) — the reordered single
# prologue already overlaps with the previous *grid step's* matmul, and
# sub-block retiling only costs MXU efficiency.
GELU_CHUNKS = 1

# Same knob for the LayerNorm prologue of ln_matmul.  None = auto by
# output width, pinned by tools/ab_gelu.py on-chip A/B (r4, two runs,
# consistent ordering): the fc layer (N=4096) is fastest with chunks=2
# (1.87/2.18 ms vs 2.18/2.30 unchunked), qkv (N=3072) with chunks=4
# (1.39/2.06 ms vs 2.00/2.42 unchunked — the biggest single win of the
# prologue pipeline).  An explicit 0/1 disables chunking; only None
# selects the auto rule.
LN_CHUNKS = None

# Route the ViT MLP sub-block through the single ln_mlp_residual kernel
# (fc + GELU + proj + residual, VMEM-resident intermediate) instead of the
# ln_matmul / gelu_matmul pair.  A/B-able at import time.
MLP_FUSE = True


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, hd: int,
                pack: int, t_real: int):
    """One grid cell = ``pack`` heads (packed along lanes so the minor
    block dim hits Mosaic's 128-lane requirement; hd=64 -> pack=2).  Each
    head is an independent one-shot attention over the full (in-VMEM)
    sequence.  Refs are 2-D (T, hd*pack) row-blocks of the (B*T, 3W)
    qkv matrix — the raw layout of the qkv matmul output, so no reshape
    or layout copy exists on either side (a (B*T,3W)->(B,T,3W) reshape
    materialised 1.4 ms/step before, traced r3).

    ``t_real < T`` masks out the trailing pad keys (Mosaic requires the
    sublane block extent to be a multiple of 8, so callers pad the token
    axis; the pad rows' outputs are garbage the caller slices off, but as
    KEYS they must not pollute real queries' softmax)."""
    t = q_ref.shape[0]
    key_mask = None
    if t_real < t:
        key_mask = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) < t_real
    outs = []
    for i in range(pack):
        sl = slice(i * hd, (i + 1) * hd)
        q = q_ref[:, sl] * jnp.asarray(scale, q_ref.dtype)  # hd=64:
        k = k_ref[:, sl]                          # scale=2^-3, exact bf16
        v = v_ref[:, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (T, T)
        if key_mask is not None:
            logits = jnp.where(key_mask, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)  # (T, hd)
        outs.append(pv / s)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _head_pack(hd: int, n_heads: int) -> int:
    """Heads per grid cell: smallest power of two making the lane block a
    multiple of 128 (Mosaic's minor-dim tiling requirement), capped at
    n_heads (tiny test shapes run interpreted, where any block is legal)."""
    p = 1
    while p < n_heads and (hd * p) % 128 != 0:
        p *= 2
    return min(p, n_heads)


def fused_active(dtype) -> bool:
    """The production gate for the fused block kernels: a real TPU backend
    with a bf16 model (the kernels compute in bf16), or tests forcing the
    Pallas interpreter on CPU.  Shared by ViTBlock (which routes through
    the kernels) and DenseViT (which pads the token axis to the 8-row
    sublane multiple Mosaic requires) so the two decisions can't drift."""
    return ((jax.default_backend() == "tpu" and dtype == jnp.bfloat16)
            or FORCE_INTERPRET)


def mha_oneshot(qkv: jnp.ndarray, n_heads: int, *, scale: float,
                t_real: int | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """Multi-head self-attention on the fused qkv tensor.

    qkv: (B, T, 3W) laid out [q | k | v] along the last axis, each W wide
    with W = n_heads * head_dim (the direct output of the qkv dense layer).
    Returns (B, T, W) with heads already merged — the transpose-free
    layout both sides of the kernel.
    """
    b, t, three_w = qkv.shape
    return mha_oneshot_2d(qkv.reshape(b * t, three_w), b, t, n_heads,
                          scale=scale, t_real=t_real, interpret=interpret
                          ).reshape(b, t, three_w // 3)


def mha_oneshot_2d(qkv2d: jnp.ndarray, b: int, t: int, n_heads: int, *,
                   scale: float, t_real: int | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """``mha_oneshot`` on the (B*T, 3W) matrix layout — the direct output
    of the fused qkv matmul.  Returns (B*T, W), ready for the output
    projection, with no reshape/layout copy on either side.

    Mosaic requires the (T, hd*pack) block's sublane extent to be a
    multiple of 8, so compiled callers must pad T to one (DenseViT does)
    and pass the unpadded length as ``t_real``; rows past it are garbage
    in the output and masked out of every softmax as keys."""
    m, three_w = qkv2d.shape
    assert m == b * t, (m, b, t)
    if t_real is None:
        t_real = t
    w = three_w // 3
    hd = w // n_heads
    FLOP_LOG.append(4 * b * t * t * w)  # qk^T + pv, all heads, as executed
    pack = _head_pack(hd, n_heads)
    if n_heads % pack:
        raise ValueError(f"n_heads={n_heads} not divisible by pack={pack}")
    groups = n_heads // pack
    blk = (t, hd * pack)
    spec = lambda off: pl.BlockSpec(  # noqa: E731
        blk, lambda bi, h, o=off: (bi, o + h))
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, hd=hd, pack=pack,
                          t_real=t_real),
        grid=(b, groups),
        in_specs=[spec(0), spec(groups), spec(2 * groups)],
        out_specs=spec(0),
        out_shape=jax.ShapeDtypeStruct((b * t, w), qkv2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret or FORCE_INTERPRET,
    )(qkv2d, qkv2d, qkv2d)


def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *,
                      eps: float, chunks: int = 1):
    # chunks > 1 splits the row block so Mosaic can overlap one sub-block's
    # VPU LayerNorm with the previous sub-block's MXU matmul (LN statistics
    # are per-row, so row chunking is exact) — same trick as
    # _gelu_matmul_kernel below.  The prologue of sub-block i+1 is computed
    # BEFORE sub-block i's dot is issued (manual two-stage software
    # pipeline): with no data dependency between them, the scheduler is
    # free to run the VPU polynomial under the MXU matmul instead of
    # serialising the two units (docs/PROFILE.md headroom #1).
    bm = x_ref.shape[0]
    sub = bm // chunks if chunks > 1 and bm % chunks == 0 else bm
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    bias = bias_ref[...].astype(jnp.float32)

    def prologue(i):
        xb = x_ref[i * sub:(i + 1) * sub, :].astype(jnp.float32)  # (sub, K)
        mu = jnp.mean(xb, axis=-1, keepdims=True)
        xc = xb - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + eps)) * g + b
        return xn.astype(w_ref.dtype)

    n_sub = bm // sub
    xn = prologue(0)
    for i in range(n_sub):
        xn_next = prologue(i + 1) if i + 1 < n_sub else None
        y = jnp.dot(xn, w_ref[...],
                    preferred_element_type=jnp.float32)  # (sub, bn)
        o_ref[i * sub:(i + 1) * sub, :] = (y + bias).astype(o_ref.dtype)
        xn = xn_next


# odd LS polynomial erf(x) ~ clamp(x * P(x^2)) fitted on [0, 3.2]
# (|error| <= 3.4e-5 over the full real line with input clamping — an
# order below the f32 test atol, two below bf16 resolution).  Division- and
# exp-free on purpose: the VPU epilogue is on the kernel's critical path
# and the classic Abramowitz & Stegun form (reciprocal + exp + 5-term
# Horner) measured ~0.18 ms/layer of pure elementwise time at the ViT-L
# bench shape (traced r3: gelu_matmul 0.57 ms vs the same-FLOPs ln_matmul
# at 0.39 ms); Horner in x^2 is ~12 cheap FMAs.
_ERF_COEF = (1.1283298410080937, -0.37573741334671773, 0.11192594468396883,
             -0.02587014286438464, 0.004610857150747611,
             -0.0006187017009385277, 5.969310805068045e-05,
             -3.85909769357618e-06, 1.482146149594643e-07,
             -2.5391730591666093e-09)


def _erf(x):
    xs = jnp.clip(x, -3.2, 3.2)
    u = xs * xs
    p = jnp.float32(_ERF_COEF[-1])
    for c in _ERF_COEF[-2::-1]:
        p = p * u + jnp.float32(c)
    return jnp.clip(xs * p, -1.0, 1.0)


def _gelu_matmul_kernel(x_ref, w_ref, bias_ref, o_ref, *, chunks: int = 1):
    # The erf prologue is pure VPU work on the (bm, K) block and the matmul
    # is pure MXU work; with chunks > 1 the block is split into independent
    # row sub-blocks so Mosaic's scheduler can overlap sub-block i+1's VPU
    # polynomial with sub-block i's matmul instead of serialising the two
    # units (docs/PROFILE.md headroom #1).
    bm = x_ref.shape[0]
    sub = bm // chunks if chunks > 1 and bm % chunks == 0 else bm
    bias = bias_ref[...].astype(jnp.float32)

    def prologue(i):
        xb = x_ref[i * sub:(i + 1) * sub, :].astype(jnp.float32)
        # exact-erf GELU spelled out: jax.nn.gelu(approximate=False) lowers
        # through erf/erfc, neither of which Mosaic implements
        g = 0.5 * xb * (1.0 + _erf(xb * jnp.float32(0.7071067811865476)))
        return g.astype(w_ref.dtype)

    # two-stage software pipeline: issue sub-block i+1's VPU polynomial
    # before sub-block i's MXU dot so the scheduler can overlap the units
    n_sub = bm // sub
    g = prologue(0)
    for i in range(n_sub):
        g_next = prologue(i + 1) if i + 1 < n_sub else None
        y = jnp.dot(g, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[i * sub:(i + 1) * sub, :] = (y + bias).astype(o_ref.dtype)
        g = g_next


def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, eps: float, chunks: int):
    """out = x + gelu(LN(x) @ w1 + b1) @ w2 + b2 for one (bm, K) row block.

    The whole MLP of a ViT block in one kernel: the (bm, 4K) GELU
    intermediate lives in VMEM instead of round-tripping through HBM
    between the fc and proj matmuls (118 MB written + re-read per ViT-L
    layer at the bench shape), and the residual add is folded into the
    epilogue (saves another (M, K) read-modify-write pass).  Row chunks
    are software-pipelined: chunk i+1's fc matmul is issued between chunk
    i's GELU polynomial and chunk i's proj matmul, so the VPU work has an
    independent MXU op to hide under.
    """
    bm, k = x_ref.shape
    sub = bm // chunks if chunks > 1 and bm % chunks == 0 else bm
    g = g_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)

    def ln_part(i):
        xb = x_ref[i * sub:(i + 1) * sub, :].astype(jnp.float32)
        mu = jnp.mean(xb, axis=-1, keepdims=True)
        xc = xb - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        xn = (xc * jax.lax.rsqrt(var + eps)) * g + b
        return xn.astype(w1_ref.dtype), xb

    def fc(xn):
        return jnp.dot(xn, w1_ref[...],
                       preferred_element_type=jnp.float32) + b1

    n_sub = bm // sub
    xn, xb = ln_part(0)
    h = fc(xn)
    for i in range(n_sub):
        gl = (0.5 * h * (1.0 + _erf(h * jnp.float32(0.7071067811865476)))
              ).astype(w2_ref.dtype)
        if i + 1 < n_sub:
            xn2, xb_next = ln_part(i + 1)
            h = fc(xn2)
        y = jnp.dot(gl, w2_ref[...],
                    preferred_element_type=jnp.float32) + b2
        o_ref[i * sub:(i + 1) * sub, :] = (xb + y).astype(o_ref.dtype)
        if i + 1 < n_sub:
            xb = xb_next


def ln_mlp_residual(x2d: jnp.ndarray, ln_scale: jnp.ndarray,
                    ln_bias: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                    w2: jnp.ndarray, b2: jnp.ndarray, *, eps: float,
                    out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """x + gelu(LayerNorm(x) @ w1 + b1) @ w2 + b2 — the full pre-LN ViT
    MLP sub-block (incl. residual) as ONE Pallas kernel.

    x2d: (M, K); w1: (K, N1); w2: (N1, K).  Replaces the
    ln_matmul + gelu_matmul + residual-add chain; both weight panels stay
    VMEM-stationary across the M grid (one 16 MB fetch per layer instead
    of re-streaming), and the (M, N1) intermediate never exists in HBM.
    Grid is 1-D over M only — requires k * N1 weights to fit VMEM
    (ViT-L: 1024*4096 bf16 x2 = 16 MB; guarded below).
    """
    m, k = x2d.shape
    n1 = w1.shape[1]
    wbytes = (w1.size + w2.size) * w1.dtype.itemsize
    if wbytes > 24 * 2**20:  # weights don't fit stationary: unfused path
        h = ln_matmul(x2d, ln_scale, ln_bias, w1, b1, eps=eps,
                      out_dtype=out_dtype or x2d.dtype, interpret=interpret)
        return x2d + gelu_matmul(h, w2, b2, out_dtype=out_dtype or x2d.dtype,
                                 interpret=interpret)
    FLOP_LOG.append(2 * m * k * n1 + 2 * m * n1 * k)
    bm = min(512, m)
    # f32 intermediates in flight: two (sub, n1) fc outputs + the (sub, k)
    # residual copy per pipeline stage; weights 16 MB; double-buffered
    # x/out blocks.  bm=512/chunks=4 lands ~27 MB scoped.
    chunks = 4 if bm % 4 == 0 else 1
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps, chunks=chunks),
        grid=(pl.cdiv(m, bm),),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((1, k), lambda i: (0, 0)),
                  pl.BlockSpec((1, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n1), lambda i: (0, 0)),
                  pl.BlockSpec((1, n1), lambda i: (0, 0)),
                  pl.BlockSpec((n1, k), lambda i: (0, 0)),
                  pl.BlockSpec((1, k), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), out_dtype or x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret or FORCE_INTERPRET,
    )(x2d, ln_scale.reshape(1, k), ln_bias.reshape(1, k), w1,
      b1.reshape(1, n1), w2, b2.reshape(1, k))


def _blocked_matmul_call(kernel, x2d, w, extras_row, extras_col, out_dtype,
                         *, block_m: int, interpret: bool):
    """Shared grid plumbing: x2d (M, K) x w (K, N) with row-broadcast
    (extras_row, shape (1, K)) and column-broadcast (extras_col, (1, N))
    side inputs.  K stays whole in VMEM; M is blocked (last block masked by
    Pallas), N blocked by the largest aligned divisor."""
    m, k = x2d.shape
    n = w.shape[1]
    FLOP_LOG.append(2 * m * k * n)
    # 8 MB weight-block cap: at ViT-L's k=4096 mlp_proj this admits the
    # WHOLE n=1024 weight panel in one block, so the GELU prologue runs
    # once per x block instead of once per (x, n) pair (bn=512 re-ran it
    # 2x; ~0.55 -> 0.44 ms/layer on chip) — affordable since the scoped-
    # VMEM limit was raised to 32 MB below.  K stays whole on purpose:
    # k-blocking with an f32 accumulator measured WORSE (0.565 vs
    # 0.515 ms) because per-(m,k) weight re-streaming costs more than the
    # larger M block saves (r3 A/B).
    bn_cap = max(128, (8 << 20) // (k * w.dtype.itemsize))
    fits = [b for b in (1024, 512, 256, 128) if n % b == 0 and b <= bn_cap]
    bn = fits[0] if fits else n
    bm = min(block_m, m)

    def _vmem_est(bm_):
        # double-buffered x/out blocks + one weight block + the kernel's
        # f32 copy of the x block (LN/GELU intermediate).  Calibrated to
        # Mosaic's scoped-vmem accounting: the k=4096 GELU layer measured
        # 16.5 MB at bm=256 (OOM over the 16 MB/core limit), 13 MB at 128.
        return (2 * bm_ * k * x2d.dtype.itemsize + k * bn * w.dtype.itemsize
                + 2 * bm_ * bn * 4 + bm_ * k * 4)

    while bm > 128 and _vmem_est(bm) > 28 * 2**20:
        bm //= 2
    grid_m, grid_n = pl.cdiv(m, bm), n // bn
    # Pallas skips the DMA when a block index is unchanged between
    # consecutive grid steps, so the MINOR grid dim decides what gets
    # re-fetched: iterate over whichever side carries less traffic.
    # ViT-L's fc layer (w 8 MB, 15 M-blocks) re-read weights 120 MB/layer
    # with the naive n-minor order — w-stationary cuts that to 8 MB
    # (profiled r3: the pallas matmuls were DMA-stall bound, MFU 0.59-0.75).
    w_stationary = (w.size * w.dtype.itemsize * grid_m
                    > x2d.size * x2d.dtype.itemsize * grid_n)
    if w_stationary:
        grid = (grid_n, grid_m)
        xm, cm, om = (lambda j, i: (i, 0)), (lambda j, i: (0, j)), \
            (lambda j, i: (i, j))
    else:
        grid = (grid_m, grid_n)
        xm, cm, om = (lambda i, j: (i, 0)), (lambda i, j: (0, j)), \
            (lambda i, j: (i, j))
    row_spec = [pl.BlockSpec((1, k), lambda *a: (0, 0)) for _ in extras_row]
    col_spec = [pl.BlockSpec((1, bn), cm) for _ in extras_col]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bm, k), xm)] + row_spec
        + [pl.BlockSpec((k, bn), cm)] + col_spec,
        out_specs=pl.BlockSpec((bm, bn), om),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the estimator undercounts Mosaic's scoped accounting by
            # ~2-3 MB at the k=4096 GELU layer (16.4 MB actual at bm=256);
            # v5e has 128 MB of VMEM, so raise the 16 MB default rather
            # than shrink bm (bm=128 measured slower, r3 A/B)
            vmem_limit_bytes=32 * 2**20),
        interpret=interpret or FORCE_INTERPRET,
    )(x2d, *extras_row, w, *extras_col)


def ln_matmul(x2d: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
              w: jnp.ndarray, bias: jnp.ndarray, *, eps: float,
              out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """LayerNorm(x) @ w + bias without materialising the LN output.

    x2d: (M, K); ln_scale/ln_bias: (K,); w: (K, N); bias: (N,).
    LN statistics in f32 (matching flax), normalised activations cast to
    w.dtype for the MXU, f32 accumulation.
    """
    k = x2d.shape[1]
    n = w.shape[1]
    chunks = LN_CHUNKS if LN_CHUNKS is not None \
        else (2 if n >= 4096 else (4 if n >= 2048 else 1))
    return _blocked_matmul_call(
        functools.partial(_ln_matmul_kernel, eps=eps, chunks=chunks),
        x2d, w,
        extras_row=[ln_scale.reshape(1, k), ln_bias.reshape(1, k)],
        extras_col=[bias.reshape(1, -1)],
        out_dtype=out_dtype or x2d.dtype, block_m=512, interpret=interpret)


def gelu_matmul(x2d: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray, *,
                out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """gelu(x, exact-erf tolerance) @ w + bias without materialising the
    GELU output.

    x2d: (M, K=4W); w: (K, N); bias: (N,).  Smaller M block than
    ln_matmul: the f32 GELU intermediate is (bm, 4W); with the 8 MB weight
    panel (whole N at ViT-L's n=1024) K=4096 still gets bm=256 under the
    28 MB VMEM guard, and the GELU prologue runs once per x block.
    """
    return _blocked_matmul_call(
        functools.partial(_gelu_matmul_kernel, chunks=GELU_CHUNKS),
        x2d, w, extras_row=[], extras_col=[bias.reshape(1, -1)],
        out_dtype=out_dtype or x2d.dtype, block_m=256, interpret=interpret)
