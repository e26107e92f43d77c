"""Fused open-vocabulary similarity scoring.

The reference scores a map against text by a CPU numpy matmul
``map_feats @ text_feats.T`` (avlmaps/utils/clip_utils.py:196-242).  Here the
score is a Pallas TPU kernel that fuses the per-row L2 normalisation into the
matmul so the (N, D) map features are read from HBM exactly once: each grid
step DMAs one (TILE_N, D) tile into VMEM, normalises on the VPU, and contracts
against the (D, C) text matrix on the MXU.

N is the number of occupied voxels (10^5-10^6), D the embedding dim (512/768),
C the number of query categories (usually < 100) — the op is purely
HBM-bandwidth bound, which is why the fusion matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avlmaps_tpu.ops._pallas_compat import pallas_interpret_mode

_TILE_N = 2048
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _score_kernel(norm_map_ref, norm_text_ref, feats_ref, text_ref, out_ref):
    x = feats_ref[:].astype(jnp.float32)

    t = text_ref[:].astype(jnp.float32)
    tsq = jnp.sum(t * t, axis=0, keepdims=True)
    tinv = jax.lax.rsqrt(jnp.maximum(tsq, 1e-12))
    tn = jnp.where(norm_text_ref[0] == 1, t * tinv, t)

    # full f32 accumulation: category argmaxes must not flip vs the
    # reference's f64/f32 numpy matmul (recall parity)
    s = jnp.dot(x, tn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    # row normalisation applied to the OUTPUT: (x/||x||)@tn == (x@tn)/||x||
    # exactly in f32 up to one rounding of the scale multiply, but N*C
    # scale ops instead of N*D and the MXU starts without waiting on a
    # VPU prologue over the whole (TILE_N, D) tile
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(sq, 1e-12))
    out_ref[:] = jnp.where(norm_map_ref[0] == 1, s * inv, s)


@functools.partial(jax.jit, static_argnames=("normalize_map", "normalize_text"))
def score_features(map_feats: jnp.ndarray, text_feats: jnp.ndarray,
                   normalize_map: bool = False,
                   normalize_text: bool = False) -> jnp.ndarray:
    """Cosine / dot-product scores: (N, D) x (C, D) -> (N, C).

    With both normalize flags False this is exactly the reference's
    ``map_feats @ text_feats.T`` (clip_utils.py:229) — the reference arrays
    are pre-normalised.  Flags fuse L2 normalisation of either side into the
    kernel.
    """
    n, d = map_feats.shape
    c = text_feats.shape[0]
    x, t, n_rows, c_pad, d_pad = _pad_operands(map_feats, text_feats)

    grid = (pl.cdiv(n_rows, _TILE_N),)
    out = pl.pallas_call(
        _score_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TILE_N, d_pad), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, c_pad), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_TILE_N, c_pad), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, c_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * d_pad * c_pad,
            bytes_accessed=n_rows * d_pad * 4 + d_pad * c_pad * 4
            + n_rows * c_pad * 4,
            transcendentals=0,
        ),
        interpret=pallas_interpret_mode(),
    )(jnp.array([1 if normalize_map else 0], jnp.int32),
      jnp.array([1 if normalize_text else 0], jnp.int32), x, t)
    return out[:n, :c]


def _pad_operands(map_feats: jnp.ndarray, text_feats: jnp.ndarray):
    """Shape the operands for the score kernels WITHOUT copying the big
    (N, D) map side in the common case.

    The Pallas grid handles a ragged final row tile, so the map only needs
    sublane/lane alignment (N % 8, D % 128) — true for every production
    config (D = 512/768, slot counts are multiples of 8).  Only when
    misaligned (tiny tests) is the 2·N·D-byte pad copy paid; the (D, C)
    text side is tiny and always padded.
    """
    n, d = map_feats.shape
    c = text_feats.shape[0]
    c_pad = _round_up(max(c, 8), _LANE)
    d_pad = _round_up(d, _LANE)
    if pallas_interpret_mode() or n % 8 or d != d_pad:
        n_rows = _round_up(max(n, 8), _TILE_N)
        x = jnp.zeros((n_rows, d_pad),
                      map_feats.dtype).at[:n, :d].set(map_feats)
    else:
        n_rows = n
        x = map_feats
    t = jnp.zeros((d_pad, c_pad),
                  text_feats.dtype).at[:d, :c].set(text_feats.T)
    return x, t, n_rows, c_pad, d_pad


def _score_argmax_kernel(n_cat: int, norm_map_ref, norm_text_ref, feats_ref,
                         text_ref, out_ref):
    # Map-side normalisation is ARGMAX-INVARIANT and skipped entirely:
    # argmax_c (x·t_c)/||x|| == argmax_c x·t_c for any row (the scale
    # 1/||x|| is strictly positive; all-zero rows tie every category to
    # score 0 with or without it).  That removes the kernel's whole VPU
    # prologue over the (TILE_N, D) tile — a squared-sum reduction plus a
    # broadcast multiply, ~1.5e9 VPU ops per 1M-voxel query — so the MXU
    # contraction starts as soon as the tile lands.  norm_map_ref stays a
    # prefetch operand only for call-signature parity with _score_kernel.
    del norm_map_ref
    x = feats_ref[:].astype(jnp.float32)

    # text normalisation DOES matter: per-category scales bias the argmax
    t = text_ref[:].astype(jnp.float32)
    tsq = jnp.sum(t * t, axis=0, keepdims=True)
    tinv = jax.lax.rsqrt(jnp.maximum(tsq, 1e-12))
    tn = jnp.where(norm_text_ref[0] == 1, t * tinv, t)

    s = jnp.dot(x, tn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_cat, s, -jnp.inf)  # padded categories never win
    # first-index-of-max, NOT jnp.argmax: Mosaic's argmax breaks ties to the
    # last index while the reference's np.argmax (vlmap.py:123) takes the
    # first — and all-zero rows (empty-weight voxels) tie every category
    m = jnp.max(s, axis=1, keepdims=True)
    first = jnp.min(jnp.where(s >= m, col, jnp.int32(2 ** 30)), axis=1)
    out_ref[:] = first.astype(jnp.int32)[:, None]


@functools.partial(jax.jit, static_argnames=("normalize_map",
                                             "normalize_text"))
def score_argmax(map_feats: jnp.ndarray, text_feats: jnp.ndarray,
                 normalize_map: bool = False,
                 normalize_text: bool = False) -> jnp.ndarray:
    """Fused cosine score + per-row argmax: (N, D) x (C, D) -> (N,) int32.

    The index_map hot path (reference vlmap.py:104-125 scores then
    np.argmax on the host) reads the map features from HBM once and never
    materialises the (N, C) score matrix — the argmax happens in VMEM per
    tile.  Ties break to the lowest index, matching np.argmax.
    """
    n = map_feats.shape[0]
    c = text_feats.shape[0]
    x, t, n_rows, c_pad, d_pad = _pad_operands(map_feats, text_feats)

    grid = (pl.cdiv(n_rows, _TILE_N),)
    out = pl.pallas_call(
        functools.partial(_score_argmax_kernel, c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TILE_N, d_pad), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, c_pad), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_TILE_N, 1), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * d_pad * c_pad,
            bytes_accessed=n_rows * d_pad * 4 + d_pad * c_pad * 4
            + n_rows * 4,
            transcendentals=0,
        ),
        interpret=pallas_interpret_mode(),
    )(jnp.array([1 if normalize_map else 0], jnp.int32),
      jnp.array([1 if normalize_text else 0], jnp.int32), x, t)
    return out[:n, 0]


def score_features_hbm(map_feats, text_feats, **kw):
    """Alias kept for API clarity: the kernel already streams (N, D) from HBM
    tile-by-tile, so arbitrary N works without materialising in VMEM."""
    return score_features(map_feats, text_feats, **kw)


@jax.jit
def topk_categories(scores: jnp.ndarray) -> jnp.ndarray:
    """Per-voxel argmax category (reference vlmap.py:123-125)."""
    return jnp.argmax(scores, axis=-1)


def score_and_mask(map_feats: jnp.ndarray, text_feats: jnp.ndarray,
                   cat_id: int) -> jnp.ndarray:
    """Fused score + argmax==cat mask (reference VLMap.index_map,
    vlmap.py:104-125)."""
    scores = score_features(map_feats, text_feats)
    return jnp.argmax(scores, axis=-1) == cat_id
