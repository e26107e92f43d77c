"""SuperGlue attentional graph matcher in flax, TPU-first.

The reference matches SuperPoint keypoints with HLoc's SuperGlue
(avlmaps/utils/localization_utils.py:140-145,221-273).  This is the same
architecture — keypoint-position MLP encoder, 9 alternating self/cross
attention layers, final projection, log-domain Sinkhorn with a learned
dustbin — redesigned for XLA:

* **static shapes**: both keypoint sets are FIXED-size (the SuperPoint
  extractor already pads to max_keypoints with a validity mask), so the
  whole match step jits once; padding is neutralised with large-negative
  log-mass (exp(-1e9) == 0) instead of dynamic slicing, which makes the
  padded result equal (to float rounding) to the unpadded one;
* **attention on the MXU**: every propagation step is two batched matmuls
  per head over the full (K, K) score matrix — no per-keypoint loops;
* **Sinkhorn as lax.scan**: the normalisation iterations are a scan over a
  (K+1, K+1) coupling matrix, compiled as one fused loop on device;
* inference-only: the torch checkpoints' BatchNorm1d layers are folded
  into the preceding dense layers at port time (``port.py``).

Weights port from the public ``superglue_{indoor,outdoor}.pth`` via
``port.py``; golden parity vs a from-spec torch oracle is tested in
``tests/test_superglue.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG = -1e9  # masked log-mass / attention logit: exp(NEG) == 0.0 in f32


@dataclasses.dataclass(frozen=True)
class SuperGlueConfig:
    desc_dim: int = 256
    kenc_layers: Tuple[int, ...] = (32, 64, 128, 256)
    gnn_layers: int = 9          # self+cross pairs (public checkpoints: 9)
    heads: int = 4
    sinkhorn_iters: int = 20     # magicleap default is 100; 20 is converged
    match_threshold: float = 0.2
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "SuperGlueConfig":
        return SuperGlueConfig(desc_dim=32, kenc_layers=(8, 16),
                               gnn_layers=2, heads=4, sinkhorn_iters=10)


def normalize_keypoints(kpts: jnp.ndarray, hw: Tuple[int, int]
                        ) -> jnp.ndarray:
    """(B, K, 2) xy pixels -> centred coords scaled by 0.7 * max(h, w)."""
    h, w = hw
    center = jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
    return (kpts - center) / (0.7 * max(h, w))


class _KeypointEncoder(nn.Module):
    """MLP over (x, y, score); the torch BN layers are folded in."""

    cfg: SuperGlueConfig

    @nn.compact
    def __call__(self, kpts, scores, hw: Tuple[int, int]):
        cfg = self.cfg
        x = jnp.concatenate([normalize_keypoints(kpts, hw),
                             scores[..., None]], axis=-1).astype(cfg.dtype)
        for i, ch in enumerate(cfg.kenc_layers):
            x = jax.nn.relu(nn.Dense(ch, dtype=cfg.dtype,
                                     name=f"enc{i}")(x))
        return nn.Dense(cfg.desc_dim, dtype=cfg.dtype,
                        name=f"enc{len(cfg.kenc_layers)}")(x)


class _Propagation(nn.Module):
    """One attentional propagation delta: MLP([x, attn(x, src, src)]).

    The same instance serves both images in a layer — flax shares the
    parameters across calls, like the torch layer does.
    """

    cfg: SuperGlueConfig

    @nn.compact
    def __call__(self, x, src, src_valid):
        cfg = self.cfg
        d, h = cfg.desc_dim, cfg.heads
        hd = d // h
        b, k = x.shape[0], x.shape[1]
        q = nn.Dense(d, dtype=cfg.dtype, name="q")(x)
        kk = nn.Dense(d, dtype=cfg.dtype, name="k")(src)
        v = nn.Dense(d, dtype=cfg.dtype, name="v")(src)
        # STRIDED head grouping: the torch layout views (b, d, n) as
        # (b, head_dim, heads, n), so head h owns channels c % heads == h —
        # NOT contiguous blocks.  The (hd, h) reshape below reproduces it,
        # and the inverse reshape feeds `merge` in the same order.
        q = q.reshape(b, k, hd, h)
        kk = kk.reshape(b, src.shape[1], hd, h)
        v = v.reshape(b, src.shape[1], hd, h)
        logits = jnp.einsum("bqdh,bkdh->bhqk", q, kk,
                            preferred_element_type=jnp.float32)
        logits = logits.astype(jnp.float32) / (hd ** 0.5)
        logits = jnp.where(src_valid[:, None, None, :], logits, NEG)
        prob = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        msg = jnp.einsum("bhqk,bkdh->bqdh", prob, v).reshape(b, k, d)
        msg = nn.Dense(d, dtype=cfg.dtype, name="merge")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = jax.nn.relu(nn.Dense(2 * d, dtype=cfg.dtype, name="mlp0")(y))
        return nn.Dense(d, dtype=cfg.dtype, name="mlp1")(y)


class SuperGlueNet(nn.Module):
    """Full matcher: returns the (B, K0+1, K1+1) log assignment matrix."""

    cfg: SuperGlueConfig

    @nn.compact
    def __call__(self, kpts0, scores0, desc0, valid0,
                 kpts1, scores1, desc1, valid1,
                 hw0: Tuple[int, int],
                 hw1: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        """``desc*`` are the L2-normalised SuperPoint descriptors (B, K, D);
        padded entries must be finite (zeros are fine).  Each keypoint set
        is normalised by ITS OWN image shape (``hw1`` defaults to ``hw0``),
        like the torch original."""
        cfg = self.cfg
        kenc = _KeypointEncoder(cfg, name="kenc")
        d0 = desc0.astype(cfg.dtype) + kenc(kpts0, scores0, hw0)
        d1 = desc1.astype(cfg.dtype) + kenc(kpts1, scores1,
                                            hw1 if hw1 is not None else hw0)
        for pair in range(cfg.gnn_layers):
            self_prop = _Propagation(cfg, name=f"g{2 * pair}")
            cross_prop = _Propagation(cfg, name=f"g{2 * pair + 1}")
            d0 = d0 + self_prop(d0, d0, valid0)
            d1 = d1 + self_prop(d1, d1, valid1)
            # cross deltas both read the PRE-update descriptors
            d0n = d0 + cross_prop(d0, d1, valid1)
            d1 = d1 + cross_prop(d1, d0, valid0)
            d0 = d0n
        proj = nn.Dense(cfg.desc_dim, dtype=cfg.dtype, name="final_proj")
        m0, m1 = proj(d0), proj(d1)
        scores = jnp.einsum("bnd,bmd->bnm", m0, m1,
                            preferred_element_type=jnp.float32)
        scores = scores.astype(jnp.float32) / cfg.desc_dim ** 0.5
        alpha = self.param("bin_score", lambda _: jnp.asarray(1.0))
        return log_optimal_transport(scores, alpha, valid0, valid1,
                                     cfg.sinkhorn_iters)


def log_optimal_transport(scores: jnp.ndarray, alpha: jnp.ndarray,
                          valid0: jnp.ndarray, valid1: jnp.ndarray,
                          iters: int) -> jnp.ndarray:
    """Masked log-domain Sinkhorn with a dustbin row/column.

    Matches SuperGlue's ``log_optimal_transport`` on the valid submatrix:
    marginals use the VALID counts and padded rows/columns get ``NEG``
    log-mass, so they transport nothing and the valid block equals the
    unpadded computation.
    """
    b, m, n = scores.shape
    nv0 = jnp.sum(valid0, axis=1).astype(jnp.float32)  # (B,)
    nv1 = jnp.sum(valid1, axis=1).astype(jnp.float32)
    total = jnp.maximum(nv0 + nv1, 1.0)
    norm = -jnp.log(total)[:, None]                    # (B, 1)

    a = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), (b, 1, 1))
    couplings = jnp.concatenate([
        jnp.concatenate([scores, jnp.broadcast_to(a, (b, m, 1))], axis=2),
        jnp.concatenate([jnp.broadcast_to(a, (b, 1, n)), a], axis=2),
    ], axis=1)                                          # (B, m+1, n+1)

    def safe_log(x):
        return jnp.log(jnp.maximum(x, 1e-30))

    log_mu = jnp.concatenate(
        [jnp.where(valid0, norm, NEG), safe_log(nv1)[:, None] + norm],
        axis=1)                                         # (B, m+1)
    log_nu = jnp.concatenate(
        [jnp.where(valid1, norm, NEG), safe_log(nv0)[:, None] + norm],
        axis=1)                                         # (B, n+1)

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return (u, v), None

    init = (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu))
    (u, v), _ = jax.lax.scan(body, init, None, length=iters)
    return couplings + u[:, :, None] + v[:, None, :] - norm[..., None]


@functools.partial(jax.jit, static_argnames=("threshold",))
def match_from_assignment(Z: jnp.ndarray, valid0: jnp.ndarray,
                          valid1: jnp.ndarray, threshold: float = 0.2):
    """Mutual-max matches from the log assignment (SuperGlue decision rule).

    Returns (matches0 (B, K0) int32 index into set 1 or -1,
    mscores0 (B, K0) exp log-prob).
    """
    inner = Z[:, :-1, :-1]
    inner = jnp.where(valid0[:, :, None] & valid1[:, None, :], inner, NEG)
    idx0 = jnp.argmax(inner, axis=2)                    # (B, K0)
    idx1 = jnp.argmax(inner, axis=1)                    # (B, K1)
    max0 = jnp.max(inner, axis=2)
    mutual0 = (jnp.take_along_axis(idx1, idx0, axis=1)
               == jnp.arange(inner.shape[1])[None])
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    ok = mutual0 & (mscores0 > threshold) & valid0
    return jnp.where(ok, idx0, -1).astype(jnp.int32), mscores0


class SuperGlueMatcher:
    """Stateful wrapper: one jitted match step at fixed (K0, K1, hw)."""

    def __init__(self, cfg: SuperGlueConfig = SuperGlueConfig(),
                 params=None, seed: int = 0):
        self.cfg = cfg
        self.model = SuperGlueNet(cfg)
        self.params = params
        self._seed = seed
        self._fwd = jax.jit(self.model.apply, static_argnums=(9, 10))

    def _ensure_params(self, feats0, feats1, hw0, hw1):
        if self.params is None:
            self.params = jax.jit(
                self.model.init, static_argnums=(9, 10))(
                jax.random.PRNGKey(self._seed),
                jnp.asarray(feats0["keypoints"], jnp.float32),
                jnp.asarray(feats0["scores"], jnp.float32),
                jnp.asarray(feats0["descriptors"], jnp.float32),
                jnp.asarray(feats0["valid"], bool),
                jnp.asarray(feats1["keypoints"], jnp.float32),
                jnp.asarray(feats1["scores"], jnp.float32),
                jnp.asarray(feats1["descriptors"], jnp.float32),
                jnp.asarray(feats1["valid"], bool), hw0, hw1)

    def match(self, feats0, feats1, hw: Tuple[int, int],
              hw1: Optional[Tuple[int, int]] = None):
        """feats: dicts with keypoints (B,K,2), scores (B,K),
        descriptors (B,K,D), valid (B,K) — the SuperPointExtractor output.
        ``hw``: image shape of set 0; ``hw1``: of set 1 (defaults to hw).

        Returns (matches0 (B, K0) int32, mscores0 (B, K0)).
        """
        hw0 = tuple(hw)
        hw1 = tuple(hw1) if hw1 is not None else hw0
        self._ensure_params(feats0, feats1, hw0, hw1)
        Z = self._fwd(self.params,
                      jnp.asarray(feats0["keypoints"], jnp.float32),
                      jnp.asarray(feats0["scores"], jnp.float32),
                      jnp.asarray(feats0["descriptors"], jnp.float32),
                      jnp.asarray(feats0["valid"], bool),
                      jnp.asarray(feats1["keypoints"], jnp.float32),
                      jnp.asarray(feats1["scores"], jnp.float32),
                      jnp.asarray(feats1["descriptors"], jnp.float32),
                      jnp.asarray(feats1["valid"], bool), hw0, hw1)
        return match_from_assignment(Z,
                                     jnp.asarray(feats0["valid"], bool),
                                     jnp.asarray(feats1["valid"], bool),
                                     threshold=self.cfg.match_threshold)
