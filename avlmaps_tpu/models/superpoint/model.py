"""SuperPoint keypoint detector + descriptor in flax.

The reference localizes with HLoc's SuperPoint + SuperGlue
(avlmaps/utils/localization_utils.py:127-145 configure the
'superpoint_aachen' / 'superglue' pipelines).  This is the standard
MagicLeap SuperPointNet architecture re-implemented TPU-first:

* NHWC, static shapes end to end — detection returns a FIXED number of
  keypoints (top-K by score after dilation-based NMS), with a validity mask
  instead of a dynamic count, so the whole extract step jits once;
* NMS is a max-pool comparison (score == dilated score), not the
  reference's iterative grid suppression — same radius semantics;
* descriptor sampling is align-corners bilinear at the keypoint coords on
  the 1/8-resolution descriptor map, matching SuperPoint's
  ``grid_sample`` usage.

Weights port from the public ``superpoint_v1.pth`` via ``port.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class SuperPointConfig:
    channels: Tuple[int, ...] = (64, 64, 128, 128)  # c1..c4 (two convs each)
    det_ch: int = 256
    desc_ch: int = 256
    desc_dim: int = 256
    nms_radius: int = 4
    max_keypoints: int = 1024
    score_threshold: float = 0.005
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "SuperPointConfig":
        return SuperPointConfig(channels=(8, 8, 16, 16), det_ch=32,
                                desc_ch=32, desc_dim=32, max_keypoints=64,
                                score_threshold=0.0)


class SuperPointNet(nn.Module):
    """VGG encoder + detector/descriptor heads (MagicLeap layout)."""

    cfg: SuperPointConfig

    @nn.compact
    def __call__(self, gray: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """gray: (B, H, W, 1) in [0, 1]; H, W multiples of 8.

        Returns (scores (B, H, W), descriptors (B, H/8, W/8, D)
        L2-normalised).
        """
        cfg = self.cfg
        c1, c2, c3, c4 = cfg.channels
        x = gray.astype(cfg.dtype)

        def conv(z, ch, name):
            return jax.nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                       dtype=cfg.dtype, name=name)(z))

        def pool(z):
            return nn.max_pool(z, (2, 2), strides=(2, 2))

        x = conv(x, c1, "conv1a")
        x = conv(x, c1, "conv1b")
        x = pool(x)
        x = conv(x, c2, "conv2a")
        x = conv(x, c2, "conv2b")
        x = pool(x)
        x = conv(x, c3, "conv3a")
        x = conv(x, c3, "conv3b")
        x = pool(x)
        x = conv(x, c4, "conv4a")
        x = conv(x, c4, "conv4b")

        # detector head: 65 = 8x8 cells + dustbin
        p = conv(x, cfg.det_ch, "convPa")
        logits = nn.Conv(65, (1, 1), dtype=cfg.dtype, name="convPb")(p)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :64]
        b, hc, wc, _ = probs.shape
        # depth-to-space: (B, Hc, Wc, 8*8) -> (B, Hc*8, Wc*8)
        scores = probs.reshape(b, hc, wc, 8, 8).transpose(0, 1, 3, 2, 4)
        scores = scores.reshape(b, hc * 8, wc * 8)

        d = conv(x, cfg.desc_ch, "convDa")
        desc = nn.Conv(cfg.desc_dim, (1, 1), dtype=cfg.dtype,
                       name="convDb")(d)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return scores, desc


def nms_scores(scores: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Keep only local maxima within ``radius`` (max-pool NMS, the batched
    equivalent of SuperPoint's iterative suppression)."""
    k = 2 * radius + 1
    pooled = nn.max_pool(scores[..., None], (k, k), strides=(1, 1),
                         padding=[(radius, radius), (radius, radius)])[..., 0]
    return jnp.where(scores == pooled, scores, 0.0)


@functools.partial(jax.jit, static_argnames=("max_kp", "radius"))
def select_keypoints(scores: jnp.ndarray, max_kp: int, radius: int,
                     threshold: float):
    """(B, H, W) scores -> fixed-size keypoints.

    Returns (xy (B, K, 2) float32 pixel coords, score (B, K), valid (B, K)).
    """
    b, h, w = scores.shape
    s = nms_scores(scores, radius)
    flat = s.reshape(b, -1)
    top, idx = jax.lax.top_k(flat, max_kp)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    xy = jnp.stack([xs, ys], axis=-1)
    valid = top > threshold
    return xy, top, valid


@jax.jit
def sample_descriptors(desc_map: jnp.ndarray, xy: jnp.ndarray
                       ) -> jnp.ndarray:
    """Bilinear-sample the 1/8-res descriptor map at full-res pixel coords
    and re-normalise.

    Exactly MagicLeap's mapping (superpoint.py sample_descriptors):
    ``g = 2*(x - 3.5)/(8*wc - 4.5) - 1`` through ``grid_sample`` with
    ``align_corners=True`` gives cell coord ``(x - 3.5)*(wc - 1)/(8*wc -
    4.5)`` — NOT ``(x - 3.5)/8``; the difference grows toward the
    right/bottom edge (~0.4 cells at the border).  Border clamping here
    matches grid_sample's zeros padding after the final L2 renorm (an
    out-of-range neighbour only rescales the in-range contribution).

    desc_map: (B, Hc, Wc, D); xy: (B, K, 2) full-res (x, y).
    """
    bsz, hc, wc, d = desc_map.shape
    sx = (xy[..., 0] - 3.5) * ((wc - 1) / (8.0 * wc - 4.5))
    sy = (xy[..., 1] - 3.5) * ((hc - 1) / (8.0 * hc - 4.5))
    x0 = jnp.clip(jnp.floor(sx), 0, wc - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(sy), 0, hc - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, wc - 1)
    y1 = jnp.minimum(y0 + 1, hc - 1)
    fx = jnp.clip(sx - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(sy - y0, 0.0, 1.0)[..., None]

    def g(yy, xx):
        return jax.vmap(lambda m, r, c: m[r, c])(desc_map, yy, xx)

    out = ((1 - fy) * (1 - fx) * g(y0, x0) + (1 - fy) * fx * g(y0, x1)
           + fy * (1 - fx) * g(y1, x0) + fy * fx * g(y1, x1))
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True),
                             1e-8)


@functools.partial(jax.jit, static_argnames=("ratio",))
def mutual_nearest_matches(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                           valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                           min_score: float = 0.0,
                           ratio: bool = False):
    """Mutual-nearest-neighbour matching on device (one (Ka, Kb) matmul).

    Returns (match_idx (Ka,) int32 — index into b or -1, score (Ka,)).
    Replaces the reference's SuperGlue GNN with the standard MNN matcher
    (SuperGlue's fallback baseline); cross-check + optional Lowe ratio.
    """
    sim = desc_a @ desc_b.T  # cosine (descs are unit)
    neg = -jnp.inf
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, neg)
    best_ab = jnp.argmax(sim, axis=1)
    best_ba = jnp.argmax(sim, axis=0)
    score = jnp.max(sim, axis=1)
    mutual = best_ba[best_ab] == jnp.arange(sim.shape[0])
    ok = mutual & (score > min_score) & valid_a
    if ratio:
        top2 = jax.lax.top_k(sim, 2)[0]
        ok = ok & (top2[:, 1] < 0.95 * top2[:, 0])
    return jnp.where(ok, best_ab, -1).astype(jnp.int32), score


class SuperPointExtractor:
    """Stateful wrapper: jitted extract step at a fixed input size."""

    def __init__(self, cfg: SuperPointConfig = SuperPointConfig(),
                 params=None, seed: int = 0):
        self.cfg = cfg
        self.model = SuperPointNet(cfg)
        self.params = params
        self._fwd = jax.jit(self.model.apply)
        self._seed = seed

    def _ensure_params(self, gray: jnp.ndarray):
        if self.params is None:
            self.params = jax.jit(self.model.init)(
                jax.random.PRNGKey(self._seed), gray)

    def extract(self, images_gray: "jnp.ndarray"):
        """(B, H, W) float32 [0,1] -> dict of fixed-size keypoint batches."""
        import numpy as np

        g = jnp.asarray(images_gray, jnp.float32)[..., None]
        h, w = g.shape[1:3]
        ph = (8 - h % 8) % 8
        pw = (8 - w % 8) % 8
        if ph or pw:
            g = jnp.pad(g, [(0, 0), (0, ph), (0, pw), (0, 0)])
        self._ensure_params(g)
        scores, desc_map = self._fwd(self.params, g)
        if ph:
            scores = scores.at[:, h:, :].set(0.0)
        if pw:
            scores = scores.at[:, :, w:].set(0.0)
        xy, sc, valid = select_keypoints(scores, self.cfg.max_keypoints,
                                         self.cfg.nms_radius,
                                         self.cfg.score_threshold)
        desc = sample_descriptors(desc_map, xy)
        return {
            "keypoints": np.asarray(jax.device_get(xy)),
            "scores": np.asarray(jax.device_get(sc)),
            "valid": np.asarray(jax.device_get(valid)),
            "descriptors": np.asarray(jax.device_get(desc)),
        }
