"""NetVLAD global image descriptor (VGG16-conv5_3 backbone + VLAD head).

The reference's visual localization retrieves mapping frames with HLoc's
NetVLAD ("VGG16-NetVLAD-Pitts30K") global descriptors
(/root/reference/avlmaps/utils/localization_utils.py:134-136 selects the
hloc ``netvlad`` conf; descriptors are cached per frame :310-406 and queried
with an einsum :408-447).  avlmaps_tpu defaults to CLIP-global retrieval
(map/visual_map.py) — this module provides the reference's descriptor class
as a drop-in alternative for users who want retrieval parity.

Architecture (Arandjelovic et al., CVPR'16; matconvnet
``vd16_pitts30k_conv5_3_vlad_preL2_intra_white`` as shipped by hloc):

* VGG16 conv1_1 .. conv5_3 (13 3x3 convs, 4 max-pools), ReLU after every
  conv except the last — conv5_3's raw activations are the local
  descriptors D=512;
* pre-L2: descriptors L2-normalised over channels;
* soft assignment: 1x1 conv D->K (K=64 clusters) + softmax;
* VLAD: per-cluster weighted residual sums against learned centers,
  intra-normalisation per cluster, flatten to K*D, global L2;
* whitening: affine projection K*D -> 4096 + final L2.

Inputs are RGB float arrays in [0, 255] minus the checkpoint's average
image (matconvnet convention; the porter stores it in the params).  All
conv/matmul work is NHWC jax under jit — one fused device program per
image batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# conv channel plan of VGG16 features up to conv5_3; "M" = 2x2/2 max-pool
VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)


@dataclasses.dataclass(frozen=True)
class NetVLADConfig:
    clusters: int = 64
    dim: int = 512  # conv5_3 channels
    whiten_dim: int = 4096
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "NetVLADConfig":
        return NetVLADConfig(clusters=4, dim=32, whiten_dim=16)


class VGGBackbone(nn.Module):
    """VGG16 conv stack up to conv5_3 (no ReLU on the last conv —
    matconvnet's NetVLAD taps the pre-activation conv5_3 output)."""

    cfg: NetVLADConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        plan = VGG16_PLAN if self.cfg.dim == 512 else \
            (self.cfg.dim, "M", self.cfg.dim)  # tiny test plan
        conv_i = 0
        n_convs = sum(1 for p in plan if p != "M")
        for p in plan:
            if p == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(int(p), (3, 3), padding=1, dtype=self.cfg.dtype,
                        name=f"conv_{conv_i}")(x)
            conv_i += 1
            if conv_i < n_convs:  # all but conv5_3 get ReLU
                x = jax.nn.relu(x)
        return x


class NetVLAD(nn.Module):
    """Full descriptor network: backbone + VLAD aggregation + whitening.

    ``__call__(images)``: (B, H, W, 3) float32, RGB in [0, 255] with the
    average image already subtracted -> (B, whiten_dim) L2-normalised.
    """

    cfg: NetVLADConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = VGGBackbone(cfg, name="backbone")(images)  # (B, h, w, D)
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d).astype(jnp.float32)

        # pre-L2 over channels
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                            1e-12)

        # soft assignment (1x1 conv == dense over channels) + softmax
        logits = nn.Dense(cfg.clusters, name="assign")(x)  # (B, N, K)
        assign = jax.nn.softmax(logits, axis=-1)

        centers = self.param(
            "centers", nn.initializers.normal(1.0), (cfg.clusters, d))
        # VLAD residual aggregation:
        #   vlad[k] = sum_n a[n,k] * (x[n] - c[k])
        #           = (a^T @ x)[k] - (sum_n a[n,k]) * c[k]
        agg = jnp.einsum("bnk,bnd->bkd", assign, x,
                         preferred_element_type=jnp.float32)
        mass = assign.sum(axis=1)  # (B, K)
        vlad = agg - mass[..., None] * centers[None]

        # intra-normalisation per cluster, flatten, global L2
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)
        vlad = vlad.reshape(b, cfg.clusters * d)
        vlad = vlad / jnp.maximum(
            jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-12)

        # whitening projection + final L2
        out = nn.Dense(cfg.whiten_dim, name="whiten")(vlad)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


class NetVLADEncoder:
    """Host-facing wrapper mirroring ClipEncoder's retrieval interface
    (get_img_feats / get_imgs_feats_batch / feat_dim)."""

    def __init__(self, cfg: NetVLADConfig = NetVLADConfig(), params=None,
                 average_image: np.ndarray | None = None, seed: int = 0,
                 image_size: int = 224):
        self.cfg = cfg
        self.model = NetVLAD(cfg)
        self.average_image = (
            np.zeros(3, np.float32) if average_image is None
            else np.asarray(average_image, np.float32).reshape(-1)[:3])
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, image_size, image_size, 3), jnp.float32))
        self.params = params
        self._fwd = jax.jit(self.model.apply)

    @property
    def feat_dim(self) -> int:
        return self.cfg.whiten_dim

    def _prep(self, images) -> np.ndarray:
        arr = np.stack([np.asarray(im, np.float32) for im in images])
        return arr - self.average_image  # RGB [0,255] minus channel means

    def get_img_feats(self, image: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(self.params,
                                    jnp.asarray(self._prep([image]))))

    def get_imgs_feats_batch(self, images, batch_size: int = 16
                             ) -> np.ndarray:
        outs = []
        for s in range(0, len(images), batch_size):
            outs.append(np.asarray(self._fwd(
                self.params, jnp.asarray(self._prep(images[s:s + batch_size])
                                         ))))
        return np.concatenate(outs)
