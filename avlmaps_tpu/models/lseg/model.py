"""LSeg: pixel-aligned CLIP features for open-vocabulary segmentation.

The mapping pipeline's flagship encoder (reference LSegEncNet,
avlmaps/lseg/modules/models/lseg_net.py:287-356): a dense ViT-L/16 backbone,
DPT decoder, and a 1x1 head projecting to the 512-d CLIP embedding space with
L2 normalisation and a fixed logit scale (exp(log(1/0.07)), a constant in the
reference since the Parameter is .exp()'d at construction).

Output is the pixel-encoding map at full input resolution (decoder at 1/2,
followed by the head's 2x align_corners upsample — lseg_net.py:333-335).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from avlmaps_tpu.models.lseg.vit import DenseViT, DenseViTConfig
from avlmaps_tpu.models.lseg.dpt import DPTDecoder
from avlmaps_tpu.ops.resize import resize_bilinear_align_corners

LOGIT_SCALE = float(np.exp(np.log(1.0 / 0.07)))  # = 1/0.07, fixed


@dataclasses.dataclass(frozen=True)
class LSegConfig:
    vit: DenseViTConfig = DenseViTConfig()
    features: int = 256
    reassemble_ch: Tuple[int, ...] = (256, 512, 1024, 1024)
    out_dim: int = 512
    dtype: Any = jnp.float32

    @staticmethod
    def vitl16(dtype=jnp.float32) -> "LSegConfig":
        """The reference's clip_vitl16_384 backbone (hooks 5/11/17/23)."""
        return LSegConfig(vit=DenseViTConfig(dtype=dtype), dtype=dtype)

    @staticmethod
    def medium(dtype=jnp.float32) -> "LSegConfig":
        """Mid-scale config for deeper golden parity tests (pairs with
        tools/torch_reference TorchLSegSpec.medium)."""
        return LSegConfig(
            vit=DenseViTConfig(patch_size=16, width=256, layers=12, heads=8,
                               hooks=(2, 5, 8, 11), pretrain_grid=12,
                               dtype=dtype),
            features=64, reassemble_ch=(64, 128, 256, 256), out_dim=96,
            dtype=dtype)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "LSegConfig":
        """Small config for tests (patch 8: output is 2x input size)."""
        return LSegConfig(
            vit=DenseViTConfig(patch_size=8, width=32, layers=4, heads=2,
                               hooks=(0, 1, 2, 3), pretrain_grid=4,
                               dtype=dtype),
            features=16, reassemble_ch=(8, 16, 32, 32), out_dim=24,
            dtype=dtype)

    @staticmethod
    def tiny16(dtype=jnp.float32) -> "LSegConfig":
        """Small patch-16 config: output == input size, as the real model —
        use for pipeline/sliding-window tests."""
        return LSegConfig(
            vit=DenseViTConfig(patch_size=16, width=32, layers=4, heads=2,
                               hooks=(0, 1, 2, 3), pretrain_grid=2,
                               dtype=dtype),
            features=16, reassemble_ch=(8, 16, 32, 32), out_dim=24,
            dtype=dtype)


class LSegNet(nn.Module):
    """Dense pixel-embedding network.

    ``__call__(images)`` -> (B, H, W, out_dim) L2-normalised pixel features
    scaled by the logit scale — the reference's ``pixel_encoding`` output
    (lseg_net.py:312-335) in NHWC.  Text scoring (the reference's second
    output) lives outside the network: score with
    avlmaps_tpu.ops.similarity.score_features against CLIP text features.
    """

    cfg: LSegConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 upsample: bool = True) -> jnp.ndarray:
        """``upsample=False`` returns the normalised features at the
        decoder's half resolution — the final 2x align-corners upsample is
        linear, so callers that only need features at sparse points sample
        the half-res map bilinearly instead (window.features_at_points),
        which is mathematically identical and skips the most
        bandwidth-expensive op of the forward."""
        cfg = self.cfg
        b, h, w, _ = images.shape
        gh, gw = h // cfg.vit.patch_size, w // cfg.vit.patch_size

        taps = DenseViT(cfg.vit, name="backbone")(images)
        path = DPTDecoder(cfg.vit.width, cfg.reassemble_ch, cfg.features,
                          cfg.dtype, name="decoder")(taps, gh, gw)
        feats = nn.Conv(cfg.out_dim, (1, 1), dtype=cfg.dtype,
                        name="head1")(path)

        # L2-normalise per pixel in f32, scale by the fixed logit scale
        feats = feats.astype(jnp.float32)
        norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
        feats = feats / jnp.maximum(norm, 1e-12) * LOGIT_SCALE
        if not upsample:
            # bf16-configured models emit the half-res map in bf16: the
            # cast fuses into the normalise epilogue and HALVES the bytes
            # the downstream point gather reads (the gather is pure HBM
            # traffic — profile r3: ~15% of the build step).  ~0.4% rel
            # feature error, the same scale as the bf16 matmuls that
            # produced the features; f32 models stay f32 end to end.
            if cfg.dtype == jnp.bfloat16:
                return feats.astype(jnp.bfloat16)
            return feats
        # final 2x upsample back to input resolution (align_corners=True)
        ph, pw = feats.shape[1], feats.shape[2]
        return resize_bilinear_align_corners(feats, 2 * ph, 2 * pw)


def init_lseg(cfg: Optional[LSegConfig] = None, image_size: int = 480,
              seed: int = 0):
    """Initialise an LSegNet and its params for a given square crop size."""
    cfg = cfg or LSegConfig.vitl16()
    model = LSegNet(cfg)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), dummy)
    return model, params


def host_init_params(cfg: Optional[LSegConfig] = None, image_size: int = 480,
                     seed: int = 0, scale: float = 0.02):
    """Materialise LSegNet params on the HOST (numpy RNG over the eval_shape
    tree) instead of jitting ``model.init``.

    Prefer this on machines with fast host<->device links (checkpoint-port
    paths materialise host-side anyway); on a slow tunnel the ~1.2 GB
    transfer dominates and the on-device ``jax.jit(model.init)`` is faster.
    Weights are random; use port.py for real checkpoints."""
    cfg = cfg or LSegConfig.vitl16()
    model = LSegNet(cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed),
                            jnp.zeros((1, image_size, image_size, 3),
                                      jnp.float32))
    rng = np.random.default_rng(seed)

    def fill(leaf):
        arr = rng.standard_normal(leaf.shape).astype(np.float32) * scale
        return jnp.asarray(arr, dtype=leaf.dtype)

    return model, jax.tree.map(fill, shapes)


def cast_params_for_inference(variables, dtype=jnp.bfloat16):
    """Pre-cast matrix-shaped params (ndim >= 2: dense/conv kernels,
    pos-embed, cls token) to the compute dtype, once.

    A bf16-configured model otherwise converts every f32 weight to bf16 on
    EVERY forward (flax dtype promotion happens inside apply): profiled r3
    at ~1.7 ms/step just in weight converts on the ViT-L build step.
    Vectors (LayerNorm scales/biases, biases) stay f32 — the kernels fold
    them in f32 anyway — and so do broadcast params with a size-1 axis
    (pos-embed, cls token) and the DPT readout projections, whose cls
    correction term is computed in f32 on purpose (dpt.ProjectReadout);
    those weights are tiny, so their per-step cast is free.  For the cast
    weights the numerics are unchanged: the same cast happened per-step
    before.
    """
    from jax.tree_util import tree_map_with_path

    def cast(path, x):
        if any("readout" in str(getattr(k, "key", "")) for k in path):
            return x
        if getattr(x, "ndim", 0) >= 2 and min(x.shape) > 1:
            return x.astype(dtype)
        return x

    return tree_map_with_path(cast, variables)
