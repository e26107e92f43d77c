"""DPT decoder: readout projection, reassemble pyramid, fusion refinement.

Reference plumbing: avlmaps/lseg/modules/models/lseg_vit.py:426-535
(act_postprocess reassemble), lseg_blocks.py:60-110 (_make_scratch) and
:150-360 (ResidualConvUnit_custom / FeatureFusionBlock_custom).

TPU-first notes: everything is NHWC; the reference's BatchNorm2d layers
(inference-only, running stats) are folded into the preceding convs at
weight-port time, so the runtime modules are plain conv+bias — one less
HBM round-trip per conv and nothing to special-case under jit.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from avlmaps_tpu.ops.resize import resize_bilinear_align_corners


class ProjectReadout(nn.Module):
    """Fold the cls token into every patch token: cat(tokens, cls) ->
    Linear(2D -> D) -> GELU (reference ProjectReadout, lseg_vit.py:79-90).

    The concat is algebraic only: cat(t, cls) @ W == t @ W[:D] + cls @ W[D:],
    so the (B, T, 2D) concat tensor is never materialised — the cls term is a
    (B, 1, D) rank-1 correction broadcast into the bias (profile r3: the
    concat copies showed up in the custom-call/fusion budget).  Param tree is
    identical to nn.Dense(name="project") on the concatenated layout."""

    width: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        from avlmaps_tpu.models.lseg.vit import _DenseParams
        k, bias = _DenseParams(self.width, name="project")(2 * d)
        dt = self.dtype
        # cls @ W[D:] + bias: tiny (B, 1, width) term, f32 for free accuracy
        corr = (x[:, :1].astype(jnp.float32) @ k[d:].astype(jnp.float32)
                + bias.astype(jnp.float32)).astype(dt)
        h = x[:, 1:].astype(dt) @ k[:d].astype(dt) + corr
        return jax.nn.gelu(h, approximate=False)


class Reassemble(nn.Module):
    """Tokens -> spatial map at one pyramid scale.

    level 0: 1x1 conv + 4x4/4 transposed conv  (1/4 scale)
    level 1: 1x1 conv + 2x2/2 transposed conv  (1/8)
    level 2: 1x1 conv                          (1/16)
    level 3: 1x1 conv + 3x3/2 strided conv     (1/32)
    (reference act_postprocess1..4, lseg_vit.py:464-535)
    """

    level: int
    vit_width: int
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        x = ProjectReadout(self.vit_width, self.dtype, name="readout")(tokens)
        b = x.shape[0]
        x = x.reshape(b, gh, gw, self.vit_width)
        x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="proj")(x)
        if self.level == 0:
            x = nn.ConvTranspose(self.out_ch, (4, 4), strides=(4, 4),
                                 dtype=self.dtype, name="resample")(x)
        elif self.level == 1:
            x = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name="resample")(x)
        elif self.level == 3:
            x = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name="resample")(x)
        return x


class ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3 -> +x (reference
    ResidualConvUnit_custom with its BatchNorms folded into the convs)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """DPT fusion: merge skip, refine, 2x upsample (align_corners=True),
    1x1 out conv (reference FeatureFusionBlock_custom,
    lseg_blocks.py:292-360)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.dtype,
                                     name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        b, h, w, c = x.shape
        x = resize_bilinear_align_corners(x, 2 * h, 2 * w)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class DPTDecoder(nn.Module):
    """Full decoder: reassemble 4 taps, 3x3 scratch convs, 4 fusion stages.

    Returns the fused feature map at 1/2 input resolution
    (reference LSegEnc.forward, lseg_net.py:296-311).
    """

    vit_width: int = 1024
    reassemble_ch: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray], gh: int,
                 gw: int) -> jnp.ndarray:
        layers = []
        for i, tokens in enumerate(taps):
            x = Reassemble(i, self.vit_width, self.reassemble_ch[i],
                           self.dtype, name=f"reassemble_{i}")(tokens, gh, gw)
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"scratch_{i}")(x)
            layers.append(x)

        path = FeatureFusionBlock(self.features, self.dtype,
                                  name="refinenet4")(layers[3])
        path = FeatureFusionBlock(self.features, self.dtype,
                                  name="refinenet3")(path, layers[2])
        path = FeatureFusionBlock(self.features, self.dtype,
                                  name="refinenet2")(path, layers[1])
        path = FeatureFusionBlock(self.features, self.dtype,
                                  name="refinenet1")(path, layers[0])
        return path
