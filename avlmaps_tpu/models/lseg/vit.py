"""Dense ViT backbone with multi-level feature taps.

The reference achieves this by registering forward hooks on a timm ViT and
bilinearly resizing the positional embedding at runtime
(avlmaps/lseg/modules/models/lseg_vit.py:104-201).  Hooks are an artefact of
wrapping a fixed third-party module; here the backbone simply *returns* the
four tapped block outputs — a pure multi-output function that jits into one
XLA program, with the pos-embed resize traced statically per input size.

Architecture matches timm's ``vit_large_patch16_384``: patch conv with bias,
cls token, learned pos-embed, pre-LN blocks with standard (erf) GELU,
LayerNorm eps 1e-6.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from avlmaps_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class DenseViTConfig:
    patch_size: int = 16
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    pretrain_grid: int = 24  # 384 / 16: grid size the pos-embed was trained at
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    # "fused" (default) switches the WHOLE block to the fused Pallas
    # kernels in ops/fused_vit.py — one-shot MHA on the qkv layout +
    # LN/GELU fused into the matmuls; 50.3 ms vs 61.8 ms backbone forward
    # against "flash" at the bench shape (r3).  "flash" keeps the classic
    # Pallas flash-attention kernel with the rest of the block unfused.
    # Both silently fall back to the einsum path off-TPU, so CPU tests and
    # virtual meshes still run
    attn_impl: str = "fused"


def _splash_attention(q, k, v, scale: float):
    """Splash-attention TPU kernel on (B, H, T, D): the newer Pallas MHA
    kernel.  Wins the standalone microbench at the LSeg eval shape (5.99 vs
    6.49 ms per (8,16,1024,64) call) but LOSES in-context inside the full
    ViT-L backbone (r3: 67.0 vs 61.8 ms for 24 layers) — the classic flash
    kernel fuses better at the block boundaries, so "flash" stays the
    default and this is an opt-in experiment knob.  Pads T to a 512
    multiple with segment-id masking like the flash path."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)
    from avlmaps_tpu.ops.fused_vit import FLOP_LOG

    b, h, t, d = q.shape
    FLOP_LOG.append(4 * b * h * t * t * d)
    tp = -(-t // 512) * 512
    pad = tp - t
    mask = sm.MultiHeadMask([sm.FullMask((tp, tp))] * h)
    kern = sk.make_splash_mha(
        mask, head_shards=1, q_seq_shards=1,
        block_sizes=sk.BlockSizes(block_q=min(512, tp), block_kv=min(512, tp),
                                  block_kv_compute=min(512, tp)))
    if pad:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, pad), (0, 0)])
        k = jnp.pad(k, [(0, 0), (0, 0), (0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pad), (0, 0)])
    seg1 = jnp.pad(jnp.ones((t,), jnp.int32), (0, pad), constant_values=2)
    seg = sk.SegmentIds(seg1, seg1)
    out = jax.vmap(lambda qq, kk, vv: kern(qq * scale, kk, vv,
                                           segment_ids=seg))(q, k, v)
    return out[:, :, :t, :] if pad else out


def _flash_attention(q, k, v, scale: float):
    """Pallas TPU flash attention on (B, H, T, D), padding T to a lane-
    friendly multiple with segment-id masking.  ~25% faster than the
    materialised einsum at the LSeg eval shape (B=8, H=16, T=901) — the
    einsum path is HBM-bound on the 415 MB f32 probs tensor."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    from avlmaps_tpu.ops.fused_vit import FLOP_LOG

    b, h, t, d = q.shape
    FLOP_LOG.append(4 * b * h * t * t * d)
    tp = -(-t // 512) * 512
    # biggest power-of-two-ish q block dividing the padded length wins on
    # v5e (measured at T=1024: bq=1024/bk=512 is ~30% faster than 512/512 —
    # fewer grid steps, k-loop still double-buffered)
    bq = 1024 if tp % 1024 == 0 else 512
    bk = min(512, tp)
    bkm = min(1024, tp) if tp % min(1024, tp) == 0 else bk
    bs = BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkm,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq)
    pad = tp - t
    if pad:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, pad), (0, 0)])
        k = jnp.pad(k, [(0, 0), (0, 0), (0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, pad), (0, 0)])
    seg = jnp.pad(jnp.ones((b, t), jnp.int32), [(0, 0), (0, pad)],
                  constant_values=2)
    out = flash_attention(q, k, v, segment_ids=SegmentIds(seg, seg),
                          sm_scale=scale, block_sizes=bs)
    return out[:, :, :t, :] if pad else out


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense``: identical param tree
    (kernel, bias), identical initialisers, no compute — the fused Pallas
    path consumes the raw weights directly."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter-only stand-in for ``nn.LayerNorm`` (scale, bias)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv`` (same kernel layout
    (kh, kw, cin, features), same initialisers)."""

    features: int
    kshape: Tuple[int, ...]  # (kh, kw, cin)

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kshape, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ViTBlock(nn.Module):
    """timm-style pre-LN transformer block (GELU MLP, fused QKV)."""

    width: int
    heads: int
    mlp_ratio: int
    ln_eps: float
    dtype: Any
    attn_impl: str = "flash"

    @nn.compact
    def __call__(self, x, t_real: int | None = None):
        b, t, _ = x.shape
        hd = self.width // self.heads
        if self.attn_impl == "fused":
            from avlmaps_tpu.ops import fused_vit
            if fused_vit.fused_active(self.dtype):
                return self._fused(x, b, t, hd, t_real or t)
            # off-TPU fallback: same params, einsum reference math below
        # LN statistics are f32 regardless of dtype (flax computes stats in
        # f32); emitting at the model dtype instead of f32 halves the LN
        # output traffic feeding the bf16 matmuls (profile r3: the ViT is
        # partially HBM-bound at MFU 0.41) with no change to f32 models
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(z):
            return z.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / np.sqrt(hd)
        # the Pallas kernels compute in bf16 — only take them when the model
        # is ALREADY bf16; an f32-configured model (golden/parity runs)
        # must not silently degrade on TPU, so it falls to the f32 einsum
        use_pallas = (self.attn_impl in ("flash", "splash")
                      and jax.default_backend() == "tpu"
                      and self.dtype == jnp.bfloat16)
        if use_pallas:
            kernel = _splash_attention if self.attn_impl == "splash" \
                else _flash_attention
            attn = kernel(q.astype(jnp.bfloat16),
                          k.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16),
                          scale).astype(self.dtype)
        elif self.attn_impl == "xla":
            # XLA's fused attention path (jax.nn.dot_product_attention,
            # BTHD layout) — an alternative to the Pallas kernel
            attn = jax.nn.dot_product_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), scale=scale).transpose(0, 2, 1, 3)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * scale
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="proj")(attn)

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         name="norm2")(x)
        h = nn.Dense(self.mlp_ratio * self.width, dtype=self.dtype,
                     name="mlp_fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x

    def _fused(self, x, b, t, hd, t_real):
        """Fully-fused block: LN->qkv and LN->fc as single Pallas kernels,
        one-shot MHA on the fused qkv layout (no BTHD transposes, no
        901->1024 pad — the token axis arrives padded only to the next
        8-multiple, 901->904, with pad keys masked), GELU fused into
        mlp_proj.  Matches the reference path within bf16 tolerance
        (tests/test_fused_vit.py); param tree is identical, so ported
        checkpoints work unchanged."""
        from avlmaps_tpu.ops import fused_vit
        from avlmaps_tpu.ops.fused_vit import (gelu_matmul, ln_matmul,
                                               ln_mlp_residual,
                                               mha_oneshot_2d)

        dt = self.dtype
        w = self.width
        g1, c1 = _LNParams(name="norm1")(w)
        kq, bq = _DenseParams(3 * w, name="qkv")(w)
        kp, bp = _DenseParams(w, name="proj")(w)
        g2, c2 = _LNParams(name="norm2")(w)
        kf, bf = _DenseParams(self.mlp_ratio * w, name="mlp_fc")(w)
        km, bm = _DenseParams(w, name="mlp_proj")(self.mlp_ratio * w)

        x2 = x.reshape(b * t, w)
        qkv = ln_matmul(x2, g1, c1, kq.astype(dt), bq, eps=self.ln_eps,
                        out_dtype=dt)
        attn = mha_oneshot_2d(qkv, b, t, self.heads, t_real=t_real,
                              scale=1.0 / float(np.sqrt(hd)))
        x2 = x2 + (attn @ kp.astype(dt) + bp.astype(dt))
        if fused_vit.MLP_FUSE:
            # whole MLP sub-block in one kernel: the (M, 4W) GELU
            # intermediate stays in VMEM (saves its HBM round-trip) and
            # the residual add rides the epilogue
            x2 = ln_mlp_residual(x2, g2, c2, kf.astype(dt), bf,
                                 km.astype(dt), bm, eps=self.ln_eps,
                                 out_dtype=dt)
        else:
            h = ln_matmul(x2, g2, c2, kf.astype(dt), bf, eps=self.ln_eps,
                          out_dtype=dt)
            x2 = x2 + gelu_matmul(h, km.astype(dt), bm, out_dtype=dt)
        return x2.reshape(b, t, w)


class DenseViT(nn.Module):
    """ViT backbone returning the outputs of the hooked blocks.

    Input: NHWC image batch (already normalised).  Output: list of
    (B, 1 + gh*gw, width) activations, one per hook, in hook order —
    exactly what the reference's forward hooks capture (block outputs,
    pre-final-norm).
    """

    cfg: DenseViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        b, h, w, _ = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        # patch embedding as space-to-depth + matmul rather than a strided
        # conv: a C_in=3 conv starves the MXU's 128-deep contraction
        # (profiled r3: 0.93 ms vs 0.06 ms ideal at the bench shape); the
        # reshaped matmul contracts over the full 768-wide patch vector.
        # Param layout stays nn.Conv's (kh, kw, cin, width) for porters.
        ps = cfg.patch_size
        cin = images.shape[-1]
        kernel, kbias = _ConvParams(cfg.width, (ps, ps, cin),
                                    name="patch_embed")()
        x = images.reshape(b, gh, ps, gw, ps, cin).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, ps * ps * cin).astype(cfg.dtype)
        x = (x @ kernel.reshape(ps * ps * cin, cfg.width).astype(cfg.dtype)
             + kbias.astype(cfg.dtype))

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.width)), x],
            axis=1)

        n_pre = cfg.pretrain_grid * cfg.pretrain_grid + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_pre, cfg.width))
        x = x + _resize_pos_embed(pos, cfg.pretrain_grid, gh, gw).astype(
            x.dtype)

        # Mosaic requires Pallas sublane block extents to be 8-multiples,
        # so the fused-kernel path runs the whole backbone at the token
        # count padded up to one (901 -> 904 at the LSeg eval shape): pad
        # rows are zeros whose garbage outputs never escape (taps slice
        # them off; the MHA kernel masks them as keys via t_real).  The
        # unfused paths keep the exact length.
        t_real = x.shape[1]
        if cfg.attn_impl == "fused":
            from avlmaps_tpu.ops import fused_vit
            if fused_vit.fused_active(cfg.dtype):
                pad = (-t_real) % 8
                if pad:
                    x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])

        taps: List[jnp.ndarray] = []
        hook_set = set(cfg.hooks)
        for i in range(cfg.layers):
            x = ViTBlock(cfg.width, cfg.heads, cfg.mlp_ratio, cfg.ln_eps,
                         cfg.dtype, attn_impl=cfg.attn_impl,
                         name=f"block_{i}")(x, t_real)
            if i in hook_set:
                taps.append(x[:, :t_real])
            if len(taps) == len(cfg.hooks) and i >= max(cfg.hooks):
                break  # blocks above the last hook never affect the output
        return taps


def _resize_pos_embed(pos: jnp.ndarray, grid_old: int, gh: int,
                      gw: int) -> jnp.ndarray:
    """Bilinearly resize the grid part of a (1, 1+g*g, D) pos-embed to
    (gh, gw), keeping the cls part (reference _resize_pos_embed,
    lseg_vit.py:149-163; align_corners=False)."""
    if gh == grid_old and gw == grid_old:
        return pos
    tok, grid = pos[:, :1], pos[:, 1:]
    d = grid.shape[-1]
    grid = grid.reshape(1, grid_old, grid_old, d)
    grid = resize_bilinear(grid, gh, gw).reshape(1, gh * gw, d)
    return jnp.concatenate([tok, grid], axis=1)
