"""Torch oracle for the OpenAI CLIP ViT image tower, used by golden-parity
tests (the text tower's oracle lives in tests/test_clip.py).  Attribute
names are chosen so ``export_visual_state_dict`` emits the OpenAI
checkpoint's ``visual.*`` key layout (reference bundled copy:
avlmaps/avlmaps/utils/clip_utils.py consumes the pip ``clip`` package whose
model.py defines VisionTransformer with these names).
"""

from __future__ import annotations

import torch
import torch.nn as nn


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    def __init__(self, width: int, heads: int):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width, eps=1e-5)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=False)
        self.ln_2 = nn.LayerNorm(width, eps=1e-5)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, 4 * width))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(4 * width, width))

    def forward(self, x, attn_mask=None):  # (T, B, W)
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchClipText(nn.Module):
    """OpenAI CLIP text transformer (causal mask, EOT-argmax pooling +
    projection) — the tower the reference's get_text_feats runs per query
    (avlmaps/utils/clip_utils.py:133-149 via the pip ``clip`` package).
    Used as the measured CPU cost model for the reference-style query
    baseline (bench.py); from-spec weights."""

    def __init__(self, width: int = 512, layers: int = 12, heads: int = 8,
                 vocab: int = 49408, ctx: int = 77, embed_dim: int = 512):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(torch.empty(ctx, width)
                                                 .normal_(std=0.01))
        self.resblocks = nn.ModuleList(
            [ResidualAttentionBlock(width, heads) for _ in range(layers)])
        self.ln_final = nn.LayerNorm(width, eps=1e-5)
        self.text_projection = nn.Parameter(torch.empty(width, embed_dim)
                                            .normal_(std=width ** -0.5))
        mask = torch.full((ctx, ctx), float("-inf")).triu_(1)
        self.register_buffer("attn_mask", mask, persistent=False)

    def forward(self, tokens):  # (B, ctx) int64
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)  # (T, B, W)
        for blk in self.resblocks:
            x = blk(x, attn_mask=self.attn_mask)
        x = self.ln_final(x.permute(1, 0, 2))
        eot = tokens.argmax(dim=-1)  # highest id = EOT, as in clip/model.py
        pooled = x[torch.arange(x.shape[0]), eot]
        return pooled @ self.text_projection


class TorchClipVision(nn.Module):
    """OpenAI CLIP VisionTransformer (class token + pre/post LN + proj)."""

    def __init__(self, image_size: int, patch_size: int, width: int,
                 layers: int, heads: int, embed_dim: int):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch_size, stride=patch_size,
                               bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n_pos = (image_size // patch_size) ** 2 + 1
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(n_pos, width))
        self.ln_pre = nn.LayerNorm(width, eps=1e-5)
        self.resblocks = nn.ModuleList(
            [ResidualAttentionBlock(width, heads) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width, eps=1e-5)
        self.proj = nn.Parameter(scale * torch.randn(width, embed_dim))

    def forward(self, images):  # (B, 3, H, W)
        x = self.conv1(images)
        b = x.shape[0]
        x = x.reshape(b, x.shape[1], -1).permute(0, 2, 1)  # (B, P, W)
        cls = self.class_embedding.to(x.dtype).expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)
        for blk in self.resblocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        x = self.ln_post(x[:, 0])
        return x @ self.proj


def export_visual_state_dict(model: TorchClipVision) -> dict:
    """Emit the OpenAI ``visual.*`` key layout consumed by
    avlmaps_tpu.models.clip.port.port_clip_state_dict."""
    sd = {
        "visual.conv1.weight": model.conv1.weight,
        "visual.class_embedding": model.class_embedding,
        "visual.positional_embedding": model.positional_embedding,
        "visual.ln_pre.weight": model.ln_pre.weight,
        "visual.ln_pre.bias": model.ln_pre.bias,
        "visual.ln_post.weight": model.ln_post.weight,
        "visual.ln_post.bias": model.ln_post.bias,
        "visual.proj": model.proj,
    }
    for i, blk in enumerate(model.resblocks):
        p = f"visual.transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = blk.ln_1.weight
        sd[f"{p}.ln_1.bias"] = blk.ln_1.bias
        sd[f"{p}.ln_2.weight"] = blk.ln_2.weight
        sd[f"{p}.ln_2.bias"] = blk.ln_2.bias
        sd[f"{p}.attn.in_proj_weight"] = blk.attn.in_proj_weight
        sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias
        sd[f"{p}.attn.out_proj.weight"] = blk.attn.out_proj.weight
        sd[f"{p}.attn.out_proj.bias"] = blk.attn.out_proj.bias
        sd[f"{p}.mlp.c_fc.weight"] = blk.mlp.c_fc.weight
        sd[f"{p}.mlp.c_fc.bias"] = blk.mlp.c_fc.bias
        sd[f"{p}.mlp.c_proj.weight"] = blk.mlp.c_proj.weight
        sd[f"{p}.mlp.c_proj.bias"] = blk.mlp.c_proj.bias
    return sd
