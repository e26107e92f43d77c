"""From-spec timm-style VisionTransformer used to shim ``timm.create_model``.

The reference's LSeg builds its backbone with
``timm.create_model("vit_large_patch16_384", pretrained=True)``
(/root/reference/avlmaps/lseg/modules/models/lseg_vit.py:231) and then
performs surgery on it: forward hooks on ``blocks[i]``, ``forward_flex`` /
``_resize_pos_embed`` bound as methods, and direct attribute access to
``patch_embed.proj`` / ``cls_token`` / ``pos_embed`` / ``pos_drop`` /
``blocks`` / ``norm``.  timm is not installed in this sandbox (and weight
download is network-blocked), so the reference-tree oracle
(tests/test_reference_oracle.py) shims the ``timm`` module with
:func:`create_model` below: a structurally-faithful, seeded-random-init
VisionTransformer matching timm's module tree and forward math
(pre-norm blocks, qkv-fused attention with head_dim**-0.5 scaling, exact
GELU, LayerNorm eps 1e-6).  Only the surface the reference's surgery
touches is implemented — the model's own ``forward`` is never called
(the surgery replaces it with ``forward_flex``).

Weights are random (seeded): the oracle checks OUR flax port against the
reference's own decoder/hook code under identical weights, not against
pretrained artifacts (those need the real network-downloaded files; see
tools/fetch_checkpoints.py).
"""

from __future__ import annotations

import torch
import torch.nn as nn


class Attention(nn.Module):
    """timm vision_transformer.Attention (inference surface)."""

    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = (self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float = 4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class PatchEmbed(nn.Module):
    """Only ``.proj`` is accessed by forward_flex (lseg_vit.py:181); the
    surgery also checks ``hasattr(patch_embed, "backbone")`` — absent here,
    as on timm's plain ViTs."""

    def __init__(self, in_chans: int, embed_dim: int, patch_size: int):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                              stride=patch_size)


class VisionTransformer(nn.Module):
    def __init__(self, img_size: int, patch_size: int, embed_dim: int,
                 depth: int, num_heads: int):
        super().__init__()
        grid = img_size // patch_size
        self.patch_embed = PatchEmbed(3, embed_dim, patch_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, grid * grid + 1, embed_dim))
        self.pos_drop = nn.Dropout(0.0)
        self.blocks = nn.ModuleList(
            [Block(embed_dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)


_SPECS = {
    # name: (img_size, patch, width, depth, heads)
    "vit_large_patch16_384": (384, 16, 1024, 24, 16),
    "vit_base_patch32_384": (384, 32, 768, 12, 12),
    "vit_base_patch16_384": (384, 16, 768, 12, 12),
}


def create_model(name: str, pretrained: bool = False, seed: int = 0,
                 **kwargs) -> VisionTransformer:
    """Shim for ``timm.create_model``.  ``pretrained`` is accepted and
    ignored (no network in this sandbox); every parameter is seeded-random
    so weight-port bugs cannot hide behind zeros or unit scales."""
    if name not in _SPECS:
        raise ValueError(f"timm shim: unknown model {name!r}; "
                         f"supported: {sorted(_SPECS)}")
    img, patch, width, depth, heads = _SPECS[name]
    model = VisionTransformer(img, patch, width, depth, heads)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    return model
