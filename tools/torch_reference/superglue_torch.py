"""Compact from-spec torch SuperGlue used as a golden oracle.

Mirrors the architecture the reference consumes through HLoc's 'superglue'
matcher (avlmaps/utils/localization_utils.py:140-145,
third_party.SuperGluePretrainedNetwork.models.matching.Matching): keypoint
MLP encoder -> alternating self/cross attentional GNN -> final projection ->
log-domain Sinkhorn optimal transport with a learned dustbin score.

Parameter naming follows the public ``superglue_{indoor,outdoor}.pth``
checkpoints (kenc.encoder.N, gnn.layers.I.attn.proj.{0,1,2} / attn.merge /
mlp.N, final_proj, bin_score) so ``state_dict()`` doubles as a synthetic
reference-named checkpoint for the porter tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import torch
from torch import nn


@dataclass
class TorchSuperGlueSpec:
    desc_dim: int = 256
    kenc_layers: Tuple[int, ...] = (32, 64, 128, 256)
    gnn_layers: int = 9          # self+cross pairs
    heads: int = 4
    sinkhorn_iters: int = 20
    match_threshold: float = 0.2

    @staticmethod
    def tiny() -> "TorchSuperGlueSpec":
        return TorchSuperGlueSpec(desc_dim=32, kenc_layers=(8, 16),
                                  gnn_layers=2, heads=4, sinkhorn_iters=10,
                                  match_threshold=0.2)


def _mlp(channels: List[int]) -> nn.Sequential:
    """Conv1d/BN/ReLU stack in the magicleap Sequential index layout."""
    layers: List[nn.Module] = []
    for i in range(1, len(channels)):
        layers.append(nn.Conv1d(channels[i - 1], channels[i], 1, bias=True))
        if i < len(channels) - 1:
            layers.append(nn.BatchNorm1d(channels[i]))
            layers.append(nn.ReLU())
    return nn.Sequential(*layers)


def normalize_keypoints(kpts: torch.Tensor, hw: Tuple[int, int]):
    h, w = hw
    center = kpts.new_tensor([w / 2.0, h / 2.0])
    scaling = 0.7 * max(h, w)
    return (kpts - center) / scaling


class KeypointEncoder(nn.Module):
    def __init__(self, desc_dim: int, layers: Tuple[int, ...]):
        super().__init__()
        self.encoder = _mlp([3, *layers, desc_dim])
        nn.init.constant_(self.encoder[-1].bias, 0.0)

    def forward(self, kpts, scores):
        # (b, n, 2) + (b, n) -> (b, 3, n) -> (b, d, n)
        inputs = torch.cat([kpts.transpose(1, 2), scores.unsqueeze(1)], 1)
        return self.encoder(inputs)


class MultiHeadedAttention(nn.Module):
    def __init__(self, heads: int, d: int):
        super().__init__()
        assert d % heads == 0
        self.dim = d // heads
        self.heads = heads
        self.merge = nn.Conv1d(d, d, 1)
        self.proj = nn.ModuleList([nn.Conv1d(d, d, 1) for _ in range(3)])

    def forward(self, query, key, value):
        b = query.size(0)
        q, k, v = [layer(x).view(b, self.dim, self.heads, -1)
                   for layer, x in zip(self.proj, (query, key, value))]
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / self.dim ** 0.5
        prob = torch.nn.functional.softmax(scores, dim=-1)
        out = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        return self.merge(out.contiguous().view(b, self.dim * self.heads, -1))


class AttentionalPropagation(nn.Module):
    def __init__(self, d: int, heads: int):
        super().__init__()
        self.attn = MultiHeadedAttention(heads, d)
        self.mlp = _mlp([d * 2, d * 2, d])
        nn.init.constant_(self.mlp[-1].bias, 0.0)

    def forward(self, x, source):
        message = self.attn(x, source, source)
        return self.mlp(torch.cat([x, message], dim=1))


class AttentionalGNN(nn.Module):
    def __init__(self, d: int, heads: int, n_pairs: int):
        super().__init__()
        self.names = ["self", "cross"] * n_pairs
        self.layers = nn.ModuleList(
            [AttentionalPropagation(d, heads) for _ in self.names])

    def forward(self, desc0, desc1):
        for name, layer in zip(self.names, self.layers):
            src0, src1 = (desc0, desc1) if name == "self" else (desc1, desc0)
            desc0 = desc0 + layer(desc0, src0)
            desc1 = desc1 + layer(desc1, src1)
        return desc0, desc1


def log_sinkhorn(Z, log_mu, log_nu, iters: int):
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(Z + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(Z + u.unsqueeze(2), dim=1)
    return Z + u.unsqueeze(2) + v.unsqueeze(1)


def log_optimal_transport(scores, alpha, iters: int):
    b, m, n = scores.shape
    one = scores.new_tensor(1)
    ms, ns = (m * one), (n * one)
    bins0 = alpha.expand(b, m, 1)
    bins1 = alpha.expand(b, 1, n)
    a = alpha.expand(b, 1, 1)
    couplings = torch.cat(
        [torch.cat([scores, bins0], -1), torch.cat([bins1, a], -1)], 1)
    norm = -(ms + ns).log()
    log_mu = torch.cat([norm.expand(m), ns.log()[None] + norm])
    log_nu = torch.cat([norm.expand(n), ms.log()[None] + norm])
    log_mu = log_mu[None].expand(b, -1)
    log_nu = log_nu[None].expand(b, -1)
    Z = log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm


class TorchSuperGlue(nn.Module):
    def __init__(self, spec: TorchSuperGlueSpec = TorchSuperGlueSpec()):
        super().__init__()
        self.spec = spec
        self.kenc = KeypointEncoder(spec.desc_dim, spec.kenc_layers)
        self.gnn = AttentionalGNN(spec.desc_dim, spec.heads, spec.gnn_layers)
        self.final_proj = nn.Conv1d(spec.desc_dim, spec.desc_dim, 1,
                                    bias=True)
        self.bin_score = nn.Parameter(torch.tensor(1.0))

    def forward(self, kpts0, scores0, desc0, kpts1, scores1, desc1,
                hw: Tuple[int, int], hw1: Tuple[int, int] = None):
        """kpts (b, n, 2) xy pixels, scores (b, n), desc (b, n, d).
        ``hw``/``hw1``: per-image shapes (hw1 defaults to hw), as the
        original normalizes each set by its own image.

        Returns (Z (b, m+1, n+1) log assignment, matches0 (b, m) int64,
        mscores0 (b, m)).
        """
        if hw1 is None:
            hw1 = hw
        d0 = desc0.transpose(1, 2)  # (b, d, n)
        d1 = desc1.transpose(1, 2)
        d0 = d0 + self.kenc(normalize_keypoints(kpts0, hw), scores0)
        d1 = d1 + self.kenc(normalize_keypoints(kpts1, hw1), scores1)
        d0, d1 = self.gnn(d0, d1)
        m0, m1 = self.final_proj(d0), self.final_proj(d1)
        scores = torch.einsum("bdn,bdm->bnm", m0, m1)
        scores = scores / self.spec.desc_dim ** 0.5
        Z = log_optimal_transport(scores, self.bin_score,
                                  self.spec.sinkhorn_iters)
        max0 = Z[:, :-1, :-1].max(2)
        max1 = Z[:, :-1, :-1].max(1)
        idx0, idx1 = max0.indices, max1.indices
        arange = torch.arange(idx0.shape[1], device=idx0.device)[None]
        mutual0 = arange == idx1.gather(1, idx0)
        mscores0 = torch.where(mutual0, max0.values.exp(),
                               torch.zeros_like(max0.values))
        valid0 = mutual0 & (mscores0 > self.spec.match_threshold)
        matches0 = torch.where(valid0, idx0, idx0.new_tensor(-1))
        return Z, matches0, mscores0


def build_torch_superglue(spec: TorchSuperGlueSpec, seed: int = 0,
                          gain: float = 1.0) -> TorchSuperGlue:
    """``gain`` scales the attention q/k/v conv weights: near-init weights
    produce near-uniform attention that can mask head-layout bugs in
    parity tests — gain ~3 sharpens the logits so per-head routing errors
    show up as large output differences."""
    torch.manual_seed(seed)
    model = TorchSuperGlue(spec).eval()
    with torch.no_grad():
        if gain != 1.0:
            for layer in model.gnn.layers:
                for proj in layer.attn.proj:
                    proj.weight.mul_(gain)
    # give BN running stats non-trivial values so folding is exercised
    with torch.no_grad():
        g = torch.Generator().manual_seed(seed + 1)
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm1d):
                mod.running_mean.copy_(
                    torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(
                    1.0 + 0.2 * torch.rand(mod.num_features, generator=g))
                mod.weight.copy_(
                    1.0 + 0.1 * torch.randn(mod.num_features, generator=g))
                mod.bias.copy_(
                    0.1 * torch.randn(mod.num_features, generator=g))
    return model


def export_reference_state_dict(model: TorchSuperGlue):
    """state_dict with the public checkpoint's key naming (it already is)."""
    return {k: v.detach().clone() for k, v in model.state_dict().items()}
