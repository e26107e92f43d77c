"""From-spec torch NetVLAD oracle for golden tests.

Independent re-derivation of the NetVLAD descriptor (Arandjelovic et al.,
CVPR'16; matconvnet vd16_pitts30k_conv5_3_vlad_preL2_intra_white semantics
as used by hloc, which the reference selects at
avlmaps/utils/localization_utils.py:134-136).  Mirrors
avlmaps_tpu/models/netvlad/model.py in torch NCHW so the flax module can be
activation-compared against a foreign implementation.
"""

from __future__ import annotations

import dataclasses

import torch
import torch.nn as nn
import torch.nn.functional as F


@dataclasses.dataclass
class TorchNetVLADSpec:
    clusters: int = 4
    dim: int = 32
    whiten_dim: int = 16


class TorchNetVLAD(nn.Module):
    """Tiny-plan backbone (conv, pool, conv) + VLAD head — the same tiny
    plan NetVLADConfig.tiny() selects, for cross-framework parity."""

    def __init__(self, spec: TorchNetVLADSpec):
        super().__init__()
        self.spec = spec
        d = spec.dim
        self.conv0 = nn.Conv2d(3, d, 3, padding=1)
        self.conv1 = nn.Conv2d(d, d, 3, padding=1)
        self.assign = nn.Linear(d, spec.clusters)
        self.centers = nn.Parameter(torch.randn(spec.clusters, d))
        self.whiten = nn.Linear(spec.clusters * d, spec.whiten_dim)

    def forward(self, x: torch.Tensor) -> torch.Tensor:  # (B, 3, H, W)
        x = F.relu(self.conv0(x))
        x = F.max_pool2d(x, 2, 2)
        x = self.conv1(x)  # no ReLU on the tapped conv
        b, d, h, w = x.shape
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, d)
        x = F.normalize(x, dim=-1)
        a = torch.softmax(self.assign(x), dim=-1)  # (B, N, K)
        agg = torch.einsum("bnk,bnd->bkd", a, x)
        vlad = agg - a.sum(1)[..., None] * self.centers[None]
        vlad = F.normalize(vlad, dim=-1)  # intra-norm
        vlad = F.normalize(vlad.reshape(b, -1), dim=-1)
        return F.normalize(self.whiten(vlad), dim=-1)
