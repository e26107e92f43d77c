"""Torch oracle for SuperPoint (the MagicLeap SuperPointNet layout), used by
the golden-parity tests.  Attribute names match superpoint_v1.pth's keys, so
``model.state_dict()`` feeds avlmaps_tpu.models.superpoint.port directly.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchSuperPoint(nn.Module):
    def __init__(self, channels=(64, 64, 128, 128), det_ch=256,
                 desc_ch=256, desc_dim=256):
        super().__init__()
        c1, c2, c3, c4 = channels
        self.conv1a = nn.Conv2d(1, c1, 3, padding=1)
        self.conv1b = nn.Conv2d(c1, c1, 3, padding=1)
        self.conv2a = nn.Conv2d(c1, c2, 3, padding=1)
        self.conv2b = nn.Conv2d(c2, c2, 3, padding=1)
        self.conv3a = nn.Conv2d(c2, c3, 3, padding=1)
        self.conv3b = nn.Conv2d(c3, c3, 3, padding=1)
        self.conv4a = nn.Conv2d(c3, c4, 3, padding=1)
        self.conv4b = nn.Conv2d(c4, c4, 3, padding=1)
        self.convPa = nn.Conv2d(c4, det_ch, 3, padding=1)
        self.convPb = nn.Conv2d(det_ch, 65, 1)
        self.convDa = nn.Conv2d(c4, desc_ch, 3, padding=1)
        self.convDb = nn.Conv2d(desc_ch, desc_dim, 1)

    def forward(self, gray):  # (B, 1, H, W)
        x = F.relu(self.conv1a(gray))
        x = F.relu(self.conv1b(x))
        x = F.max_pool2d(x, 2)
        x = F.relu(self.conv2a(x))
        x = F.relu(self.conv2b(x))
        x = F.max_pool2d(x, 2)
        x = F.relu(self.conv3a(x))
        x = F.relu(self.conv3b(x))
        x = F.max_pool2d(x, 2)
        x = F.relu(self.conv4a(x))
        x = F.relu(self.conv4b(x))

        p = F.relu(self.convPa(x))
        logits = self.convPb(p)
        probs = logits.softmax(dim=1)[:, :64]
        b, _, hc, wc = probs.shape
        scores = probs.reshape(b, 8, 8, hc, wc).permute(0, 3, 1, 4, 2)
        scores = scores.reshape(b, hc * 8, wc * 8)

        d = F.relu(self.convDa(x))
        desc = self.convDb(d)
        desc = desc / desc.norm(dim=1, keepdim=True).clamp_min(1e-8)
        return scores, desc
