"""Port the public MagicLeap ``superpoint_v1.pth`` weights into the flax
SuperPointNet.

The checkpoint is a flat state dict with keys conv1a..conv4b, convPa/convPb
(detector) and convDa/convDb (descriptor), each with .weight (out, in, kh,
kw) and .bias.  The reference consumes the same weights through HLoc's
extractor (avlmaps/utils/localization_utils.py:127-136,
feature_type 'superpoint_aachen').
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from avlmaps_tpu.models.superpoint.model import SuperPointConfig

_LAYERS = ("conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
           "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb")


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x, np.float32)


def config_from_state_dict(sd: Dict[str, Any]) -> SuperPointConfig:
    return SuperPointConfig(
        channels=(_t(sd["conv1a.weight"]).shape[0],
                  _t(sd["conv2a.weight"]).shape[0],
                  _t(sd["conv3a.weight"]).shape[0],
                  _t(sd["conv4a.weight"]).shape[0]),
        det_ch=_t(sd["convPa.weight"]).shape[0],
        desc_ch=_t(sd["convDa.weight"]).shape[0],
        desc_dim=_t(sd["convDb.weight"]).shape[0])


def port_superpoint_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for name in _LAYERS:
        w = _t(sd[f"{name}.weight"])  # (out, in, kh, kw)
        params[name] = {"kernel": w.transpose(2, 3, 1, 0),
                        "bias": _t(sd[f"{name}.bias"])}
    return {"params": params}


def load_superpoint_checkpoint(path: str):
    """Load superpoint_v1.pth -> (config, flax variables)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return config_from_state_dict(sd), port_superpoint_state_dict(sd)
