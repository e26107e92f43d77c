"""Port public SuperGlue checkpoints (``superglue_{indoor,outdoor}.pth``)
into the flax SuperGlueNet.

The torch layout (consumed by the reference through HLoc,
avlmaps/utils/localization_utils.py:140-145) is Conv1d/BatchNorm1d
Sequentials; inference-mode BatchNorm is an affine map, so each BN is
folded into its preceding conv here:
``W' = W * (gamma/std), b' = (b - mean) * gamma/std + beta``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from avlmaps_tpu.models.superglue.model import SuperGlueConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                      else x, np.float32)


def _dense(sd: Dict[str, Any], conv: str, bn: str | None = None,
           eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """Conv1d (+ folded BN) -> flax Dense {kernel (in, out), bias (out,)}."""
    w = _t(sd[f"{conv}.weight"])            # (out, in, 1)
    b = _t(sd[f"{conv}.bias"])
    kernel = w[:, :, 0].T                   # (in, out)
    if bn is not None:
        gamma = _t(sd[f"{bn}.weight"])
        beta = _t(sd[f"{bn}.bias"])
        mean = _t(sd[f"{bn}.running_mean"])
        var = _t(sd[f"{bn}.running_var"])
        scale = gamma / np.sqrt(var + eps)
        kernel = kernel * scale[None, :]
        b = (b - mean) * scale + beta
    return {"kernel": kernel, "bias": b}


def config_from_state_dict(sd: Dict[str, Any], heads: int = 4,
                           sinkhorn_iters: int = 100) -> SuperGlueConfig:
    """Infer the SuperGlueConfig from a checkpoint's tensor shapes.

    ``sinkhorn_iters`` defaults to 100 — the MagicLeap/HLoc value the
    reference pipeline runs with (ADVICE r2).  Pass a smaller count as an
    explicit speed knob; the golden test asserts 20 vs 100 agree to float
    tolerance on converged problems, but near-threshold scores can differ.
    """
    desc_dim = _t(sd["final_proj.weight"]).shape[0]
    enc_idx = sorted({int(m.group(1)) for k in sd
                      if (m := re.match(r"kenc\.encoder\.(\d+)\.weight$",
                                        k))})
    # conv positions are 0, 3, 6, ...; BN positions are conv+1
    convs = [i for i in enc_idx if i % 3 == 0]
    kenc_layers = tuple(_t(sd[f"kenc.encoder.{i}.weight"]).shape[0]
                        for i in convs[:-1])
    n_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"gnn\.layers\.(\d+)\.", k)))
    return SuperGlueConfig(desc_dim=desc_dim, kenc_layers=kenc_layers,
                           gnn_layers=n_layers // 2, heads=heads,
                           sinkhorn_iters=sinkhorn_iters)


def port_superglue_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Torch state dict -> flax variables for :class:`SuperGlueNet`."""
    cfg = config_from_state_dict(sd)
    params: Dict[str, Any] = {}

    kenc: Dict[str, Any] = {}
    n_stages = len(cfg.kenc_layers) + 1
    for j in range(n_stages):
        conv = f"kenc.encoder.{3 * j}"
        bn = f"kenc.encoder.{3 * j + 1}" if j < n_stages - 1 else None
        kenc[f"enc{j}"] = _dense(sd, conv, bn)
    params["kenc"] = kenc

    for i in range(2 * cfg.gnn_layers):
        base = f"gnn.layers.{i}"
        params[f"g{i}"] = {
            "q": _dense(sd, f"{base}.attn.proj.0"),
            "k": _dense(sd, f"{base}.attn.proj.1"),
            "v": _dense(sd, f"{base}.attn.proj.2"),
            "merge": _dense(sd, f"{base}.attn.merge"),
            "mlp0": _dense(sd, f"{base}.mlp.0", f"{base}.mlp.1"),
            "mlp1": _dense(sd, f"{base}.mlp.3"),
        }

    params["final_proj"] = _dense(sd, "final_proj")
    params["bin_score"] = _t(sd["bin_score"]).reshape(())
    return {"params": params}


def load_superglue_checkpoint(path: str, sinkhorn_iters: int = 100
                              ) -> Tuple[SuperGlueConfig, Dict[str, Any]]:
    """Load superglue_*.pth -> (config, flax variables).

    ``sinkhorn_iters``: 100 matches the MagicLeap/HLoc pipeline the
    reference runs; lower it explicitly to trade match-score convergence
    for speed."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return (config_from_state_dict(sd, sinkhorn_iters=sinkhorn_iters),
            port_superglue_state_dict(sd))
