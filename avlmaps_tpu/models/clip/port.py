"""Port OpenAI CLIP checkpoint weights into the flax model.

The reference loads checkpoints through the pip ``clip`` package
(avlmaps/map/vlmap.py:89).  Here a torch ``state_dict`` (from a downloaded
OpenAI CLIP .pt, loaded on CPU) is remapped onto the flax parameter tree.
torch is used only as a file reader on the host — nothing touches the torch
runtime on device.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from avlmaps_tpu.models.clip.model import ClipConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def config_from_state_dict(sd: Dict[str, Any]) -> ClipConfig:
    """Infer the CLIP variant hyper-parameters from checkpoint shapes
    (mirrors how OpenAI's build_model sizes the model from the state dict)."""
    vision_width = _t(sd["visual.conv1.weight"]).shape[0]
    patch = _t(sd["visual.conv1.weight"]).shape[-1]
    n_pos = _t(sd["visual.positional_embedding"]).shape[0]
    image_size = int(round(((n_pos - 1) ** 0.5))) * patch
    vision_layers = len({k.split(".")[3] for k in sd
                         if k.startswith("visual.transformer.resblocks.")})
    text_width = _t(sd["ln_final.weight"]).shape[0]
    text_layers = len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks.")})
    embed_dim = _t(sd["text_projection"]).shape[1]
    context_length = _t(sd["positional_embedding"]).shape[0]
    vocab_size = _t(sd["token_embedding.weight"]).shape[0]
    return ClipConfig(embed_dim=embed_dim, image_size=image_size,
                      patch_size=patch, vision_width=vision_width,
                      vision_layers=vision_layers, text_width=text_width,
                      text_layers=text_layers,
                      text_heads=max(1, text_width // 64),
                      context_length=context_length, vocab_size=vocab_size)


def _block_params(sd, prefix: str) -> Dict[str, Any]:
    """One transformer block: torch fused in_proj -> flax qkv dense."""
    return {
        "ln_1": {"scale": _t(sd[f"{prefix}.ln_1.weight"]),
                 "bias": _t(sd[f"{prefix}.ln_1.bias"])},
        "ln_2": {"scale": _t(sd[f"{prefix}.ln_2.weight"]),
                 "bias": _t(sd[f"{prefix}.ln_2.bias"])},
        "attn": {
            "qkv": {"kernel": _t(sd[f"{prefix}.attn.in_proj_weight"]).T,
                    "bias": _t(sd[f"{prefix}.attn.in_proj_bias"])},
            "out": {"kernel": _t(sd[f"{prefix}.attn.out_proj.weight"]).T,
                    "bias": _t(sd[f"{prefix}.attn.out_proj.bias"])},
        },
        "mlp_fc": {"kernel": _t(sd[f"{prefix}.mlp.c_fc.weight"]).T,
                   "bias": _t(sd[f"{prefix}.mlp.c_fc.bias"])},
        "mlp_proj": {"kernel": _t(sd[f"{prefix}.mlp.c_proj.weight"]).T,
                     "bias": _t(sd[f"{prefix}.mlp.c_proj.bias"])},
    }


def port_clip_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """OpenAI CLIP state dict -> flax params for :class:`Clip`."""
    cfg = config_from_state_dict(sd)
    text: Dict[str, Any] = {
        "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": {"scale": _t(sd["ln_final.weight"]),
                     "bias": _t(sd["ln_final.bias"])},
        "text_projection": _t(sd["text_projection"]),
    }
    for i in range(cfg.text_layers):
        text[f"block_{i}"] = _block_params(sd, f"transformer.resblocks.{i}")

    conv = _t(sd["visual.conv1.weight"])  # (width, 3, p, p) -> (p, p, 3, width)
    visual: Dict[str, Any] = {
        "patch_embed": {"kernel": conv.transpose(2, 3, 1, 0)},
        "class_embedding": _t(sd["visual.class_embedding"]),
        "positional_embedding": _t(sd["visual.positional_embedding"]),
        "ln_pre": {"scale": _t(sd["visual.ln_pre.weight"]),
                   "bias": _t(sd["visual.ln_pre.bias"])},
        "ln_post": {"scale": _t(sd["visual.ln_post.weight"]),
                    "bias": _t(sd["visual.ln_post.bias"])},
        "proj": _t(sd["visual.proj"]),
    }
    for i in range(cfg.vision_layers):
        visual[f"block_{i}"] = _block_params(
            sd, f"visual.transformer.resblocks.{i}")

    return {"params": {"text": text, "visual": visual,
                       "logit_scale": _t(sd["logit_scale"])}}


def load_clip_checkpoint(path: str):
    """Load an OpenAI CLIP .pt (jit archive or plain state dict) OR a
    pre-ported .msgpack (tools/port_checkpoints.py output, with its
    .config.json sidecar) and return (config, flax variables)."""
    if str(path).endswith(".msgpack"):
        return load_clip_msgpack(path)
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
    cfg = config_from_state_dict(sd)
    return cfg, port_clip_state_dict(sd)


def config_to_jsonable(cfg) -> dict:
    """ClipConfig -> plain-JSON dict (dtype dropped; restored as f32)."""
    import dataclasses

    return {k: v for k, v in dataclasses.asdict(cfg).items()
            if k != "dtype"}


def config_from_jsonable(d: dict):
    from avlmaps_tpu.models.clip.model import ClipConfig

    return ClipConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in d.items()})


def load_clip_msgpack(path: str):
    """Pre-ported clip.msgpack (+ clip.config.json sidecar from
    tools/port_checkpoints.py) -> (config, flax variables)."""
    import json
    from pathlib import Path

    from flax import serialization

    p = Path(path)
    cfg_path = p.with_suffix(".config.json")
    if not cfg_path.exists():
        raise FileNotFoundError(
            f"{cfg_path} not found — re-run tools/port_checkpoints.py "
            "(it writes the config sidecar next to the msgpack)")
    cfg = config_from_jsonable(json.loads(cfg_path.read_text()))
    variables = serialization.msgpack_restore(p.read_bytes())
    return cfg, variables
