"""Port AudioCLIP-Partial-Training.pt weights into the flax model.

The reference loads the checkpoint with strict=False into its torch
AudioCLIP (avlmaps/audioclip/model/audioclip.py:96-108).  Key layout:
CLIP text keys at the top level (transformer.resblocks.N..., ln_final,
token_embedding, positional_embedding, text_projection), the audio tower
under ``audio.*`` (ESResNeXt conv/bn/layer/att/fbsp/fc naming), and the
logit scales, and the RN50 ModifiedResNet visual tower under ``visual.*``
(downsample Sequential named "-1"/"0"/"1" in the OpenAI layout: the conv is
``downsample.0`` and the bn ``downsample.1``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from avlmaps_tpu.models.audioclip.audioclip import AudioClipConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      np.float32)


def _conv(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _bn(sd, key) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{key}.weight"]),
            "bias": _t(sd[f"{key}.bias"]),
            "mean": _t(sd[f"{key}.running_mean"]),
            "var": _t(sd[f"{key}.running_var"])}


def _dense(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _ln(sd, key) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def _text_block(sd, prefix) -> Dict[str, Any]:
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "qkv": {"kernel": _t(sd[f"{prefix}.attn.in_proj_weight"]).T,
                    "bias": _t(sd[f"{prefix}.attn.in_proj_bias"])},
            "out": {"kernel": _t(sd[f"{prefix}.attn.out_proj.weight"]).T,
                    "bias": _t(sd[f"{prefix}.attn.out_proj.bias"])},
        },
        "mlp_fc": _dense(sd, f"{prefix}.mlp.c_fc"),
        "mlp_proj": _dense(sd, f"{prefix}.mlp.c_proj"),
    }


def _attention2d(sd, key) -> Dict[str, Any]:
    return {"conv_depth": _conv(sd, f"{key}.conv_depth"),
            "conv_point": _conv(sd, f"{key}.conv_point"),
            "bn": _bn(sd, f"{key}.bn")}


def config_from_state_dict(sd: Dict[str, Any]) -> AudioClipConfig:
    """Infer the AudioCLIP variant from checkpoint shapes (counts of
    transformer.resblocks / audio.layerX / visual.layerX entries and the
    projection dims), so the porter drives on any-size checkpoints."""
    import dataclasses as _dc

    def stage_counts(prefix):
        out = []
        for stage in range(1, 5):
            blocks = {k.split(".")[2] for k in sd
                      if k.startswith(f"{prefix}.layer{stage}.")}
            out.append(len(blocks))
        return tuple(out)

    text_layers = len({k.split(".")[2] for k in sd
                       if k.startswith("transformer.resblocks.")})
    text_width = _t(sd["ln_final.weight"]).shape[0]
    embed_dim = _t(sd["text_projection"]).shape[1]
    context_length = _t(sd["positional_embedding"]).shape[0]
    vocab_size = _t(sd["token_embedding.weight"]).shape[0]

    base = AudioClipConfig()
    n_out = _t(sd["audio.fbsp.m"]).shape[0]
    audio = _dc.replace(base.audio, layers=stage_counts("audio"),
                        num_classes=embed_dim, n_fft=2 * (n_out - 1))
    # grouped-conv width back-solves groups*width_per_group from conv2
    w2 = _t(sd["audio.layer1.0.conv2.weight"])
    groups = w2.shape[0] // w2.shape[1]
    audio = _dc.replace(audio, groups=groups,
                        width_per_group=w2.shape[0] * 64
                        // (64 * groups))

    vwidth = _t(sd["visual.conv3.weight"]).shape[0]
    n_pos = _t(sd["visual.attnpool.positional_embedding"]).shape[0]
    spatial = int(round((n_pos - 1) ** 0.5))
    c_final = _t(sd["visual.attnpool.k_proj.weight"]).shape[0]
    # OpenAI rule: attnpool heads = vision_width * 32 // 64 = c_final // 64
    # (RN50: 2048 // 64 = 32)
    vision = _dc.replace(base.vision, layers=stage_counts("visual"),
                         width=vwidth, embed_dim=embed_dim,
                         heads=max(1, c_final // 64),
                         image_size=spatial * 32)
    return AudioClipConfig(
        embed_dim=embed_dim, text_width=text_width,
        text_layers=text_layers,
        text_heads=max(1, text_width // 64),
        context_length=context_length, vocab_size=vocab_size,
        audio=audio, vision=vision)


def port_audioclip_state_dict(sd: Dict[str, Any],
                              cfg: AudioClipConfig = AudioClipConfig()
                              ) -> Dict[str, Any]:
    """AudioCLIP torch state dict -> flax variables for
    avlmaps_tpu.models.audioclip.AudioClip."""
    text: Dict[str, Any] = {
        "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _t(sd["text_projection"]),
    }
    for i in range(cfg.text_layers):
        text[f"block_{i}"] = _text_block(sd, f"transformer.resblocks.{i}")

    audio: Dict[str, Any] = {
        "fbsp_m": _t(sd["audio.fbsp.m"]),
        "fbsp_fb": _t(sd["audio.fbsp.fb"]),
        "fbsp_fc": _t(sd["audio.fbsp.fc"]),
        "conv1": _conv(sd, "audio.conv1"),
        "bn1": _bn(sd, "audio.bn1"),
        "fc": _dense(sd, "audio.fc"),
    }
    for stage, n_blocks in enumerate(cfg.audio.layers):
        for blk in range(n_blocks):
            p = f"audio.layer{stage + 1}.{blk}"
            entry: Dict[str, Any] = {
                "conv1": _conv(sd, f"{p}.conv1"),
                "bn1": _bn(sd, f"{p}.bn1"),
                "conv2": _conv(sd, f"{p}.conv2"),
                "bn2": _bn(sd, f"{p}.bn2"),
                "conv3": _conv(sd, f"{p}.conv3"),
                "bn3": _bn(sd, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                entry["downsample_conv"] = _conv(sd, f"{p}.downsample.0")
                entry["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            audio[f"layer{stage + 1}_{blk}"] = entry
    for a in range(1, 6):
        if f"audio.att{a}.conv_depth.weight" in sd:
            audio[f"att{a}"] = _attention2d(sd, f"audio.att{a}")

    visual: Dict[str, Any] = {
        "conv1": _conv(sd, "visual.conv1"),
        "bn1": _bn(sd, "visual.bn1"),
        "conv2": _conv(sd, "visual.conv2"),
        "bn2": _bn(sd, "visual.bn2"),
        "conv3": _conv(sd, "visual.conv3"),
        "bn3": _bn(sd, "visual.bn3"),
        "attnpool": {
            "positional_embedding":
                _t(sd["visual.attnpool.positional_embedding"]),
            "q_proj": _dense(sd, "visual.attnpool.q_proj"),
            "k_proj": _dense(sd, "visual.attnpool.k_proj"),
            "v_proj": _dense(sd, "visual.attnpool.v_proj"),
            "c_proj": _dense(sd, "visual.attnpool.c_proj"),
        },
    }
    for stage, n_blocks in enumerate(cfg.vision.layers):
        for blk in range(n_blocks):
            p = f"visual.layer{stage + 1}.{blk}"
            entry = {
                "conv1": _conv(sd, f"{p}.conv1"),
                "bn1": _bn(sd, f"{p}.bn1"),
                "conv2": _conv(sd, f"{p}.conv2"),
                "bn2": _bn(sd, f"{p}.bn2"),
                "conv3": _conv(sd, f"{p}.conv3"),
                "bn3": _bn(sd, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                entry["downsample_conv"] = _conv(sd, f"{p}.downsample.0")
                entry["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            visual[f"layer{stage + 1}_{blk}"] = entry

    return {"params": {
        "text": text,
        "audio": audio,
        "visual": visual,
        "logit_scale": _t(sd["logit_scale"]).reshape(()),
        "logit_scale_ai": _t(sd["logit_scale_ai"]).reshape(()),
        "logit_scale_at": _t(sd["logit_scale_at"]).reshape(()),
    }}


def load_audioclip_checkpoint(path: str,
                              cfg: Optional[AudioClipConfig] = None):
    """Load AudioCLIP-Partial-Training.pt -> flax variables.  The variant
    config is inferred from the checkpoint shapes unless given."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    if cfg is None:
        cfg = config_from_state_dict(sd)
    return port_audioclip_state_dict(sd, cfg)


def load_audioclip_checkpoint_with_config(path: str):
    """(config, flax variables) from AudioCLIP-Partial-Training.pt or a
    pre-ported .msgpack (+ .config.json sidecar) — the pair
    AudioClipEncoder needs."""
    if str(path).endswith(".msgpack"):
        return load_audioclip_msgpack(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    cfg = config_from_state_dict(sd)
    return cfg, port_audioclip_state_dict(sd, cfg)


def config_to_jsonable(cfg: "AudioClipConfig") -> dict:
    """AudioClipConfig (nested dataclasses) -> plain-JSON dict."""
    import dataclasses

    def strip(d):
        return {k: strip(v) if isinstance(v, dict) else v
                for k, v in d.items() if k != "dtype"}

    return strip(dataclasses.asdict(cfg))


def config_from_jsonable(d: dict) -> "AudioClipConfig":
    from avlmaps_tpu.models.audioclip.esresnet import ESResNeXtConfig
    from avlmaps_tpu.models.audioclip.modified_resnet import (
        ModifiedResNetConfig)

    def tup(v):
        return tuple(v) if isinstance(v, list) else v

    audio = ESResNeXtConfig(**{k: tup(v) for k, v in d["audio"].items()})
    vision = ModifiedResNetConfig(**{k: tup(v)
                                     for k, v in d["vision"].items()})
    rest = {k: tup(v) for k, v in d.items()
            if k not in ("audio", "vision")}
    return AudioClipConfig(audio=audio, vision=vision, **rest)


def load_audioclip_msgpack(path: str):
    """Pre-ported audioclip.msgpack (+ .config.json sidecar) ->
    (config, flax variables)."""
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
