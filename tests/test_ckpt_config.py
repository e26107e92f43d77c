"""Checkpoint-path config knobs: real weight files route into the encoders
(AVLMapsConfig.{lseg,clip,audioclip}_ckpt, map_config.superpoint_ckpt)."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

torch = pytest.importorskip("torch")


def test_load_lseg_params_ckpt_and_msgpack(tmp_path):
    from flax import serialization
    from avlmaps_tpu.map.vlmap import load_lseg_params
    from avlmaps_tpu.models.lseg import LSegNet, LSegConfig
    from tools.torch_reference.lseg_torch import (
        TorchLSegSpec, build_torch_lseg, export_reference_state_dict)

    tm = build_torch_lseg(TorchLSegSpec.tiny16(), seed=0)
    ckpt = tmp_path / "demo.ckpt"
    torch.save({"state_dict": export_reference_state_dict(tm)}, ckpt)

    model = LSegNet(LSegConfig.tiny16())
    # .ckpt branch (ViT depth inferred from the file's block keys)
    v1 = load_lseg_params(str(ckpt), model)
    y1 = model.apply(v1, jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert np.isfinite(np.asarray(y1)).all()

    # .msgpack branch
    mp = tmp_path / "lseg.msgpack"
    mp.write_bytes(serialization.to_bytes(v1))
    v2 = load_lseg_params(str(mp), model)
    y2 = model.apply(v2, jnp.zeros((1, 32, 32, 3), jnp.float32))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_avlmap_builds_encoders_from_ckpts(tmp_path):
    """AVLMap with configured clip/audioclip checkpoint paths constructs
    real-weight encoders (sizes inferred from the files)."""
    from avlmaps_tpu.config import load_config
    from avlmaps_tpu.map.avlmap import AVLMap
    from avlmaps_tpu.models.audioclip import AudioClipConfig
    from tests.test_audioclip_port import synth_state_dict
    from tests.test_clip import TINY as CLIP_TINY

    # tiny OpenAI-layout CLIP .pt (text + ViT visual)
    import tests.test_clip as tc

    vit = tc.TestTorchVisionPort()

    class Holder:
        pass

    torch.manual_seed(0)
    from tools.torch_reference.clip_torch import TorchClipVision

    tv = TorchClipVision(image_size=32, patch_size=8, width=32, layers=2,
                         heads=1, embed_dim=16).eval()
    sd = vit._port(tv)
    clip_pt = tmp_path / "ViT-tiny.pt"
    torch.save({k: torch.as_tensor(np.asarray(v.detach() if hasattr(v, "detach") else v))
                for k, v in sd.items()}, clip_pt)

    accfg = AudioClipConfig.tiny()
    ac_sd = {k: torch.as_tensor(v) for k, v in
             synth_state_dict(accfg, np.random.default_rng(1)).items()}
    ac_pt = tmp_path / "AudioCLIP-tiny.pt"
    torch.save(ac_sd, ac_pt)

    cfg = load_config()
    cfg.clip_ckpt = str(clip_pt)
    cfg.audioclip_ckpt = str(ac_pt)
    avlmap = AVLMap(cfg, data_dir=str(tmp_path))
    assert avlmap.area_map.clip_encoder is not None
    assert avlmap.area_map.clip_encoder.feat_dim == CLIP_TINY.embed_dim
    enc = avlmap.sound_map._encoder
    assert enc is not None and enc.cfg.embed_dim == accfg.embed_dim
    # the loaded encoders actually run
    feats = avlmap.area_map.clip_encoder.get_text_feats(["kitchen"])
    assert feats.shape == (1, 16)
