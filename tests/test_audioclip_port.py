"""AudioCLIP weight-port plumbing: a reference-style state dict with the
exact key layout round-trips into the flax tree and runs."""

import numpy as np
import jax.numpy as jnp
import pytest

from avlmaps_tpu.models.audioclip import AudioClipConfig, AudioClip
from avlmaps_tpu.models.audioclip.port import port_audioclip_state_dict


def synth_state_dict(cfg: AudioClipConfig, rng):
    """Build a torch-style AudioCLIP state dict with the reference key
    naming, sized for ``cfg`` (numpy tensors are accepted by the porter)."""
    sd = {}
    W, L, E, CTX, V = (cfg.text_width, cfg.text_layers, cfg.embed_dim,
                       cfg.context_length, cfg.vocab_size)
    sd["token_embedding.weight"] = rng.normal(size=(V, W)).astype(np.float32)
    sd["positional_embedding"] = rng.normal(size=(CTX, W)).astype(np.float32)
    sd["ln_final.weight"] = np.ones(W, np.float32)
    sd["ln_final.bias"] = np.zeros(W, np.float32)
    sd["text_projection"] = rng.normal(size=(W, E)).astype(np.float32)
    for i in range(L):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = np.ones(W, np.float32)
        sd[f"{p}.ln_1.bias"] = np.zeros(W, np.float32)
        sd[f"{p}.ln_2.weight"] = np.ones(W, np.float32)
        sd[f"{p}.ln_2.bias"] = np.zeros(W, np.float32)
        sd[f"{p}.attn.in_proj_weight"] = rng.normal(
            size=(3 * W, W)).astype(np.float32)
        sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * W, np.float32)
        sd[f"{p}.attn.out_proj.weight"] = rng.normal(
            size=(W, W)).astype(np.float32)
        sd[f"{p}.attn.out_proj.bias"] = np.zeros(W, np.float32)
        sd[f"{p}.mlp.c_fc.weight"] = rng.normal(
            size=(4 * W, W)).astype(np.float32)
        sd[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * W, np.float32)
        sd[f"{p}.mlp.c_proj.weight"] = rng.normal(
            size=(W, 4 * W)).astype(np.float32)
        sd[f"{p}.mlp.c_proj.bias"] = np.zeros(W, np.float32)

    a = cfg.audio
    n_out = a.n_fft // 2 + 1
    # m = 1.0: the complex-power branch is exact there.  Fractional m is
    # covered by test_audioclip.py::TestFBSP (the (mag²)^(m/2) term near
    # sinc zeros amplifies f32 representation noise ~1e5x, which would
    # swamp an end-to-end activation comparison without testing anything)
    sd["audio.fbsp.m"] = np.full(n_out, 1.0, np.float32)
    sd["audio.fbsp.fb"] = np.full(n_out, 1.5, np.float32)
    sd["audio.fbsp.fc"] = np.arange(n_out, dtype=np.float32)
    sd["audio.conv1.weight"] = rng.normal(size=(64, 3, 7, 7)).astype(
        np.float32) * 0.05
    sd["audio.bn1.weight"] = np.ones(64, np.float32)
    sd["audio.bn1.bias"] = np.zeros(64, np.float32)
    sd["audio.bn1.running_mean"] = rng.normal(size=64).astype(np.float32)
    sd["audio.bn1.running_var"] = np.abs(rng.normal(size=64)).astype(
        np.float32) + 0.5

    def add_bn(key, ch):
        # randomised running stats: parity tests then exercise the frozen-BN
        # folding, not just the conv kernels
        sd[f"{key}.weight"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
        sd[f"{key}.bias"] = (rng.normal(size=ch) * 0.1).astype(np.float32)
        sd[f"{key}.running_mean"] = (rng.normal(size=ch) * 0.2).astype(
            np.float32)
        sd[f"{key}.running_var"] = (np.abs(rng.normal(size=ch)) * 0.5
                                    + 0.5).astype(np.float32)

    planes = (64, 128, 256, 512)
    in_ch = 64
    for stage, n_blocks in enumerate(a.layers):
        for blk in range(n_blocks):
            p = f"audio.layer{stage + 1}.{blk}"
            width = int(planes[stage] * a.width_per_group / 64.0) * a.groups
            out_ch = planes[stage] * 4
            stride_block = blk == 0
            sd[f"{p}.conv1.weight"] = rng.normal(
                size=(width, in_ch, 1, 1)).astype(np.float32) * 0.05
            add_bn(f"{p}.bn1", width)
            sd[f"{p}.conv2.weight"] = rng.normal(
                size=(width, width // a.groups, 3, 3)).astype(
                    np.float32) * 0.05
            add_bn(f"{p}.bn2", width)
            sd[f"{p}.conv3.weight"] = rng.normal(
                size=(out_ch, width, 1, 1)).astype(np.float32) * 0.05
            add_bn(f"{p}.bn3", out_ch)
            if stride_block and in_ch != out_ch or (stride_block
                                                    and stage > 0):
                sd[f"{p}.downsample.0.weight"] = rng.normal(
                    size=(out_ch, in_ch, 1, 1)).astype(np.float32) * 0.05
                add_bn(f"{p}.downsample.1", out_ch)
            in_ch = out_ch
    att_specs = [(64, 256, (3, 1)), (256, 512, (1, 5)), (512, 1024, (3, 1)),
                 (1024, 2048, (1, 5)), (2048, 2048, (3, 5))]
    for ai, (cin, cout, ks) in enumerate(att_specs, start=1):
        key = f"audio.att{ai}"
        sd[f"{key}.conv_depth.weight"] = rng.normal(
            size=(cin, 1, *ks)).astype(np.float32) * 0.05
        sd[f"{key}.conv_depth.bias"] = np.zeros(cin, np.float32)
        sd[f"{key}.conv_point.weight"] = rng.normal(
            size=(cout, cin, 1, 1)).astype(np.float32) * 0.05
        sd[f"{key}.conv_point.bias"] = np.zeros(cout, np.float32)
        add_bn(f"{key}.bn", cout)
    sd["audio.fc.weight"] = rng.normal(size=(E, 2048)).astype(
        np.float32) * 0.05
    sd["audio.fc.bias"] = np.zeros(E, np.float32)

    # RN50 ModifiedResNet visual tower (OpenAI key layout)
    v = cfg.vision
    w = v.width
    sd["visual.conv1.weight"] = rng.normal(size=(w // 2, 3, 3, 3)).astype(
        np.float32) * 0.05
    add_bn("visual.bn1", w // 2)
    sd["visual.conv2.weight"] = rng.normal(
        size=(w // 2, w // 2, 3, 3)).astype(np.float32) * 0.05
    add_bn("visual.bn2", w // 2)
    sd["visual.conv3.weight"] = rng.normal(size=(w, w // 2, 3, 3)).astype(
        np.float32) * 0.05
    add_bn("visual.bn3", w)
    vin = w
    for stage, n_blocks in enumerate(v.layers):
        planes = w * (2 ** stage)
        for blk in range(n_blocks):
            p = f"visual.layer{stage + 1}.{blk}"
            sd[f"{p}.conv1.weight"] = rng.normal(
                size=(planes, vin, 1, 1)).astype(np.float32) * 0.05
            add_bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = rng.normal(
                size=(planes, planes, 3, 3)).astype(np.float32) * 0.05
            add_bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = rng.normal(
                size=(planes * 4, planes, 1, 1)).astype(np.float32) * 0.05
            add_bn(f"{p}.bn3", planes * 4)
            if blk == 0 and (stage > 0 or vin != planes * 4):
                sd[f"{p}.downsample.0.weight"] = rng.normal(
                    size=(planes * 4, vin, 1, 1)).astype(np.float32) * 0.05
                add_bn(f"{p}.downsample.1", planes * 4)
            vin = planes * 4
    spatial = v.image_size // 32
    sd["visual.attnpool.positional_embedding"] = rng.normal(
        size=(spatial * spatial + 1, vin)).astype(np.float32) * 0.02
    for proj, odim in (("q_proj", vin), ("k_proj", vin), ("v_proj", vin),
                       ("c_proj", E)):
        sd[f"visual.attnpool.{proj}.weight"] = rng.normal(
            size=(odim, vin)).astype(np.float32) * 0.05
        sd[f"visual.attnpool.{proj}.bias"] = np.zeros(odim, np.float32)

    sd["logit_scale"] = np.array(np.log(1 / 0.07), np.float32)
    sd["logit_scale_ai"] = np.array(np.log(100.0), np.float32)
    sd["logit_scale_at"] = np.array(np.log(50.0), np.float32)
    return sd


def test_port_full_size_structure(rng):
    """Full-size config: porter output must match the flax param tree
    structure and run a forward on short audio."""
    import jax

    cfg = AudioClipConfig()
    sd = synth_state_dict(cfg, rng)
    variables = port_audioclip_state_dict(sd, cfg)

    model = AudioClip(cfg)
    img = cfg.vision.image_size
    ref = jax.eval_shape(
        lambda k, a, v, t: model.init(k, a, v, t,
                                      method=AudioClip.tri_modal),
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8192), jnp.float32),
        jnp.zeros((1, img, img, 3), jnp.float32),
        jnp.zeros((1, cfg.context_length), jnp.int32))

    def paths(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(paths(v, prefix + k + "/"))
            else:
                out[prefix + k] = tuple(np.shape(v))
        return out

    got = paths(variables["params"])
    expected = paths(ref["params"])  # eval_shape leaves -> ShapeDtypeStruct
    assert got == expected

    # distinctive values land where expected
    np.testing.assert_allclose(variables["params"]["audio"]["fbsp_fb"], 1.5)
    np.testing.assert_allclose(
        float(variables["params"]["logit_scale_at"]), np.log(50.0),
        rtol=1e-6)

    # forwards run with the ported weights
    out = model.apply(variables, jnp.zeros((1, 8192), jnp.float32),
                      method=AudioClip.encode_audio)
    assert out.shape == (1, cfg.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
    img_size = cfg.vision.image_size
    vout = model.apply(variables,
                       jnp.zeros((1, img_size, img_size, 3), jnp.float32),
                       method=AudioClip.encode_image)
    assert vout.shape == (1, cfg.embed_dim)
    assert np.isfinite(np.asarray(vout)).all()


class TestTorchGoldenParity:
    """Activation-level golden parity for both non-text towers against the
    torch oracle (tools/torch_reference/audioclip_torch.py), through the
    real porter (VERDICT item 1)."""

    @pytest.fixture(scope="class")
    def tiny_setup(self):
        pytest.importorskip("torch")
        import sys, pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
        from tools.torch_reference.audioclip_torch import (
            load_towers_from_state_dict)

        cfg = AudioClipConfig.tiny()
        sd = synth_state_dict(cfg, np.random.default_rng(7))
        a = cfg.audio
        oracle = load_towers_from_state_dict(
            sd,
            audio_kwargs=dict(layers=a.layers, groups=a.groups,
                              width_per_group=a.width_per_group,
                              num_classes=cfg.embed_dim, n_fft=a.n_fft,
                              hop_length=a.hop_length,
                              win_length=a.win_length,
                              normalized=a.normalized),
            visual_kwargs=dict(layers=cfg.vision.layers,
                               width=cfg.vision.width,
                               embed_dim=cfg.embed_dim,
                               heads=cfg.vision.heads,
                               image_size=cfg.vision.image_size))
        variables = port_audioclip_state_dict(sd, cfg)
        return cfg, oracle, variables

    def test_rn50_image_tower_parity(self, tiny_setup):
        import torch

        cfg, oracle, variables = tiny_setup
        model = AudioClip(cfg)
        img = cfg.vision.image_size
        x = np.random.default_rng(0).normal(size=(2, img, img, 3)).astype(
            np.float32)
        with torch.no_grad():
            expected = oracle.visual(
                torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x),
                                     method=AudioClip.encode_image))
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_esresnext_audio_tower_parity(self, tiny_setup):
        import torch

        cfg, oracle, variables = tiny_setup
        model = AudioClip(cfg)
        # int16-range waveform, like the reference's input distribution
        audio = (np.random.default_rng(1).normal(size=(2, 2048)) * 8000
                 ).astype(np.float32)
        with torch.no_grad():
            expected = oracle.audio(torch.from_numpy(audio)).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(audio),
                                     method=AudioClip.encode_audio))
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)

    def test_spectrogram_frontend_parity(self, tiny_setup):
        """The FBSP log-power spectrogram alone (frame -> filterbank ->
        band-split -> dB), oracle vs a flax-side replication via the same
        public ops the tower uses."""
        import torch
        import jax.numpy as jnp2
        from avlmaps_tpu.models.audioclip.fbsp import (
            blackmanharris_window, frame_signal, fbsp_weights, fbsp_apply,
            scale_signal)

        cfg, oracle, variables = tiny_setup
        a = cfg.audio
        audio = (np.random.default_rng(2).normal(size=(1, 1024)) * 5000
                 ).astype(np.float32)
        with torch.no_grad():
            expected = oracle.audio.spectrogram_db(
                torch.from_numpy(audio)).numpy()

        x = scale_signal(jnp2.asarray(audio))
        win = jnp2.asarray(blackmanharris_window(a.win_length), jnp2.float32)
        frames = frame_signal(x, a.win_length, a.hop_length, win)
        pad = a.n_fft - a.win_length
        frames = jnp2.pad(frames, [(0, 0), (0, 0),
                                   (pad // 2, pad - pad // 2)])
        p = variables["params"]["audio"]
        w = fbsp_weights(p["fbsp_m"], p["fbsp_fb"], p["fbsp_fc"], a.n_fft,
                         normalized=a.normalized)
        spec = jnp2.swapaxes(fbsp_apply(frames, w), 1, 2)
        pb = spec.shape[1] // 3
        spec = spec[:, :3 * pb]
        pow_spec = spec[..., 0] ** 2 + spec[..., 1] ** 2
        pow_spec = jnp2.where(pow_spec > 0.0, pow_spec, 1e-18)
        got = np.asarray(10.0 * jnp2.log10(pow_spec)).reshape(
            1, 3, pb, -1)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)
