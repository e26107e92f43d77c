"""Wav2CLIP alternative audio encoder: spectrogram oracle + torch golden
parity through the porter (reference ablation path,
avlmaps/utils/audio_utils.py:695-735)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.models.wav2clip import (
    Wav2Clip, Wav2ClipConfig, Wav2ClipEncoder, log_mel_spectrogram,
    mel_filterbank, port_wav2clip_state_dict,
)

TINY = Wav2ClipConfig.tiny()


class TestSpectrogram:
    def test_matches_direct_dft(self, rng):
        cfg = TINY
        audio = rng.normal(size=(2, 1000)).astype(np.float32) * 0.1
        got = np.asarray(log_mel_spectrogram(jnp.asarray(audio), cfg))

        n, hop = cfg.n_fft, cfg.hop_length
        win = np.hanning(n + 1)[:-1]
        pad = np.pad(audio, [(0, 0), (n // 2, n // 2)], mode="reflect")
        n_frames = 1 + audio.shape[-1] // hop
        mel = mel_filterbank(cfg.sample_rate, n, cfg.n_mels)
        want = np.zeros((2, cfg.n_mels, n_frames), np.float32)
        for b in range(2):
            for f in range(n_frames):
                fr = pad[b, f * hop:f * hop + n] * win
                power = np.abs(np.fft.rfft(fr)) ** 2
                want[b, :, f] = np.log(mel @ power + 1e-6)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_filterbank_shape_and_partition(self):
        fb = mel_filterbank(16000, 512, 64)
        assert fb.shape == (64, 257)
        assert (fb >= 0).all()
        # every mel filter has support
        assert (fb.sum(axis=1) > 0).all()


class TestTorchGoldenParity:
    @pytest.fixture(scope="class")
    def torch_ref(self):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        import torch.nn.functional as F

        cfg = TINY

        class Block(tnn.Module):
            def __init__(self, cin, planes, stride=1):
                super().__init__()
                self.conv1 = tnn.Conv2d(cin, planes, 3, stride=stride,
                                        padding=1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1,
                                        bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.downsample = None
                if stride != 1 or cin != planes:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(cin, planes, 1, stride=stride,
                                   bias=False),
                        tnn.BatchNorm2d(planes))

            def forward(self, x):
                idt = x
                h = F.relu(self.bn1(self.conv1(x)))
                h = self.bn2(self.conv2(h))
                if self.downsample is not None:
                    idt = self.downsample(x)
                return F.relu(h + idt)

        class TorchWav2Clip(tnn.Module):
            def __init__(self):
                super().__init__()
                w = cfg.width
                self.conv1 = tnn.Conv2d(1, w, 7, stride=2, padding=3,
                                        bias=False)
                self.bn1 = tnn.BatchNorm2d(w)
                cin = w
                for stage, nb in enumerate(cfg.layers):
                    planes = w * (2 ** stage)
                    stride = 1 if stage == 0 else 2
                    blocks = [Block(cin, planes, stride)]
                    cin = planes
                    blocks += [Block(cin, planes) for _ in range(1, nb)]
                    setattr(self, f"layer{stage + 1}",
                            tnn.Sequential(*blocks))
                self.fc = tnn.Linear(cin, cfg.embed_dim)
                self.register_buffer(
                    "mel", torch.from_numpy(
                        mel_filterbank(cfg.sample_rate, cfg.n_fft,
                                       cfg.n_mels)))

            def forward(self, audio):
                win = torch.hann_window(cfg.n_fft, periodic=True)
                spec = torch.stft(audio, cfg.n_fft,
                                  hop_length=cfg.hop_length, window=win,
                                  center=True, pad_mode="reflect",
                                  return_complex=True)
                power = spec.abs() ** 2  # (B, bins, frames)
                x = torch.log(torch.einsum("mk,bkf->bmf", self.mel, power)
                              + 1e-6)[:, None]
                x = F.relu(self.bn1(self.conv1(x)))
                x = F.max_pool2d(x, 3, stride=2, padding=1)
                for stage in range(4):
                    x = getattr(self, f"layer{stage + 1}")(x)
                x = x.mean(dim=(2, 3))
                return self.fc(x)

        torch.manual_seed(0)
        m = TorchWav2Clip().eval()
        # randomise BN running stats so frozen-BN folding is exercised
        g = torch.Generator().manual_seed(1)
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, tnn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.2, generator=g)
                    mod.running_var.uniform_(0.5, 1.5, generator=g)
        return m

    def test_full_forward_parity(self, torch_ref):
        import torch

        sd = torch_ref.state_dict()
        variables = port_wav2clip_state_dict(sd, TINY)
        model = Wav2Clip(TINY)
        audio = (np.random.default_rng(0).normal(size=(2, 1500)) * 0.2
                 ).astype(np.float32)
        with torch.no_grad():
            expected = torch_ref(torch.from_numpy(audio)).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(audio)))
        np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


class TestEncoderWrapper:
    def test_embed_and_score(self, rng):
        enc = Wav2ClipEncoder(TINY)
        clips = [rng.normal(size=(900,)).astype(np.float32),
                 rng.normal(size=(1500,)).astype(np.float32)]
        feats = enc.embed_audio_batch(clips, batch_size=2)
        assert feats.shape == (2, TINY.embed_dim)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                                   rtol=1e-4)

        class FakeClip:
            def get_text_feats(self, texts):
                r = np.random.default_rng(0)
                t = r.normal(size=(len(texts), TINY.embed_dim)).astype(
                    np.float32)
                return t / np.linalg.norm(t, axis=1, keepdims=True)

        enc.clip_encoder = FakeClip()
        scores = enc.audio_text_scores(feats, ["glass breaking", "dog"])
        assert scores.shape == (2, 2)


def test_soundmap_encoder_swap(rng, tmp_path):
    """Wav2ClipEncoder duck-types AudioClipEncoder: SoundMap builds and
    queries with it (the reference's wav2clip ablation path)."""
    from avlmaps_tpu.map.sound_map import SoundMap

    enc = Wav2ClipEncoder(TINY)

    class FakeClip:
        def get_text_feats(self, texts):
            r = np.random.default_rng(hash(tuple(texts)) % 2**31)
            t = r.normal(size=(len(texts), TINY.embed_dim)).astype(
                np.float32)
            return t / np.linalg.norm(t, axis=1, keepdims=True)

    enc.clip_encoder = FakeClip()
    feats = enc.encode_audio_batch(
        [rng.normal(size=(1200,)).astype(np.float32) * 8000])
    text = enc.encode_text([["glass breaking"], ["dog barking"]])
    logits = enc.audio_text_logits(feats, text)
    assert logits.shape == (1, 2)
    assert np.isfinite(logits).all()
    del SoundMap  # imported to assert availability of the swap target
