"""AudioCLIP tests: frame/FBSP/adaptive-pool parity against torch/numpy
oracles and tiny end-to-end forward sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.models.audioclip import (
    frame_signal, fbsp_weights, fbsp_apply, blackmanharris_window,
    scale_signal, adaptive_max_pool, AudioClipConfig, AudioClipEncoder,
)


class TestFraming:
    def test_matches_reference_semantics(self, rng):
        """Oracle re-implements reference frame_signal
        (audioclip/utils/transforms.py): centred zero pad + strided windows."""
        t, fl, hop = 1000, 128, 64
        sig = rng.normal(size=(2, t)).astype(np.float32)
        win = blackmanharris_window(fl).astype(np.float32)
        got = np.asarray(frame_signal(jnp.asarray(sig), fl, hop,
                                      jnp.asarray(win)))
        num_frames = 1 + int(np.ceil((t - fl) / hop))
        pad_len = (num_frames - 1) * hop + fl
        extra = pad_len - t
        padded = np.pad(sig, [(0, 0), (extra // 2, extra - extra // 2)])
        expected = np.stack(
            [padded[:, i * hop:i * hop + fl] * win
             for i in range(num_frames)], axis=1)
        assert got.shape == (2, num_frames, fl)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    def test_short_signal_single_frame(self):
        sig = jnp.ones((1, 50))
        got = frame_signal(sig, 128, 64)
        assert got.shape == (1, 1, 128)

    def test_blackmanharris_matches_scipy(self):
        sps = pytest.importorskip("scipy.signal")
        np.testing.assert_allclose(blackmanharris_window(1654),
                                   sps.get_window("blackmanharris", 1654,
                                                  fftbins=True),
                                   rtol=1e-10, atol=1e-10)


class TestFBSP:
    def test_weights_match_torch_formula(self):
        """Oracle: the reference LinearFBSP._materialize_weights formula
        (fbsp.py:67-97) in torch."""
        torch = pytest.importorskip("torch")

        out_f, in_f = 9, 64
        m = torch.tensor([0.0, 0.5, 1.0, 2.0, -0.5, 0.3, 1.5, 0.0, 4.0])
        fb = torch.rand(out_f,
                        generator=torch.Generator().manual_seed(7)) + 0.5
        fc = torch.arange(out_f, dtype=torch.float32)
        eps = 1e-8

        t = np.pi * torch.linspace(-1, 1, in_f).reshape(1, -1, 1) + eps
        m_ = m.reshape(-1, 1, 1)
        fb_ = fb.reshape(-1, 1, 1)
        fc_ = fc.reshape(-1, 1, 1)
        kernel = torch.cat((torch.cos(fc_ * t), -torch.sin(fc_ * t)), dim=-1)
        scale = fb_.sqrt()
        x = fb_ * t / (m_ + eps)
        win = torch.where(x == 0, torch.ones_like(x), torch.sin(x) / x)
        mags = win.abs()
        phases = torch.zeros_like(win).atan2(win)
        mag_out = (mags ** 2) ** (0.5 * m_)
        win_c = torch.cat((mag_out * (m_ * phases).cos(),
                           mag_out * (m_ * phases).sin()), dim=-1)
        expected = scale * torch.cat(
            (win_c[..., :1] * kernel[..., :1]
             - win_c[..., 1:] * kernel[..., 1:],
             win_c[..., :1] * kernel[..., 1:]
             + win_c[..., 1:] * kernel[..., :1]), dim=-1)
        expected = expected / np.sqrt(in_f)

        got = np.asarray(fbsp_weights(jnp.asarray(m.numpy()),
                                      jnp.asarray(fb.numpy()),
                                      jnp.asarray(fc.numpy()), in_f,
                                      normalized=True))
        # tolerance headroom: torch.linspace/jnp.linspace differ by 1 ulp
        # at some grid points, and the fractional powers (mag^2)^(m/2) for
        # the extreme synthetic orders here (m = -0.5, 4) amplify libm
        # differences between frameworks to ~4e-4 relative
        np.testing.assert_allclose(got, expected.numpy(), rtol=1e-3,
                                   atol=5e-5)

    def test_apply_is_complex_linear(self, rng):
        frames = rng.normal(size=(2, 5, 32)).astype(np.float32)
        w = rng.normal(size=(7, 32, 2)).astype(np.float32)
        got = np.asarray(fbsp_apply(jnp.asarray(frames), jnp.asarray(w)))
        expected_re = frames @ w[..., 0].T
        expected_im = frames @ w[..., 1].T
        np.testing.assert_allclose(got[..., 0], expected_re, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(got[..., 1], expected_im, rtol=1e-4,
                                   atol=1e-4)


class TestAdaptiveMaxPool:
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((86, 98), (43, 49)), ((43, 49), (22, 25)), ((22, 25), (11, 13)),
        ((11, 13), (1, 1)), ((10, 10), (10, 10)),
    ])
    def test_matches_torch(self, rng, in_hw, out_hw):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x = rng.normal(size=(2, *in_hw, 3)).astype(np.float32)
        got = np.asarray(adaptive_max_pool(jnp.asarray(x), *out_hw))
        with torch.no_grad():
            expected = F.adaptive_max_pool2d(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), out_hw).numpy()
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected,
                                   rtol=1e-6)


def test_scale_signal():
    x = jnp.asarray([-32768.0, 0.0, 32767.0])
    out = np.asarray(scale_signal(x))
    np.testing.assert_allclose(out, [-1.0, 32768 / 65535 * 2 - 1, 1.0],
                               atol=1e-6)


class TestTinyEndToEnd:
    @pytest.fixture(scope="class")
    def enc(self):
        return AudioClipEncoder(AudioClipConfig.tiny(), seed=0)

    def test_audio_embedding_shapes(self, enc, rng):
        clips = [rng.normal(size=(1500,)) * 1000 for _ in range(3)]
        feats = enc.encode_audio_batch(clips, batch_size=2)
        assert feats.shape == (3, 16)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                                   rtol=1e-4)

    def test_text_embedding(self, enc):
        feats = enc.encode_text([["glass_breaking"], ["dog"]])
        assert feats.shape == (2, 16)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                                   rtol=1e-4)

    def test_logits(self, enc, rng):
        a = enc.encode_audio_batch([rng.normal(size=(1500,)) * 1000
                                    for _ in range(2)], batch_size=2)
        t = enc.encode_text(["dog", "rain", "siren"])
        logits = enc.audio_text_logits(a, t)
        assert logits.shape == (2, 3)
        # clamped learned scale starts at 100
        assert np.abs(logits).max() <= 100.0 + 1e-3
