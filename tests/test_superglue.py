"""SuperGlue tests: torch golden parity through the porter (BN folding),
padding invariance of the masked Sinkhorn, and match quality on a synthetic
correspondence problem."""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from avlmaps_tpu.models.superglue import (
    SuperGlueConfig, SuperGlueNet, SuperGlueMatcher,
    match_from_assignment, port_superglue_state_dict,
    config_from_state_dict,
)

TINY = SuperGlueConfig.tiny()
HW = (48, 64)


def _rand_feats(rng, k, d, hw=HW):
    h, w = hw
    return {
        "keypoints": np.stack(
            [rng.uniform(0, w, k), rng.uniform(0, h, k)],
            axis=-1).astype(np.float32)[None],
        "scores": rng.uniform(0.1, 1.0, k).astype(np.float32)[None],
        "descriptors": _unit(rng.normal(size=(k, d)))[None],
        "valid": np.ones((1, k), bool),
    }


def _unit(x):
    x = np.asarray(x, np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestTorchGoldenParity:
    @pytest.fixture(scope="class")
    def pair(self):
        pytest.importorskip("torch")
        from tools.torch_reference.superglue_torch import (
            TorchSuperGlueSpec, build_torch_superglue,
            export_reference_state_dict,
        )

        # gain sharpens attention so head-layout errors can't hide
        tm = build_torch_superglue(TorchSuperGlueSpec.tiny(), seed=0,
                                   gain=3.0)
        sd = export_reference_state_dict(tm)
        cfg = config_from_state_dict(sd, sinkhorn_iters=TINY.sinkhorn_iters)
        assert cfg.desc_dim == TINY.desc_dim
        assert cfg.kenc_layers == TINY.kenc_layers
        assert cfg.gnn_layers == TINY.gnn_layers
        variables = port_superglue_state_dict(sd)
        return tm, SuperGlueNet(TINY), variables

    def test_assignment_parity(self, pair):
        import torch

        tm, model, variables = pair
        rng = np.random.default_rng(0)
        k0, k1 = 24, 30
        hw1 = (64, 80)  # different ref-image shape: per-set normalisation
        f0 = _rand_feats(rng, k0, TINY.desc_dim)
        f1 = _rand_feats(rng, k1, TINY.desc_dim, hw=hw1)
        with torch.no_grad():
            Zt, matches_t, mscores_t = tm(
                torch.from_numpy(f0["keypoints"]),
                torch.from_numpy(f0["scores"]),
                torch.from_numpy(f0["descriptors"]),
                torch.from_numpy(f1["keypoints"]),
                torch.from_numpy(f1["scores"]),
                torch.from_numpy(f1["descriptors"]), HW, hw1)
        Z = model.apply(variables,
                        jnp.asarray(f0["keypoints"]),
                        jnp.asarray(f0["scores"]),
                        jnp.asarray(f0["descriptors"]),
                        jnp.asarray(f0["valid"]),
                        jnp.asarray(f1["keypoints"]),
                        jnp.asarray(f1["scores"]),
                        jnp.asarray(f1["descriptors"]),
                        jnp.asarray(f1["valid"]), HW, hw1)
        np.testing.assert_allclose(np.asarray(Z), Zt.numpy(),
                                   rtol=2e-3, atol=2e-3)
        m, s = match_from_assignment(Z, jnp.asarray(f0["valid"]),
                                     jnp.asarray(f1["valid"]),
                                     threshold=TINY.match_threshold)
        np.testing.assert_array_equal(np.asarray(m)[0],
                                      matches_t.numpy()[0])
        np.testing.assert_allclose(np.asarray(s)[0], mscores_t.numpy()[0],
                                   rtol=1e-3, atol=1e-3)

    def test_padding_invariance(self, pair):
        """Padding either keypoint set must not change the valid block."""
        _, model, variables = pair
        rng = np.random.default_rng(1)
        k0, k1, pad = 16, 20, 8
        f0 = _rand_feats(rng, k0, TINY.desc_dim)
        f1 = _rand_feats(rng, k1, TINY.desc_dim)

        def run(f0, f1):
            return np.asarray(model.apply(
                variables,
                jnp.asarray(f0["keypoints"]), jnp.asarray(f0["scores"]),
                jnp.asarray(f0["descriptors"]), jnp.asarray(f0["valid"]),
                jnp.asarray(f1["keypoints"]), jnp.asarray(f1["scores"]),
                jnp.asarray(f1["descriptors"]), jnp.asarray(f1["valid"]),
                HW))

        Z = run(f0, f1)

        def padded(f, pad):
            k = f["keypoints"].shape[1]
            return {
                "keypoints": np.concatenate(
                    [f["keypoints"], np.zeros((1, pad, 2), np.float32)], 1),
                "scores": np.concatenate(
                    [f["scores"], np.zeros((1, pad), np.float32)], 1),
                "descriptors": np.concatenate(
                    [f["descriptors"],
                     np.zeros((1, pad, TINY.desc_dim), np.float32)], 1),
                "valid": np.concatenate(
                    [f["valid"], np.zeros((1, pad), bool)], 1),
            }

        Zp = run(padded(f0, pad), padded(f1, pad))
        # valid block + the dustbin row/col must match the unpadded run
        np.testing.assert_allclose(Zp[:, :k0, :k1], Z[:, :k0, :k1],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Zp[:, -1, :k1], Z[:, -1, :k1],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Zp[:, :k0, -1], Z[:, :k0, -1],
                                   rtol=1e-4, atol=1e-4)


def test_sinkhorn_recovers_permutation():
    """A score matrix with a strong permuted diagonal must transport to
    exactly that permutation — sanity of the Sinkhorn + mutual-max rule."""
    from avlmaps_tpu.models.superglue import log_optimal_transport

    rng = np.random.default_rng(2)
    k = 32
    perm = rng.permutation(k)
    scores = rng.normal(scale=0.1, size=(1, k, k)).astype(np.float32)
    scores[0, np.arange(k), np.argsort(perm)] += 6.0
    valid = jnp.ones((1, k), bool)
    Z = log_optimal_transport(jnp.asarray(scores), jnp.asarray(1.0),
                              valid, valid, iters=30)
    m, s = match_from_assignment(Z, valid, valid, threshold=0.2)
    inv = np.argsort(perm)  # inv[i] = j with perm[j] == i
    np.testing.assert_array_equal(np.asarray(m)[0], inv)
    assert np.all(np.asarray(s)[0] > 0.5)


def test_matcher_wrapper_shapes():
    """SuperGlueMatcher jits end to end and respects validity masks."""
    rng = np.random.default_rng(3)
    k0, k1 = 16, 20
    f0 = _rand_feats(rng, k0, TINY.desc_dim)
    f1 = _rand_feats(rng, k1, TINY.desc_dim)
    f0["valid"][0, 10:] = False
    matcher = SuperGlueMatcher(TINY, seed=0)
    m, s = matcher.match(f0, f1, HW)
    assert m.shape == (1, k0) and s.shape == (1, k0)
    m = np.asarray(m)[0]
    assert np.all(m[10:] == -1)  # invalid queries never match
    assert np.all((m == -1) | ((m >= 0) & (m < k1)))


def test_sinkhorn_20_vs_100_converged():
    """ADVICE r2: ported checkpoints default to the MagicLeap 100-iteration
    Sinkhorn; assert 20 iterations has already converged to the 100-iter
    assignment on a typical problem (so 20 remains a safe speed knob)."""
    from avlmaps_tpu.models.superglue import log_optimal_transport

    rng = np.random.default_rng(4)
    k = 48
    scores = rng.normal(scale=1.0, size=(1, k, k)).astype(np.float32)
    valid = jnp.ones((1, k), bool)
    z20 = log_optimal_transport(jnp.asarray(scores), jnp.asarray(1.0),
                                valid, valid, iters=20)
    z100 = log_optimal_transport(jnp.asarray(scores), jnp.asarray(1.0),
                                 valid, valid, iters=100)
    np.testing.assert_allclose(np.asarray(z20), np.asarray(z100),
                               rtol=1e-3, atol=1e-3)


def test_ported_config_defaults_to_100_iters():
    from avlmaps_tpu.models.superglue import config_from_state_dict
    from tools.torch_reference.superglue_torch import build_torch_superglue

    sd = build_torch_superglue(TINY, seed=0).state_dict()
    assert config_from_state_dict(sd).sinkhorn_iters == 100
