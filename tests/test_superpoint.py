"""SuperPoint tests: torch golden parity through the porter, static-shape
keypoint selection, descriptor sampling, and the device MNN matcher."""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from avlmaps_tpu.models.superpoint import (
    SuperPointConfig, SuperPointNet, SuperPointExtractor,
    select_keypoints, sample_descriptors, mutual_nearest_matches,
    port_superpoint_state_dict,
)
from avlmaps_tpu.models.superpoint.port import config_from_state_dict

TINY = SuperPointConfig.tiny()


class TestTorchGoldenParity:
    @pytest.fixture(scope="class")
    def torch_ref(self):
        torch = pytest.importorskip("torch")
        from tools.torch_reference.superpoint_torch import TorchSuperPoint

        torch.manual_seed(0)
        return TorchSuperPoint(channels=TINY.channels, det_ch=TINY.det_ch,
                               desc_ch=TINY.desc_ch,
                               desc_dim=TINY.desc_dim).eval()

    def test_full_forward_parity(self, torch_ref):
        import torch

        sd = torch_ref.state_dict()
        cfg = config_from_state_dict(sd)
        assert cfg.channels == TINY.channels
        variables = port_superpoint_state_dict(sd)
        model = SuperPointNet(TINY)

        x = np.random.default_rng(0).uniform(0, 1, (2, 48, 64)).astype(
            np.float32)
        with torch.no_grad():
            e_scores, e_desc = torch_ref(torch.from_numpy(x[:, None]))
        scores, desc = model.apply(variables, jnp.asarray(x[..., None]))
        np.testing.assert_allclose(np.asarray(scores), e_scores.numpy(),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(desc).transpose(0, 3, 1, 2), e_desc.numpy(),
            rtol=1e-4, atol=1e-5)


class TestKeypointSelection:
    def test_static_topk_with_nms(self):
        scores = np.zeros((1, 32, 32), np.float32)
        scores[0, 5, 7] = 0.9
        scores[0, 5, 9] = 0.8  # within NMS radius of the stronger peak
        scores[0, 20, 20] = 0.7
        xy, sc, valid = select_keypoints(jnp.asarray(scores), 8, 4, 0.1)
        xy, sc, valid = map(np.asarray, (xy, sc, valid))
        assert valid[0].sum() == 2
        got = {tuple(p) for p in xy[0][valid[0]].astype(int)}
        assert got == {(7, 5), (20, 20)}  # (x, y); the 0.8 peak suppressed

    def test_threshold_masks_not_shrinks(self):
        scores = np.random.default_rng(0).uniform(
            0, 1e-4, (2, 16, 16)).astype(np.float32)
        xy, sc, valid = select_keypoints(jnp.asarray(scores), 16, 2, 0.5)
        assert np.asarray(xy).shape == (2, 16, 2)  # static K
        assert not np.asarray(valid).any()


class TestDescriptorSampling:
    # MagicLeap's grid_sample mapping: cell coord s relates to pixel x by
    # x = 3.5 + s * (8*wc - 4.5) / (wc - 1)
    @staticmethod
    def _px(s, wc):
        return 3.5 + s * (8 * wc - 4.5) / (wc - 1)

    def test_cell_centre_is_exact(self, rng):
        desc_map = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
        n = desc_map / np.linalg.norm(desc_map, axis=-1, keepdims=True)
        xy = jnp.asarray([[[self._px(2, 4), self._px(1, 4)]]], jnp.float32)
        out = np.asarray(sample_descriptors(jnp.asarray(desc_map), xy))
        np.testing.assert_allclose(out[0, 0], n[0, 1, 2], rtol=1e-5)

    def test_interpolates_between_cells(self, rng):
        desc_map = rng.normal(size=(1, 2, 2, 4)).astype(np.float32)
        xy = jnp.asarray([[[self._px(0.5, 2), self._px(0, 2)]]],
                         jnp.float32)  # halfway in x, cell 0 in y
        out = np.asarray(sample_descriptors(jnp.asarray(desc_map), xy))
        mid = (desc_map[0, 0, 0] + desc_map[0, 0, 1]) / 2
        mid = mid / np.linalg.norm(mid)
        np.testing.assert_allclose(out[0, 0], mid, rtol=1e-4, atol=1e-5)


class TestMNNMatcher:
    def test_mutual_and_crosscheck(self, rng):
        d = rng.normal(size=(6, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        perm = np.array([3, 0, 5, 1, 2, 4])
        db = d[perm] + rng.normal(size=(6, 16)).astype(np.float32) * 0.01
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        valid = jnp.ones((6,), bool)
        idx, score = mutual_nearest_matches(jnp.asarray(d), jnp.asarray(db),
                                            valid, valid)
        idx = np.asarray(idx)
        # matches invert the permutation: a[i] pairs with b[perm^-1[i]]
        inv = np.argsort(perm)
        np.testing.assert_array_equal(idx, inv)

    def test_invalid_rows_unmatched(self, rng):
        d = rng.normal(size=(4, 8)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        va = jnp.asarray([True, True, False, True])
        vb = jnp.ones((4,), bool)
        idx, _ = mutual_nearest_matches(jnp.asarray(d), jnp.asarray(d),
                                        va, vb)
        idx = np.asarray(idx)
        assert idx[2] == -1
        np.testing.assert_array_equal(idx[[0, 1, 3]], [0, 1, 3])


class TestExtractor:
    def test_fixed_shapes_and_padding(self):
        ext = SuperPointExtractor(TINY)
        imgs = np.random.default_rng(0).uniform(
            0, 1, (2, 30, 41)).astype(np.float32)  # not multiples of 8
        out = ext.extract(imgs)
        k = TINY.max_keypoints
        assert out["keypoints"].shape == (2, k, 2)
        assert out["descriptors"].shape == (2, k, TINY.desc_dim)
        kp = out["keypoints"][out["valid"]]
        assert (kp[:, 0] < 41).all() and (kp[:, 1] < 30).all()


def test_sample_descriptors_matches_torch_grid_sample():
    """Descriptor sampling equals MagicLeap's normalize + grid_sample
    (align_corners=True) for interior keypoints."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    hc, wc, d = 6, 8, 16
    desc_map = rng.normal(size=(1, hc, wc, d)).astype(np.float32)
    # interior coords (outside-border handling differs only by a rescale
    # that the final L2 renorm cancels)
    k = 64
    xy = np.stack([rng.uniform(4.0, wc * 8 - 5.0, k),
                   rng.uniform(4.0, hc * 8 - 5.0, k)],
                  axis=-1).astype(np.float32)[None]
    got = np.asarray(sample_descriptors(jnp.asarray(desc_map),
                                        jnp.asarray(xy)))

    kp = torch.from_numpy(xy.copy()) - 8 / 2 + 0.5
    kp /= torch.tensor([(wc * 8 - 8 / 2 - 0.5), (hc * 8 - 8 / 2 - 0.5)])
    kp = kp * 2 - 1
    dm = torch.from_numpy(desc_map.transpose(0, 3, 1, 2))
    want = torch.nn.functional.grid_sample(
        dm, kp.view(1, 1, -1, 2), mode="bilinear", align_corners=True)
    want = torch.nn.functional.normalize(
        want.reshape(1, d, -1), p=2, dim=1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
