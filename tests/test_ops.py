"""Tests for similarity scoring, heatmaps, pooling and morphology ops against
NumPy / SciPy oracles."""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from avlmaps_tpu.ops.similarity import score_features, topk_categories
from avlmaps_tpu.ops.heatmap import (
    heatmap_from_mask_3d, heatmap_from_mask_2d, distance_transform_edt_jax,
    radial_decay_heatmap, decayed_point_heatmap_2d,
)
from avlmaps_tpu.ops.pooling import (
    pool_3d_label_to_2d, pool_3d_rgb_to_2d, lift_2d_to_3d,
)
from avlmaps_tpu.ops.morphology import (
    binary_dilation_jax, binary_erosion_jax, binary_closing_jax,
    gaussian_blur_jax,
)


class TestSimilarity:
    def test_matches_numpy_matmul(self, rng):
        n, d, c = 3000, 512, 11
        feats = rng.normal(size=(n, d)).astype(np.float32)
        text = rng.normal(size=(c, d)).astype(np.float32)
        got = np.asarray(score_features(jnp.asarray(feats), jnp.asarray(text)))
        expected = feats @ text.T
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-3)

    def test_fused_normalisation(self, rng):
        n, d, c = 500, 64, 5
        feats = rng.normal(size=(n, d)).astype(np.float32) * 3
        text = rng.normal(size=(c, d)).astype(np.float32) * 2
        got = np.asarray(score_features(jnp.asarray(feats), jnp.asarray(text),
                                        normalize_map=True,
                                        normalize_text=True))
        fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        tn = text / np.linalg.norm(text, axis=1, keepdims=True)
        np.testing.assert_allclose(got, fn @ tn.T, rtol=1e-3, atol=2e-3)

    def test_small_and_odd_shapes(self, rng):
        got = np.asarray(score_features(
            jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(2, 7)).astype(np.float32))))
        assert got.shape == (3, 2)

    def test_argmax(self, rng):
        scores = rng.normal(size=(100, 6)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(topk_categories(jnp.asarray(scores))),
            scores.argmax(axis=1))

    def test_fused_score_argmax(self, rng):
        from avlmaps_tpu.ops.similarity import score_argmax

        n, d, c = 3000, 512, 11
        feats = rng.normal(size=(n, d)).astype(np.float32) * 2
        # all-negative scores: padded categories must never win the argmax
        text = -np.abs(rng.normal(size=(c, d)).astype(np.float32))
        feats = np.abs(feats)
        got = np.asarray(score_argmax(jnp.asarray(feats), jnp.asarray(text),
                                      normalize_map=True,
                                      normalize_text=True))
        fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        tn = text / np.linalg.norm(text, axis=1, keepdims=True)
        assert (fn @ tn.T).max() < 0  # the masking actually matters here
        np.testing.assert_array_equal(got, (fn @ tn.T).argmax(axis=1))

    def test_fused_score_argmax_tie_break_first(self, rng):
        from avlmaps_tpu.ops.similarity import score_argmax

        # zero rows tie every category; np.argmax semantics = first index
        feats = np.zeros((16, 32), np.float32)
        feats[8:] = rng.normal(size=(8, 32)).astype(np.float32)
        text = rng.normal(size=(4, 32)).astype(np.float32)
        got = np.asarray(score_argmax(jnp.asarray(feats), jnp.asarray(text),
                                      normalize_map=True,
                                      normalize_text=True))
        fn = np.divide(feats, np.linalg.norm(feats, axis=1, keepdims=True),
                       out=np.zeros_like(feats),
                       where=np.linalg.norm(feats, axis=1,
                                            keepdims=True) > 0)
        tn = text / np.linalg.norm(text, axis=1, keepdims=True)
        np.testing.assert_array_equal(got, (fn @ tn.T).argmax(axis=1))

    def test_fused_score_argmax_odd_shapes(self, rng):
        from avlmaps_tpu.ops.similarity import score_argmax

        got = np.asarray(score_argmax(
            jnp.asarray(rng.normal(size=(13, 7)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(3, 7)).astype(np.float32))))
        assert got.shape == (13,) and got.dtype == np.int32
        assert (got >= 0).all() and (got < 3).all()


def _heat3d_bruteforce(grid_pos, mask, cell_size, decay_rate):
    """Reference O(N*M) loop (visualize_utils.py:29-49)."""
    target = np.asarray(grid_pos)[mask].astype(np.float64)
    expected = np.ones(len(mask))
    for i in np.where(~mask)[0]:
        d = np.linalg.norm(target - grid_pos[i], axis=1).min() / cell_size
        expected[i] = np.clip(1 - d * decay_rate, 0, 1)
    return expected


class TestHeatmap3D:
    def test_matches_bruteforce(self, rng):
        n = 400
        grid_pos = rng.integers(0, 50, size=(n, 3)).astype(np.int32)
        mask = rng.uniform(size=n) < 0.1
        mask[0] = True  # ensure at least one target
        got = heatmap_from_mask_3d(grid_pos, mask, cell_size=0.05,
                                   decay_rate=0.01)
        expected = _heat3d_bruteforce(grid_pos, mask, 0.05, 0.01)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_dense_and_direct_paths_agree(self, rng):
        """Integer-lattice positions route to the banded dense EDT; both
        paths must match the brute-force oracle bit-closely."""
        n = 600
        grid_pos = rng.integers(0, 40, size=(n, 3)).astype(np.int32)
        mask = rng.uniform(size=n) < 0.05
        mask[3] = True
        expected = _heat3d_bruteforce(grid_pos, mask, 0.05, 0.01)
        dense = heatmap_from_mask_3d(grid_pos, mask, 0.05, 0.01,
                                     method="dense")
        direct = heatmap_from_mask_3d(grid_pos, mask, 0.05, 0.01,
                                      method="direct")
        np.testing.assert_allclose(dense, expected, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(direct, expected, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(dense, direct, rtol=1e-3, atol=1e-4)

    def test_metric_lattice_snaps_to_dense(self, rng):
        """HabitatLanguageRobot passes metric voxel centres (grid * cs,
        habitat_lang_robot.py:250); the dense path must snap to the
        cell_size lattice and still match the oracle."""
        cs = 0.05
        n = 300
        cells = rng.integers(0, 30, size=(n, 3)).astype(np.float64)
        grid_pos = (cells * cs).astype(np.float32)
        mask = rng.uniform(size=n) < 0.08
        mask[0] = True
        expected = _heat3d_bruteforce(grid_pos.astype(np.float64), mask,
                                      cs, 0.1)
        got = heatmap_from_mask_3d(grid_pos, mask, cell_size=cs,
                                   decay_rate=0.1, method="dense")
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_duplicate_positions_and_big_decay(self, rng):
        """Duplicate voxel positions (target + non-target sharing a cell)
        and a decay putting the cutoff below one cell."""
        grid_pos = np.array([[5, 5, 5], [5, 5, 5], [9, 5, 5], [5, 8, 5]],
                            np.int32)
        mask = np.array([True, False, False, False])
        for method in ("dense", "direct"):
            got = heatmap_from_mask_3d(grid_pos, mask, 0.05, 0.2,
                                       method=method)
            expected = _heat3d_bruteforce(grid_pos, mask, 0.05, 0.2)
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5,
                                       err_msg=method)

    def test_grid_shape_and_lattice_unit_hints(self, rng):
        """Device-resident query path: declaring the lattice + grid shape
        must reproduce the probed path exactly (and needs no host probe)."""
        n = 500
        grid_pos = rng.integers(0, 30, size=(n, 3)).astype(np.int32)
        mask = rng.uniform(size=n) < 0.05
        mask[1] = True
        base = heatmap_from_mask_3d(grid_pos, mask, 0.05, 0.01)
        hinted = heatmap_from_mask_3d(
            jnp.asarray(grid_pos), jnp.asarray(mask), 0.05, 0.01,
            method="dense", lattice_unit=1.0, grid_shape=(30, 30, 30))
        np.testing.assert_allclose(hinted, base, rtol=1e-5, atol=1e-6)
        # empty mask through the no-sync dense path: natural zeros
        empty = heatmap_from_mask_3d(
            jnp.asarray(grid_pos), jnp.zeros(n, bool), 0.05, 0.01,
            method="dense", lattice_unit=1.0, grid_shape=(30, 30, 30))
        np.testing.assert_array_equal(np.asarray(empty), np.zeros(n))

    def test_nonlattice_positions_fall_back(self, rng):
        """Arbitrary float positions cannot snap — auto must still produce
        oracle-exact output via the direct kernel."""
        n = 200
        grid_pos = rng.uniform(0, 20, size=(n, 3)).astype(np.float32)
        mask = rng.uniform(size=n) < 0.1
        mask[0] = True
        expected = _heat3d_bruteforce(grid_pos.astype(np.float64), mask,
                                      0.05, 0.01)
        got = heatmap_from_mask_3d(grid_pos, mask, 0.05, 0.01)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_no_targets(self):
        # empty target set -> the decay limit (zero heat); the reference
        # would crash on an empty argmin (visualize_utils.py:41)
        got = heatmap_from_mask_3d(np.zeros((10, 3), np.int32),
                                   np.zeros(10, bool))
        np.testing.assert_array_equal(got, np.zeros(10, np.float32))


class TestEDT:
    def test_matches_scipy(self, rng):
        mask = rng.uniform(size=(96, 80)) < 0.05
        mask[0, 0] = True
        got = np.asarray(distance_transform_edt_jax(jnp.asarray(mask)))
        expected = ndi.distance_transform_edt(~mask)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)

    def test_heatmap_2d_matches_reference_formula(self, rng):
        mask = (rng.uniform(size=(64, 64)) < 0.03).astype(np.uint8)
        mask[5, 7] = 1
        got = heatmap_from_mask_2d(mask, cell_size=0.05, decay_rate=0.01)
        dists = ndi.distance_transform_edt(mask == 0) / 0.05
        tmp = np.ones_like(dists) - dists * 0.01
        expected = np.where(tmp < 0, 0, tmp)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_radial_decay():
    grid_pos = np.array([[0, 0, 0], [3, 4, 9], [100, 0, 1]], np.float32)
    got = np.asarray(radial_decay_heatmap(jnp.asarray(grid_pos),
                                          jnp.asarray([0.0, 0.0, 5.0]),
                                          decay_rate=0.1))
    np.testing.assert_allclose(got, [1.0, 0.5, 0.0], atol=1e-6)


class TestDecayedPointHeatmap:
    """Parity of the batched device scan against the host per-pose loop it
    replaced in AVLMap.index_area_2d / index_sound_2d."""

    @staticmethod
    def _oracle(shape, tracks, confs, decay, combine):
        h, w = shape
        rows = np.arange(h, dtype=np.float32)[:, None]
        cols = np.arange(w, dtype=np.float32)[None, :]
        out = np.zeros((h, w), np.float32)
        for track, con in zip(tracks, confs):
            dmin = np.full((h, w), np.inf, np.float32)
            for (r, c) in np.atleast_2d(track):
                dmin = np.minimum(
                    dmin, np.sqrt((rows - r) ** 2 + (cols - c) ** 2))
            if combine == "max":
                out = np.maximum(out, np.clip(con - dmin * decay, 0.0, 1.0))
            else:
                out += np.maximum(con - con * dmin * decay, 0.0)
        return out

    def test_area_max_composite(self, rng):
        shape = (40, 33)
        seeds = [np.array([[r, c]], np.float32)
                 for r, c in rng.integers(0, 33, size=(7, 2))]
        confs = rng.uniform(0.2, 1.0, size=7).astype(np.float32)
        got = decayed_point_heatmap_2d(shape, seeds, confs, 0.05, "max")
        want = self._oracle(shape, seeds, confs, 0.05, "max")
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_sound_sum_composite_multiseed(self, rng):
        shape = (30, 30)
        tracks = [rng.integers(0, 30, size=(t, 2)).astype(np.float32)
                  for t in (1, 4, 9)]
        confs = np.array([0.9, 0.4, 0.7], np.float32)
        got = decayed_point_heatmap_2d(shape, tracks, confs, 0.02, "sum")
        want = self._oracle(shape, tracks, confs, 0.02, "sum")
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_empty_events(self):
        out = decayed_point_heatmap_2d((8, 8), [], [], 0.1, "max")
        np.testing.assert_array_equal(out, np.zeros((8, 8), np.float32))


class TestPooling:
    def test_label_pool(self, rng):
        n, gs = 300, 32
        grid_pos = rng.integers(0, gs, size=(n, 3)).astype(np.int32)
        mask = rng.uniform(size=n) < 0.3
        got = pool_3d_label_to_2d(mask, grid_pos, gs)
        expected = np.zeros((gs, gs), bool)
        for i in range(n):
            r, c, _ = grid_pos[i]
            expected[r, c] |= mask[i]
        np.testing.assert_array_equal(got, expected)

    def test_rgb_pool_highest_wins(self):
        gs = 8
        grid_pos = np.array([[1, 1, 0], [1, 1, 5], [2, 2, 3]], np.int32)
        rgb = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30]], np.uint8)
        got = pool_3d_rgb_to_2d(rgb, grid_pos, gs)
        np.testing.assert_array_equal(got[1, 1], [0, 20, 0])
        np.testing.assert_array_equal(got[2, 2], [0, 0, 30])
        np.testing.assert_array_equal(got[0, 0], [0, 0, 0])

    def test_lift(self, rng):
        gs = 16
        heat = rng.uniform(size=(gs, gs)).astype(np.float32)
        grid_pos = rng.integers(0, gs, size=(50, 3)).astype(np.int32)
        got = lift_2d_to_3d(heat, grid_pos)
        np.testing.assert_allclose(
            got, heat[grid_pos[:, 0], grid_pos[:, 1]])


class TestMorphology:
    def test_dilation_matches_scipy(self, rng):
        mask = rng.uniform(size=(40, 40)) < 0.1
        for it in (1, 3):
            got = np.asarray(binary_dilation_jax(jnp.asarray(mask),
                                                 iterations=it))
            expected = ndi.binary_dilation(mask, structure=np.ones((3, 3)),
                                           iterations=it)
            np.testing.assert_array_equal(got, expected)

    def test_erosion_matches_scipy(self, rng):
        mask = rng.uniform(size=(40, 40)) < 0.7
        got = np.asarray(binary_erosion_jax(jnp.asarray(mask), iterations=1))
        expected = ndi.binary_erosion(mask, structure=np.ones((3, 3)),
                                      iterations=1)
        np.testing.assert_array_equal(got, expected)

    def test_closing_matches_scipy(self, rng):
        mask = rng.uniform(size=(48, 48)) < 0.4
        got = np.asarray(binary_closing_jax(jnp.asarray(mask), iterations=3))
        expected = ndi.binary_closing(mask, structure=np.ones((3, 3)),
                                      iterations=3)
        # interior must match; scipy's border handling differs at the frame
        np.testing.assert_array_equal(got[4:-4, 4:-4], expected[4:-4, 4:-4])

    def test_gaussian_matches_scipy(self, rng):
        img = rng.normal(size=(50, 50)).astype(np.float32)
        got = np.asarray(gaussian_blur_jax(jnp.asarray(img), sigma=1.0,
                                           truncate=3.0))
        expected = ndi.gaussian_filter(img, sigma=1.0, truncate=3.0)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
