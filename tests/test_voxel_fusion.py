"""Voxel fusion kernel vs a NumPy oracle implementing the sequential
weighted running mean of the reference's per-point loop
(avlmaps/map/vlmap_builder.py:136-178).

Note on fidelity: the reference's *first* insert stores ``feat * alpha``
un-normalised (vlmap_builder.py:163), so its later running means over-weight
the first point by a factor alpha — an upstream accounting bug.  Both this
oracle and the kernel implement the mathematically-intended weighted mean
Σ(α·f)/Σα (what ConceptFusion specifies), which the two compute identically.
"""

import numpy as np
import jax.numpy as jnp

from avlmaps_tpu.ops.voxel_fusion import (
    VoxelFusionState, init_fusion_state, fuse_points, export_fusion_state,
    restore_fusion_state, concept_fusion_alpha,
)
from avlmaps_tpu.geometry.grid import voxel_linear_id_jax

GS, VH, D, CAP = 32, 8, 16, 2048


def weighted_mean_oracle(points, feats, rgbs, alphas, valid):
    """Sequential weighted running mean per voxel (arrival order)."""
    occupied = -np.ones((GS, GS, VH), np.int32)
    grid_feat = np.zeros((CAP, D), np.float64)
    grid_rgb = np.zeros((CAP, 3), np.float64)
    weight = np.zeros((CAP,), np.float64)
    grid_pos = np.zeros((CAP, 3), np.int32)
    max_id = 0
    for i in range(points.shape[0]):
        if not valid[i]:
            continue
        row, col, h = points[i]
        a = alphas[i]
        oid = occupied[row, col, h]
        if oid == -1:
            occupied[row, col, h] = max_id
            grid_feat[max_id] = feats[i]
            grid_rgb[max_id] = rgbs[i]
            weight[max_id] = a
            grid_pos[max_id] = [row, col, h]
            max_id += 1
        else:
            w = weight[oid]
            grid_feat[oid] = (grid_feat[oid] * w + feats[i] * a) / (w + a)
            grid_rgb[oid] = (grid_rgb[oid] * w + rgbs[i] * a) / (w + a)
            weight[oid] = w + a
    return occupied, grid_feat[:max_id], grid_rgb[:max_id], weight[:max_id], \
        grid_pos[:max_id], max_id


def make_batch(rng, n):
    points = rng.integers(0, [GS, GS, VH], size=(n, 3)).astype(np.int32)
    feats = rng.normal(size=(n, D)).astype(np.float32)
    rgbs = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
    alphas = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    return points, feats, rgbs, alphas, valid


def run_fusion(batches):
    state = init_fusion_state(GS, VH, D, CAP)
    for points, feats, rgbs, alphas, valid in batches:
        vids = voxel_linear_id_jax(jnp.asarray(points), GS, VH)
        state = fuse_points(state, vids, jnp.asarray(feats),
                            jnp.asarray(rgbs), jnp.asarray(alphas),
                            jnp.asarray(valid), gs=GS, vh=VH)
    return state


class TestFusionVsOracle:
    def test_single_batch(self, rng):
        batch = make_batch(rng, 600)
        self._check(run_fusion([batch]), [batch])

    def test_multi_batch(self, rng):
        batches = [make_batch(rng, 300) for _ in range(4)]
        self._check(run_fusion(batches), batches)

    def _check(self, state, batches):
        points = np.concatenate([b[0] for b in batches])
        feats = np.concatenate([b[1] for b in batches])
        rgbs = np.concatenate([b[2] for b in batches])
        alphas = np.concatenate([b[3] for b in batches])
        valid = np.concatenate([b[4] for b in batches])
        occ_ref, feat_ref, rgb_ref, w_ref, pos_ref, max_id = \
            weighted_mean_oracle(points, feats, rgbs, alphas, valid)

        grid_feat, grid_pos, weight, occupied, grid_rgb = \
            export_fusion_state(state, GS, VH)

        assert grid_feat.shape[0] == max_id
        np.testing.assert_array_equal(occupied >= 0, occ_ref >= 0)

        # slot numbering may differ (oracle: arrival order; kernel: voxel-id
        # order within a batch) — compare voxel-by-voxel
        ref_slot = {tuple(pos_ref[s]): s for s in range(max_id)}
        for s in range(max_id):
            rs = ref_slot[tuple(grid_pos[s])]
            np.testing.assert_allclose(weight[s], w_ref[rs], rtol=1e-5)
            np.testing.assert_allclose(grid_feat[s], feat_ref[rs], rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_allclose(grid_rgb[s].astype(np.float64),
                                       rgb_ref[rs], atol=1.0)  # uint8 rounding


def test_batch_order_invariance(rng):
    """The associative form must not care how points are split into batches."""
    points, feats, rgbs, alphas, valid = make_batch(rng, 512)
    s1 = run_fusion([(points, feats, rgbs, alphas, valid)])
    halves = [(points[:256], feats[:256], rgbs[:256], alphas[:256],
               valid[:256]),
              (points[256:], feats[256:], rgbs[256:], alphas[256:],
               valid[256:])]
    s2 = run_fusion(halves)
    f1, p1, w1, o1, r1 = export_fusion_state(s1, GS, VH)
    f2, p2, w2, o2, r2 = export_fusion_state(s2, GS, VH)
    order1 = np.lexsort(p1.T)
    order2 = np.lexsort(p2.T)
    np.testing.assert_array_equal(p1[order1], p2[order2])
    np.testing.assert_allclose(w1[order1], w2[order2], rtol=1e-5)
    np.testing.assert_allclose(f1[order1], f2[order2], rtol=1e-4, atol=1e-5)


def test_capacity_overflow(rng):
    """Points beyond capacity go to the trash slot, counted not crashed."""
    small_cap = 8
    state = init_fusion_state(GS, VH, D, small_cap)
    points = np.stack([np.arange(20) % GS, np.zeros(20), np.zeros(20)],
                      axis=1).astype(np.int32)
    vids = voxel_linear_id_jax(jnp.asarray(points), GS, VH)
    state = fuse_points(state, vids,
                        jnp.ones((20, D)), jnp.ones((20, 3)),
                        jnp.ones((20,)), jnp.ones((20,), bool), gs=GS, vh=VH)
    assert int(state.n_slots) == small_cap
    assert int(state.n_dropped) == 12


def test_resume_roundtrip(rng):
    batch = make_batch(rng, 400)
    state = run_fusion([batch])
    grid_feat, grid_pos, weight, occupied, grid_rgb = export_fusion_state(
        state, GS, VH)
    state2 = restore_fusion_state(GS, VH, CAP, grid_feat, grid_pos, weight,
                                  occupied, grid_rgb)
    f2, p2, w2, o2, r2 = export_fusion_state(state2, GS, VH)
    np.testing.assert_allclose(f2, grid_feat, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(p2, grid_pos)
    np.testing.assert_allclose(w2, weight, rtol=1e-6)
    np.testing.assert_array_equal(o2, occupied)


def test_export_transfer_scales_with_occupancy(rng):
    """VERDICT r2 #2: the periodic-save export must fetch O(n_slots) rows,
    not the full (capacity+1, D) accumulators (2 GB at production scale)."""
    from avlmaps_tpu.ops.voxel_fusion import (
        _device_export, export_bucket, occupied_from_grid_pos)

    big_cap = 500_000
    state = init_fusion_state(GS, VH, D, big_cap)
    points, feats, rgbs, alphas, valid = make_batch(rng, 600)
    vids = voxel_linear_id_jax(jnp.asarray(points), GS, VH)
    state = fuse_points(state, vids, jnp.asarray(feats), jnp.asarray(rgbs),
                        jnp.asarray(alphas), jnp.asarray(valid),
                        gs=GS, vh=VH)
    n = int(state.n_slots)
    bucket = export_bucket(n)
    assert n <= bucket <= max(4096, 2 * n)  # power-of-two cover, not capacity
    out = _device_export(state, bucket=bucket)
    # everything that crosses the link is bucket-sized, << capacity
    assert all(a.shape[0] == bucket for a in out)
    fetched_bytes = sum(a.size * a.dtype.itemsize for a in out)
    full_bytes = state.sum_wfeat.size * 4
    assert fetched_bytes < full_bytes / 50

    # and the sliced export equals the definitionally-correct full fetch
    grid_feat, grid_pos, weight, occupied, grid_rgb = \
        export_fusion_state(state, GS, VH)
    sum_w = np.asarray(state.sum_w)[:n]
    denom = np.where(sum_w > 0, sum_w, 1.0)[:, None]
    np.testing.assert_allclose(grid_feat,
                               np.asarray(state.sum_wfeat)[:n] / denom,
                               rtol=1e-6)
    np.testing.assert_array_equal(grid_pos, np.asarray(state.grid_pos)[:n])
    np.testing.assert_array_equal(
        occupied,
        np.asarray(state.occupied_flat).reshape(GS, GS, VH))
    assert occupied_from_grid_pos(grid_pos, GS, VH).max() == n - 1


def test_concept_fusion_alpha():
    pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [3.0, 4.0, 0.0]])
    a = np.asarray(concept_fusion_alpha(pts))
    np.testing.assert_allclose(
        a, np.exp(-np.array([0.0, 1.0, 25.0]) / 1.2), rtol=1e-4)
