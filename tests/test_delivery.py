"""D2H-lean delivery formats (VERDICT r4 #1): u8 quantisation, top-k
peaks, on-device cross-modal goal pick, and the single-dispatch serving
query — all checked against the f32 host paths they replace."""

import numpy as np
import pytest

import jax.numpy as jnp

from avlmaps_tpu.ops.delivery import (
    dequantize_heat_u8, fetch_np, fused_goal_pick, make_object_query,
    quantize_heat_u8, topk_peaks,
)
from avlmaps_tpu.ops.heatmap import (
    decayed_point_heatmap_2d, heatmap_from_mask_2d, heatmap_from_mask_3d,
)
from avlmaps_tpu.ops.similarity import score_argmax


def test_u8_quantisation_roundtrip(rng):
    heat = rng.uniform(0, 1, 4096).astype(np.float32)
    back = dequantize_heat_u8(fetch_np(quantize_heat_u8(jnp.asarray(heat))))
    assert back.dtype == np.float32
    assert np.abs(back - heat).max() <= 0.5 / 255 + 1e-7
    # exact endpoints survive (targets are exactly 1.0 in heatmaps)
    assert dequantize_heat_u8(fetch_np(quantize_heat_u8(
        jnp.asarray([0.0, 1.0])))).tolist() == [0.0, 1.0]


def test_topk_peaks_match_numpy(rng):
    heat = rng.uniform(0, 1, 2048).astype(np.float32)
    pos = rng.integers(0, 50, (2048, 3)).astype(np.int32)
    vals, got_pos = fetch_np(*topk_peaks(jnp.asarray(heat),
                                         jnp.asarray(pos), k=16))
    order = np.argsort(-heat)[:16]
    np.testing.assert_allclose(vals, heat[order])
    np.testing.assert_array_equal(got_pos, pos[order])


def test_fused_goal_pick_matches_host_product_argmax(rng):
    n = 4096
    pos = rng.integers(0, 100, (n, 3)).astype(np.int32)
    heats = [rng.uniform(0, 1, n).astype(np.float32) for _ in range(3)]
    got_pos, got_val = fetch_np(*fused_goal_pick(
        [jnp.asarray(h) for h in heats], jnp.asarray(pos)))
    fused = heats[0] * heats[1] * heats[2]
    idx = int(np.argmax(fused))
    np.testing.assert_array_equal(got_pos, pos[idx])
    np.testing.assert_allclose(got_val, fused[idx], rtol=1e-6)


def test_fused_goal_pick_tie_breaks_to_first_index():
    heat = np.array([0.5, 1.0, 1.0, 0.25], np.float32)
    pos = np.arange(12, dtype=np.int32).reshape(4, 3)
    got_pos, _ = fetch_np(*fused_goal_pick([heat], pos))
    np.testing.assert_array_equal(got_pos, pos[1])


def test_object_query_program_matches_staged_path(rng):
    """The fused serving query (one dispatch) must equal score_argmax ->
    heatmap_from_mask_3d(dense, grid_shape) -> per-head delivery."""
    n, d, c = 1024, 64, 6
    gs, vh = 40, 8
    feats = rng.normal(size=(n, d)).astype(np.float32)
    text = rng.normal(size=(c, d)).astype(np.float32)
    grid_pos = np.stack([rng.integers(0, gs, n), rng.integers(0, gs, n),
                         rng.integers(0, vh, n)], axis=1).astype(np.int32)

    query = make_object_query((gs, gs, vh), cell_size=0.05,
                              decay_rate=0.01, k=8)
    out = query(feats, text, grid_pos)

    labels = np.asarray(score_argmax(jnp.asarray(feats), jnp.asarray(text),
                                     normalize_map=True,
                                     normalize_text=True))
    mask = labels == 0
    ref_heat = heatmap_from_mask_3d(grid_pos, mask, cell_size=0.05,
                                    decay_rate=0.01, method="dense",
                                    lattice_unit=1.0,
                                    grid_shape=(gs, gs, vh))
    heat, heat_u8, goal, tv, tp = fetch_np(
        out["heat"], out["heat_u8"], out["goal_pos"], out["topk_vals"],
        out["topk_pos"])
    np.testing.assert_allclose(heat, ref_heat, atol=1e-6)
    np.testing.assert_array_equal(
        heat_u8, np.round(ref_heat * 255).astype(np.uint8))
    np.testing.assert_array_equal(goal, grid_pos[np.argmax(ref_heat)])
    order = np.argsort(-ref_heat, kind="stable")[:8]
    np.testing.assert_allclose(tv, ref_heat[order], atol=1e-6)


def test_text_object_query_matches_staged_path(rng):
    """The one-dispatch text->goal program (encode inside the program)
    equals template-encode -> concat -> score -> heat run separately."""
    from avlmaps_tpu.models.clip import ClipEncoder
    from avlmaps_tpu.ops.delivery import make_text_object_query

    enc = ClipEncoder("tiny")
    n, d = 512, enc.feat_dim
    gs, vh = 32, 4
    feats = rng.normal(size=(n, d)).astype(np.float32)
    grid_pos = np.stack([rng.integers(0, gs, n), rng.integers(0, gs, n),
                         rng.integers(0, vh, n)], 1).astype(np.int32)
    other = rng.normal(size=(5, d)).astype(np.float32)

    query = make_text_object_query(enc, (gs, gs, vh), cell_size=0.05,
                                   decay_rate=0.01, k=8)
    out = query("chair", feats, grid_pos, other)

    qf = enc.get_text_feats_multiple_templates(["chair"])
    text = np.concatenate([qf, other], axis=0)
    labels = np.asarray(score_argmax(jnp.asarray(feats), jnp.asarray(text),
                                     normalize_map=True,
                                     normalize_text=True))
    ref_heat = heatmap_from_mask_3d(grid_pos, labels == 0, cell_size=0.05,
                                    decay_rate=0.01, method="dense",
                                    lattice_unit=1.0,
                                    grid_shape=(gs, gs, vh))
    heat, goal = fetch_np(out["heat"], out["goal_pos"])
    np.testing.assert_allclose(heat, ref_heat, atol=1e-5)
    np.testing.assert_array_equal(goal, grid_pos[np.argmax(ref_heat)])


def test_heatmap_2d_as_device_matches_host(rng):
    mask = np.zeros((64, 64), bool)
    mask[rng.integers(0, 64, 20), rng.integers(0, 64, 20)] = True
    host = heatmap_from_mask_2d(mask, cell_size=0.05, decay_rate=0.01)
    dev = heatmap_from_mask_2d(mask, cell_size=0.05, decay_rate=0.01,
                               as_device=True)
    np.testing.assert_allclose(np.asarray(dev), host)


def test_decayed_point_heatmap_normalize_in_program(rng):
    tracks = [rng.uniform(0, 64, (5, 2)).astype(np.float32)
              for _ in range(4)]
    confs = rng.uniform(0.2, 1.0, 4).astype(np.float32)
    raw = decayed_point_heatmap_2d((64, 64), tracks, confs, 0.05,
                                   combine="sum")
    lo, hi = raw.min(), raw.max()
    want = (raw - lo) / (hi - lo if hi > lo else 1.0)
    got = decayed_point_heatmap_2d((64, 64), tracks, confs, 0.05,
                                   combine="sum", normalize=True)
    np.testing.assert_allclose(got, want, atol=1e-6)
    dev = decayed_point_heatmap_2d((64, 64), tracks, confs, 0.05,
                                   combine="sum", normalize=True,
                                   as_device=True)
    np.testing.assert_allclose(np.asarray(dev), want, atol=1e-6)


def test_index_object_delivery_formats(rng):
    """AVLMap.index_object's wire formats agree with the f32 path on a
    stub vlmap (no encoders: with_init_cat via a precomputed scores_mat)."""
    from avlmaps_tpu.map.avlmap import AVLMap

    n, gs, vh = 512, 32, 4
    m = AVLMap.__new__(AVLMap)

    class _Cfg:
        class params:
            cs = 0.05

    class _VLMap:
        grid_pos = np.stack([rng.integers(0, gs, n),
                             rng.integers(0, gs, n),
                             rng.integers(0, vh, n)], 1).astype(np.int32)
        occupied_ids = np.zeros((gs, gs, vh), np.int32)
        categories = ["chair", "other"]
        scores_mat = rng.normal(size=(n, 2)).astype(np.float32)

        def index_map(self, name, with_init_cat=True):
            return np.argmax(self.scores_mat, axis=1) == 0

    m.config = _Cfg()
    m.vlmap = _VLMap()

    f32 = m.index_object("chair", decay_rate=0.01)
    u8 = m.index_object("chair", decay_rate=0.01, delivery="u8")
    assert np.abs(u8 - f32).max() <= 0.5 / 255 + 1e-7
    dev = m.index_object("chair", decay_rate=0.01, delivery="device")
    np.testing.assert_allclose(np.asarray(dev), f32, atol=1e-6)
    vals, pos = m.index_object("chair", decay_rate=0.01, delivery="topk")
    assert vals.shape == (64,) and pos.shape == (64, 3)
    order = np.argsort(-f32, kind="stable")[:64]
    np.testing.assert_allclose(vals, f32[order], atol=1e-6)
    goal = m.index_object("chair", decay_rate=0.01, delivery="goal")
    np.testing.assert_array_equal(goal,
                                  m.vlmap.grid_pos[np.argmax(f32)])
    with pytest.raises(ValueError):
        m.index_object("chair", delivery="f16")