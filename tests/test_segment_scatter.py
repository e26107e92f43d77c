"""Sorted segment scatter-add kernel (ops/segment_scatter.py) vs the XLA
scatter oracle, in Pallas interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.ops import segment_scatter
from avlmaps_tpu.ops.segment_scatter import sorted_segment_scatter_add

S, W = 64, 128


def _oracle(accum, slots, updates):
    out = np.array(accum, np.float64)
    for k in range(slots.shape[0]):
        out[slots[k]] += np.asarray(updates[k], np.float64)
    return out.astype(np.float32)


def run(accum, slots, updates, block_rows, rle=True):
    return np.asarray(sorted_segment_scatter_add(
        jnp.asarray(accum), jnp.asarray(slots, jnp.int32),
        jnp.asarray(updates), block_rows=block_rows, rle=rle,
        interpret=True))


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("block_rows", [8, 16])
@pytest.mark.parametrize("pattern", ["collisions", "unique", "one_slot",
                                     "spanning"])
def test_matches_oracle(rng, pattern, block_rows, rle):
    b = 50  # deliberately not a block multiple -> exercises padding
    accum = rng.normal(size=(S, W)).astype(np.float32)
    if pattern == "collisions":
        slots = np.sort(rng.integers(0, S - 1, b)).astype(np.int32)
    elif pattern == "unique":
        slots = np.sort(rng.choice(S - 1, b, replace=False)).astype(np.int32)
    elif pattern == "one_slot":
        slots = np.full(b, 17, np.int32)
    else:  # one segment spanning several blocks mid-way
        slots = np.sort(np.concatenate([
            rng.integers(0, 10, 10), np.full(30, 23),
            rng.integers(40, S - 1, 10)])).astype(np.int32)
    updates = rng.normal(size=(b, W)).astype(np.float32)
    got = run(accum, slots, updates, block_rows, rle=rle)
    want = _oracle(accum, slots, updates)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rle_bitwise_equals_onehot(rng):
    """The run-length accumulate performs the same pairwise f32 adds as the
    per-row one-hot form (run sums start from exact 0), so the two kernel
    variants must agree BITWISE."""
    accum = rng.normal(size=(S, W)).astype(np.float32)
    slots = np.sort(rng.integers(0, S - 1, 50)).astype(np.int32)
    updates = rng.normal(size=(50, W)).astype(np.float32)
    a = run(accum, slots, updates, 16, rle=False)
    b = run(accum, slots, updates, 16, rle=True)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("feat_dtype", [np.float32, jnp.bfloat16])
def test_split_payload_matches_assembled(rng, feat_dtype):
    """sorted_segment_scatter_add_split (in-kernel w*feat + aux concat)
    vs assembling the update first: same multiplies in the same add
    order.  On backends that contract ``acc += w*f`` to an FMA (XLA CPU)
    the in-kernel product keeps extra precision the assembled path
    rounds away — a <=1-ulp difference on multi-row slots (the split
    result is the more accurate one); on the TPU backend the two match
    bitwise."""
    from avlmaps_tpu.ops.segment_scatter import (
        sorted_segment_scatter_add_split,
    )

    d, aux_w = 128, 128
    accum = rng.normal(size=(S, d + aux_w)).astype(np.float32)
    slots = np.sort(rng.integers(0, S - 1, 50)).astype(np.int32)
    feats = jnp.asarray(rng.normal(size=(50, d)).astype(np.float32),
                        feat_dtype)
    w = rng.uniform(0.1, 1.0, 50).astype(np.float32)
    aux = rng.normal(size=(50, aux_w)).astype(np.float32)

    got = np.asarray(sorted_segment_scatter_add_split(
        jnp.asarray(accum), jnp.asarray(slots), feats, jnp.asarray(w),
        jnp.asarray(aux), block_rows=16, interpret=True))
    update = np.concatenate(
        [w[:, None] * np.asarray(feats, np.float32), aux], axis=1)
    want = np.asarray(sorted_segment_scatter_add(
        jnp.asarray(accum), jnp.asarray(slots), jnp.asarray(update),
        block_rows=16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    # and against the exact f64 oracle
    out = np.array(accum, np.float64)
    for k in range(slots.shape[0]):
        out[slots[k]] += np.asarray(update[k], np.float64)
    np.testing.assert_allclose(got, out.astype(np.float32),
                               rtol=1e-5, atol=1e-5)


def test_split_payload_fallback_on_odd_width(rng):
    """Non-lane-multiple d falls back to the assembled path and still
    matches the oracle."""
    from avlmaps_tpu.ops.segment_scatter import (
        sorted_segment_scatter_add_split,
    )

    d, aux_w = 24, W - 24
    accum = rng.normal(size=(S, W)).astype(np.float32)
    slots = np.sort(rng.integers(0, S - 1, 30)).astype(np.int32)
    feats = rng.normal(size=(30, d)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, 30).astype(np.float32)
    aux = rng.normal(size=(30, aux_w)).astype(np.float32)
    got = np.asarray(sorted_segment_scatter_add_split(
        jnp.asarray(accum), jnp.asarray(slots), jnp.asarray(feats),
        jnp.asarray(w), jnp.asarray(aux), block_rows=8, interpret=True))
    update = np.concatenate([w[:, None] * feats, aux], axis=1)
    want = _oracle(accum, slots, update)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_trash_row_absorbs_padding(rng):
    """Padding rows add exactly zero to the trash row S-1."""
    accum = rng.normal(size=(S, W)).astype(np.float32)
    slots = np.sort(rng.integers(0, S, 13)).astype(np.int32)
    updates = rng.normal(size=(13, W)).astype(np.float32)
    got = run(accum, slots, updates, block_rows=8)
    want = _oracle(accum, slots, updates)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_non_lane_multiple_width(rng):
    """Odd widths (e.g. tiny test feat dims) still match the oracle."""
    accum = rng.normal(size=(S, 152)).astype(np.float32)
    slots = np.sort(rng.integers(0, S, 20)).astype(np.int32)
    updates = rng.normal(size=(20, 152)).astype(np.float32)
    got = run(accum, slots, updates, block_rows=8)
    np.testing.assert_allclose(got, _oracle(accum, slots, updates),
                               rtol=1e-5, atol=1e-5)


def test_tail_one_drops_trash_row_only(rng):
    """S % 8 == 1 (the voxel-fusion layout): updates to the final row — the
    trash slot, contents unspecified — are discarded; every aligned row
    still matches the oracle exactly."""
    s = 57  # 57 % 8 == 1
    accum = rng.normal(size=(s, W)).astype(np.float32)
    slots = np.sort(rng.integers(0, s, 40)).astype(np.int32)
    slots[-5:] = s - 1  # guarantee trash-row traffic
    updates = rng.normal(size=(40, W)).astype(np.float32)
    got = run(accum, slots, updates, block_rows=8)
    want = _oracle(accum, slots, updates)
    np.testing.assert_allclose(got[:-1], want[:-1], rtol=1e-5, atol=1e-5)
    # the trash row is untouched, not corrupted
    np.testing.assert_allclose(got[-1], accum[-1], rtol=1e-6)


def test_misaligned_shape_falls_back_to_xla(rng):
    """S % 8 not in {0, 1}: exact XLA-scatter fallback (test-scale shapes)."""
    s = 61
    accum = rng.normal(size=(s, W)).astype(np.float32)
    slots = np.sort(rng.integers(0, s, 30)).astype(np.int32)
    updates = rng.normal(size=(30, W)).astype(np.float32)
    got = run(accum, slots, updates, block_rows=8)
    np.testing.assert_allclose(got, _oracle(accum, slots, updates),
                               rtol=1e-5, atol=1e-5)


def test_fuse_points_dedup_matches_default(rng):
    """fuse_points(dedup_scatter=True) == the XLA-scatter path."""
    from avlmaps_tpu.ops.voxel_fusion import fuse_points, init_fusion_state

    gs, vh, d, cap = 16, 4, 24, 256
    b = 300
    segment_scatter.FORCE_INTERPRET = True
    try:
        vids = rng.integers(0, gs * gs * vh, b).astype(np.int32)
        feats = rng.normal(size=(b, d)).astype(np.float32)
        rgbs = rng.integers(0, 255, (b, 3)).astype(np.float32)
        alphas = rng.uniform(0.1, 1.0, b).astype(np.float32)
        valid = rng.random(b) > 0.1

        kw = dict(gs=gs, vh=vh)
        s_ref = fuse_points(init_fusion_state(gs, vh, d, cap),
                            jnp.asarray(vids), jnp.asarray(feats),
                            jnp.asarray(rgbs), jnp.asarray(alphas),
                            jnp.asarray(valid), **kw)
        s_ded = fuse_points(init_fusion_state(gs, vh, d, cap),
                            jnp.asarray(vids), jnp.asarray(feats),
                            jnp.asarray(rgbs), jnp.asarray(alphas),
                            jnp.asarray(valid), dedup_scatter=True, **kw)
    finally:
        segment_scatter.FORCE_INTERPRET = False
    assert int(s_ded.n_slots) == int(s_ref.n_slots)
    assert int(s_ded.n_dropped) == int(s_ref.n_dropped)
    np.testing.assert_array_equal(np.asarray(s_ded.occupied_flat),
                                  np.asarray(s_ref.occupied_flat))
    # all real slots match; the trash row (last) is unspecified under the
    # dedup kernel (its updates are discarded, not accumulated)
    np.testing.assert_allclose(np.asarray(s_ded.accum)[:-1],
                               np.asarray(s_ref.accum)[:-1],
                               rtol=1e-5, atol=1e-4)
