"""Voxel scatter-accumulate fusion — the map-construction hot path on TPU.

The reference builds the map with a per-point Python loop doing a sequential
weighted running mean per voxel (avlmaps/map/vlmap_builder.py:136-178).  Here
the update is reformulated associatively: each voxel slot stores Σ(w·feat) and
Σw; the running mean is recovered on read as Σ(w·feat)/Σw.  In exact
arithmetic this equals the reference's sequential mean for any point order
(one intentional deviation: the reference's first insert stores
``feat * alpha`` un-normalised, vlmap_builder.py:163, so its means over-weight
a voxel's first point by a factor alpha — the associative form implements the
weighted mean ConceptFusion actually specifies), which makes the whole frame
batch one data-parallel scatter-add — XLA lowers
it onto the TPU's native scatter path, and points from many frames fuse in a
single device step.

Slot allocation (the reference's ``max_id`` bump + ``occupied_ids`` bookkeeping,
vlmap_builder.py:161-178) is done with static shapes: sort the batch's unseen
voxel ids, flag first occurrences, and assign contiguous slot ranks via a
cumulative sum.  Invalid / overflowing points are routed to a trash slot
(row ``capacity`` of every per-slot array) instead of branching.

All functions are pure; ``fuse_points`` is designed to be ``jit``-ed with
donated state so the accumulators update in place in HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT32_MAX = np.iinfo(np.int32).max


class VoxelFusionState(NamedTuple):
    """Device-resident accumulator state (a pytree; shard-friendly).

    ``occupied_flat`` is the dense voxel -> slot table, flattened to 1D for
    cheap gathers/scatters: index = row * gs * vh + col * vh + h.

    All per-slot quantities live in ONE wide f32 array ``accum`` with
    columns ``[Σw·feat (D) | Σw·rgb (3) | Σw (1) | (row, col, h) (3) |
    zero pad]`` so the per-step update is a SINGLE scatter-add: TPU
    scatters are latency-bound per ROW, so four separate scatters
    (feat/rgb/w/pos) cost ~4x one wide scatter (profiled r3: 6.5 ms/step
    -> one ~3.8 ms scatter at the bench geometry).  Positions ride along
    as f32 adds applied exactly once per slot (by the allocating point),
    exact below 2^24.  The width is padded to D+128 — the next lane
    multiple — because at D+7 (519) XLA's auto entry layout packs the
    array column-major to dodge lane padding and then transposes the full
    2 GB array TWICE around the (row-major) scatter, ~14 ms/step (traced
    r3); at a lane multiple row-major costs nothing and wins everywhere.
    The named views below keep every consumer source-compatible.
    """

    occupied_flat: jnp.ndarray  # (gs*gs*vh,) int32, -1 = empty
    accum: jnp.ndarray  # (capacity+1, D+128) float32; last row = trash slot
    n_slots: jnp.ndarray  # () int32 — the reference's max_id
    n_dropped: jnp.ndarray  # () int32 — points lost to capacity overflow

    @property
    def feat_dim(self):
        return self.accum.shape[-1] - ACCUM_PAD

    @property
    def sum_wfeat(self):  # (capacity+1, D) Σ w·feat per slot
        return self.accum[..., :self.feat_dim]

    @property
    def sum_wrgb(self):  # (capacity+1, 3) Σ w·rgb per slot
        return self.accum[..., self.feat_dim:self.feat_dim + 3]

    @property
    def sum_w(self):  # (capacity+1,) Σ w per slot
        return self.accum[..., self.feat_dim + 3]

    @property
    def grid_pos(self):  # (capacity+1, 3) int32 (row, col, h) of each slot
        d = self.feat_dim
        return self.accum[..., d + 4:d + 7].astype(jnp.int32)


# accumulator columns beyond feat_dim: rgb (3) + w (1) + pos (3) + zero
# pad up to the 128-lane multiple (see VoxelFusionState docstring)
ACCUM_PAD = 128


def init_fusion_state(gs: int, vh: int, feat_dim: int,
                      capacity: int) -> VoxelFusionState:
    """Fresh accumulators.  The +1 row on per-slot arrays is the trash slot."""
    return VoxelFusionState(
        occupied_flat=jnp.full((gs * gs * vh,), -1, jnp.int32),
        accum=jnp.zeros((capacity + 1, feat_dim + ACCUM_PAD), jnp.float32),
        n_slots=jnp.zeros((), jnp.int32),
        n_dropped=jnp.zeros((), jnp.int32),
    )


def concept_fusion_alpha(points_local: jnp.ndarray,
                         sigma_sq: float = 0.6) -> jnp.ndarray:
    """ConceptFusion distance weight α = exp(-|p|² / (2σ²)), σ² = 0.6
    (reference vlmap_builder.py:156-158)."""
    radial_dist_sq = jnp.sum(jnp.square(points_local), axis=-1)
    return jnp.exp(-radial_dist_sq / (2.0 * sigma_sq))


@functools.partial(jax.jit,
                   static_argnames=("gs", "vh", "n_rows", "dedup_scatter",
                                    "scatter_block_rows", "scatter_rle",
                                    "scatter_split"),
                   donate_argnums=(0,))
def fuse_points(state: VoxelFusionState,
                vids: jnp.ndarray,  # (B,) int32 flat voxel ids
                feats: jnp.ndarray,  # (B, D) float32
                rgbs: jnp.ndarray,  # (B, 3) float32
                alphas: jnp.ndarray,  # (B,) float32 confidence weights
                valid: jnp.ndarray,  # (B,) bool
                *, gs: int, vh: int,
                n_rows: Optional[int] = None,
                dedup_scatter: bool = False,
                scatter_block_rows: int = 64,
                scatter_rle: bool = True,
                scatter_split: bool = True) -> VoxelFusionState:
    """Fuse one batch of weighted point features into the voxel accumulators.

    Semantics per valid point (row, col, h) with weight α (matches the
    reference inner loop vlmap_builder.py:161-178 in its associative form):
      slot           = occupied[row, col, h], allocating if empty
      sum_wfeat[slot] += α·feat ; sum_wrgb[slot] += α·rgb ; sum_w[slot] += α

    ``n_rows`` supports row-sharded grids (multi-chip): the state's
    occupied table covers only ``n_rows`` of the gs rows and vids are local
    (local_row * gs * vh + col * vh + h).  Defaults to the full grid.

    ``dedup_scatter=True`` sorts the batch by slot and combines colliding
    rows before touching HBM (ops/segment_scatter.py): one RMW per unique
    voxel instead of one serialized scatter row per point.  Numerically
    identical up to f32 add order (adds within a slot commute).
    """
    capacity = state.accum.shape[0] - 1
    b = vids.shape[0]
    if n_rows is None:
        n_rows = gs
    n_vox = n_rows * gs * vh
    if n_vox + capacity + 1 >= INT32_MAX:
        # the composite sort key below needs capacity+1+vid to fit int32;
        # a grid this size would need an >8 GB slot table anyway
        raise ValueError(f"grid of {n_vox} voxels + capacity {capacity} "
                         "overflows the int32 fusion sort key")

    safe_vids = jnp.where(valid, vids, 0)
    slot0 = state.occupied_flat[safe_vids]  # -1 = unseen

    # ---- ONE sort orders allocation AND the dedup scatter -----------------
    # Composite key: points of already-allocated voxels sort by their final
    # slot; first-seen voxels sort by voxel id shifted past every possible
    # slot (their final slots n_slots+rank are assigned in ascending vid
    # order, so key order IS final-slot order); invalid points sort last
    # (their slot is the trash row ``capacity``, the largest slot).  The
    # sorted batch is therefore ascending in FINAL slot, which is exactly
    # what the windowed dedup scatter consumes — replacing the r2 chain of
    # three 62k-row sorts (allocation sort, inverse-permutation sort, the
    # dedup slot sort) with one.
    key = jnp.where(valid,
                    jnp.where(slot0 >= 0, slot0, capacity + 1 + safe_vids),
                    INT32_MAX)
    perm = jnp.argsort(key)
    sk = key[perm]

    # ---- allocate slots for first-seen voxels (sorted domain) -------------
    is_new = (sk > capacity) & (sk < INT32_MAX)
    vid_s = jnp.where(is_new, sk - (capacity + 1), 0)
    first = jnp.concatenate([is_new[:1],
                             is_new[1:] & (sk[1:] != sk[:-1])])
    # contiguous rank of each unique new voxel, in voxel-id order; constant
    # within a run, so every point of a new voxel knows its slot without
    # re-reading the table after the update below
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_unique = jnp.sum(first.astype(jnp.int32))
    cand = state.n_slots + rank
    fits = cand < capacity
    slot_s = jnp.where(is_new, jnp.where(fits, cand, capacity),
                       jnp.minimum(sk, capacity))
    designated = first & fits  # the one point that writes each new slot
    # non-designated rows point one past the table and mode="drop" discards
    # them in the scatter itself — concatenating a real landing row instead
    # cost three full copies of the 30M-entry table per step (~1.3 ms
    # traced r3, and it defeated the donated-buffer in-place scatter)
    write_vid = jnp.where(designated, vid_s, n_vox)
    occupied_flat = state.occupied_flat.at[write_vid].set(slot_s,
                                                          mode="drop")

    # ---- accumulate (sorted domain; scatter order is irrelevant to +=) ----
    # each new slot's (row, col, h) is written by exactly ONE point — the
    # designated allocator — as a weighted add in the shared scatter below
    # (scatters are latency-bound per row, so the position columns ride the
    # feature scatter for free instead of a scatter of their own).
    w = jnp.where(valid, alphas, 0.0).astype(jnp.float32)[perm]
    vrow = vid_s // (gs * vh)
    vcol = (vid_s // vh) % gs
    vhh = vid_s % vh
    pos_add = (jnp.stack([vrow, vcol, vhh], axis=1).astype(jnp.float32)
               * designated[:, None])
    aux = jnp.concatenate([
        w[:, None] * rgbs[perm],
        w[:, None],
        pos_add,
        jnp.zeros((b, ACCUM_PAD - 7), jnp.float32),
    ], axis=1)
    if dedup_scatter and scatter_rle and scatter_split:
        # split payload: the kernel builds w*feat in VMEM from the RAW
        # sorted features (bf16 straight from the encoder) — no f32
        # cast/multiply/concatenate pass over the 640-wide update and
        # half the feature stream into the kernel.  Same multiplies, same
        # add order: bitwise-identical to the assembled form.
        from avlmaps_tpu.ops.segment_scatter import \
            sorted_segment_scatter_add_split

        accum = sorted_segment_scatter_add_split(
            state.accum, slot_s, feats[perm], w, aux,
            block_rows=scatter_block_rows)
    elif dedup_scatter:
        from avlmaps_tpu.ops.segment_scatter import \
            sorted_segment_scatter_add

        update = jnp.concatenate(
            [w[:, None] * feats[perm].astype(jnp.float32), aux], axis=1)
        accum = sorted_segment_scatter_add(
            state.accum, slot_s, update, block_rows=scatter_block_rows,
            rle=scatter_rle)
    else:
        update = jnp.concatenate(
            [w[:, None] * feats[perm].astype(jnp.float32), aux], axis=1)
        accum = state.accum.at[slot_s].add(update)

    n_slots = jnp.minimum(state.n_slots + n_unique, capacity)
    n_dropped = state.n_dropped + jnp.sum(
        ((sk < INT32_MAX) & (slot_s == capacity)).astype(jnp.int32))

    return VoxelFusionState(occupied_flat, accum, n_slots, n_dropped)


def export_bucket(n: int, minimum: int = 4096) -> int:
    """Static slice length for exporting ``n`` occupied slots: next power of
    two (>= minimum) so repeat exports hit a handful of compiled programs."""
    return max(minimum, 1 << max(int(n) - 1, 0).bit_length())


@functools.partial(jax.jit, static_argnames=("bucket",))
def _device_export(state: VoxelFusionState, *, bucket: int):
    """Slice the first ``bucket`` slots and finish the weighted mean ON
    DEVICE, so the D2H transfer scales with occupancy, not capacity
    (VERDICT r2 #2: the full (capacity+1, D) fetch was ~2 GB per periodic
    save at the production capacity — the dominant cost of a real build on
    a slow host link, vs the reference's cheap incremental HDF5 save,
    avlmaps/map/vlmap_builder.py:180-183)."""
    d = state.feat_dim
    a = jax.lax.dynamic_slice(state.accum, (0, 0),
                              (bucket, state.accum.shape[1]))
    sum_w = a[:, d + 3]
    denom = jnp.where(sum_w > 0, sum_w, 1.0)[:, None]
    grid_feat = a[:, :d] / denom
    grid_rgb = a[:, d:d + 3] / denom
    grid_pos = a[:, d + 4:d + 7].astype(jnp.int32)
    rgb_u8 = jnp.clip(grid_rgb, 0, 255).astype(jnp.uint8)
    return grid_feat, grid_pos, sum_w, rgb_u8


def occupied_from_grid_pos(grid_pos: np.ndarray, gs: int, vh: int,
                           n: Optional[int] = None) -> np.ndarray:
    """Rebuild the dense slot table from the per-slot positions.

    ``occupied_ids[r, c, h] = slot`` is exactly invertible from
    ``grid_pos[slot] = (r, c, h)``: the device table never needs to cross
    the host link (120 MB at the reference gs=1000/vh=30 geometry)."""
    n = grid_pos.shape[0] if n is None else n
    occ = np.full((gs, gs, vh), -1, np.int32)
    p = grid_pos[:n]
    occ[p[:, 0], p[:, 1], p[:, 2]] = np.arange(n, dtype=np.int32)
    return occ


def export_fusion_state(state: VoxelFusionState, gs: int, vh: int
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray, np.ndarray]:
    """Convert device accumulators to the reference's storage form.

    Returns (grid_feat (N, D) weighted-mean, grid_pos (N, 3), weight (N,),
    occupied_ids (gs, gs, vh), grid_rgb (N, 3) uint8), N = n_slots.

    Only ~N rows cross the device->host link: the per-slot arrays are
    sliced (to the next power-of-two bucket) and normalised on device, and
    the dense occupied table is reconstructed host-side from grid_pos.
    """
    n = int(jax.device_get(state.n_slots))
    bucket = min(export_bucket(n), state.sum_w.shape[0])
    grid_feat, grid_pos, sum_w, grid_rgb = jax.device_get(
        _device_export(state, bucket=bucket))
    grid_feat = np.asarray(grid_feat)[:n]
    grid_pos = np.asarray(grid_pos)[:n]
    sum_w = np.asarray(sum_w)[:n]
    grid_rgb = np.asarray(grid_rgb)[:n]
    occupied_ids = occupied_from_grid_pos(grid_pos, gs, vh)
    return (grid_feat.astype(np.float32), grid_pos.astype(np.int32),
            sum_w.astype(np.float32), occupied_ids, grid_rgb)


def restore_fusion_state(gs: int, vh: int, capacity: int,
                         grid_feat: np.ndarray, grid_pos: np.ndarray,
                         weight: np.ndarray, occupied_ids: np.ndarray,
                         grid_rgb: Optional[np.ndarray] = None
                         ) -> VoxelFusionState:
    """Resume fusion from a saved map (the builder's resume path; reference
    vlmap_builder.py:211-224)."""
    n = grid_feat.shape[0]
    d = grid_feat.shape[1]
    if n > capacity:
        raise ValueError(f"saved map has {n} slots > capacity {capacity}")
    accum = np.zeros((capacity + 1, d + ACCUM_PAD), np.float32)
    accum[:n, d + 3] = weight
    accum[:n, :d] = grid_feat * weight[:, None]
    if grid_rgb is not None:
        accum[:n, d:d + 3] = grid_rgb.astype(np.float32) * weight[:, None]
    accum[:n, d + 4:d + 7] = grid_pos.astype(np.float32)
    return VoxelFusionState(
        occupied_flat=jnp.asarray(occupied_ids.reshape(-1).astype(np.int32)),
        accum=jnp.asarray(accum),
        n_slots=jnp.asarray(n, jnp.int32),
        n_dropped=jnp.zeros((), jnp.int32),
    )
