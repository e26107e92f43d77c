"""Sorted segment scatter-add: one HBM RMW per unique aligned 8-row window.

XLA lowers ``accum.at[slots].add(updates)`` on TPU to a row-serial scatter
(~124 ns/row traced r3: 3.85 ms for a 31k-row fusion batch) — it pays per
UPDATE row even when many rows hit the same slot.  The map-building batch
has ~9x slot collisions (overlapping frames see the same voxels), so
combining colliding rows first cuts the serialized row count ~9x.

Mosaic only DMAs HBM slices whose sublane extent is a multiple of the
f32 tiling (8 rows), so the RMW granule is the aligned 8-row WINDOW
``[8k, 8k+8)`` containing a slot, not the slot row itself.  The kernel
consumes slot-sorted updates: a sequential grid walks fixed-size row
blocks, accumulates each run of same-window rows into an (8, W) VMEM
tile (one-hot row placement on the VPU), and issues ONE asynchronous
read-modify-write DMA per window.  Reads for all of a block's windows
are issued back-to-back before the accumulation pass consumes them, so
DMA latency overlaps compute.  Windows spanning block boundaries carry
their partial tile in VMEM scratch (the grid is sequential).

Hazard freedom: slots are sorted, so each window appears as one
contiguous run and its RMW happens exactly once globally; a spanning
window is finalized only in its last block, and a block's writes are
drained before the next block issues reads.

Alignment tail: rows past the last aligned window boundary (``s % 8``
trailing rows) cannot be DMAed.  With the voxel-fusion layout
(s = capacity+1, capacity a multiple of 8) the single uncovered row is
the TRASH slot, whose contents are unspecified by contract — its
updates are redirected to an in-bounds row with a zeroed payload.  Any
other misaligned shape falls back to the XLA scatter.

Used by ops.voxel_fusion.fuse_points(dedup_scatter=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flip in tests to run every call in interpreter mode on CPU
FORCE_INTERPRET = False


def _kernel(word_ref, upd_ref, acc_in, acc_out,
            acc_tile, landing, sem_r, sem_w, *, rows: int):
    """One grid step = ``rows`` sorted update rows.

    word_ref: (B_padded,) int32 in SMEM (scalar prefetch), one packed word
        per row: ``win * 16 + r8 * 2 + end`` — the aligned-window index
        (slot // 8), the row within the window (slot % 8), and a flag
        marking the last row of the window's run.  Packing keeps the SMEM
        footprint at 4 bytes/row (three separate arrays exceeded the 1 MB
        SMEM budget at batch 16).
    upd_ref:   (rows, W) f32 VMEM block of sorted updates.
    acc_out:   (S, W) f32 in HBM (aliased input — the live accumulator).
    acc_tile:  (8, W) f32 VMEM — accumulated tile of the current window
               (persists across grid steps for boundary-spanning windows).
    landing:   (rows, 8, W) f32 VMEM RMW staging, one tile per window
               finalized in this block.
    """
    i = pl.program_id(0)
    base = i * rows

    @pl.when(i == 0)
    def _init():
        acc_tile[...] = jnp.zeros_like(acc_tile)

    # ---- phase 1: issue one read per window finalized in this block -----
    def issue(r, u):
        word = word_ref[base + r]

        def go(u):
            pltpu.make_async_copy(
                acc_out.at[pl.ds((word // 16) * 8, 8)],
                landing.at[u], sem_r.at[u]).start()
            return u + 1

        return jax.lax.cond(word % 2 != 0, go, lambda u: u, u)

    n_seg = jax.lax.fori_loop(0, rows, issue, 0)

    # ---- phase 2: accumulate rows; finalize windows as they close -------
    def step(r, u):
        word = word_ref[base + r]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                  == (word // 2) % 8).astype(jnp.float32)
        acc_tile[...] += onehot * upd_ref[pl.ds(r, 1), :]

        def close(u):
            pltpu.make_async_copy(
                acc_out.at[pl.ds((word // 16) * 8, 8)],
                landing.at[u], sem_r.at[u]).wait()
            landing[u] += acc_tile[...]
            acc_tile[...] = jnp.zeros_like(acc_tile)
            pltpu.make_async_copy(
                landing.at[u],
                acc_out.at[pl.ds((word // 16) * 8, 8)],
                sem_w.at[u]).start()
            return u + 1

        return jax.lax.cond(word % 2 != 0, close, lambda u: u, u)

    jax.lax.fori_loop(0, rows, step, 0)

    # ---- phase 3: drain writes before the next block reuses sems --------
    def drain(u, _):
        pltpu.make_async_copy(landing.at[u],
                              acc_out.at[pl.ds(0, 8)],  # shape-only
                              sem_w.at[u]).wait()
        return 0

    jax.lax.fori_loop(0, n_seg, drain, 0)


def _kernel_rle(word_ref, upd_ref, acc_in, acc_out,
                acc_tile, run_sum, landing, sem_r, sem_w, *, rows: int):
    """Run-length variant of :func:`_kernel`: rows are sorted by SLOT, so
    same-slot rows are adjacent — accumulate each slot's run into a
    (1, W) vector sum (one VPU add per row) and pay the (8, W) one-hot
    placement once per UNIQUE slot instead of once per row.  At the
    production batch's ~9x slot collisions that cuts the kernel's VPU work
    ~4x (the one-hot expand was 8*W ops/row).

    word packing here: ``win * 32 + r8 * 4 + slot_end * 2 + win_end``
    (a window boundary is always also a slot boundary).
    """
    i = pl.program_id(0)
    base = i * rows

    @pl.when(i == 0)
    def _init():
        acc_tile[...] = jnp.zeros_like(acc_tile)
        run_sum[...] = jnp.zeros_like(run_sum)

    def issue(r, u):
        word = word_ref[base + r]

        def go(u):
            pltpu.make_async_copy(
                acc_out.at[pl.ds((word // 32) * 8, 8)],
                landing.at[u], sem_r.at[u]).start()
            return u + 1

        return jax.lax.cond(word % 2 != 0, go, lambda u: u, u)

    n_seg = jax.lax.fori_loop(0, rows, issue, 0)

    def step(r, u):
        word = word_ref[base + r]
        run_sum[...] += upd_ref[pl.ds(r, 1), :]

        def slot_close(u):
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                      == (word // 4) % 8).astype(jnp.float32)
            acc_tile[...] += onehot * run_sum[...]
            run_sum[...] = jnp.zeros_like(run_sum)

            def win_close(u):
                pltpu.make_async_copy(
                    acc_out.at[pl.ds((word // 32) * 8, 8)],
                    landing.at[u], sem_r.at[u]).wait()
                landing[u] += acc_tile[...]
                acc_tile[...] = jnp.zeros_like(acc_tile)
                pltpu.make_async_copy(
                    landing.at[u],
                    acc_out.at[pl.ds((word // 32) * 8, 8)],
                    sem_w.at[u]).start()
                return u + 1

            return jax.lax.cond(word % 2 != 0, win_close, lambda u: u, u)

        return jax.lax.cond((word // 2) % 2 != 0, slot_close,
                            lambda u: u, u)

    jax.lax.fori_loop(0, rows, step, 0)

    def drain(u, _):
        pltpu.make_async_copy(landing.at[u],
                              acc_out.at[pl.ds(0, 8)],  # shape-only
                              sem_w.at[u]).wait()
        return 0

    jax.lax.fori_loop(0, n_seg, drain, 0)


def _kernel_rle_split(word_ref, w_ref, feat_ref, aux_ref, acc_in, acc_out,
                      acc_tile, run_sum, fbuf, landing, sem_r, sem_w, *,
                      rows: int, d: int):
    """Split-payload run-length kernel: the update row is BUILT IN VMEM
    from the raw sorted inputs — (rows, d) bf16/f32 features, per-row f32
    weight in SMEM, (rows, W-d) f32 aux columns (w-scaled rgb/w/pos) —
    instead of a pre-assembled (rows, W) f32 update.  Deletes the XLA-side
    f32 cast+multiply+concatenate passes over the 640-wide payload and
    halves the kernel's feature stream when the encoder emits bf16.
    Arithmetic is unchanged: w (f32) x feat (cast to f32) is the same
    multiply the XLA assembly did, in the same add order."""
    i = pl.program_id(0)
    base = i * rows

    @pl.when(i == 0)
    def _init():
        acc_tile[...] = jnp.zeros_like(acc_tile)
        run_sum[...] = jnp.zeros_like(run_sum)

    def issue(r, u):
        word = word_ref[base + r]

        def go(u):
            pltpu.make_async_copy(
                acc_out.at[pl.ds((word // 32) * 8, 8)],
                landing.at[u], sem_r.at[u]).start()
            return u + 1

        return jax.lax.cond(word % 2 != 0, go, lambda u: u, u)

    n_seg = jax.lax.fori_loop(0, rows, issue, 0)

    # one vectorised widen per block: Mosaic cannot prove dynamic 1-row
    # loads 8-aligned on a bf16 (2-sublane-packed) block, so the dynamic
    # per-row reads go through this f32 scratch (the HBM stream stays
    # bf16 — the widening never round-trips to HBM)
    fbuf[...] = feat_ref[...].astype(jnp.float32)

    def step(r, u):
        word = word_ref[base + r]
        w = w_ref[base + r]
        run_sum[0:1, :d] += w * fbuf[pl.ds(r, 1), :]
        run_sum[0:1, d:] += aux_ref[pl.ds(r, 1), :]

        def slot_close(u):
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                      == (word // 4) % 8).astype(jnp.float32)
            acc_tile[...] += onehot * run_sum[...]
            run_sum[...] = jnp.zeros_like(run_sum)

            def win_close(u):
                pltpu.make_async_copy(
                    acc_out.at[pl.ds((word // 32) * 8, 8)],
                    landing.at[u], sem_r.at[u]).wait()
                landing[u] += acc_tile[...]
                acc_tile[...] = jnp.zeros_like(acc_tile)
                pltpu.make_async_copy(
                    landing.at[u],
                    acc_out.at[pl.ds((word // 32) * 8, 8)],
                    sem_w.at[u]).start()
                return u + 1

            return jax.lax.cond(word % 2 != 0, win_close, lambda u: u, u)

        return jax.lax.cond((word // 2) % 2 != 0, slot_close,
                            lambda u: u, u)

    jax.lax.fori_loop(0, rows, step, 0)

    def drain(u, _):
        pltpu.make_async_copy(landing.at[u],
                              acc_out.at[pl.ds(0, 8)],  # shape-only
                              sem_w.at[u]).wait()
        return 0

    jax.lax.fori_loop(0, n_seg, drain, 0)


# SMEM holds the whole prefetch arrays (word + w = 8 bytes/row); stay
# well under the ~1 MB budget (three arrays overflowed it at batch 16)
_SPLIT_MAX_ROWS = 100_000


def sorted_segment_scatter_add_split(accum: jnp.ndarray,
                                     slots: jnp.ndarray,
                                     feats: jnp.ndarray,
                                     w: jnp.ndarray,
                                     aux: jnp.ndarray, *,
                                     block_rows: int = 64,
                                     interpret: bool = False
                                     ) -> jnp.ndarray:
    """``accum[slots[k]] += concat(w[k]*feats[k], aux[k])`` for ascending
    ``slots`` — the fusion update built inside the kernel.

    feats: (B, d) bf16/f32 (RAW encoder features, sorted); w: (B,) f32;
    aux: (B, W-d) f32 (already w-scaled rgb/weight/pos columns).  Falls
    back to assembling the update and the standard kernel when shapes
    miss the compiled path's constraints (lane-multiple d and aux width,
    8-aligned accumulator, SMEM row budget).
    """
    s, wd = accum.shape
    b, d = feats.shape
    if b == 0:
        return accum
    interp = interpret or FORCE_INTERPRET
    ok = (s % 8 in (0, 1) and s - s % 8 > 0 and d % 128 == 0
          and (wd - d) % 128 == 0 and aux.shape[1] == wd - d
          and b <= _SPLIT_MAX_ROWS)
    if not ok:
        update = jnp.concatenate(
            [w[:, None] * feats.astype(jnp.float32), aux], axis=1)
        return sorted_segment_scatter_add(accum, slots, update,
                                          block_rows=block_rows,
                                          interpret=interpret)
    tail = s % 8
    s8 = s - tail
    if tail == 1:
        oob = slots >= s8
        slots = jnp.where(oob, s8 - 1, slots)
        feats = jnp.where(oob[:, None], 0, feats)
        aux = jnp.where(oob[:, None], 0.0, aux)
        w = jnp.where(oob, 0.0, w)

    rows = min(block_rows, b)
    pad = (-b) % rows
    if pad:
        slots = jnp.concatenate(
            [slots, jnp.full((pad,), s8 - 1, jnp.int32)])
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, d), feats.dtype)])
        aux = jnp.concatenate([aux, jnp.zeros((pad, wd - d), aux.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    n = b + pad
    nb = n // rows

    win = slots // 8
    win_end = jnp.concatenate(
        [(win[1:] != win[:-1]).astype(jnp.int32),
         jnp.ones((1,), jnp.int32)])
    slot_end = jnp.concatenate(
        [(slots[1:] != slots[:-1]).astype(jnp.int32),
         jnp.ones((1,), jnp.int32)])
    word = win * 32 + (slots % 8) * 4 + slot_end * 2 + win_end

    return pl.pallas_call(
        functools.partial(_kernel_rle_split, rows=rows, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec((rows, d), lambda i, *_: (i, 0)),
                      pl.BlockSpec((rows, wd - d), lambda i, *_: (i, 0)),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((8, wd), jnp.float32),
                            pltpu.VMEM((1, wd), jnp.float32),
                            pltpu.VMEM((rows, d), jnp.float32),
                            pltpu.VMEM((rows, 8, wd), jnp.float32),
                            pltpu.SemaphoreType.DMA((rows,)),
                            pltpu.SemaphoreType.DMA((rows,))],
        ),
        out_shape=jax.ShapeDtypeStruct((s, wd), jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interp,
    )(word, w.astype(jnp.float32), feats, aux, accum)


def sorted_segment_scatter_add(accum: jnp.ndarray, slots: jnp.ndarray,
                               updates: jnp.ndarray, *,
                               block_rows: int = 64,
                               rle: bool = True,
                               interpret: bool = False) -> jnp.ndarray:
    """``accum[slots[k]] += updates[k]`` for ascending ``slots``.

    accum: (S, W) f32, donated/aliased; slots: (B,) int32 sorted ascending;
    updates: (B, W) f32 in the same order.  W should be a 128-lane multiple
    for full VPU/DMA efficiency (the production fusion width D+128 is).

    ``rle=True`` (default) uses the run-length kernel: one (1, W) VPU add
    per row plus one (8, W) one-hot placement per UNIQUE slot — bitwise
    identical to the per-row one-hot form (run sums start from exact 0, so
    the pairwise f32 add sequence is the same) and ~4x less VPU work at
    the production batch's ~9x slot collisions.

    The RMW granule is the aligned 8-row window, so rows past the last
    8-aligned boundary are unreachable: with ``S % 8 == 1`` (voxel fusion:
    capacity+1 rows, capacity % 8 == 0) that single row is the trash slot
    and its updates are DISCARDED (trash contents are unspecified); any
    other misaligned S falls back to the XLA scatter.
    """
    s, w = accum.shape
    b = slots.shape[0]
    if b == 0:
        return accum
    updates = updates.astype(jnp.float32)
    interp = interpret or FORCE_INTERPRET

    tail = s % 8
    s8 = s - tail
    # the compiled kernel additionally needs a 128-lane-multiple width
    # (the production fusion width D+128 is; odd test widths crash Mosaic's
    # tiled-DMA path and gain nothing from dedup anyway)
    if tail not in (0, 1) or s8 == 0 or (not interp and w % 128):
        return accum.at[slots].add(updates)
    if tail == 1:
        oob = slots >= s8
        slots = jnp.where(oob, s8 - 1, slots)
        updates = jnp.where(oob[:, None], 0.0, updates)

    rows = min(block_rows, b)
    pad = (-b) % rows
    if pad:
        slots = jnp.concatenate(
            [slots, jnp.full((pad,), s8 - 1, jnp.int32)])
        updates = jnp.concatenate(
            [updates, jnp.zeros((pad, w), updates.dtype)])
    n = b + pad
    nb = n // rows

    win = slots // 8
    win_end = jnp.concatenate(
        [(win[1:] != win[:-1]).astype(jnp.int32),
         jnp.ones((1,), jnp.int32)])
    if rle:
        slot_end = jnp.concatenate(
            [(slots[1:] != slots[:-1]).astype(jnp.int32),
             jnp.ones((1,), jnp.int32)])
        word = win * 32 + (slots % 8) * 4 + slot_end * 2 + win_end
        kernel = functools.partial(_kernel_rle, rows=rows)
        scratch = [pltpu.VMEM((8, w), jnp.float32),
                   pltpu.VMEM((1, w), jnp.float32)]
    else:
        word = win * 16 + (slots % 8) * 2 + win_end
        kernel = functools.partial(_kernel, rows=rows)
        scratch = [pltpu.VMEM((8, w), jnp.float32)]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((rows, w), lambda i, *_: (i, 0)),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch + [
                pltpu.VMEM((rows, 8, w), jnp.float32),
                pltpu.SemaphoreType.DMA((rows,)),
                pltpu.SemaphoreType.DMA((rows,))],
        ),
        out_shape=jax.ShapeDtypeStruct((s, w), jnp.float32),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interp,
    )(word, updates, accum)
