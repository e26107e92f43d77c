"""Row-sharded multi-chip voxel fusion with data-parallel encoder frames.

Design (see package docstring): LSeg runs data-parallel over frames; each
device extracts a compact per-point payload (voxel row/col/h, feature, rgb,
alpha, valid), all-gathers it across the mesh (ICI), and fuses only points
whose top-down row falls in its shard of the grid.  Slot allocation is
per-shard, so no cross-device ordering exists at all — the merge on export
is pure concatenation with row/slot offsets.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avlmaps_tpu.geometry.grid import voxel_linear_id_jax
from avlmaps_tpu.models.lseg.window import features_at_points
from avlmaps_tpu.ops.voxel_fusion import (
    ACCUM_PAD, VoxelFusionState, init_fusion_state, fuse_points,
)


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class ShardedFusion:
    """Sharded fusion state + the compiled multi-chip map-update step."""

    def __init__(self, mesh: Mesh, *, gs: int, cs: float, vh: int,
                 feat_dim: int, capacity: int, calib_mat: np.ndarray,
                 image_hw: Tuple[int, int], lseg_apply: Callable,
                 base_size: int = 520, crop_size: int = 480,
                 min_depth: float = 0.1, max_depth: float = 6.0,
                 payload_dtype=jnp.bfloat16, half_res_apply: bool = False,
                 transport: str = "frame", lseg_eval: str = "sliding",
                 geometry_fn: Optional[Callable] = None,
                 dedup_scatter: Optional[bool] = None,
                 payload_routing: str = "all_gather",
                 a2a_slack: float = 2.0):
        """``payload_dtype``: wire format of the gathered feature payload —
        bf16 halves the dominant ICI traffic (docs/SCALING.md arithmetic);
        accumulation stays f32 inside fuse_points either way.  Pass
        jnp.float32 for bit-exact parity with the single-device path.

        ``transport``: "frame" feeds full RGB-D frames; "canvas" feeds the
        lean CanvasBatch payload (pipeline/transport.py) — ``step`` then
        takes (params, canvas_u8, z_mm, rgb_pts, pose, sample_idx, valid).

        ``dedup_scatter``: route each shard's fusion through the sorted
        segment scatter-add kernel — same default as make_frame_step
        (on for TPU backends, off elsewhere).

        ``payload_routing``: how the per-point payload reaches its owner
        shard (VERDICT r3 #7).  "all_gather" replicates every point to
        every device (D x the needed ICI bytes, zero loss);
        "all_to_all" bins points by owner row-range on the sender and
        exchanges only each owner's bucket — ~D/``a2a_slack`` x fewer
        bytes on the wire (docs/SCALING.md crossover arithmetic).  Bucket
        capacity is ``ceil(points/D) * a2a_slack``; points past a full
        bucket (pathological case: one frame's points all in one shard)
        are dropped and counted in ``state.n_dropped``."""
        if payload_routing not in ("all_gather", "all_to_all"):
            raise ValueError(f"unknown payload_routing {payload_routing!r}")
        if dedup_scatter is None:
            dedup_scatter = jax.default_backend() == "tpu"
        self.mesh = mesh
        self.payload_dtype = payload_dtype
        # lseg_eval: "sliding" (reference-parity crop grid) or "whole"
        # (one forward over the padded canvas; canvas transport only) --
        # same semantics as make_frame_step_canvas
        if lseg_eval not in ("sliding", "whole"):
            raise ValueError(f"unknown lseg_eval {lseg_eval!r}")
        if lseg_eval == "whole" and transport != "canvas":
            raise ValueError("lseg_eval='whole' requires canvas transport")
        self.axis = mesh.axis_names[0]
        self.n_dev = mesh.devices.size
        if gs % self.n_dev:
            raise ValueError(f"gs={gs} not divisible by {self.n_dev} devices")
        self.gs, self.cs, self.vh = gs, cs, vh
        self.rows_per_dev = gs // self.n_dev
        self.cap_per_dev = capacity // self.n_dev
        self.feat_dim = feat_dim

        rows = self.rows_per_dev
        axis = self.axis
        payload_dtype = self.payload_dtype

        # the unproject chain is the SAME program as the single-device
        # steps (vlmap_builder.make_unproject); only ownership differs —
        # here it is decided after the all_gather by a dynamic axis_index.
        # ``geometry_fn`` overrides it for grids with different indexing
        # (e.g. the multi-floor builder's offset grid): signature
        # (z, sample_idx, pose) -> (gid (B,N,3), fx, fy, alpha, valid)
        if geometry_fn is None:
            from avlmaps_tpu.map.vlmap_builder import make_unproject

            geometry_fn = make_unproject(
                gs=gs, cs=cs, vh=vh, calib_mat=calib_mat, image_hw=image_hw,
                base_size=base_size, crop_size=crop_size, min_depth=min_depth,
                max_depth=max_depth)

        def geometry(z, sample_idx, pose):
            gid, fx, fy, alpha, valid = geometry_fn(z, sample_idx, pose)
            return gid, fx, fy, valid, alpha

        def fuse_owned(state, gid_rows, feats, rgbs, alpha, valid):
            """Shared tail of both routing modes: rebase global grid ids
            onto this shard's row range and fuse the rows it owns."""
            my = jax.lax.axis_index(axis)
            local_row = gid_rows[:, 0] - my * rows
            owned = (local_row >= 0) & (local_row < rows)
            lgid = jnp.concatenate([local_row[:, None], gid_rows[:, 1:]],
                                   axis=-1)
            vids = jnp.clip(voxel_linear_id_jax(lgid, gs, vh), 0,
                            rows * gs * vh - 1)
            return fuse_points(state, vids, feats, rgbs, alpha,
                               valid & owned, gs=gs, vh=vh, n_rows=rows,
                               dedup_scatter=dedup_scatter)

        def gather_and_fuse(state, gid, feats, rgbs, alpha, valid):
            """All-gather the compact payload over ICI; fuse owned rows."""
            d = feats.shape[-1]
            gid_f = jax.lax.all_gather(gid.reshape(-1, 3), axis,
                                       tiled=True)
            feats_f = jax.lax.all_gather(
                feats.reshape(-1, d).astype(payload_dtype), axis,
                tiled=True).astype(jnp.float32)
            rgbs_f = jax.lax.all_gather(rgbs.reshape(-1, 3), axis,
                                        tiled=True)
            alpha_f = jax.lax.all_gather(alpha.reshape(-1), axis, tiled=True)
            valid_f = jax.lax.all_gather(valid.reshape(-1), axis, tiled=True)
            return fuse_owned(state, gid_f, feats_f, rgbs_f, alpha_f,
                              valid_f)

        n_dev = self.n_dev

        def a2a_and_fuse(state, gid, feats, rgbs, alpha, valid):
            """Owner-routed exchange: bin the local payload by owner
            row-range, ship each bucket to its owner with ONE all_to_all
            (each device sends/receives ~slack x B bytes instead of the
            all_gather's D x B), fuse what arrives — every received row is
            already owned by construction."""
            d = feats.shape[-1]
            gid2 = gid.reshape(-1, 3)
            n_pts = gid2.shape[0]
            feats2 = feats.reshape(-1, d).astype(payload_dtype)
            rgbs2 = rgbs.reshape(-1, 3)
            alpha2 = alpha.reshape(-1)
            valid2 = valid.reshape(-1)

            cap = int(min(n_pts, -(-n_pts // n_dev) * a2a_slack))
            cap = max(8, ((cap + 7) // 8) * 8)

            owner = jnp.clip(gid2[:, 0], 0, gs - 1) // rows
            owner = jnp.where(valid2, owner, n_dev)  # invalid -> sentinel
            order = jnp.argsort(owner, stable=True)
            so = owner[order]
            start = jnp.searchsorted(so, jnp.arange(n_dev + 1))
            pos = jnp.arange(n_pts) - start[so]
            keep = (so < n_dev) & (pos < cap)
            dst = jnp.where(keep, so * cap + pos, n_dev * cap)  # drop row

            def bucketize(x, fill):
                out = jnp.full((n_dev * cap + 1,) + x.shape[1:], fill,
                               x.dtype)
                return out.at[dst].set(x[order])[:n_dev * cap]

            def xchg(x):
                return jax.lax.all_to_all(
                    x.reshape(n_dev, cap, *x.shape[1:]), axis,
                    split_axis=0, concat_axis=0).reshape(
                        n_dev * cap, *x.shape[1:])

            g_r = xchg(bucketize(gid2, 0))
            f_r = xchg(bucketize(feats2, 0)).astype(jnp.float32)
            r_r = xchg(bucketize(rgbs2, 0))
            a_r = xchg(bucketize(alpha2, 0))
            v_r = xchg(bucketize(valid2, False))

            # bucket overflow is a SEND-side drop: count it in this
            # shard's n_dropped so lossy routing is always observable
            overflow = jnp.sum((so < n_dev) & ~keep)
            state = fuse_owned(state, g_r, f_r, r_r, a_r, v_r)
            return state._replace(
                n_dropped=state.n_dropped
                + overflow.astype(state.n_dropped.dtype))

        if payload_routing == "all_to_all":
            gather_and_fuse = a2a_and_fuse
        self.payload_routing = payload_routing

        def shard_body(state, lseg_params, rgb_norm, depth, pose, sample_idx,
                       frame_valid):
            """Runs per device: local frames -> global payload -> local rows."""
            if rgb_norm.dtype == jnp.uint8:
                # raw frames off the loader: normalise on device
                rgb_norm = rgb_norm.astype(jnp.float32) * (1.0 / 127.5) - 1.0
            if depth.dtype == jnp.uint16:  # loader depth_mm mode (packed
                depth = depth.astype(jnp.float32) * 1e-3  # scenes ship mm)
            b = rgb_norm.shape[0]
            z = jnp.take_along_axis(depth.reshape(b, -1), sample_idx, axis=1)
            gid, fx, fy, valid, alpha = geometry(z, sample_idx, pose)
            feats = features_at_points(lseg_apply, lseg_params, rgb_norm,
                                       fx, fy, base_size, crop_size,
                                       half_res_apply=half_res_apply)
            rgb_u8 = (rgb_norm * 0.5 + 0.5) * 255.0
            rgbs = jnp.take_along_axis(rgb_u8.reshape(b, -1, 3),
                                       sample_idx[..., None], axis=1)
            return gather_and_fuse(state, gid, feats, rgbs, alpha,
                                   valid & frame_valid[:, None])

        def shard_body_canvas(state, lseg_params, canvas_u8, z_mm, rgb_pts,
                              pose, sample_idx, frame_valid):
            """Lean-transport variant (pipeline/transport.py CanvasBatch)."""
            canvas = canvas_u8.astype(jnp.float32) * (1.0 / 127.5) - 1.0
            z = z_mm.astype(jnp.float32) * 1e-3
            gid, fx, fy, valid, alpha = geometry(z, sample_idx, pose)
            if lseg_eval == "whole":
                from avlmaps_tpu.models.lseg.window import (
                    whole_canvas_features_at_points)

                feats = whole_canvas_features_at_points(
                    lseg_apply, lseg_params, canvas, fx, fy)
            else:
                feats = features_at_points(lseg_apply, lseg_params, canvas,
                                           fx, fy, base_size, crop_size,
                                           half_res_apply=half_res_apply)
            return gather_and_fuse(state, gid, feats,
                                   rgb_pts.astype(jnp.float32), alpha,
                                   valid & frame_valid[:, None])

        pspec_state = VoxelFusionState(
            occupied_flat=P(axis), accum=P(axis), n_slots=P(axis),
            n_dropped=P(axis))
        self._state_spec = pspec_state
        self.transport = transport
        if transport == "canvas":
            body, n_data_args = shard_body_canvas, 6
        else:
            body, n_data_args = shard_body, 5
        self._step = jax.jit(
            jax.shard_map(
                body, mesh=mesh,
                in_specs=(pspec_state, P()) + (P(axis),) * n_data_args,
                out_specs=pspec_state,
                check_vma=False,
            ),
            donate_argnums=(0,))

        self.state = self._init_state()

    def restore(self, grid_feat: np.ndarray, grid_pos: np.ndarray,
                weight: np.ndarray, occupied_ids: np.ndarray,
                grid_rgb: Optional[np.ndarray] = None) -> None:
        """Resume a sharded build from a saved (merged) map: re-shard slots
        by row ownership — the inverse of :func:`export_sharded`.  Mirrors
        the reference's resume semantics (avlmaps/map/vlmap_builder.py:66-91)
        on the multi-chip path."""
        self.state = restore_sharded(
            grid_feat, grid_pos, weight, occupied_ids, grid_rgb,
            n_dev=self.n_dev, gs=self.gs, vh=self.vh,
            rows_per_dev=self.rows_per_dev, cap_per_dev=self.cap_per_dev,
            feat_dim=self.feat_dim)
        shardings = jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec), self._state_spec)
        self.state = jax.tree.map(jax.device_put, self.state, shardings)

    def _init_state(self) -> VoxelFusionState:
        """Per-shard states stacked on a leading device axis."""
        rows, gs, vh = self.rows_per_dev, self.gs, self.vh
        n = self.n_dev

        def one(_):
            return init_fusion_state(1, 1, self.feat_dim, self.cap_per_dev)

        # build shapes manually: occupied covers rows*gs*vh per device
        state = VoxelFusionState(
            occupied_flat=jnp.full((n * rows * gs * vh,), -1, jnp.int32),
            accum=jnp.zeros((n * (self.cap_per_dev + 1),
                             self.feat_dim + ACCUM_PAD), jnp.float32),
            n_slots=jnp.zeros((n,), jnp.int32),
            n_dropped=jnp.zeros((n,), jnp.int32),
        )
        shardings = jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec), self._state_spec)
        return jax.tree.map(jax.device_put, state, shardings)

    def step(self, lseg_params, *args):
        """One multi-chip map update over a global frame batch (batch must be
        divisible by the mesh size).

        frame transport:  step(params, rgb, depth, pose, sample_idx, valid)
        canvas transport: step(params, canvas_u8, z_mm, rgb_pts, pose,
                               sample_idx, valid)
        """
        self.state = self._step(self.state, lseg_params, *args)
        return self.state

    def export(self):
        return export_sharded(self.state, n_dev=self.n_dev, gs=self.gs,
                              vh=self.vh, rows_per_dev=self.rows_per_dev,
                              cap_per_dev=self.cap_per_dev, mesh=self.mesh)


def restore_sharded(grid_feat: np.ndarray, grid_pos: np.ndarray,
                    weight: np.ndarray, occupied_ids: np.ndarray,
                    grid_rgb: Optional[np.ndarray], *, n_dev: int, gs: int,
                    vh: int, rows_per_dev: int, cap_per_dev: int,
                    feat_dim: int) -> VoxelFusionState:
    """Build per-device fusion shards from a merged map.

    Each slot is owned by the shard whose row range contains its grid row;
    per-shard slot ids are re-based to local contiguous ranks and the
    occupied table is rebuilt from the slots' own (row, col, h) so stale
    entries in ``occupied_ids`` can't leak across shards."""
    n = grid_feat.shape[0]
    rows = grid_pos[:, 0]
    occ = np.full((n_dev, rows_per_dev * gs * vh), -1, np.int32)
    wf = np.zeros((n_dev, cap_per_dev + 1, feat_dim), np.float32)
    wr = np.zeros((n_dev, cap_per_dev + 1, 3), np.float32)
    wsum = np.zeros((n_dev, cap_per_dev + 1), np.float32)
    pos = np.zeros((n_dev, cap_per_dev + 1, 3), np.int32)
    n_slots = np.zeros((n_dev,), np.int32)
    for d in range(n_dev):
        mine = np.nonzero((rows >= d * rows_per_dev)
                          & (rows < (d + 1) * rows_per_dev))[0]
        k = mine.shape[0]
        if k > cap_per_dev:
            raise ValueError(
                f"shard {d} needs {k} slots > per-shard capacity "
                f"{cap_per_dev}")
        w = np.asarray(weight[mine], np.float32)
        wsum[d, :k] = w
        wf[d, :k] = grid_feat[mine] * w[:, None]
        if grid_rgb is not None:
            wr[d, :k] = grid_rgb[mine].astype(np.float32) * w[:, None]
        lpos = grid_pos[mine].astype(np.int32).copy()
        lpos[:, 0] -= d * rows_per_dev
        pos[d, :k] = lpos
        lin = (lpos[:, 0] * gs + lpos[:, 1]) * vh + lpos[:, 2]
        occ[d, lin] = np.arange(k, dtype=np.int32)
        n_slots[d] = k
    accum = np.concatenate([
        wf, wr, wsum[..., None], pos.astype(np.float32),
        np.zeros((n_dev, cap_per_dev + 1, ACCUM_PAD - 7), np.float32)],
        axis=2)
    return VoxelFusionState(
        occupied_flat=jnp.asarray(occ.reshape(-1)),
        accum=jnp.asarray(accum.reshape(-1, feat_dim + ACCUM_PAD)),
        n_slots=jnp.asarray(n_slots),
        n_dropped=jnp.zeros((n_dev,), jnp.int32),
    )


def export_sharded(state: VoxelFusionState, *, n_dev: int, gs: int, vh: int,
                   rows_per_dev: int, cap_per_dev: int,
                   mesh: Optional[Mesh] = None):
    """Merge per-device shards into the reference's storage form: concatenate
    slots with per-shard offsets, rebuild the dense occupied table from the
    slots' own positions.

    With a ``mesh``, each shard slices its first ``bucket`` slots and
    finishes the weighted mean ON DEVICE (bucket = power-of-two cover of the
    fullest shard), so D2H bytes scale with occupancy, not capacity, and the
    per-device occupied tables never cross the link at all (VERDICT r2 #2).
    """
    from avlmaps_tpu.ops.voxel_fusion import export_bucket

    n_slots = np.asarray(jax.device_get(state.n_slots)).reshape(n_dev)
    if mesh is not None:
        axis = mesh.axis_names[0]
        bucket = min(export_bucket(int(n_slots.max())), cap_per_dev + 1)

        def shard_export(st: VoxelFusionState):
            d = st.feat_dim
            a = jax.lax.dynamic_slice(st.accum, (0, 0),
                                      (bucket, st.accum.shape[1]))
            w = a[:, d + 3]
            denom = jnp.where(w > 0, w, 1.0)[:, None]
            f = a[:, :d] / denom
            r = a[:, d:d + 3] / denom
            p = a[:, d + 4:d + 7].astype(jnp.int32)
            return f, p, w, jnp.clip(r, 0, 255).astype(jnp.uint8)

        spec = VoxelFusionState(
            occupied_flat=P(axis), accum=P(axis), n_slots=P(axis),
            n_dropped=P(axis))
        out = jax.jit(jax.shard_map(
            shard_export, mesh=mesh, in_specs=(spec,),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_vma=False))(state)
        wf, pos, wsum, wr8 = (np.asarray(jax.device_get(a)) for a in out)
        wf = wf.reshape(n_dev, bucket, -1)
        pos = pos.reshape(n_dev, bucket, 3)
        wsum = wsum.reshape(n_dev, bucket)
        wr8 = wr8.reshape(n_dev, bucket, 3)
        pre_divided = True
    else:  # no mesh (e.g. a host-side restored state): full fetch fallback
        acc = np.asarray(jax.device_get(state.accum)).reshape(
            n_dev, cap_per_dev + 1, -1)
        d = acc.shape[2] - ACCUM_PAD
        wf = acc[:, :, :d]
        wr = acc[:, :, d:d + 3]
        wsum = acc[:, :, d + 3]
        pos = acc[:, :, d + 4:d + 7].astype(np.int32)
        pre_divided = False

    feats, rgbs, weights, poss = [], [], [], []
    for d in range(n_dev):
        n = int(n_slots[d])
        w = wsum[d, :n]
        if pre_divided:
            feats.append(wf[d, :n])
            rgbs.append(wr8[d, :n])
        else:
            denom = np.where(w > 0, w, 1.0)[:, None]
            feats.append(wf[d, :n] / denom)
            rgbs.append(np.clip(wr[d, :n] / denom, 0, 255).astype(np.uint8))
        weights.append(w)
        p = pos[d, :n].copy()
        p[:, 0] += d * rows_per_dev  # re-base shard-local rows
        poss.append(p)
    grid_pos = np.concatenate(poss).astype(np.int32)
    # occupied[r, c, h] = global slot id — exactly invertible from the
    # per-slot positions; the 120 MB device table stays on device
    occupied = np.full((gs, gs, vh), -1, np.int32)
    occupied[grid_pos[:, 0], grid_pos[:, 1], grid_pos[:, 2]] = \
        np.arange(grid_pos.shape[0], dtype=np.int32)
    return (np.concatenate(feats).astype(np.float32),
            grid_pos,
            np.concatenate(weights).astype(np.float32),
            occupied,
            np.concatenate(rgbs))


def sharded_score_argmax(mesh: Mesh, map_feats, text_feats,
                         normalize_map: bool = True,
                         normalize_text: bool = True) -> np.ndarray:
    """Multi-chip open-vocabulary indexing: (N, D) voxel features row-
    sharded over the mesh, (C, D) text replicated; every device runs the
    fused score+argmax Pallas kernel on its shard.

    There are NO collectives on the hot path — the argmax is per-voxel, so
    the row sharding makes each device's work independent (the reference's
    equivalent is a single-host numpy matmul, clip_utils.py:196-242).
    Returns the (N,) int32 best-category labels on the host.
    """
    from functools import partial

    from avlmaps_tpu.ops.similarity import score_argmax

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n = map_feats.shape[0]
    pad = (-n) % (n_dev * 8)  # equal shards, sublane-aligned rows
    feats = np.asarray(map_feats, np.float32)
    if pad:
        feats = np.concatenate(
            [feats, np.zeros((pad, feats.shape[1]), np.float32)])
    f = jax.device_put(jnp.asarray(feats),
                       NamedSharding(mesh, P(axis, None)))
    t = jax.device_put(jnp.asarray(text_feats, jnp.float32),
                       NamedSharding(mesh, P()))
    fn = jax.shard_map(
        partial(score_argmax, normalize_map=normalize_map,
                normalize_text=normalize_text),
        mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(axis),
        check_vma=False)  # pallas_call out_shape carries no vma info
    out = np.asarray(jax.device_get(jax.jit(fn)(f, t)))
    return out[:n]
