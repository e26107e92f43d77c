"""VLMap builder: the map-construction pipeline on TPU.

Reference flow (avlmaps/map/vlmap_builder.py:54-185): per frame, run LSeg,
backproject a random subset of depth pixels, transform to the map frame, and
update voxels one point at a time in Python.  Here the whole per-frame body —
sliding-window LSeg forward, ray generation at the sampled pixels, pose
transform, grid indexing, ConceptFusion weighting and the voxel
scatter-accumulate — is ONE jitted device program over a *batch* of frames,
fed by a host-side prefetch loader.  Random pixel subsampling happens on the
host (numpy RNG), mirroring the reference's np.random.shuffle subsample
(vlmap_builder.py:266-281) with a static per-frame point budget.
"""

from __future__ import annotations

import os
import sys
import warnings
from pathlib import Path
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avlmaps_tpu.geometry.grid import (
    base_pos_to_grid_id_jax, out_of_range_mask_jax, voxel_linear_id_jax,
)
from avlmaps_tpu.geometry.projection import get_sim_cam_mat
from avlmaps_tpu.geometry.transforms import pose_vec_to_tf
from avlmaps_tpu.map.voxel_map import SparseVoxelMap, load_3d_map
from avlmaps_tpu.models.lseg.window import (
    plan_windows, features_at_points, whole_canvas_features_at_points,
)
from avlmaps_tpu.ops.voxel_fusion import (
    VoxelFusionState, init_fusion_state, fuse_points, export_fusion_state,
    restore_fusion_state, concept_fusion_alpha,
)
from avlmaps_tpu.utils.profiling import RateMeter


def make_unproject(*, gs: int, cs: float, vh: int, calib_mat: np.ndarray,
                   image_hw: Tuple[int, int], base_size: int,
                   crop_size: int, min_depth: float, max_depth: float):
    """THE implementation of the reference's backproject -> map-frame ->
    voxel-grid-id -> canvas-projection chain (avlmaps/map/vlmap_builder.py:
    126-160, mapping_utils.py:226-251), shared by the single-device frame
    steps AND the sharded bodies — the truncation/+0.5 pixel conventions
    live here only.

    Returns ``unproject(z, sample_idx, pose) -> (gid, fx, fy, alpha,
    valid)``: global (B, N, 3) grid ids, canvas feature coords,
    ConceptFusion alpha and the depth/grid/canvas validity mask (no row
    ownership — that is transport/sharding policy, see
    make_point_geometry and parallel/sharded.py).
    """
    h, w = image_hw
    height, width, _, _, _ = plan_windows(h, w, base_size, crop_size)
    feat_intr = jnp.asarray(get_sim_cam_mat(height, width), jnp.float32)
    inv_calib = jnp.asarray(np.linalg.inv(calib_mat), jnp.float32)

    def unproject(z, sample_idx, pose):
        px = (sample_idx % w).astype(jnp.float32)
        py = (sample_idx // w).astype(jnp.float32)

        # backproject the sampled pixels (reference depth2pc at the +0.5
        # pixel centres, mapping_utils.py:226-251)
        uv1 = jnp.stack([px + 0.5, py + 0.5, jnp.ones_like(px)], axis=-1)
        rays = jnp.einsum("ij,bnj->bni", inv_calib, uv1,
                          precision=jax.lax.Precision.HIGHEST)
        pc_local = rays * z[..., None]  # (B, N, 3)
        zmask = (z > min_depth) & (z < max_depth)

        # to map frame (reference pc_transform chain, vlmap_builder.py:131-133)
        pc_global = jnp.einsum("bij,bnj->bni", pose[:, :3, :3], pc_local,
                               precision=jax.lax.Precision.HIGHEST) \
            + pose[:, None, :3, 3]

        gid = jax.vmap(lambda pt: base_pos_to_grid_id_jax(gs, cs, pt))(
            pc_global)
        in_grid = jax.vmap(lambda g: out_of_range_mask_jax(g, gs, vh))(gid)

        # pixel features looked up via the canvas intrinsics projection
        # (reference pix_feats_intr, vlmap_builder.py:126,141-143)
        uvw = jnp.einsum("ij,bnj->bni", feat_intr, pc_local,
                         precision=jax.lax.Precision.HIGHEST)
        fx = jnp.trunc(uvw[..., 0] / uvw[..., 2] - 0.5).astype(jnp.int32)
        fy = jnp.trunc(uvw[..., 1] / uvw[..., 2] - 0.5).astype(jnp.int32)
        in_feat = (fx >= 0) & (fx < width) & (fy >= 0) & (fy < height)

        alpha = concept_fusion_alpha(pc_local)
        return gid, fx, fy, alpha, zmask & in_grid & in_feat

    return unproject


def make_point_geometry(*, gs: int, cs: float, vh: int,
                        calib_mat: np.ndarray, image_hw: Tuple[int, int],
                        base_size: int, crop_size: int, min_depth: float,
                        max_depth: float, n_rows: Optional[int] = None,
                        row_offset: int = 0):
    """make_unproject + static row ownership for the frame-step factories.

    Returns ``(geometry, rows)`` where
    ``geometry(z, sample_idx, pose) -> (vids, fx, fy, alpha, valid)``:
    shard-local linear voxel ids (row-rebased and clipped) and the
    combined depth/grid/canvas/ownership validity mask.
    """
    unproject = make_unproject(
        gs=gs, cs=cs, vh=vh, calib_mat=calib_mat, image_hw=image_hw,
        base_size=base_size, crop_size=crop_size, min_depth=min_depth,
        max_depth=max_depth)
    rows = gs if n_rows is None else n_rows

    def geometry(z, sample_idx, pose):
        gid, fx, fy, alpha, valid = unproject(z, sample_idx, pose)
        # row sharding: keep only rows this shard owns, re-base the row
        local_row = gid[..., 0] - row_offset
        owned = (local_row >= 0) & (local_row < rows)
        lgid = jnp.concatenate([local_row[..., None], gid[..., 1:]], axis=-1)
        vids = jax.vmap(lambda g: voxel_linear_id_jax(g, gs, vh))(lgid)
        vids = jnp.clip(vids, 0, rows * gs * vh - 1)
        return vids, fx, fy, alpha, valid & owned

    return geometry, rows


def make_frame_step(lseg_apply: Callable, *, gs: int, cs: float, vh: int,
                    calib_mat: np.ndarray, image_hw: Tuple[int, int],
                    base_size: int = 520, crop_size: int = 480,
                    min_depth: float = 0.1, max_depth: float = 6.0,
                    n_rows: Optional[int] = None,
                    row_offset: int = 0,
                    half_res_apply: bool = False,
                    rgb_uint8: bool = False,
                    dedup_scatter: Optional[bool] = None) -> Callable:
    """Build the jitted device step for one batch of frames.

    ``lseg_apply(params, crops) -> (B', c, c, D)`` is the pixel-feature
    network; pass an identity-style stub for benchmarking the fusion alone.
    ``n_rows``/``row_offset`` support row-sharded grids (multi-chip).
    ``rgb_uint8=True`` accepts raw uint8 RGB and normalises on device
    (pairs with PrefetchLoader(normalize=False): 4x less H2D traffic).
    ``dedup_scatter`` routes the fusion through the sorted segment
    scatter-add kernel (ops/segment_scatter.py); default: on for TPU
    backends (measured ~2 ms/step faster at the bench batch, r3), off
    elsewhere (the kernel needs Mosaic or the Pallas interpreter).
    """
    if dedup_scatter is None:
        dedup_scatter = jax.default_backend() == "tpu"
    geometry, rows = make_point_geometry(
        gs=gs, cs=cs, vh=vh, calib_mat=calib_mat, image_hw=image_hw,
        base_size=base_size, crop_size=crop_size, min_depth=min_depth,
        max_depth=max_depth, n_rows=n_rows, row_offset=row_offset)

    def step(state: VoxelFusionState, lseg_params, rgb_norm: jnp.ndarray,
             depth: jnp.ndarray, pose: jnp.ndarray, sample_idx: jnp.ndarray,
             frame_valid: jnp.ndarray) -> VoxelFusionState:
        if rgb_uint8:
            # (x/255 - 0.5)/0.5, fused on device
            rgb_norm = rgb_norm.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        if depth.dtype == jnp.uint16:  # loader depth_mm mode
            depth = depth.astype(jnp.float32) * 1e-3
        b = rgb_norm.shape[0]
        z = jnp.take_along_axis(depth.reshape(b, -1), sample_idx,
                                axis=1)  # (B, N)
        vids, fx, fy, alpha, valid = geometry(z, sample_idx, pose)

        feats = features_at_points(lseg_apply, lseg_params, rgb_norm, fx, fy,
                                   base_size, crop_size,
                                   half_res_apply=half_res_apply)  # (B, N, D)

        # colour at the sampled pixel (reference project_point(calib) lookup
        # lands back on the source pixel)
        rgb_u8 = (rgb_norm * 0.5 + 0.5) * 255.0
        flat_rgb = rgb_u8.reshape(b, -1, 3)
        rgbs = jnp.take_along_axis(flat_rgb, sample_idx[..., None], axis=1)

        valid = valid & frame_valid[:, None]
        d = feats.shape[-1]
        return fuse_points(
            state, vids.reshape(-1), feats.reshape(-1, d),
            rgbs.reshape(-1, 3), alpha.reshape(-1), valid.reshape(-1),
            gs=gs, vh=vh, n_rows=rows, dedup_scatter=dedup_scatter)

    return step


def make_frame_step_canvas(lseg_apply: Callable, *, gs: int, cs: float,
                           vh: int, calib_mat: np.ndarray,
                           image_hw: Tuple[int, int],
                           base_size: int = 520, crop_size: int = 480,
                           min_depth: float = 0.1, max_depth: float = 6.0,
                           n_rows: Optional[int] = None,
                           row_offset: int = 0,
                           half_res_apply: bool = True,
                           lseg_eval: str = "sliding",
                           dedup_scatter: Optional[bool] = None) -> Callable:
    """Lean-transport variant of make_frame_step (pipeline.transport).

    Consumes a CanvasBatch — the pre-resized uint8 canvas plus depth/colour
    gathered at the sampled pixels on the host — instead of full frames:
    ~6.4x less host->device traffic, bit-identical depth/colour values and
    an identical LSeg input up to the canvas' uint8 re-quantisation.  The
    geometry below is the same program as make_frame_step with the full-res
    depth/RGB gathers and the device resize removed.

    ``lseg_eval``: "sliding" = the reference's count-normalised overlapping
    crop grid (lseg_utils.py:77-96, parity default); "whole" = one forward
    over the padded canvas (window.whole_canvas_features_at_points, ~2.4x
    fewer encoder FLOPs, not numerically identical to the reference).
    ``dedup_scatter``: see make_frame_step.
    """
    if dedup_scatter is None:
        dedup_scatter = jax.default_backend() == "tpu"
    geometry, rows = make_point_geometry(
        gs=gs, cs=cs, vh=vh, calib_mat=calib_mat, image_hw=image_hw,
        base_size=base_size, crop_size=crop_size, min_depth=min_depth,
        max_depth=max_depth, n_rows=n_rows, row_offset=row_offset)

    def step(state: VoxelFusionState, lseg_params, canvas_u8: jnp.ndarray,
             z_mm: jnp.ndarray, rgb_pts: jnp.ndarray, pose: jnp.ndarray,
             sample_idx: jnp.ndarray,
             frame_valid: jnp.ndarray) -> VoxelFusionState:
        canvas = canvas_u8.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        z = z_mm.astype(jnp.float32) * 1e-3  # (B, N) metres
        vids, fx, fy, alpha, valid = geometry(z, sample_idx, pose)

        if lseg_eval == "whole":
            feats = whole_canvas_features_at_points(
                lseg_apply, lseg_params, canvas, fx, fy)
        else:
            feats = features_at_points(lseg_apply, lseg_params, canvas,
                                       fx, fy, base_size, crop_size,
                                       half_res_apply=half_res_apply)

        valid = valid & frame_valid[:, None]
        d = feats.shape[-1]
        return fuse_points(
            state, vids.reshape(-1), feats.reshape(-1, d),
            rgb_pts.astype(jnp.float32).reshape(-1, 3),
            alpha.reshape(-1), valid.reshape(-1),
            gs=gs, vh=vh, n_rows=rows, dedup_scatter=dedup_scatter)

    return step


def make_frame_step_device_sampled(
        lseg_apply: Callable, *, gs: int, cs: float, vh: int,
        calib_mat: np.ndarray, image_hw: Tuple[int, int],
        base_size: int = 520, crop_size: int = 480,
        min_depth: float = 0.1, max_depth: float = 6.0,
        n_rows: Optional[int] = None, row_offset: int = 0,
        half_res_apply: bool = True, lseg_eval: str = "whole",
        max_pts: int = 7776, seed: int = 0,
        dedup_scatter: Optional[bool] = None) -> Callable:
    """Serving-mode step with ON-DEVICE point sampling (VERDICT r3 #2).

    The canvas transport still left O(points) host work per frame — RNG
    sampling plus depth/colour gathers on the producer thread — which on a
    1-core host capped the whole-canvas e2e rate at ~36% of the device
    rate.  This step moves all of it on device: the producer ships only the
    resized canvas + the full-res uint16-mm depth plane (a pure memmap copy
    from a packed scene, ~2.1 MB/frame vs 0.6 — trading link bytes for zero
    host per-point work), and the device

    * draws the pixel subsample from a threefry fold of the frame id
      (deterministic per frame — resume-safe, like the host sampler's
      seeded RNG; reference subsample: vlmap_builder.py:266-281),
    * masks duplicate draws (sort + adjacent-compare) so no pixel fuses
      twice — budget ~0.5% under the host sampler's exact-unique count,
    * gathers depth at the samples from the shipped plane,
    * reads point colour from the canvas at the align-corners-scaled pixel
      (nearest) — the one approximation vs the host path, affecting only
      the cosmetic grid_rgb channel (features come from the canvas anyway).
    """
    if dedup_scatter is None:
        dedup_scatter = jax.default_backend() == "tpu"
    geometry, rows = make_point_geometry(
        gs=gs, cs=cs, vh=vh, calib_mat=calib_mat, image_hw=image_hw,
        base_size=base_size, crop_size=crop_size, min_depth=min_depth,
        max_depth=max_depth, n_rows=n_rows, row_offset=row_offset)
    h, w = image_hw
    ch, cw, _, _, _ = plan_windows(h, w, base_size, crop_size)
    sy = (ch - 1) / max(h - 1, 1)
    sx = (cw - 1) / max(w - 1, 1)
    key = jax.random.PRNGKey(seed)

    def step(state: VoxelFusionState, lseg_params, canvas_u8: jnp.ndarray,
             depth_u16: jnp.ndarray, pose: jnp.ndarray,
             frame_ids: jnp.ndarray,
             frame_valid: jnp.ndarray) -> VoxelFusionState:
        b = canvas_u8.shape[0]

        def sample_one(fid):
            return jax.random.randint(jax.random.fold_in(key, fid),
                                      (max_pts,), 0, h * w, dtype=jnp.int32)

        idx = jax.vmap(sample_one)(frame_ids)
        idx = jnp.sort(idx, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((b, 1), bool), idx[:, 1:] == idx[:, :-1]], axis=1)

        z = jnp.take_along_axis(depth_u16.reshape(b, -1), idx,
                                axis=1).astype(jnp.float32) * 1e-3
        vids, fx, fy, alpha, valid = geometry(z, idx, pose)
        valid = valid & ~dup & frame_valid[:, None]

        canvas = canvas_u8.astype(jnp.float32) * (1.0 / 127.5) - 1.0
        if lseg_eval == "whole":
            feats = whole_canvas_features_at_points(
                lseg_apply, lseg_params, canvas, fx, fy)
        else:
            feats = features_at_points(lseg_apply, lseg_params, canvas,
                                       fx, fy, base_size, crop_size,
                                       half_res_apply=half_res_apply)

        # colour from the canvas at the scaled source pixel (nearest)
        cx = jnp.clip(jnp.rint((idx % w).astype(jnp.float32) * sx),
                      0, cw - 1).astype(jnp.int32)
        cy = jnp.clip(jnp.rint((idx // w).astype(jnp.float32) * sy),
                      0, ch - 1).astype(jnp.int32)
        cidx = cy * cw + cx
        rgbs = jnp.take_along_axis(
            canvas_u8.reshape(b, -1, 3).astype(jnp.float32),
            cidx[..., None], axis=1)

        d = feats.shape[-1]
        return fuse_points(
            state, vids.reshape(-1), feats.reshape(-1, d),
            rgbs.reshape(-1, 3), alpha.reshape(-1), valid.reshape(-1),
            gs=gs, vh=vh, n_rows=rows, dedup_scatter=dedup_scatter)

    return step


def sample_pixels(rng: np.random.Generator, h: int, w: int,
                  depth_sample_rate: int, max_pts: int,
                  batch: int) -> np.ndarray:
    """Host-side random pixel subsample: ~h*w/rate unique pixels per frame
    (reference _backproject_depth shuffle, vlmap_builder.py:266-281), padded
    by repetition to the static ``max_pts`` budget."""
    n_target = min(max(h * w // depth_sample_rate, 1), max_pts)
    idx = np.empty((batch, max_pts), np.int32)
    for b in range(batch):
        # oversample-with-replacement + unique: ~100x cheaper than
        # permutation-based no-replacement sampling at this ratio, and the
        # host must keep up with the device step
        over = rng.integers(0, h * w, int(n_target * 1.3) + 16)
        pick = np.unique(over)
        if pick.shape[0] < n_target:  # extremely unlikely; top up
            extra = rng.choice(h * w, size=n_target - pick.shape[0],
                               replace=False)
            pick = np.concatenate([pick, extra])
        elif pick.shape[0] > n_target:
            # np.unique SORTS — slicing [:n_target] would keep only the
            # smallest pixel indices, systematically excluding the bottom
            # of the frame (~20% at the production ratio).  Subsample the
            # surplus uniformly instead (r4 fix, caught by the
            # device-sampling statistics test).
            pick = pick[rng.choice(pick.shape[0], n_target, replace=False)]
        reps = int(np.ceil(max_pts / n_target))
        idx[b] = np.tile(pick, reps)[:max_pts]
    return idx


class VLMapBuilder:
    """Build the sparse voxel VLMap for one scene directory.

    Directory layout and pose semantics follow the reference
    (rgb/*.png, depth/*.npy, poses.txt; avlmaps/map/map.py:40-52,
    vlmap_builder.py:54-108).
    """

    def __init__(self, data_dir, map_config, pose_path, rgb_paths,
                 depth_paths, base2cam_tf: np.ndarray,
                 base_transform: np.ndarray, lseg_apply=None,
                 lseg_params=None, feat_dim: int = 512,
                 batch_size: int = 8, seed: int = 0, mesh=None,
                 half_res_apply: bool = False,
                 transport: Optional[str] = None,
                 packed_path=None, sampling: str = "host"):
        self.data_dir = Path(data_dir)
        self.map_config = map_config
        self.pose_path = pose_path
        self.rgb_paths = list(rgb_paths)
        self.depth_paths = list(depth_paths)
        self.base2cam_tf = base2cam_tf
        self.base_transform = base_transform
        self.lseg_apply = lseg_apply
        self.lseg_params = lseg_params
        self.feat_dim = feat_dim
        self.batch_size = batch_size
        self.mesh = mesh  # jax.sharding.Mesh -> multi-chip sharded fusion
        self.half_res_apply = half_res_apply
        # "frame" ships full RGB-D frames; "canvas" ships the resized canvas
        # + per-point gathers (pipeline.transport — ~6.4x less H2D traffic).
        # None -> the map_config's transport knob.  The fallback matches
        # MapConfig's default ("canvas"): one default, stated in README
        # ("Parity deviations") — pass transport="frame" for strict
        # bit-parity with the frame path's uint8 handling.
        self.transport = transport if transport is not None else \
            getattr(map_config, "transport", "canvas")
        # packed-scene ingestion (pipeline/packed.py): explicit path, or
        # auto-detect <data_dir>/scene.avpack built by tools/pack_scene.py.
        # Falls back to PNG/npy decode when absent or stale.
        self.packed_path = packed_path
        # "host" = the reference-style host pixel subsample shipped as
        # CanvasBatch gathers; "device" = on-device threefry sampling fed
        # by RawCanvasBatch (canvas + full-res u16 depth) — zero host
        # per-point work, ~3.5x the link bytes.  Pick "device" on hosts
        # whose CPU (not device link) is the pipeline bound.
        if sampling not in ("host", "device"):
            raise ValueError(f"sampling={sampling!r}: use 'host' or "
                             "'device'")
        self.sampling = sampling
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.map_save_dir = self.data_dir / "vlmap"
        self.map_save_path = self.map_save_dir / "vlmaps.h5df"

    def create_mobile_base_map(self, save_every: int = 100,
                               progress: bool = True) -> SparseVoxelMap:
        base_poses = np.loadtxt(self.pose_path)
        if base_poses.ndim == 1:
            base_poses = base_poses[None]
        inv_bt = np.linalg.inv(self.base_transform)
        init_base_tf = (self.base_transform @ pose_vec_to_tf(base_poses[0])
                        @ inv_bt)
        inv_init_base_tf = np.linalg.inv(init_base_tf)

        # full cam->map transform per frame (reference vlmap_builder.py:106-133)
        pose_tfs = []
        for vec in base_poses:
            base_pose = self.base_transform @ pose_vec_to_tf(vec) @ inv_bt
            tf = inv_init_base_tf @ base_pose
            pose_tfs.append(tf @ self.base_transform @ self.base2cam_tf)
        return self._build(pose_tfs, save_every, progress)

    def create_camera_map(self, save_every: int = 100,
                          progress: bool = True) -> SparseVoxelMap:
        """Build the map from *camera* poses, centred at the first camera
        frame (reference create_camera_map is an unimplemented TODO,
        avlmaps/map/vlmap_builder.py:187-193; its docstring fixes the
        semantics: the first camera must be horizontal).

        poses.txt rows are habitat camera poses (pos + quat).  The cam->map
        chain is ``B · H₀⁻¹ · Hᵢ · C`` where B is the habitat->map axis
        rearrangement (base_transform), Hᵢ the habitat camera pose and C the
        habitat-camera (z backward) -> CV-camera (z forward) flip — at i=0
        this places the camera at the origin with the map height axis up.
        """
        cam2cv = np.diag([1.0, -1.0, -1.0, 1.0])
        cam_poses = np.loadtxt(self.pose_path)
        if cam_poses.ndim == 1:
            cam_poses = cam_poses[None]
        inv_h0 = np.linalg.inv(pose_vec_to_tf(cam_poses[0]))
        pose_tfs = [self.base_transform @ inv_h0 @ pose_vec_to_tf(vec)
                    @ cam2cv for vec in cam_poses]
        return self._build(pose_tfs, save_every, progress)

    def _build(self, pose_tfs, save_every: int,
               progress: bool) -> SparseVoxelMap:
        cfg = self.map_config
        gs, cs, vh = cfg.gs, cfg.cs, cfg.vh
        os.makedirs(self.map_save_dir, exist_ok=True)
        self._pose_tfs = pose_tfs

        # resume support: skip frames already in the saved map
        saved, mapped = self._load_saved()

        self._scene = self._packed_scene()
        if self._scene is not None:
            h, w = self._scene.h, self._scene.w
        else:
            from avlmaps_tpu.pipeline.loader import load_depth

            probe = np.asarray(load_depth(self.depth_paths[0]))
            h, w = probe.shape[:2]
        max_pts = cfg.point_budget(h, w)

        if self.mesh is not None:
            if self.sampling == "device":
                warnings.warn(
                    "sampling='device' is not implemented for sharded "
                    "(mesh) builds; using the host sampler", stacklevel=2)
            return self._create_sharded(gs, cs, vh, h, w, max_pts, saved,
                                        mapped, save_every, progress)

        if saved is not None:
            grid_feat, grid_pos, weight, occupied_ids, grid_rgb = saved
            state = restore_fusion_state(gs, vh, cfg.capacity, grid_feat,
                                         grid_pos, weight, occupied_ids,
                                         grid_rgb)
        else:
            state = init_fusion_state(gs, vh, self.feat_dim, cfg.capacity)

        base_size = getattr(cfg, "lseg_base_size", 520)
        crop_size = getattr(cfg, "lseg_crop_size", 480)
        use_canvas = self.transport == "canvas"
        device_sampling = use_canvas and self.sampling == "device"
        if self.sampling == "device" and not use_canvas:
            warnings.warn("sampling='device' needs transport='canvas'; "
                          "using the host sampler", stacklevel=2)
        if device_sampling:
            from avlmaps_tpu.pipeline.transport import (
                make_raw_canvas_transform)

            step = make_frame_step_device_sampled(
                self.lseg_apply, gs=gs, cs=cs, vh=vh,
                calib_mat=cfg.calib_matrix(), image_hw=(h, w),
                base_size=base_size, crop_size=crop_size,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                half_res_apply=self.half_res_apply,
                lseg_eval=getattr(cfg, "lseg_eval", "sliding"),
                max_pts=max_pts, seed=self.seed)
            height, width, _, _, _ = plan_windows(h, w, base_size,
                                                  crop_size)
            transform = make_raw_canvas_transform((height, width))
        elif use_canvas:
            from avlmaps_tpu.pipeline.transport import make_canvas_transform

            step = make_frame_step_canvas(
                self.lseg_apply, gs=gs, cs=cs, vh=vh,
                calib_mat=cfg.calib_matrix(), image_hw=(h, w),
                base_size=base_size, crop_size=crop_size,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                half_res_apply=self.half_res_apply,
                lseg_eval=getattr(cfg, "lseg_eval", "sliding"))
            height, width, _, _, _ = plan_windows(h, w, base_size, crop_size)
            transform = make_canvas_transform(
                lambda b: sample_pixels(self.rng, h, w,
                                        cfg.depth_sample_rate, max_pts, b),
                (height, width))
        else:
            step = make_frame_step(
                self.lseg_apply, gs=gs, cs=cs, vh=vh,
                calib_mat=cfg.calib_matrix(), image_hw=(h, w),
                base_size=base_size, crop_size=crop_size,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                half_res_apply=self.half_res_apply, rgb_uint8=True)
            transform = None
        step = jax.jit(step, donate_argnums=(0,))

        loader = self._make_loader(
            pose_tfs, self.batch_size, mapped, transform, use_canvas,
            h, w, max_pts, device_put=True,
            canvas_hw=(height, width) if use_canvas else None,
            raw_canvas=device_sampling)
        done = 0
        meter = RateMeter()
        for batch in loader:
            if device_sampling:
                state = step(state, self.lseg_params,
                             jnp.asarray(batch.canvas),
                             jnp.asarray(batch.depth_mm),
                             jnp.asarray(batch.pose_tf),
                             jnp.asarray(batch.frame_ids),
                             jnp.asarray(batch.frame_ids >= 0))
            elif use_canvas:
                state = step(state, self.lseg_params,
                             jnp.asarray(batch.canvas),
                             jnp.asarray(batch.z_mm),
                             jnp.asarray(batch.rgb_pts),
                             jnp.asarray(batch.pose_tf),
                             jnp.asarray(batch.sample_idx),
                             jnp.asarray(batch.frame_ids >= 0))
            else:
                sample_idx = sample_pixels(self.rng, h, w,
                                           cfg.depth_sample_rate,
                                           max_pts, self.batch_size)
                state = step(state, self.lseg_params,
                             jnp.asarray(batch.rgb), jnp.asarray(batch.depth),
                             jnp.asarray(batch.pose_tf),
                             jnp.asarray(sample_idx),
                             jnp.asarray(batch.frame_ids >= 0))
            n_new = int((batch.frame_ids >= 0).sum())
            mapped.update(int(i) for i in batch.frame_ids if i >= 0)
            done += n_new
            rate = meter.update(n_new)
            if progress:
                rate_s = f" ({rate:.1f} fps)" if rate else ""
                print(f"\rVLMap: {done} frames fused{rate_s}", end="",
                      flush=True)
            if save_every and done % save_every < self.batch_size:
                self._save(state, gs, vh, mapped)
        if progress:
            print()
        self.build_stats = {
            "frames": done,
            "voxels": int(jax.device_get(state.n_slots)),
            "points_dropped": int(jax.device_get(state.n_dropped)),
            "fps": meter.rate,
        }
        return self._save(state, gs, vh, mapped)

    def _packed_scene(self):
        """Open the packed scene when configured/present, it matches the
        frame list, and it is newer than the source frames (shared policy:
        pipeline.packed.open_matching); None -> decode PNG/npy per frame
        (reference behaviour, avlmaps/map/vlmap_builder.py:118-120)."""
        from avlmaps_tpu.pipeline.packed import open_matching

        return open_matching(self.data_dir, self.rgb_paths,
                             self.depth_paths,
                             explicit_path=self.packed_path)

    def _make_loader(self, pose_tfs, batch_size, mapped, transform,
                     use_canvas, h, w, max_pts, device_put,
                     canvas_hw=None, raw_canvas=False):
        """PackedLoader when a matching .avpack exists, else PrefetchLoader.

        Packed + matching stored canvas: the producer does only O(points)
        gathers per frame (no decode, no resize) — batches are bit-identical
        to the online canvas-transport path (tests/test_packed.py).
        ``raw_canvas``: device-sampling transport (canvas + full-res u16
        depth, zero per-point host work)."""
        cfg = self.map_config
        scene = getattr(self, "_scene", None)
        if scene is not None:
            from avlmaps_tpu.pipeline.packed import PackedLoader

            if (raw_canvas and scene.canvas is not None
                    and tuple(scene.canvas_hw) == tuple(canvas_hw)):
                return PackedLoader(scene, pose_tfs, batch_size=batch_size,
                                    skip_ids=mapped, raw_canvas=True,
                                    device_put=device_put)
            if (use_canvas and not raw_canvas and scene.canvas is not None
                    and tuple(scene.canvas_hw) == tuple(canvas_hw)):
                return PackedLoader(
                    scene, pose_tfs, batch_size=batch_size,
                    skip_ids=mapped,
                    sampler=lambda b: sample_pixels(
                        self.rng, h, w, cfg.depth_sample_rate, max_pts, b),
                    device_put=device_put)
            return PackedLoader(scene, pose_tfs, batch_size=batch_size,
                                skip_ids=mapped, transform=transform,
                                depth_metres=use_canvas,
                                device_put=device_put)
        from avlmaps_tpu.pipeline.loader import PrefetchLoader

        return PrefetchLoader(self.rgb_paths, self.depth_paths, pose_tfs,
                              batch_size=batch_size, skip_ids=mapped,
                              normalize=False, transform=transform,
                              device_put=device_put)

    def _load_saved(self):
        """Saved map arrays + mapped frame set, or (None, empty) if fresh."""
        if self.map_save_path.exists():
            (mapped_list, grid_feat, grid_pos, weight, occupied_ids,
             grid_rgb) = load_3d_map(self.map_save_path)
            return ((grid_feat, grid_pos, weight, occupied_ids, grid_rgb),
                    set(int(i) for i in mapped_list))
        return None, set()

    def _save(self, state: VoxelFusionState, gs: int, vh: int,
              mapped) -> SparseVoxelMap:
        grid_feat, grid_pos, weight, occupied_ids, grid_rgb = \
            export_fusion_state(state, gs, vh)
        m = SparseVoxelMap(gs=gs, vh=vh, feat_dim=grid_feat.shape[1],
                           grid_feat=grid_feat, grid_pos=grid_pos,
                           weight=weight, occupied_ids=occupied_ids,
                           grid_rgb=grid_rgb, mapped_iters=set(mapped))
        m.save(self.map_save_path)
        return m


    def _create_sharded(self, gs, cs, vh, h, w, max_pts, saved, mapped,
                        save_every, progress) -> SparseVoxelMap:
        """Multi-chip build: frames data-parallel over the mesh, voxel grid
        row-sharded (parallel/sharded.py).  Resumes from a saved map by
        re-sharding its slots by row ownership (ShardedFusion.restore) and
        checkpoints every ``save_every`` fused frames, mirroring the
        reference's periodic save (avlmaps/map/vlmap_builder.py:180-183)."""
        from avlmaps_tpu.parallel.sharded import ShardedFusion

        cfg = self.map_config
        n_dev = self.mesh.devices.size
        batch = max(self.batch_size, n_dev)
        batch = (batch // n_dev) * n_dev
        base_size = getattr(cfg, "lseg_base_size", 520)
        crop_size = getattr(cfg, "lseg_crop_size", 480)
        use_canvas = self.transport == "canvas"
        fusion = ShardedFusion(
            self.mesh, gs=gs, cs=cs, vh=vh, feat_dim=self.feat_dim,
            capacity=cfg.capacity, calib_mat=cfg.calib_matrix(),
            image_hw=(h, w), lseg_apply=self.lseg_apply,
            base_size=base_size, crop_size=crop_size,
            min_depth=cfg.min_depth, max_depth=cfg.max_depth,
            half_res_apply=self.half_res_apply,
            transport=self.transport,
            lseg_eval=getattr(cfg, "lseg_eval", "sliding"))
        if saved is not None:
            fusion.restore(*saved)

        import jax.numpy as _jnp

        def save() -> SparseVoxelMap:
            grid_feat, grid_pos, weight, occupied_ids, grid_rgb = \
                fusion.export()
            m = SparseVoxelMap(gs=gs, vh=vh, feat_dim=grid_feat.shape[1],
                               grid_feat=grid_feat, grid_pos=grid_pos,
                               weight=weight, occupied_ids=occupied_ids,
                               grid_rgb=grid_rgb, mapped_iters=set(mapped))
            m.save(self.map_save_path)
            return m

        pose_tfs = self._pose_tfs
        transform = None
        height = width = None
        if use_canvas:
            from avlmaps_tpu.pipeline.transport import make_canvas_transform

            height, width, _, _, _ = plan_windows(h, w, base_size, crop_size)
            transform = make_canvas_transform(
                lambda bb: sample_pixels(self.rng, h, w,
                                         cfg.depth_sample_rate, max_pts, bb),
                (height, width))
        # no producer-side device_put on the mesh path: shard_map owns
        # placement of the global batch across devices
        loader = self._make_loader(
            pose_tfs, batch, mapped, transform, use_canvas, h, w, max_pts,
            device_put=False,
            canvas_hw=(height, width) if use_canvas else None)
        from avlmaps_tpu.utils.profiling import RateMeter

        meter = RateMeter()
        done = 0
        for b in loader:
            if use_canvas:
                fusion.step(self.lseg_params, _jnp.asarray(b.canvas),
                            _jnp.asarray(b.z_mm), _jnp.asarray(b.rgb_pts),
                            _jnp.asarray(b.pose_tf),
                            _jnp.asarray(b.sample_idx),
                            _jnp.asarray(b.frame_ids >= 0))
            else:
                idx = sample_pixels(self.rng, h, w, cfg.depth_sample_rate,
                                    max_pts, batch)
                fusion.step(self.lseg_params, _jnp.asarray(b.rgb),
                            _jnp.asarray(b.depth), _jnp.asarray(b.pose_tf),
                            _jnp.asarray(idx),
                            _jnp.asarray(b.frame_ids >= 0))
            n_new = int((b.frame_ids >= 0).sum())
            mapped.update(int(i) for i in b.frame_ids if i >= 0)
            done += n_new
            meter.update(n_new)
            if progress:
                print(f"\rVLMap (sharded x{n_dev}): {done} frames", end="",
                      flush=True)
            if save_every and done % save_every < batch:
                save()
        if progress:
            print()
        m = save()
        self.build_stats = {
            "frames": done,
            "voxels": int(m.grid_feat.shape[0]),
            "points_dropped": 0,
            "fps": meter.rate,
        }
        return m
