"""VisualMap: localize a query image against the mapping trajectory.

The reference wraps the HLoc toolbox — NetVLAD global retrieval, then
SuperPoint+SuperGlue matching and depth-lifted PnP for a metric relative
pose (avlmaps/map/visual_map.py + utils/localization_utils.py:408-558).
TPU-native re-design:

* global retrieval runs on the flax CLIP image tower (batched device matmul
  against cached per-frame descriptors, replacing NetVLAD);
* local matching runs SuperPoint (flax, on device) + a mutual-NN matcher
  when weights are provided (models/superpoint; port of the same public
  superpoint_v1.pth the reference's HLoc pipeline uses), with ORB +
  cross-checked Hamming as the classical fallback;
* the metric solve lifts reference keypoints with the stored depth and runs
  cv2.solvePnPRansac, replacing pycolmap's absolute_pose_estimation.  Falls
  back to the retrieved frame's pose when matching/PnP fails (the reference
  also degrades to retrieval then).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from avlmaps_tpu.config import MapConfig
from avlmaps_tpu.geometry.transforms import pose_vec_to_tf


class VisualMap:
    def __init__(self, map_config: MapConfig, data_dir: str = "",
                 clip_encoder=None, superpoint=None,
                 superpoint_ckpt: Optional[str] = None,
                 netvlad_ckpt: Optional[str] = None,
                 superglue=None, superglue_ckpt: Optional[str] = None):
        self.map_config = map_config
        self.data_dir = Path(data_dir) if data_dir else None
        self.descriptors: Optional[np.ndarray] = None
        self.poses: Optional[np.ndarray] = None  # (N, 4, 4) base tfs
        self.clip_encoder = clip_encoder
        # global retrieval descriptor: the reference uses hloc NetVLAD
        # (localization_utils.py:134-136); we default to CLIP-global and
        # load the reference's descriptor class when its .mat is configured
        if netvlad_ckpt is None:
            netvlad_ckpt = getattr(map_config, "netvlad_ckpt", "")
        if clip_encoder is None and netvlad_ckpt:
            from avlmaps_tpu.models.netvlad import load_netvlad_encoder

            self.clip_encoder = load_netvlad_encoder(netvlad_ckpt)
        # learned local features: an injected SuperPointExtractor, a
        # checkpoint path, or None -> ORB fallback (random SuperPoint
        # weights would be worse than ORB, so weights are required here)
        self.superpoint = superpoint
        if superpoint_ckpt is None:
            superpoint_ckpt = getattr(map_config, "superpoint_ckpt", "")
        if superpoint is None and superpoint_ckpt:
            from avlmaps_tpu.models.superpoint import (
                SuperPointExtractor, load_superpoint_checkpoint)

            sp_cfg, sp_vars = load_superpoint_checkpoint(superpoint_ckpt)
            self.superpoint = SuperPointExtractor(sp_cfg, params=sp_vars)
        # learned matcher: SuperGlue when its checkpoint is configured,
        # else the device mutual-NN matcher (reference: HLoc SuperGlue,
        # localization_utils.py:140-145)
        self.superglue = superglue
        if superglue_ckpt is None:
            superglue_ckpt = getattr(map_config, "superglue_ckpt", "")
        if superglue is None and superglue_ckpt:
            from avlmaps_tpu.models.superglue import (
                SuperGlueMatcher, load_superglue_checkpoint)

            sg_cfg, sg_vars = load_superglue_checkpoint(superglue_ckpt)
            self.superglue = SuperGlueMatcher(sg_cfg, params=sg_vars)

    def _init_clip(self):
        if self.clip_encoder is None:
            from avlmaps_tpu.models.clip import ClipEncoder

            self.clip_encoder = ClipEncoder("ViT-B/32")
        return self.clip_encoder

    def _cache_dir(self) -> Path:
        d = self.data_dir / "visual_map"
        os.makedirs(d, exist_ok=True)
        return d

    def _cache_candidates(self) -> list:
        """Readable descriptor caches, preferred first.  Caches are stored
        PER ENCODER DIM (``global_descriptors_<dim>.h5df``) so switching the
        retrieval encoder (e.g. NetVLAD 4096-d <-> CLIP 512-d) never
        destroys another encoder's artifact (ADVICE r2); the unsuffixed
        legacy name is still read."""
        d = self._cache_dir()
        if self.clip_encoder is not None:
            dim = self.clip_encoder.feat_dim
        else:
            dim = 512  # _init_clip's lazy default is CLIP ViT-B/32 (512-d);
            # globbing *any* per-dim cache here picked whichever dim sorted
            # first (e.g. a NetVLAD 4096-d artifact) and forced a full
            # re-encode at the first retrieve()
        return [d / f"global_descriptors_{dim}.h5df",
                d / "global_descriptors.h5df"]

    def _cache_write_path(self, feat_dim: int) -> Path:
        return self._cache_dir() / f"global_descriptors_{feat_dim}.h5df"

    def create_and_load_map(self, data_dir: Union[Path, str],
                            batch_size: int = 64) -> None:
        """Compute (or load cached) per-frame global descriptors
        (reference compute_global_descriptor caching,
        localization_utils.py:310-406)."""
        from avlmaps_tpu.pipeline.packed import rgb_reader

        self.data_dir = Path(data_dir)
        pose_path = self.data_dir / "poses.txt"
        base_poses = np.loadtxt(pose_path)
        if base_poses.ndim == 1:
            base_poses = base_poses[None]
        self.poses = np.stack([pose_vec_to_tf(v) for v in base_poses])

        for cache in self._cache_candidates():
            if not cache.exists():
                continue
            with h5py.File(cache, "r") as f:
                descs = f["descriptors"][:]
            # validate against the active encoder's dim without building
            # one (instantiating a CLIP tower just to read feat_dim would
            # cost seconds + model memory on every warm-cache load): an
            # unset encoder always lazily becomes the 512-d ViT-B/32
            expected = (self.clip_encoder.feat_dim
                        if self.clip_encoder is not None else 512)
            dim_ok = descs.shape[1] == expected
            if descs.shape[0] == len(self.poses) and dim_ok:
                self.descriptors = descs
                return  # cache valid; else try the next candidate
        rgb_paths = sorted((self.data_dir / "rgb").glob("*.png"))
        enc = self._init_clip()
        read = rgb_reader(self.data_dir, rgb_paths)
        self.descriptors = np.zeros((len(rgb_paths), enc.feat_dim),
                                    np.float32)
        for s0 in range(0, len(rgb_paths), batch_size):
            chunk = [read(i) for i in
                     range(s0, min(s0 + batch_size, len(rgb_paths)))]
            self.descriptors[s0:s0 + len(chunk)] = \
                enc.get_imgs_feats_batch(chunk, batch_size)
        with h5py.File(self._cache_write_path(enc.feat_dim), "w") as f:
            f.create_dataset("descriptors", data=self.descriptors)

    def retrieve(self, image: np.ndarray, topk: int = 1) -> np.ndarray:
        """Indices of the most similar mapping frames (reference
        localize_agent retrieval einsum, localization_utils.py:408-447)."""
        enc = self._init_clip()
        if (self.descriptors is not None and self.data_dir is not None
                and self.descriptors.shape[1] != enc.feat_dim):
            # descriptors from a different retrieval encoder (e.g. NetVLAD
            # 4096-d vs CLIP 512-d): load-or-compute THIS encoder's cache —
            # per-dim cache files, so the other encoder's artifact survives
            self.create_and_load_map(self.data_dir)
        q = enc.get_img_feats(image)
        sims = (self.descriptors @ q.T).flatten()
        return np.argsort(sims)[::-1][:topk]

    # habitat camera (x right, y up, z backward) <-> OpenCV camera
    # (x right, y down, z forward)
    _HAB2CV = np.diag([1.0, -1.0, -1.0, 1.0])

    def _ref_cam_tf(self, frame_id: int) -> np.ndarray:
        """Habitat-frame camera pose of a mapping frame: base pose raised by
        the sensor height (reference habitat sensor spec)."""
        cam = self.poses[frame_id].copy()
        cam[1, 3] += self.map_config.pose_info.camera_height
        return cam

    def _ensure_paths(self) -> bool:
        if not hasattr(self, "_rgb_paths"):
            self._rgb_paths = sorted((self.data_dir / "rgb").glob("*.png"))
            self._depth_paths = sorted(
                (self.data_dir / "depth").glob("*.npy"))
        return bool(self._rgb_paths)

    def _ref_depth(self, frame_id: int) -> Optional[np.ndarray]:
        """Cached depth image of a mapping frame (no feature work)."""
        from avlmaps_tpu.pipeline.loader import load_depth

        if not hasattr(self, "_depth_cache"):
            self._depth_cache = {}
        if frame_id in self._depth_cache:
            return self._depth_cache[frame_id]
        self._ensure_paths()
        if frame_id >= len(self._depth_paths):
            return None
        depth = np.asarray(load_depth(self._depth_paths[frame_id]),
                           np.float64)
        if depth.ndim == 3:
            depth = depth[..., 0]
        self._depth_cache[frame_id] = depth
        return depth

    def _ref_frame_features(self, frame_id: int):
        """Cached (keypoints, descriptors, depth) of a mapping frame — the
        ORB pass is a per-scene constant, only paid on the ORB path."""
        import cv2

        from avlmaps_tpu.pipeline.loader import load_rgb

        if not hasattr(self, "_ref_cache"):
            self._ref_cache = {}
        if frame_id in self._ref_cache:
            return self._ref_cache[frame_id]
        self._ensure_paths()
        ref_depth = self._ref_depth(frame_id)
        if ref_depth is None or frame_id >= len(self._rgb_paths):
            return None
        ref_img = load_rgb(self._rgb_paths[frame_id])
        orb = cv2.ORB_create(nfeatures=2000)
        gray = cv2.cvtColor(ref_img, cv2.COLOR_RGB2GRAY)
        kr, dr = orb.detectAndCompute(gray, None)
        self._ref_cache[frame_id] = (kr, dr, ref_depth)
        return self._ref_cache[frame_id]

    def _sp_frame_features(self, frame_id: int):
        """Cached SuperPoint features of a mapping frame."""
        from avlmaps_tpu.pipeline.loader import load_rgb

        if not hasattr(self, "_sp_cache"):
            self._sp_cache = {}
        if frame_id in self._sp_cache:
            return self._sp_cache[frame_id]
        self._ensure_paths()
        if frame_id >= len(self._rgb_paths):
            return None  # degrade like the ORB path, not IndexError
        img = load_rgb(self._rgb_paths[frame_id])
        out = self.superpoint.extract(self._to_gray(img)[None])
        feats = {k: v[0] for k, v in out.items()}
        feats["hw"] = img.shape[:2]
        self._sp_cache[frame_id] = feats
        return feats

    @staticmethod
    def _to_gray(rgb: np.ndarray) -> np.ndarray:
        import cv2

        return cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0

    def _match_superpoint(self, query_image: np.ndarray, frame_id: int):
        """(ref_pts, query_pts) pixel pairs from SuperPoint + SuperGlue
        when its weights are configured, else SuperPoint + device MNN
        (reference: SuperPoint+SuperGlue via HLoc,
        localization_utils.py:137-145,247-273)."""
        import jax.numpy as jnp

        ref = self._sp_frame_features(frame_id)
        if ref is None:
            return np.zeros((0, 2)), np.zeros((0, 2))
        q = self.superpoint.extract(self._to_gray(query_image)[None])
        q = {k: v[0] for k, v in q.items()}
        if self.superglue is not None:
            idx, _ = self.superglue.match(
                {k: v[None] for k, v in q.items()},
                {k: v[None] for k, v in ref.items() if k != "hw"},
                query_image.shape[:2], hw1=ref["hw"])
            idx = np.asarray(idx)[0]
        else:
            from avlmaps_tpu.models.superpoint import mutual_nearest_matches

            idx, _ = mutual_nearest_matches(
                jnp.asarray(q["descriptors"]),
                jnp.asarray(ref["descriptors"]),
                jnp.asarray(q["valid"]), jnp.asarray(ref["valid"]))
            idx = np.asarray(idx)
        sel = idx >= 0
        return ref["keypoints"][idx[sel]], q["keypoints"][sel]

    def _match_orb(self, query_image: np.ndarray, frame_id: int):
        """(ref_pts, query_pts) from ORB + cross-checked Hamming."""
        import cv2

        kr, dr, _ = self._ref_frame_features(frame_id)
        orb = cv2.ORB_create(nfeatures=2000)
        gray_q = cv2.cvtColor(query_image, cv2.COLOR_RGB2GRAY)
        kq, dq = orb.detectAndCompute(gray_q, None)
        if dq is None or dr is None:
            return np.zeros((0, 2)), np.zeros((0, 2))
        matcher = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
        matches = matcher.match(dr, dq)
        ref_pts = np.asarray([kr[m.queryIdx].pt for m in matches],
                             np.float64).reshape(-1, 2)
        q_pts = np.asarray([kq[m.trainIdx].pt for m in matches],
                           np.float64).reshape(-1, 2)
        return ref_pts, q_pts

    def refine_pose(self, query_image: np.ndarray, frame_id: int,
                    query_intr: np.ndarray,
                    min_matches: int = 12,
                    reproj_error: float = 12.0
                    ) -> Optional[np.ndarray]:
        """Metric camera pose of the query via depth-lifted PnP against one
        mapping frame (reference _get_relative_pose_with_depth,
        localization_utils.py:449-515; RANSAC max_error 12 px kept).

        Returns the habitat-frame camera tf, or None when matching fails.
        """
        import cv2

        ref_depth = self._ref_depth(frame_id)
        if ref_depth is None:
            return None

        if self.superpoint is not None:
            ref_pts, q_pts = self._match_superpoint(query_image, frame_id)
        else:
            ref_pts, q_pts = self._match_orb(query_image, frame_id)
        if len(ref_pts) < min_matches:
            return None

        h, w = ref_depth.shape
        ref_intr = np.asarray(self.map_config.calib_matrix())
        inv_ref = np.linalg.inv(ref_intr)
        obj_pts, img_pts = [], []
        for (u, v), (qu, qv) in zip(ref_pts, q_pts):
            ui, vi = int(round(u)), int(round(v))
            if not (0 <= ui < w and 0 <= vi < h):
                continue
            z = ref_depth[vi, ui]
            if z <= 0.05 or not np.isfinite(z):
                continue
            obj_pts.append((inv_ref @ np.array([u + 0.5, v + 0.5, 1.0])) * z)
            # same corner-origin pixel convention on the query side
            img_pts.append((qu + 0.5, qv + 0.5))
        if len(obj_pts) < min_matches:
            return None

        ok, rvec, tvec, inliers = cv2.solvePnPRansac(
            np.asarray(obj_pts, np.float64),
            np.asarray(img_pts, np.float64), np.asarray(query_intr,
                                                        np.float64),
            None, reprojectionError=reproj_error, iterationsCount=200,
            flags=cv2.SOLVEPNP_ITERATIVE)
        if not ok or inliers is None or len(inliers) < min_matches // 2:
            return None
        rot, _ = cv2.Rodrigues(rvec)
        # T_qr maps ref-cam (cv) points into the query-cam (cv) frame
        t_qr = np.eye(4)
        t_qr[:3, :3] = rot
        t_qr[:3, 3] = tvec.reshape(3)
        ref_cam_hab = self._ref_cam_tf(frame_id)
        ref_cam_cv = ref_cam_hab @ self._HAB2CV
        query_cam_cv = ref_cam_cv @ np.linalg.inv(t_qr)
        return query_cam_cv @ np.linalg.inv(self._HAB2CV)

    def localize_image(self, image: np.ndarray,
                       query_cam_intrinsic_mat: Optional[np.ndarray] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Query image -> (camera tf, base tf) in the habitat frame
        (reference visual_map.py:59-80): CLIP retrieval, then depth-lifted
        PnP refinement; retrieval pose on fallback."""
        assert self.descriptors is not None, "call create_and_load_map first"
        best = int(self.retrieve(image, topk=1)[0])
        cam_tf: Optional[np.ndarray] = None
        if self.data_dir is not None and (self.data_dir / "depth").exists():
            intr = query_cam_intrinsic_mat
            if intr is None:
                # reference derives query intrinsics from the image size at
                # 90 deg fov (localization_utils.py get_sim_cam_mat_with_fov)
                from avlmaps_tpu.geometry.projection import (
                    get_sim_cam_mat_with_fov,
                )

                intr = get_sim_cam_mat_with_fov(image.shape[0],
                                                image.shape[1], 90)
            try:
                cam_tf = self.refine_pose(image, best, intr)
            except Exception:
                cam_tf = None
        if cam_tf is None:
            cam_tf = self._ref_cam_tf(best)
        base_tf = cam_tf.copy()
        base_tf[1, 3] -= self.map_config.pose_info.camera_height
        return cam_tf, base_tf
