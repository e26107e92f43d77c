"""VisualMap: localize a query image against the mapping trajectory.

The reference wraps the HLoc toolbox — NetVLAD global retrieval, then
SuperPoint+SuperGlue matching and depth-lifted PnP for a metric relative pose
(avlmaps/map/visual_map.py + utils/localization_utils.py).  TPU-native
re-design: global retrieval runs on the flax CLIP image tower (batched
device matmul against cached per-frame descriptors, replacing NetVLAD), and
the localized pose is the retrieved frame's recorded pose.  Keypoint-level
relative-pose refinement (SuperPoint/SuperGlue/PnP) is a tracked gap
(docs/PARITY.md) — retrieval-level localization already serves the
cross-modal indexing path (AVLMap.index_image decays from the pose).
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
                 clip_encoder=None):
        self.map_config = map_config
        self.data_dir = Path(data_dir) if data_dir else None
        self.descriptors: Optional[np.ndarray] = None
        self.poses: Optional[np.ndarray] = None  # (N, 4, 4) base tfs
        self.clip_encoder = clip_encoder

    def _init_clip(self):
        if self.clip_encoder is None:
            from avlmaps_tpu.models.clip import ClipEncoder

            self.clip_encoder = ClipEncoder("ViT-B/32")
        return self.clip_encoder

    def _cache_path(self) -> Path:
        d = self.data_dir / "visual_map"
        os.makedirs(d, exist_ok=True)
        return d / "global_descriptors.h5df"

    def create_and_load_map(self, data_dir: Union[Path, str],
                            batch_size: int = 64) -> None:
        """Compute (or load cached) per-frame global descriptors
        (reference compute_global_descriptor caching,
        localization_utils.py:310-406)."""
        from avlmaps_tpu.pipeline.loader import load_rgb

        self.data_dir = Path(data_dir)
        cache = self._cache_path()
        pose_path = self.data_dir / "poses.txt"
        base_poses = np.loadtxt(pose_path)
        if base_poses.ndim == 1:
            base_poses = base_poses[None]
        self.poses = np.stack([pose_vec_to_tf(v) for v in base_poses])

        if cache.exists():
            with h5py.File(cache, "r") as f:
                self.descriptors = f["descriptors"][:]
            if self.descriptors.shape[0] == len(self.poses):
                return
        rgb_paths = sorted((self.data_dir / "rgb").glob("*.png"))
        enc = self._init_clip()
        self.descriptors = np.zeros((len(rgb_paths), enc.feat_dim),
                                    np.float32)
        for s0 in range(0, len(rgb_paths), batch_size):
            chunk = [load_rgb(p) for p in rgb_paths[s0:s0 + batch_size]]
            self.descriptors[s0:s0 + len(chunk)] = \
                enc.get_imgs_feats_batch(chunk, batch_size)
        with h5py.File(cache, "w") as f:
            f.create_dataset("descriptors", data=self.descriptors)

    def retrieve(self, image: np.ndarray, topk: int = 1) -> np.ndarray:
        """Indices of the most similar mapping frames (reference
        localize_agent retrieval einsum, localization_utils.py:408-447)."""
        enc = self._init_clip()
        q = enc.get_img_feats(image)
        sims = (self.descriptors @ q.T).flatten()
        return np.argsort(sims)[::-1][:topk]

    def localize_image(self, image: np.ndarray,
                       query_cam_intrinsic_mat: Optional[np.ndarray] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Query image -> (camera tf, base tf) in the habitat frame
        (reference visual_map.py:59-80).  Retrieval-level: returns the
        best-matching mapping frame's pose."""
        assert self.descriptors is not None, "call create_and_load_map first"
        best = int(self.retrieve(image, topk=1)[0])
        base_tf = self.poses[best]
        # camera sits camera_height above base (reference map.py:54-61)
        cam_tf = base_tf.copy()
        cam_tf[1, 3] += self.map_config.pose_info.camera_height
        return cam_tf, base_tf
