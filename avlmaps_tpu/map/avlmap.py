"""AVLMap: facade composing the four modality maps with cross-modal heatmaps.

Mirrors reference avlmaps/map/avlmap.py: open-vocabulary object queries over
the voxel VLMap, area queries over the sparse CLIP map, sound queries over
the audio event database and image queries via visual localization — all
returned as per-voxel heatmaps in [0, 1] for fusion.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from avlmaps_tpu.config import AVLMapsConfig
from avlmaps_tpu.map.vlmap import VLMap
from avlmaps_tpu.map.sound_map import SoundMap
from avlmaps_tpu.map.area_map import AreaMap
from avlmaps_tpu.map.visual_map import VisualMap
from avlmaps_tpu.ops.heatmap import (
    decayed_point_heatmap_2d, heatmap_from_mask_3d,
)
from avlmaps_tpu.ops.pooling import lift_2d_to_3d


class AVLMap:
    def __init__(self, config: AVLMapsConfig, data_dir: str = "",
                 clip_encoder=None, area_clip_encoder=None,
                 audioclip_encoder=None):
        self.config = config
        lseg_ckpt = getattr(config, "lseg_ckpt", "")
        clip_ckpt = getattr(config, "clip_ckpt", "")
        audioclip_ckpt = getattr(config, "audioclip_ckpt", "")
        if audioclip_encoder is None and audioclip_ckpt:
            from avlmaps_tpu.models.audioclip import AudioClipEncoder
            from avlmaps_tpu.models.audioclip.port import (
                load_audioclip_checkpoint_with_config)

            ac_cfg, ac_vars = load_audioclip_checkpoint_with_config(
                audioclip_ckpt)
            audioclip_encoder = AudioClipEncoder(cfg=ac_cfg, params=ac_vars)
        if area_clip_encoder is None and clip_ckpt:
            from avlmaps_tpu.models.clip import ClipEncoder

            area_clip_encoder = ClipEncoder.from_checkpoint(clip_ckpt)
        elif area_clip_encoder is None and getattr(
                config.map_config, "clip_variant", ""):
            # explicit variant (e.g. "tiny" for CI/demo builds): share one
            # encoder across area/visual/vlmap
            from avlmaps_tpu.models.clip import ClipEncoder

            area_clip_encoder = ClipEncoder(config.map_config.clip_variant)
        # share the checkpoint-loaded CLIP tower with VLMap — otherwise its
        # lazy _init_clip would torch.load the same .pt a second time
        self.vlmap = VLMap(config.map_config, data_dir=data_dir,
                           clip_encoder=clip_encoder or area_clip_encoder,
                           lseg_ckpt=lseg_ckpt, clip_ckpt=clip_ckpt)
        self.sound_map = SoundMap(data_dir, config.sound_config,
                                  config.sound_data_collect_params,
                                  is_ambiguous=False, is_real=False,
                                  audioclip_encoder=audioclip_encoder)
        self.area_map = AreaMap(data_dir, clip_encoder=area_clip_encoder)
        self.visual_map = VisualMap(
            config.map_config, data_dir, clip_encoder=area_clip_encoder,
            superpoint_ckpt=getattr(config.map_config, "superpoint_ckpt",
                                    "") or None)
        self.dataloader = None

    # -- lifecycle (reference avlmap.py:38-56) ----------------------------

    def create_map(self, data_dir: Union[Path, str]) -> bool:
        self.vlmap.create_map(data_dir)
        self.area_map.create_map(data_dir)
        self.visual_map.create_and_load_map(data_dir)
        self.sound_map.create_sound_map(data_dir)
        return True

    def load_map(self, data_dir: Union[Path, str]) -> bool:
        from avlmaps_tpu.dataloader.habitat_dataloader import (
            VLMapsDataloaderHabitat,
        )

        self.vlmap.load_map(data_dir)
        self.area_map.load_map(data_dir)
        self.visual_map.create_and_load_map(data_dir)
        self.sound_map.load_sound_map(data_dir)
        self.dataloader = VLMapsDataloaderHabitat(
            data_dir, self.config.map_config, self.vlmap)
        return True

    # -- object (reference avlmap.py:67-77) -------------------------------

    def index_object(self, object_name: str,
                     init_categories: Optional[List[str]] = None,
                     decay_rate: float = 0.1) -> np.ndarray:
        if init_categories is not None:
            # the reference strips the first and last entries ('void' and
            # 'objects' of mp3dcat) before scoring (avlmap.py:69)
            self.vlmap.init_categories(list(init_categories)[1:-1])
            mask = self.vlmap.index_map(object_name, with_init_cat=True)
        else:
            mask = self.vlmap.index_map(object_name, with_init_cat=False)
        return heatmap_from_mask_3d(self.vlmap.grid_pos, mask,
                                    cell_size=self.config.params.cs,
                                    decay_rate=decay_rate,
                                    grid_shape=self.vlmap.occupied_ids.shape)

    # -- area (reference avlmap.py:78-109) ---------------------------------

    def index_area_2d(self, area_name: str,
                      decay_rate: float = 0.1) -> np.ndarray:
        """Per-pose CLIP scores splatted as radial decays, max-composited.

        Pose→map-cell conversion stays on host (cheap, per pose); the
        per-pose decay stacking runs as one device scan
        (ops/heatmap.decayed_point_heatmap_2d)."""
        shape = self.vlmap.occupied_ids.shape[:2]
        scores = self.area_map.index_map(area_name, with_init_cat=False)
        rng = scores.max() - scores.min()
        scores = (scores - scores.min()) / (rng if rng > 0 else 1.0)

        seeds, confs = [], []
        for i, tf_hab in enumerate(self.area_map.robot_pose_list):
            self.dataloader.from_habitat_tf(np.asarray(tf_hab))
            row, col, _ = self.dataloader.to_full_map_pose()
            if not (0 <= row < shape[0] and 0 <= col < shape[1]):
                continue
            seeds.append(np.array([[row, col]], np.float32))
            confs.append(float(scores[i]))

        dist_map = decayed_point_heatmap_2d(shape, seeds, confs,
                                            decay_rate, combine="max")
        rng = dist_map.max() - dist_map.min()
        return (dist_map - dist_map.min()) / (rng if rng > 0 else 1.0)

    def index_area(self, area_name: str,
                   decay_rate: float = 0.1) -> np.ndarray:
        heatmap_2d = self.index_area_2d(area_name, decay_rate)
        return lift_2d_to_3d(heatmap_2d, self.vlmap.grid_pos)

    # -- sound (reference avlmap.py:111-144) --------------------------------

    def index_sound_2d(self, sound_name: str,
                       decay_rate: float = 0.01) -> np.ndarray:
        """Per-event confidence decays from the event's pose track, summed.

        Each event's seed track (min radial distance == multi-seed EDT) and
        the sum composite run as one device scan
        (ops/heatmap.decayed_point_heatmap_2d)."""
        probs, locations_list = \
            self.sound_map.get_distribution_and_locations(sound_name)
        shape = self.vlmap.occupied_ids.shape[:2]
        tracks, confs = [], []
        for loc_i, locations in enumerate(locations_list):
            seeds = []
            for location in locations:
                tf_hab = np.eye(4)
                tf_hab[:3, 3] = location
                self.dataloader.from_habitat_tf(tf_hab)
                row, col, _ = self.dataloader.to_full_map_pose()
                if 0 <= row < shape[0] and 0 <= col < shape[1]:
                    seeds.append((row, col))
            if not seeds:
                continue
            tracks.append(np.asarray(seeds, np.float32))
            confs.append(float(probs[loc_i]))

        dist_map = decayed_point_heatmap_2d(shape, tracks, confs,
                                            decay_rate, combine="sum")
        rng = dist_map.max() - dist_map.min()
        return (dist_map - dist_map.min()) / (rng if rng > 0 else 1.0)

    def index_sound(self, sound_name: str,
                    decay_rate: float = 0.01) -> np.ndarray:
        heatmap_2d = self.index_sound_2d(sound_name, decay_rate)
        return lift_2d_to_3d(heatmap_2d, self.vlmap.grid_pos)

    # -- image (reference avlmap.py:146-163) --------------------------------

    def index_image(self, image: np.ndarray,
                    query_cam_intrinsics: Optional[np.ndarray] = None,
                    decay_rate: float = 0.01) -> np.ndarray:
        _, query_base_tf = self.visual_map.localize_image(
            image, query_cam_intrinsic_mat=query_cam_intrinsics)
        self.dataloader.from_habitat_tf(query_base_tf)
        row, col, _ = self.dataloader.to_full_map_pose()
        height = (self.config.map_config.pose_info.camera_height
                  / self.config.params.cs)
        pos = np.array([row, col, height], np.float32)
        dists = np.linalg.norm(
            (self.vlmap.grid_pos.astype(np.float32) - pos)[:, :2], axis=1)
        return np.clip(1.0 - decay_rate * dists, 0.0, 1.0)

    # -- visualization helper (reference avlmap.py:57-66) -----------------

    def heatmap_rgb(self, heatmap: np.ndarray,
                    transparency: float = 0.5) -> np.ndarray:
        """Blend a [0,1] heatmap with the voxel colours (JET)."""
        import cv2

        sim = (np.asarray(heatmap) * 255).astype(np.uint8)
        heat = cv2.applyColorMap(sim, cv2.COLORMAP_JET)
        heat = heat.reshape(-1, 3)[:, ::-1].astype(np.float32)
        return heat * transparency + self.vlmap.grid_rgb * (1 - transparency)
