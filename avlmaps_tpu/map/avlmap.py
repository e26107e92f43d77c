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
                     decay_rate: float = 0.1, delivery: str = "f32"):
        """Open-vocabulary object heatmap over the voxel map.

        ``delivery`` picks the wire format (VERDICT r4 #1 — the f32 density
        fetch is 4 MB/query and dominates tunnelled hosts):

        * ``"f32"``   — reference-shaped (N,) float32 host array (default);
        * ``"u8"``    — same host array, but quantised to 1/255 steps on
          device so only 1 MB crosses the link;
        * ``"device"``— the (N,) f32 heat left in HBM (for on-device
          cross-modal fusion, ops.delivery.fused_goal_pick);
        * ``"topk"``  — (values (64,), positions (64, 3)) host arrays,
          ~bytes on the wire;
        * ``"goal"``  — the argmax voxel position (3,) int32 (the only
          thing the robot's move_to consumes, reference
          habitat_lang_robot.py:419-430).
        """
        if init_categories is not None:
            # the reference strips the first and last entries ('void' and
            # 'objects' of mp3dcat) before scoring (avlmap.py:69)
            self.vlmap.init_categories(list(init_categories)[1:-1])
            mask = self.vlmap.index_map(object_name, with_init_cat=True)
        else:
            mask = self.vlmap.index_map(object_name, with_init_cat=False)
        heat = heatmap_from_mask_3d(self.vlmap.grid_pos, mask,
                                    cell_size=self.config.params.cs,
                                    decay_rate=decay_rate,
                                    grid_shape=self.vlmap.occupied_ids.shape,
                                    as_device=delivery != "f32")
        if delivery == "f32":
            return heat
        from avlmaps_tpu.ops import delivery as dlv

        if delivery == "device":
            return heat
        if delivery == "u8":
            return dlv.dequantize_heat_u8(
                dlv.fetch_np(dlv.quantize_heat_u8(heat)))
        if delivery == "topk":
            vals, pos = dlv.topk_peaks(heat, self.vlmap.grid_pos)
            return dlv.fetch_np(vals, pos)
        if delivery == "goal":
            pos, _ = dlv.fused_goal_pick([heat], self.vlmap.grid_pos)
            return dlv.fetch_np(pos)
        raise ValueError(f"unknown delivery format {delivery!r}")

    # -- area (reference avlmap.py:78-109) ---------------------------------

    def index_area_2d(self, area_name: str,
                      decay_rate: float = 0.1,
                      delivery: str = "f32") -> np.ndarray:
        """Per-pose CLIP scores splatted as radial decays, max-composited.

        Pose→map-cell conversion stays on host (cheap, per pose); the
        per-pose decay stacking AND the min-max normalisation run as one
        device program (ops/heatmap.decayed_point_heatmap_2d).
        ``delivery``: "f32" (default) / "u8" (1-byte wire format) /
        "device" (heat left in HBM)."""
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

        return self._deliver_2d(decayed_point_heatmap_2d(
            shape, seeds, confs, decay_rate, combine="max", normalize=True,
            as_device=delivery != "f32"), delivery)

    @staticmethod
    def _deliver_2d(heat, delivery: str):
        if delivery in ("f32", "device"):
            return heat
        from avlmaps_tpu.ops import delivery as dlv

        if delivery == "u8":
            return dlv.dequantize_heat_u8(
                dlv.fetch_np(dlv.quantize_heat_u8(heat)))
        raise ValueError(f"unknown delivery format {delivery!r}")

    def index_area(self, area_name: str,
                   decay_rate: float = 0.1) -> np.ndarray:
        heatmap_2d = self.index_area_2d(area_name, decay_rate)
        return lift_2d_to_3d(heatmap_2d, self.vlmap.grid_pos)

    # -- sound (reference avlmap.py:111-144) --------------------------------

    def index_sound_2d(self, sound_name: str,
                       decay_rate: float = 0.01,
                       delivery: str = "f32") -> np.ndarray:
        """Per-event confidence decays from the event's pose track, summed.

        Each event's seed track (min radial distance == multi-seed EDT),
        the sum composite and the min-max normalisation run as one device
        program (ops/heatmap.decayed_point_heatmap_2d).  ``delivery``:
        "f32" (default) / "u8" / "device" as in :meth:`index_area_2d`."""
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

        return self._deliver_2d(decayed_point_heatmap_2d(
            shape, tracks, confs, decay_rate, combine="sum", normalize=True,
            as_device=delivery != "f32"), delivery)

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
