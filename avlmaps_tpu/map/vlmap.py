"""VLMap: the visual-language voxel map with open-vocabulary indexing.

Mirrors reference avlmaps/map/vlmap.py: load the voxel artifact, score
``grid_feat`` against prompt-ensembled CLIP text features, take the per-voxel
argmax as the category mask; CLIP-driven dynamic obstacle customisation.
The scoring matmul runs on TPU (ops/similarity fused kernel) instead of the
reference's CPU numpy (vlmap.py:94,113 via clip_utils).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from avlmaps_tpu.config import MapConfig
from avlmaps_tpu.map.map_base import Map, get_segment_islands_pos
from avlmaps_tpu.map.voxel_map import load_3d_map
from avlmaps_tpu.ops.pooling import pool_3d_label_to_2d
from avlmaps_tpu.utils.category_matching import find_similar_category_id


def load_lseg_params(path: str, model):
    """LSeg weights from a .ckpt/.pt (through the porter) or a pre-ported
    .msgpack (tools/port_checkpoints.py output)."""
    if str(path).endswith(".msgpack"):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from flax import serialization

        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 480, 480, 3), jnp.float32))
        template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                template)
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())
    from avlmaps_tpu.models.lseg.port import load_lseg_checkpoint

    return load_lseg_checkpoint(str(path))


class OpenVocabIndexMixin:
    """Shared open-vocabulary indexing over ``self.grid_feat``: CLIP init
    (checkpoint-aware), category pre-scoring, and the fused-argmax query
    path.  Used by both the single-floor :class:`VLMap` and the
    multi-floor :class:`~.vlmap_builder_multi_floor.VLMapMultiFloor` so
    the two can't drift (reference vlmap.py:67-125 /
    vlmap_multi_floor.py:111-144 duplicate the same logic)."""

    def _init_clip(self, clip_version: str = "ViT-B/32"):
        """Lazy CLIP init (reference vlmap.py:67-90); loads the OpenAI .pt
        when a checkpoint path is configured, random weights otherwise
        (variant from map_config.clip_variant when set)."""
        if self.clip_encoder is not None:
            return self.clip_encoder
        from avlmaps_tpu.models.clip import ClipEncoder

        if getattr(self, "clip_ckpt", ""):
            self.clip_encoder = ClipEncoder.from_checkpoint(self.clip_ckpt)
        else:
            variant = getattr(getattr(self, "map_config", None),
                              "clip_variant", "") or clip_version
            self.clip_encoder = ClipEncoder(variant)
        return self.clip_encoder

    def init_categories(self, categories: List[str]) -> np.ndarray:
        """Pre-score the map against a fixed category list
        (reference vlmap.py:92-102)."""
        self.categories = list(categories)
        enc = self._init_clip()
        self.scores_mat = enc.get_lseg_score(
            self.categories, self.grid_feat, use_multiple_templates=True,
            add_other=True)
        return self.scores_mat

    def index_map(self, language_desc: str,
                  with_init_cat: bool = True) -> np.ndarray:
        """Per-voxel boolean mask for a language query
        (reference vlmap.py:104-125)."""
        if with_init_cat and self.scores_mat is not None and self.categories:
            cat_id = find_similar_category_id(language_desc, self.categories)
            return np.argmax(self.scores_mat, axis=1) == cat_id
        if with_init_cat:
            raise Exception(
                "Categories are not preloaded. Call "
                "init_categories(categories: List[str]) to initialize "
                "categories.")
        enc = self._init_clip()
        if hasattr(enc, "get_lseg_argmax"):
            # fused score+argmax: the (N, C) score matrix stays on device
            return enc.get_lseg_argmax(
                [language_desc], self.grid_feat,
                use_multiple_templates=True, add_other=True) == 0
        scores = enc.get_lseg_score(  # injected/stub encoder fallback
            [language_desc], self.grid_feat, use_multiple_templates=True,
            add_other=True)
        return np.argmax(scores, axis=1) == 0

    def make_serving_query(self, other_categories: List[str] = ("other",),
                           decay_rate: float = 0.01, k: int = 64,
                           **delivery_kw):
        """Bind the one-dispatch serving query to this loaded map
        (ops/delivery.make_text_object_query): CLIP template encode ->
        score vs the pre-encoded ``other_categories`` matrix -> dense EDT
        heat -> goal/top-k delivery heads, all in one device program.

        Returns ``query(name) -> dict`` of device arrays (``goal_pos``,
        ``topk_vals``/``topk_pos``, ``heat``); fetch with
        ops.delivery.fetch_np.  The map features ride the encoder's HBM
        cache, so repeat queries upload nothing."""
        import jax.numpy as jnp

        from avlmaps_tpu.ops.delivery import make_text_object_query

        enc = self._init_clip()
        other = enc.get_text_feats_multiple_templates(
            list(other_categories), as_device=True)
        fused = make_text_object_query(
            enc, self.occupied_ids.shape, cell_size=self.cs,
            decay_rate=decay_rate, k=k, **delivery_kw)
        feats_dev = enc._map_feats_device(
            self.grid_feat.reshape(-1, self.grid_feat.shape[-1]))
        pos_dev = jnp.asarray(self.grid_pos, jnp.int32)

        def query(name: str):
            return fused(name, feats_dev, pos_dev, other)

        return query

    def index_map_sharded(self, mesh, language_desc: str) -> np.ndarray:
        """Multi-chip open-vocabulary indexing: ``grid_feat`` row-sharded
        over the mesh, each device runs the fused score+argmax kernel on
        its shard with zero hot-path collectives
        (parallel.sharded.sharded_score_argmax).  Same mask semantics as
        :meth:`index_map` with ``with_init_cat=False``."""
        from avlmaps_tpu.parallel.sharded import sharded_score_argmax

        enc = self._init_clip()
        text = enc.get_text_feats_multiple_templates(
            [language_desc, "other"])
        labels = sharded_score_argmax(
            mesh, self.grid_feat.reshape(-1, self.grid_feat.shape[-1]),
            np.asarray(text), normalize_map=False, normalize_text=False)
        # no renormalisation: the host path (get_lseg_argmax ->
        # score_argmax) scores raw template-mean text features, whose
        # per-category norms are part of the reference's scoring
        return labels == 0


class VLMap(OpenVocabIndexMixin, Map):
    def __init__(self, map_config: MapConfig, data_dir: str = "",
                 clip_encoder=None, lseg_ckpt: str = "",
                 clip_ckpt: str = ""):
        super().__init__(map_config, data_dir=data_dir)
        self.scores_mat: Optional[np.ndarray] = None
        self.categories: Optional[List[str]] = None
        self.clip_encoder = clip_encoder
        self.lseg_ckpt = lseg_ckpt
        self.clip_ckpt = clip_ckpt
        self._lseg = None  # (apply_fn, params) injected for map creation

    # -- model wiring --------------------------------------------------------

    def set_lseg(self, apply_fn, params, feat_dim: int = 512):
        self._lseg = (apply_fn, params, feat_dim)

    def _default_lseg(self):
        """LSeg for map creation: the configured checkpoint (demo_e200.ckpt
        via the porter, or a pre-ported .msgpack) when given, randomly
        initialised otherwise (reference _init_lseg,
        avlmaps/map/vlmap_builder.py:226-264)."""
        if self._lseg is None:
            import jax
            import jax.numpy as jnp
            from avlmaps_tpu.models.lseg import LSegNet, LSegConfig

            arch = getattr(self.map_config, "lseg_arch", "vitl16")
            # allowlist of archs whose output geometry the evaluators
            # accept (patch-16: output == crop, or half of it)
            if arch not in ("vitl16", "medium", "tiny16"):
                raise ValueError(f"unknown lseg_arch {arch!r}")
            factory = getattr(LSegConfig, arch)
            cfg = factory(dtype=jnp.bfloat16 if arch == "vitl16"
                          else jnp.float32)
            model = LSegNet(cfg)
            crop = getattr(self.map_config, "lseg_crop_size", 480)
            if self.lseg_ckpt:
                params = load_lseg_params(self.lseg_ckpt, model)
            else:
                params = jax.jit(model.init)(
                    jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 3),
                                                     jnp.float32))
            if cfg.dtype == jnp.bfloat16:
                from avlmaps_tpu.models.lseg.model import (
                    cast_params_for_inference)
                params = cast_params_for_inference(params)
            self._lseg = (model.apply, params, cfg.out_dim)
        return self._lseg

    # -- create / load -------------------------------------------------------

    def create_map(self, data_dir: Union[Path, str],
                   batch_size: int = 4) -> None:
        """Build the voxel map for a scene (reference vlmap.py:33-48)."""
        from avlmaps_tpu.map.vlmap_builder import VLMapBuilder

        self._setup_paths(data_dir)
        apply_fn, params, feat_dim = self._default_lseg()
        builder = VLMapBuilder(
            self.data_dir, self.map_config, self.pose_path, self.rgb_paths,
            self.depth_paths, self.base2cam_tf, self.base_transform,
            lseg_apply=apply_fn, lseg_params=params, feat_dim=feat_dim,
            batch_size=batch_size)
        pose_type = self.map_config.pose_info.pose_type
        if pose_type == "mobile_base":
            builder.create_mobile_base_map()
        elif pose_type == "camera":
            # reference dispatches here too (vlmap.py:45-48) but its
            # create_camera_map is an unimplemented TODO; ours is real
            builder.create_camera_map()
        else:
            raise ValueError(f"unknown pose_type {pose_type!r}")

    def load_map(self, data_dir: Union[Path, str]) -> bool:
        self._setup_paths(data_dir)
        self.map_save_path = Path(data_dir) / "vlmap" / "vlmaps.h5df"
        if not self.map_save_path.exists():
            print("Loading VLMap failed because the file doesn't exist.")
            return False
        (self.mapped_iter_list, self.grid_feat, self.grid_pos, self.weight,
         self.occupied_ids, self.grid_rgb) = load_3d_map(self.map_save_path)
        return True

    # -- indexing: init_categories / index_map from OpenVocabIndexMixin ------

    def customize_obstacle_map(self, potential_obstacle_names: List[str],
                               obstacle_names: List[str],
                               vis: bool = False) -> None:
        """CLIP-scored dynamic obstacle mask (reference vlmap.py:127-156 +
        index_utils.get_dynamic_obstacles_map_3d :138-184)."""
        if self.obstacles_cropped is None and self.obstacles_map is None:
            self.generate_obstacle_map()
        enc = self._init_clip()

        all_obstacles_mask = self.obstacles_cropped == 0
        # add_other=True: the reference scores with an appended 'other'
        # class absorbing non-obstacle voxels (index_utils.py:152-158)
        if hasattr(enc, "get_lseg_argmax"):
            predict = enc.get_lseg_argmax(
                list(potential_obstacle_names), self.grid_feat,
                use_multiple_templates=True, add_other=True)
        else:  # injected/stub encoder fallback
            predict = np.argmax(enc.get_lseg_score(
                list(potential_obstacle_names), self.grid_feat,
                use_multiple_templates=True, add_other=True), axis=1)
        obs_inds = [i for i, name in enumerate(potential_obstacle_names)
                    if name in obstacle_names]
        pts_mask = np.isin(predict, obs_inds)

        new_obstacles = np.zeros_like(self.obstacles_cropped, dtype=bool)
        obs_pts = self.grid_pos[pts_mask]
        rows = obs_pts[:, 0] - self.rmin
        cols = obs_pts[:, 1] - self.cmin
        inside = ((rows >= 0) & (rows < new_obstacles.shape[0])
                  & (cols >= 0) & (cols < new_obstacles.shape[1]))
        new_obstacles[rows[inside], cols[inside]] = True
        new_obstacles &= all_obstacles_mask
        new_obstacles = ~new_obstacles

        dilated = Map._dilate_map(new_obstacles == 0,
                                  self.map_config.dilate_iter,
                                  self.map_config.gaussian_sigma)
        self.obstacles_new_cropped = dilated == 0

    def get_pos(self, name: str):
        """Contours/centers/bboxes of a category's islands on the full map
        (reference vlmap.py:158-187)."""
        import jax.numpy as jnp
        from avlmaps_tpu.ops.morphology import (
            binary_closing_jax, binary_dilation_jax, gaussian_blur_jax,
        )

        assert self.categories
        pc_mask = self.index_map(name, with_init_cat=True)
        mask_2d = pool_3d_label_to_2d(pc_mask, self.grid_pos, self.gs)
        mask_2d = mask_2d[self.rmin:self.rmax + 1, self.cmin:self.cmax + 1]

        fg = binary_closing_jax(jnp.asarray(mask_2d), iterations=3)
        fg = gaussian_blur_jax(jnp.asarray(fg).astype(jnp.float32),
                               sigma=0.8, truncate=3.0)
        fg = np.asarray(fg) > 0.5
        fg = np.asarray(binary_dilation_jax(jnp.asarray(fg)))

        contours, centers, bbox_list, _ = get_segment_islands_pos(fg, 1)
        # shift back to whole-map coords (reference vlmap.py:176-185)
        for i in range(len(contours)):
            centers[i][0] += self.rmin
            centers[i][1] += self.cmin
            bbox_list[i][0] += self.rmin
            bbox_list[i][1] += self.rmin
            bbox_list[i][2] += self.cmin
            bbox_list[i][3] += self.cmin
            contours[i] = contours[i] + np.array([[self.rmin, self.cmin]])
        return contours, centers, bbox_list
