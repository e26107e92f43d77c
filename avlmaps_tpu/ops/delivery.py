"""D2H-lean query delivery: quantized heat, top-k peaks, on-device goal pick.

The full ``index_object`` query is delivery-bound on tunnelled hosts: the
reference-shaped result is a raw (N,) float32 heatmap — 4 MB per query at
N=1e6 voxels — but its consumers never need f32 density.  The robot's goal
selection is one argmax over (a product of) heatmaps
(/root/reference/avlmaps/robot/habitat_lang_robot.py:357-430) and the
visualiser quantises to a u8 colormap anyway
(/root/reference/avlmaps/utils/visualize_utils.py:59-74).  Three wire
formats, leanest first:

* ``goal``  — cross-modal fusion (elementwise product) + argmax on device;
  the host fetches one (row, col, height) coordinate (~bytes);
* ``topk``  — the k highest-heat voxels with their positions (~k·16 bytes);
* ``u8``    — the full density field quantised to 1/255 steps (heat lives
  in [0, 1] by construction), 4 MB -> 1 MB on the wire, dequantised to f32
  on the host so callers see the same dtype/range as the f32 path.

``make_object_query`` additionally fuses the whole serving query — the
score+argmax Pallas kernel, the banded dense EDT heat and every delivery
head — into ONE jitted program so a query pays the per-dispatch floor
once (docs/PROFILE.md "Measurement hygiene": ~3 ms per dispatch on this
host).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from avlmaps_tpu.ops.heatmap import _banded_axis_pass, _INF
from avlmaps_tpu.ops.similarity import score_argmax

__all__ = [
    "quantize_heat_u8", "dequantize_heat_u8", "topk_peaks",
    "fused_goal_pick", "make_object_query", "fetch_np",
]


@jax.jit
def quantize_heat_u8(heat: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] float heat -> u8 with 1/255 steps (round-to-nearest)."""
    return jnp.round(jnp.clip(heat, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def dequantize_heat_u8(u8) -> np.ndarray:
    """Host-side inverse: u8 wire payload -> f32 in [0, 1]."""
    return np.asarray(u8, np.float32) / np.float32(255.0)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_peaks(heat: jnp.ndarray, grid_pos: jnp.ndarray, k: int = 64):
    """(k,) top heat values + their (k, 3) voxel positions, on device."""
    vals, idx = jax.lax.top_k(heat, k)
    return vals, jnp.take(grid_pos, idx, axis=0)


@jax.jit
def _goal_pick(heats: jnp.ndarray, grid_pos: jnp.ndarray):
    fused = jnp.prod(heats, axis=0)
    idx = jnp.argmax(fused)
    return jnp.take(grid_pos, idx, axis=0), fused[idx]


def fused_goal_pick(heats: Sequence[jnp.ndarray], grid_pos):
    """Cross-modal fusion + goal argmax on device (reference
    get_map_3d x get_major_map_3d -> get_max_pos_3d,
    habitat_lang_robot.py:357-430, host numpy there).

    ``heats``: per-modality (N,) heat arrays (device or host).  Returns
    ((3,) int32 position, float heat) as DEVICE arrays — fetching them is
    a ~16-byte D2H instead of len(heats) x 4 MB.  Ties break to the first
    voxel index, matching np.argmax on the host-fused product.
    """
    stack = jnp.stack([jnp.asarray(h, jnp.float32) for h in heats])
    return _goal_pick(stack, jnp.asarray(grid_pos))


def fetch_np(*arrays, async_start: bool = True):
    """Fetch device arrays to host numpy, starting all D2H copies before
    blocking on any — so a multi-payload delivery overlaps its transfers
    (and a caller holding results from several queries drains them in one
    link-bound pass instead of one RTT each)."""
    if async_start:
        for a in arrays:
            start = getattr(a, "copy_to_host_async", None)
            if start is not None:
                try:
                    start()
                except Exception:  # backend without async D2H: plain fetch
                    pass
    out = tuple(np.asarray(jax.device_get(a)) for a in arrays)
    return out[0] if len(out) == 1 else out


# ---------------------------------------------------------------------------
# single-dispatch serving query
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("dims", "r", "k", "with_u8", "with_topk"))
def _object_query_program(feats, text, coords, dims, r,
                          decay_per_cell, k, with_u8, with_topk):
    """score+argmax -> category-0 mask -> banded dense 3D EDT -> heat ->
    delivery heads, as one traced program (one dispatch per query)."""
    labels = score_argmax(feats, text, normalize_map=True,
                          normalize_text=True)
    mask = labels == 0

    x, y, z = dims
    grid = jnp.full((x, y, z), _INF, jnp.float32)
    cx = jnp.where(mask, coords[:, 0], jnp.int32(2 ** 30))
    grid = grid.at[cx, coords[:, 1], coords[:, 2]].min(0.0, mode="drop")
    for axis in range(3):
        grid = _banded_axis_pass(grid, r, axis)
    d2 = grid[coords[:, 0], coords[:, 1], coords[:, 2]]
    heat = jnp.clip(1.0 - jnp.sqrt(d2) * decay_per_cell, 0.0, 1.0)
    heat = jnp.where(mask, 1.0, heat)

    out = {"goal_pos": jnp.take(coords, jnp.argmax(heat), axis=0),
           "heat": heat}
    if with_u8:
        out["heat_u8"] = jnp.round(heat * 255.0).astype(jnp.uint8)
    if with_topk:
        vals, idx = jax.lax.top_k(heat, k)
        out["topk_vals"] = vals
        out["topk_pos"] = jnp.take(coords, idx, axis=0)
    return out


def make_text_object_query(clip_encoder, grid_shape,
                           cell_size: float = 0.05,
                           decay_rate: float = 0.01, k: int = 64,
                           with_u8: bool = False, with_topk: bool = True):
    """The whole serving query as ONE device program, text encode included:
    CLIP-encode the query's template ensemble -> prepend to the resident
    category matrix -> fused score+argmax -> banded dense EDT heat ->
    goal/top-k (/u8) delivery heads.

    One dispatch per query (the ~3 ms-per-dispatch floor and the dispatch-
    to-dispatch gaps of the staged path are paid once), tokenisation stays
    on host (~0.8 ms).  Returns ``query(text, map_feats, grid_pos,
    other_text_feats) -> dict`` of device arrays; ``other_text_feats`` is
    the (C-1, D) pre-encoded category matrix the query competes against
    (reference init_categories semantics, vlmap.py:92-125 — the query
    replaces category 0).
    """
    from avlmaps_tpu.models.clip.features import MULTIPLE_TEMPLATES
    from avlmaps_tpu.models.clip.model import Clip

    n_t = len(MULTIPLE_TEMPLATES)
    model = clip_encoder.model
    decay_per_cell = float(decay_rate) / float(cell_size)
    r = int(np.ceil(1.0 / decay_per_cell)) + 1
    dims = tuple(int(-(-int(s) // 32) * 32) for s in grid_shape)

    @jax.jit
    def program(params, tokens, feats, coords, other_text):
        tf = model.apply(params, tokens, method=Clip.encode_text)
        tf = tf.astype(jnp.float32)
        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
        query_feat = tf.reshape(-1, n_t, tf.shape[-1]).mean(axis=1)
        text = jnp.concatenate([query_feat, other_text], axis=0)
        return _object_query_program(feats, text, coords, dims, r,
                                     decay_per_cell, k, with_u8, with_topk)

    def query(text: str, map_feats, grid_pos, other_text_feats):
        prompts = [t.format(text) for t in MULTIPLE_TEMPLATES]
        tokens = clip_encoder.tokenizer(prompts,
                                        clip_encoder.cfg.context_length)
        return program(clip_encoder.params, jnp.asarray(tokens),
                       jnp.asarray(map_feats),
                       jnp.asarray(grid_pos, jnp.int32),
                       jnp.asarray(other_text_feats))

    return query


def make_object_query(grid_shape, cell_size: float = 0.05,
                      decay_rate: float = 0.01, k: int = 64,
                      with_u8: bool = True, with_topk: bool = True):
    """Build the fused open-vocabulary object query for a fixed map layout.

    Returns ``query(map_feats, text_feats, grid_pos) -> dict`` of DEVICE
    arrays: ``heat`` (N,) f32, ``goal_pos`` (3,) int32, and the optional
    ``heat_u8`` / ``topk_vals``+``topk_pos`` delivery heads.  ``grid_pos``
    must be integer voxel cells inside ``grid_shape`` (the builder's
    layout); the dense EDT's band radius comes from the decay clip exactly
    as in ops.heatmap.heatmap_from_mask_3d.
    """
    # grid_pos is integer cells (lattice unit 1.0); the reference divides
    # distances by cell_size before applying the decay
    # (visualize_utils.py:40) — same unit quirk as heatmap_from_mask_3d
    decay_per_cell = float(decay_rate) / float(cell_size)
    r = int(np.ceil(1.0 / decay_per_cell)) + 1
    dims = tuple(int(-(-int(s) // 32) * 32) for s in grid_shape)

    def query(map_feats, text_feats, grid_pos):
        coords = jnp.asarray(grid_pos, jnp.int32)
        return _object_query_program(
            jnp.asarray(map_feats), jnp.asarray(text_feats), coords,
            dims, r, decay_per_cell, k, with_u8, with_topk)

    return query
