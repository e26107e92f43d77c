"""Heatmap generation kernels.

The reference computes 3D heatmaps with a per-point Python loop over *all*
non-target voxels, each doing a full distance scan over target voxels
(avlmaps/utils/visualize_utils.py:29-49 — O(N·M) with tqdm), and 2D heatmaps
via scipy's EDT (:97-102).  Both are reformulated as static-shaped device
ops:

* 3D: a tiled min-distance reduction — voxels stream in row chunks, target
  chunks are reduced with a running minimum; distances via the
  |a|² + |b|² - 2a·b expansion so the inner contraction hits the MXU.
* 2D: an exact two-pass Euclidean distance transform (vertical sweep +
  horizontal lower-envelope minimisation), fully vectorised.

Unit quirk preserved from the reference: ``grid_pos`` is in *cells*, yet
distances are divided by ``cell_size`` again before applying the decay
(visualize_utils.py:40,98).  Parity beats dimensional hygiene here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 1.0e6


@functools.partial(jax.jit, static_argnames=("row_chunk", "tgt_chunk"))
def _min_dist_to_targets(points: jnp.ndarray, targets: jnp.ndarray,
                         row_chunk: int = 8192,
                         tgt_chunk: int = 1024) -> jnp.ndarray:
    """Per-point min Euclidean distance to any target point.

    ``points``: (N, 3) float32; ``targets``: (M, 3) float32 where masked-out
    targets are pre-filled with a far sentinel coordinate.
    """
    n = points.shape[0]
    m = targets.shape[0]
    n_pad = (n + row_chunk - 1) // row_chunk * row_chunk
    m_pad = (m + tgt_chunk - 1) // tgt_chunk * tgt_chunk
    pts = jnp.full((n_pad, 3), _FAR, jnp.float32).at[:n].set(points)
    tgt = jnp.full((m_pad, 3), _FAR, jnp.float32).at[:m].set(targets)
    tgt_tiles = tgt.reshape(m_pad // tgt_chunk, tgt_chunk, 3)

    def row_block(block):  # (row_chunk, 3)
        bsq = jnp.sum(block * block, axis=1, keepdims=True)

        def scan_tile(dmin, tile):
            tsq = jnp.sum(tile * tile, axis=1)[None, :]
            cross = block @ tile.T  # MXU contraction
            d2 = jnp.maximum(bsq + tsq - 2.0 * cross, 0.0)
            return jnp.minimum(dmin, jnp.min(d2, axis=1)), None

        dmin0 = jnp.full((block.shape[0],), jnp.inf, jnp.float32)
        dmin, _ = jax.lax.scan(scan_tile, dmin0, tgt_tiles)
        return jnp.sqrt(dmin)

    dists = jax.lax.map(row_block, pts.reshape(-1, row_chunk, 3))
    return dists.reshape(-1)[:n]


def heatmap_from_mask_3d(grid_pos, mask, cell_size: float = 0.05,
                         decay_rate: float = 0.01) -> np.ndarray:
    """3D heatmap: 1 on target voxels, decaying with min distance elsewhere.

    Matches reference get_heatmap_from_mask_3d (visualize_utils.py:29-49):
    ``heat = clip(1 - (min_dist / cell_size) * decay_rate, 0, 1)``.
    Returns (N,) float32 (host numpy).
    """
    grid_pos = jnp.asarray(grid_pos, jnp.float32)
    mask = jnp.asarray(mask, bool)
    targets = jnp.where(mask[:, None], grid_pos, _FAR)
    any_target = bool(jax.device_get(jnp.any(mask)))
    if not any_target:
        # no target voxels: zero heat everywhere (the decay limit).  The
        # reference would crash here (argmin over an empty target set,
        # visualize_utils.py:41) — returning the limit is the usable fix.
        return np.zeros((grid_pos.shape[0],), np.float32)
    dists = _min_dist_to_targets(grid_pos, targets) / cell_size
    heat = jnp.clip(1.0 - dists * decay_rate, 0.0, 1.0)
    heat = jnp.where(mask, 1.0, heat)
    return np.asarray(jax.device_get(heat), np.float32)


# ---------------------------------------------------------------------------
# exact 2D Euclidean distance transform
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def distance_transform_edt_jax(zero_mask: jnp.ndarray,
                               row_chunk: int = 64) -> jnp.ndarray:
    """Exact EDT: distance from each pixel to the nearest True pixel.

    Equivalent to ``scipy.ndimage.distance_transform_edt(~zero_mask)`` —
    i.e. True entries in ``zero_mask`` are the zero set.

    Two-pass algorithm: (1) per-column nearest-zero row offset via forward +
    backward cumulative sweeps; (2) per-row exact lower-envelope minimisation
    ``D(i,j)² = min_k G(i,k)² + (j-k)²`` evaluated as a chunked broadcast —
    O(gs³) scalar min-ops but fully vectorised on the VPU.
    """
    h, w = zero_mask.shape
    big = jnp.float32(h + w + 1)

    # pass 1: vertical distance to nearest zero in the same column
    init = jnp.where(zero_mask, 0.0, jnp.inf)

    def sweep(carry, row):
        d = jnp.minimum(row, carry + 1.0)
        return d, d

    _, down = jax.lax.scan(sweep, jnp.full((w,), big), init)
    _, up = jax.lax.scan(sweep, jnp.full((w,), big), init, reverse=True)
    g = jnp.minimum(down, up)  # (h, w) vertical distances (may be inf)
    g = jnp.minimum(g, big)

    # pass 2: for each row, exact min over columns of g² + dx²
    cols = jnp.arange(w, dtype=jnp.float32)
    dx2 = (cols[:, None] - cols[None, :]) ** 2  # (w, w)
    g2 = g * g

    h_pad = (h + row_chunk - 1) // row_chunk * row_chunk
    g2p = jnp.full((h_pad, w), big * big).at[:h].set(g2)

    def row_block(block):  # (row_chunk, w)
        # (rows, j, k): block[r, k] + dx2[j, k], min over k
        return jnp.min(block[:, None, :] + dx2[None, :, :], axis=-1)

    d2 = jax.lax.map(row_block, g2p.reshape(-1, row_chunk, w))
    return jnp.sqrt(d2.reshape(h_pad, w)[:h])


def heatmap_from_mask_2d(mask, cell_size: float = 0.05,
                         decay_rate: float = 0.01) -> np.ndarray:
    """2D heatmap via EDT decay (reference get_heatmap_from_mask_2d,
    visualize_utils.py:97-102)."""
    mask = jnp.asarray(mask)
    dists = distance_transform_edt_jax(mask != 0) / cell_size
    heat = jnp.clip(1.0 - dists * decay_rate, 0.0, jnp.inf)
    heat = jnp.where(heat < 0, 0.0, heat)
    return np.asarray(jax.device_get(heat), np.float32)


@jax.jit
def radial_decay_heatmap(grid_pos: jnp.ndarray, center: jnp.ndarray,
                         decay_rate: float = 0.01,
                         confidence: float = 1.0) -> jnp.ndarray:
    """Planar radial decay from one map position (reference
    AVLMap.index_image, avlmap.py:146-163): distances use only (row, col)."""
    d = jnp.linalg.norm((grid_pos[:, :2].astype(jnp.float32)
                         - center[:2].astype(jnp.float32)), axis=1)
    return jnp.clip(confidence - decay_rate * d, 0.0, 1.0)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "combine", "decay_rate"))
def _stacked_decay_scan(seeds_rc: jnp.ndarray, confidences: jnp.ndarray,
                        h: int, w: int, decay_rate: float,
                        combine: str) -> jnp.ndarray:
    """One ``lax.scan`` step per event: min radial distance over the event's
    (padded) seed track, decay layer, max/sum composite.  Memory stays at
    O(T·h·w) per step regardless of the event count."""
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]

    def step(out, ev):
        seeds, conf = ev  # (T, 2) float32, () float32
        d2 = ((rows[None] - seeds[:, 0, None, None]) ** 2
              + (cols[None] - seeds[:, 1, None, None]) ** 2)  # (T, h, w)
        dist = jnp.sqrt(jnp.min(d2, axis=0))
        if combine == "max":
            layer = jnp.clip(conf - dist * decay_rate, 0.0, 1.0)
            return jnp.maximum(out, layer), None
        layer = jnp.maximum(conf - conf * dist * decay_rate, 0.0)
        return out + layer, None

    out0 = jnp.zeros((h, w), jnp.float32)
    out, _ = jax.lax.scan(step, out0, (seeds_rc, confidences))
    return out


def decayed_point_heatmap_2d(shape, points_rc, confidences,
                             decay_rate: float, combine: str = "max"):
    """Stack per-event radial-decay maps (references AVLMap.index_area_2d
    avlmaps/map/avlmap.py:78-108 / index_sound_2d :110-144).

    ``points_rc``: per-event seed tracks — either a flat (E, 2) array (one
    seed per event, the area case) or a list of (T_i, 2) arrays (pose tracks,
    the sound case); tracks are padded to the longest with a far sentinel.
    For each event with confidence c the per-event map is
    ``clip(c - dist·decay, 0, 1)`` (max composite, area) or
    ``max(c - c·dist·decay, 0)`` (sum composite, sound), where ``dist`` is
    the min radial distance over the event's seeds — each seed map has a
    single nonzero pixel, whose EDT is exactly the radial distance, so no
    EDT pass is needed.  Runs as one jitted scan on device.
    """
    h, w = int(shape[0]), int(shape[1])
    tracks = [np.atleast_2d(np.asarray(p, np.float32)) for p in points_rc]
    if not tracks:
        return np.zeros((h, w), np.float32)
    t_max = max(max(t.shape[0] for t in tracks), 1)
    # bucket the track axis to a power of two as well — otherwise every
    # distinct longest-track length forces a fresh compile of the scan
    t_max = 1 << max(t_max - 1, 0).bit_length()
    far = np.float32(_FAR)
    seeds = np.full((len(tracks), t_max, 2), far, np.float32)
    for i, t in enumerate(tracks):
        seeds[i, :t.shape[0]] = t
    conf = np.asarray(confidences, np.float32)
    # pad the event axis to a power-of-two bucket so the compiled program is
    # reused across query sizes (far seeds + conf 0 contribute nothing)
    e = len(tracks)
    e_pad = 1 << max(e - 1, 0).bit_length()
    if e_pad > e:
        seeds = np.concatenate(
            [seeds, np.full((e_pad - e, t_max, 2), far, np.float32)])
        conf = np.concatenate([conf, np.zeros(e_pad - e, np.float32)])
    out = _stacked_decay_scan(jnp.asarray(seeds), jnp.asarray(conf),
                              h, w, float(decay_rate), combine)
    return np.asarray(jax.device_get(out), np.float32)
