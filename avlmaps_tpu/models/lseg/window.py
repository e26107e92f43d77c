"""Sliding-window LSeg inference as a single batched device program.

The reference evaluates overlapping 480-crops of a 520-long-side resize in a
Python grid loop with count-normalised averaging
(avlmaps/utils/lseg_utils.py:20-119).  The grid is static given the input
size, so here all crops are evaluated as ONE batched forward (the window axis
folds into the batch axis — TPU-friendly: bigger matmuls, one compile), and
the overlap-average is a static scatter-add.

Canvas accumulation runs in f32; for the map-building path use
``lseg_features_at_points`` which gathers only the sampled pixels inside the
same jit so the full (H, W, 512) canvas never reaches the host.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avlmaps_tpu.ops.resize import resize_bilinear_align_corners

NORM_MEAN = (0.5, 0.5, 0.5)
NORM_STD = (0.5, 0.5, 0.5)


def normalize_image(rgb_uint8: np.ndarray) -> np.ndarray:
    """HWC uint8 -> normalised float32 (reference lseg transform,
    vlmap_builder.py:255-261: ToTensor + Normalize(0.5, 0.5))."""
    img = rgb_uint8.astype(np.float32) / 255.0
    return (img - np.asarray(NORM_MEAN)) / np.asarray(NORM_STD)


def plan_windows(h: int, w: int, base_size: int = 520, crop_size: int = 480,
                 stride_rate: float = 2.0 / 3.0):
    """Static sliding-window plan for an (h, w) input.

    Returns (resized_h, resized_w, padded_h, padded_w, crops) where crops is
    a list of (h0, h1, w0, w1) in padded coords — the same grid the reference
    computes at lseg_utils.py:42-52,69-76.
    """
    stride = int(crop_size * stride_rate)
    if h > w:
        height, width = base_size, int(1.0 * w * base_size / h + 0.5)
    else:
        width, height = base_size, int(1.0 * h * base_size / w + 0.5)
    ph, pw = max(height, crop_size), max(width, crop_size)
    crops: List[Tuple[int, int, int, int]] = []
    h_grids = int(math.ceil(1.0 * (ph - crop_size) / stride)) + 1
    w_grids = int(math.ceil(1.0 * (pw - crop_size) / stride)) + 1
    for idh in range(h_grids):
        for idw in range(w_grids):
            h0, w0 = idh * stride, idw * stride
            h1, w1 = min(h0 + crop_size, ph), min(w0 + crop_size, pw)
            crops.append((h0, h1, w0, w1))
    return height, width, ph, pw, crops


def _pad_value() -> np.ndarray:
    """-mean/std: the normalised zero pixel (reference pad_image,
    additional_utils/models.py:145-157)."""
    return -np.asarray(NORM_MEAN, np.float32) / np.asarray(NORM_STD,
                                                           np.float32)


def sliding_window_features(apply_fn: Callable, params, images: jnp.ndarray,
                            base_size: int = 520, crop_size: int = 480,
                            flip: bool = False) -> jnp.ndarray:
    """Full-canvas pixel features for a batch of same-sized frames.

    ``images``: (B, H, W, 3) normalised float32.  Returns
    (B, height, width, D) where (height, width) is the base_size resize —
    matching the reference's returned resolution (lseg_utils.py:97-98).

    ``flip=True`` adds the horizontally-flipped evaluation of every padded
    crop, un-flipped (the reference's module_inference,
    additional_utils/models.py:134-140 — a SUM, not an average; the flipped
    crops fold into the same batched forward).
    """
    b, h, w, _ = images.shape
    height, width, ph, pw, crops = plan_windows(h, w, base_size, crop_size)

    # canvas-sized input (pipeline.transport canvas mode): resize is identity
    x = images if (h, w) == (height, width) \
        else resize_bilinear_align_corners(images, height, width)
    pad = _pad_value()
    canvas_in = jnp.broadcast_to(jnp.asarray(pad), (b, ph, pw, 3))
    canvas_in = canvas_in.at[:, :height, :width, :].set(x)

    # batch all crops: (B * n_crops, crop, crop, 3); crops shorter than the
    # window are padded with the normalised-zero pixel (reference pad_image)
    crop_batch = []
    for (h0, h1, w0, w1) in crops:
        piece = canvas_in[:, h0:h1, w0:w1, :]
        if (h1 - h0, w1 - w0) != (crop_size, crop_size):
            full = jnp.broadcast_to(jnp.asarray(pad),
                                    (b, crop_size, crop_size, 3))
            piece = full.at[:, :h1 - h0, :w1 - w0, :].set(piece)
        crop_batch.append(piece)
    batch = jnp.concatenate(crop_batch, axis=0)
    if flip:
        batch = jnp.concatenate([batch, batch[:, :, ::-1, :]], axis=0)

    feats = apply_fn(params, batch)  # (B * n_crops [* 2], crop, crop, D)
    if flip:
        n = batch.shape[0] // 2
        feats = feats[:n] + feats[n:, :, ::-1, :]
    if feats.shape[1] != crop_size or feats.shape[2] != crop_size:
        raise ValueError(
            f"model output {feats.shape[1:3]} != crop {crop_size}: the "
            "overlap merge requires an output-resolution-preserving model "
            "(patch-16 LSeg); use LSegConfig.tiny16 for small tests")
    d = feats.shape[-1]

    out = jnp.zeros((b, ph, pw, d), jnp.float32)
    count = jnp.zeros((1, ph, pw, 1), jnp.float32)
    for ci, (h0, h1, w0, w1) in enumerate(crops):
        piece = feats[ci * b:(ci + 1) * b, :h1 - h0, :w1 - w0, :]
        out = out.at[:, h0:h1, w0:w1, :].add(piece.astype(jnp.float32))
        count = count.at[:, h0:h1, w0:w1, :].add(1.0)
    out = out / count
    return out[:, :height, :width, :]


DEFAULT_SCALES = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)


def multi_scale_features(apply_fn: Callable, params, images: jnp.ndarray,
                         base_size: int = 520, crop_size: int = 480,
                         scales=DEFAULT_SCALES,
                         flip: bool = True) -> jnp.ndarray:
    """Multi-scale (+ flip) evaluation — the reference's quality knob
    (LSeg_MultiEvalModule.forward, additional_utils/models.py:55-133).

    Per scale: aspect-preserving resize to long side ceil(base_size·scale),
    sliding-window count-normalised evaluation (a single padded crop when
    the scaled image fits one window — the same code path), align-corners
    resize back to the input size; scales SUM (argmax-invariant, like the
    reference).  Returns (B, H, W, D) at the input resolution.
    """
    import math as _math

    b, h, w, _ = images.shape
    total = None
    for scale in scales:
        long_size = int(_math.ceil(base_size * scale))
        out = sliding_window_features(apply_fn, params, images,
                                      base_size=long_size,
                                      crop_size=crop_size, flip=flip)
        out = resize_bilinear_align_corners(out, h, w)
        total = out if total is None else total + out
    return total


def bilinear_patch_sample(fmap: jnp.ndarray, sx: jnp.ndarray,
                          sy: jnp.ndarray) -> jnp.ndarray:
    """Edge-safe bilinear sample of (B, H, W, D) feature maps at float
    coords (B, N) — ONE (2, 2, D) patch gather per point instead of four
    separate row gathers.  TPU gathers are latency-bound per gathered
    slice, so fetching the whole bilinear support as one slice quarters
    the row count (the four-corner form traced at 3.3 ms/step, r3).

    ``sx``/``sy`` must already be clipped to [0, W-1] / [0, H-1].  Uses the
    standard edge-safe formulation start = min(floor(s), size-2),
    t = s - start ∈ [0, 1]: algebraically identical to clamped-corner
    lerping (at the high edge t = 1 selects the far corner exactly).
    """
    b, h, w, d = fmap.shape
    ys = jnp.clip(jnp.floor(sy), 0, h - 2).astype(jnp.int32)
    xs = jnp.clip(jnp.floor(sx), 0, w - 2).astype(jnp.int32)
    ty = (sy - ys.astype(jnp.float32))[..., None]
    tx = (sx - xs.astype(jnp.float32))[..., None]
    starts = jnp.stack([ys, xs], axis=-1)  # (B, N, 2)

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def patch(m, s):  # m: (H, W, D), s: (N, 2) -> (N, 2, 2, D)
        return jax.lax.gather(
            m, s, dn, slice_sizes=(2, 2, d),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    p = jax.vmap(patch)(fmap, starts)
    return ((1 - ty) * (1 - tx) * p[:, :, 0, 0]
            + (1 - ty) * tx * p[:, :, 0, 1]
            + ty * (1 - tx) * p[:, :, 1, 0]
            + ty * tx * p[:, :, 1, 1])


def whole_canvas_features_at_points(apply_fn: Callable, params,
                                    images: jnp.ndarray, px: jnp.ndarray,
                                    py: jnp.ndarray,
                                    pad_multiple: int = 32) -> jnp.ndarray:
    """Single-forward fast mode: ONE evaluation of the whole canvas instead
    of the reference's overlapping crop grid — ~2.4x fewer FLOPs at the
    1080x720 geometry (749 vs 1802 ViT tokens).

    The canvas is padded to a pad_multiple boundary (32 = patch 16 x the
    DPT /2 stage) with the normalised-zero pixel and evaluated once; pixel
    features are gathered at (px, py) directly (full-res model output) or
    via the half-res align-corners bilinear map (upsample=False output).

    NOT numerically equivalent to the sliding window: each pixel sees one
    global receptive field instead of a count-normalised average over
    480-crops, and the pos-embed is resized to the canvas grid.  For a
    per-pixel (receptive-field-free) function the two modes agree exactly
    (tested); for the trained LSeg the difference is a quality/throughput
    trade-off — keep the default "sliding" mode for reference parity.
    """
    b, h, w, _ = images.shape
    ph = -(-h // pad_multiple) * pad_multiple
    pw = -(-w // pad_multiple) * pad_multiple
    pad = _pad_value()
    canvas = jnp.broadcast_to(jnp.asarray(pad), (b, ph, pw, 3))
    canvas = canvas.at[:, :h, :w, :].set(images)
    feats = apply_fn(params, canvas)  # (B, ph or ph/2, pw or pw/2, D)
    fh, fw = feats.shape[1], feats.shape[2]

    if (fh, fw) == (ph, pw):  # full-res output: direct gather
        gx = jnp.clip(px, 0, pw - 1)
        gy = jnp.clip(py, 0, ph - 1)
        return jax.vmap(lambda m, r, c: m[r, c])(feats, gy, gx)
    if (fh * 2, fw * 2) != (ph, pw):
        raise ValueError(f"model output {(fh, fw)} is neither full nor half "
                         f"of the padded canvas {(ph, pw)}")
    # half-res align-corners sample (same map as the skipped 2x upsample)
    sx = jnp.clip(px.astype(jnp.float32), 0, pw - 1) * ((fw - 1) / (pw - 1))
    sy = jnp.clip(py.astype(jnp.float32), 0, ph - 1) * ((fh - 1) / (ph - 1))
    return bilinear_patch_sample(feats, sx, sy)


def features_at_points(apply_fn: Callable, params, images: jnp.ndarray,
                       px: jnp.ndarray, py: jnp.ndarray,
                       base_size: int = 520, crop_size: int = 480,
                       half_res_apply: bool = False) -> jnp.ndarray:
    """Pixel features gathered at per-frame pixel coords, all on device.

    ``px``/``py``: (B, N) pixel coords in the *feature-canvas* frame
    (the reference projects points with the canvas intrinsics,
    vlmap_builder.py:126,143).  Out-of-canvas coords return garbage rows —
    mask downstream, exactly like the reference's bounds check (:160).
    Returns (B, N, D).

    ``half_res_apply=True`` expects ``apply_fn`` to return features at HALF
    the crop resolution (LSegNet with upsample=False) and replaces the
    materialise-canvas-then-gather path with direct bilinear sampling of
    each covering crop's half-res map + count averaging — mathematically
    identical (the skipped 2x upsample is align-corners bilinear, which the
    sampler reproduces in its coordinate map) and far cheaper in HBM.
    """
    if not half_res_apply:
        canvas = sliding_window_features(apply_fn, params, images, base_size,
                                         crop_size)
        b, hh, ww, d = canvas.shape
        px = jnp.clip(px, 0, ww - 1)
        py = jnp.clip(py, 0, hh - 1)
        return jax.vmap(lambda c, x, y: c[y, x])(canvas, px, py)
    return _features_at_points_halfres(apply_fn, params, images, px, py,
                                       base_size, crop_size)


def _features_at_points_halfres(apply_fn, params, images, px, py,
                                base_size: int, crop_size: int
                                ) -> jnp.ndarray:
    b, h, w, _ = images.shape
    height, width, ph, pw, crops = plan_windows(h, w, base_size, crop_size)
    x = images if (h, w) == (height, width) \
        else resize_bilinear_align_corners(images, height, width)
    pad = _pad_value()
    canvas_in = jnp.broadcast_to(jnp.asarray(pad), (b, ph, pw, 3))
    canvas_in = canvas_in.at[:, :height, :width, :].set(x)

    crop_batch = []
    for (h0, h1, w0, w1) in crops:
        piece = canvas_in[:, h0:h1, w0:w1, :]
        if (h1 - h0, w1 - w0) != (crop_size, crop_size):
            full = jnp.broadcast_to(jnp.asarray(pad),
                                    (b, crop_size, crop_size, 3))
            piece = full.at[:, :h1 - h0, :w1 - w0, :].set(piece)
        crop_batch.append(piece)
    feats = apply_fn(params, jnp.concatenate(crop_batch, axis=0))
    hh = feats.shape[1]
    if hh * 2 != crop_size:
        raise ValueError(
            f"half-res apply returned {hh}, expected {crop_size // 2}")
    d = feats.shape[-1]
    n = px.shape[1]
    nc = len(crops)

    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    # half-res align-corners coordinate map: full i -> i * (hh-1)/(2hh-1)
    scale = (hh - 1) / (crop_size - 1)

    # per-crop local coords, stacked on the crop axis so all crops' corner
    # gathers fuse into FOUR large takes (profile r3: eight smaller gathers
    # were launch-bound at ~15% of the build step)
    w0s = jnp.asarray([c[2] for c in crops], jnp.float32)[:, None, None]
    h0s = jnp.asarray([c[0] for c in crops], jnp.float32)[:, None, None]
    w1s = jnp.asarray([c[3] for c in crops], jnp.float32)[:, None, None]
    h1s = jnp.asarray([c[1] for c in crops], jnp.float32)[:, None, None]
    lx = pxf[None] - w0s  # (nc, B, N)
    ly = pyf[None] - h0s
    inside = ((pxf[None] >= w0s) & (pxf[None] < w1s)
              & (pyf[None] >= h0s) & (pyf[None] < h1s))
    sx = jnp.clip(lx, 0, crop_size - 1) * scale
    sy = jnp.clip(ly, 0, crop_size - 1) * scale
    val = bilinear_patch_sample(feats, sx.reshape(nc * b, n),
                                sy.reshape(nc * b, n))
    m = inside.reshape(nc, b, n, 1).astype(jnp.float32)
    acc = jnp.sum(val.astype(jnp.float32).reshape(nc, b, n, d) * m, axis=0)
    cnt = jnp.sum(m, axis=0)
    return acc / jnp.maximum(cnt, 1.0)
