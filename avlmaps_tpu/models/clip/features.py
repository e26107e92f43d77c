"""High-level CLIP feature APIs: prompt templates, batched text/image
features, and map scoring.

Mirrors the reference's avlmaps/utils/clip_utils.py surface (templates
:10-74, get_text_feats :133-149, get_text_feats_multiple_templates :152-159,
get_lseg_score :196-242) re-hosted on the flax encoders: tokenisation on the
host, one jitted forward per (padded) batch on TPU, normalisation fused.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from avlmaps_tpu.models.clip.model import (
    Clip, ClipConfig, CLIP_VARIANTS, preprocess_images,
)
from avlmaps_tpu.models.clip.tokenizer import ClipTokenizer, default_tokenizer
from avlmaps_tpu.ops.similarity import score_argmax, score_features

# The 64 prompt-ensembling templates published with OpenAI CLIP's prompt
# engineering notebook (same set the reference embeds at clip_utils.py:10-74).
# These are public prompt data, not code.
MULTIPLE_TEMPLATES = [
    "There is {} in the scene.",
    "There is the {} in the scene.",
    "a photo of {} in the scene.",
    "a photo of the {} in the scene.",
    "a photo of one {} in the scene.",
    "I took a picture of of {}.",
    "I took a picture of of my {}.",
    "I took a picture of of the {}.",
    "a photo of {}.",
    "a photo of my {}.",
    "a photo of the {}.",
    "a photo of one {}.",
    "a photo of many {}.",
    "a good photo of {}.",
    "a good photo of the {}.",
    "a bad photo of {}.",
    "a bad photo of the {}.",
    "a photo of a nice {}.",
    "a photo of the nice {}.",
    "a photo of a cool {}.",
    "a photo of the cool {}.",
    "a photo of a weird {}.",
    "a photo of the weird {}.",
    "a photo of a small {}.",
    "a photo of the small {}.",
    "a photo of a large {}.",
    "a photo of the large {}.",
    "a photo of a clean {}.",
    "a photo of the clean {}.",
    "a photo of a dirty {}.",
    "a photo of the dirty {}.",
    "a bright photo of {}.",
    "a bright photo of the {}.",
    "a dark photo of {}.",
    "a dark photo of the {}.",
    "a photo of a hard to see {}.",
    "a photo of the hard to see {}.",
    "a low resolution photo of {}.",
    "a low resolution photo of the {}.",
    "a cropped photo of {}.",
    "a cropped photo of the {}.",
    "a close-up photo of {}.",
    "a close-up photo of the {}.",
    "a jpeg corrupted photo of {}.",
    "a jpeg corrupted photo of the {}.",
    "a blurry photo of {}.",
    "a blurry photo of the {}.",
    "a pixelated photo of {}.",
    "a pixelated photo of the {}.",
    "a black and white photo of the {}.",
    "a black and white photo of {}.",
    "a plastic {}.",
    "the plastic {}.",
    "a toy {}.",
    "the toy {}.",
    "a plushie {}.",
    "the plushie {}.",
    "a cartoon {}.",
    "the cartoon {}.",
    "an embroidered {}.",
    "the embroidered {}.",
    "a painting of the {}.",
    "a painting of a {}.",
]


def _array_fingerprint(a: np.ndarray, samples: int = 1024) -> bytes:
    """Cheap content fingerprint: hash of ``samples`` evenly-spaced rows.
    O(samples*D) regardless of N — catches in-place mutation of a cached
    map without touching the multi-GB array."""
    import hashlib

    flat = a.reshape(-1, a.shape[-1]) if a.ndim > 1 else a.reshape(-1, 1)
    idx = np.linspace(0, flat.shape[0] - 1, min(samples, flat.shape[0]),
                      dtype=np.int64)
    return hashlib.blake2b(np.ascontiguousarray(flat[idx]).tobytes(),
                           digest_size=16).digest()


class ClipEncoder:
    """Stateful convenience wrapper: config + params + jitted forwards.

    ``params=None`` initialises random weights (architecture-correct; used
    for benchmarking and tests where no checkpoint is available).
    """

    def __init__(self, variant: str = "ViT-B/32",
                 params: Optional[Any] = None,
                 tokenizer: Optional[ClipTokenizer] = None,
                 dtype: Any = jnp.float32, seed: int = 0):
        cfg = CLIP_VARIANTS[variant]
        self.cfg = ClipConfig(**{**cfg.__dict__, "dtype": dtype})
        self.variant = variant
        self.feat_dim = self.cfg.embed_dim
        self.model = Clip(self.cfg)
        self.tokenizer = tokenizer or default_tokenizer()
        if params is None:
            k = jax.random.PRNGKey(seed)
            dummy_tokens = jnp.zeros((1, self.cfg.context_length), jnp.int32)
            dummy_img = jnp.zeros(
                (1, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32)
            params = jax.jit(self.model.init)(k, dummy_tokens, dummy_img)
        self.params = params

        self._encode_text = jax.jit(
            lambda p, t: self.model.apply(p, t, method=Clip.encode_text))
        self._encode_image = jax.jit(
            lambda p, x: self.model.apply(p, x, method=Clip.encode_image))

    @classmethod
    def from_config(cls, cfg: ClipConfig, seed: int = 0,
                    tokenizer: Optional[ClipTokenizer] = None
                    ) -> "ClipEncoder":
        """Build from an explicit config (tests / custom sizes)."""
        enc = cls.__new__(cls)
        enc.cfg = cfg
        enc.variant = "custom"
        enc.feat_dim = cfg.embed_dim
        enc.model = Clip(cfg)
        enc.tokenizer = tokenizer or default_tokenizer()
        k = jax.random.PRNGKey(seed)
        enc.params = jax.jit(enc.model.init)(
            k, jnp.zeros((1, cfg.context_length), jnp.int32),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32))
        enc._encode_text = jax.jit(
            lambda p, t: enc.model.apply(p, t, method=Clip.encode_text))
        enc._encode_image = jax.jit(
            lambda p, x: enc.model.apply(p, x, method=Clip.encode_image))
        return enc

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "ClipEncoder":
        from avlmaps_tpu.models.clip.port import load_clip_checkpoint

        cfg, variables = load_clip_checkpoint(path)
        enc = cls.__new__(cls)
        enc.cfg = cfg
        enc.variant = "checkpoint"
        enc.feat_dim = cfg.embed_dim
        enc.model = Clip(cfg)
        enc.tokenizer = kw.get("tokenizer") or default_tokenizer()
        enc.params = variables
        enc._encode_text = jax.jit(
            lambda p, t: enc.model.apply(p, t, method=Clip.encode_text))
        enc._encode_image = jax.jit(
            lambda p, x: enc.model.apply(p, x, method=Clip.encode_image))
        return enc

    # -- text --------------------------------------------------------------

    def get_text_feats(self, texts: Sequence[str],
                       batch_size: int = 64,
                       as_device: bool = False) -> np.ndarray:
        """L2-normalised text features, (len(texts), embed_dim) float32
        (reference get_text_feats, clip_utils.py:133-149).  Batches are
        padded to ``batch_size`` so only one program is compiled.

        ``as_device=True`` keeps the result in HBM (normalisation on
        device, no D2H fetch) — the internal query path uses it because
        one device_get costs a full tunnel RTT (~68 ms measured) before
        the features are re-uploaded to the score kernel anyway."""
        if not len(texts):
            empty = np.zeros((0, self.feat_dim), np.float32)
            return jnp.asarray(empty) if as_device else empty
        tokens = self.tokenizer(list(texts), self.cfg.context_length)
        chunks = []
        for start in range(0, len(texts), batch_size):
            chunk = tokens[start:start + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.tile(chunk[-1:], (pad, 1))], axis=0)
            feats = self._encode_text(self.params, jnp.asarray(chunk))
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            chunks.append(feats[:batch_size - pad])
        dev = (jnp.concatenate(chunks, axis=0) if len(chunks) > 1
               else chunks[0]).astype(jnp.float32)
        if as_device:
            return dev
        return np.asarray(jax.device_get(dev), np.float32)

    def _template_encoder(self):
        """One jitted program for the whole template ensemble: encode all
        (template, text) pairs, L2-normalise, mean per text.  The previous
        form went through get_text_feats' 64-prompt chunking — one dispatch
        PER TEXT plus separate norm/mean dispatches (~3 ms floor each on
        tunnelled hosts, docs/PROFILE.md) — this is one dispatch total."""
        fn = getattr(self, "_encode_templates", None)
        if fn is None:
            n_t = len(MULTIPLE_TEMPLATES)

            @jax.jit
            def fn(p, tokens):
                feats = self.model.apply(p, tokens, method=Clip.encode_text)
                feats = feats.astype(jnp.float32)
                feats = feats / jnp.linalg.norm(feats, axis=-1,
                                                keepdims=True)
                return feats.reshape(-1, n_t, feats.shape[-1]).mean(axis=1)

            self._encode_templates = fn
        return fn

    def get_text_feats_multiple_templates(self, texts: Sequence[str],
                                          as_device: bool = False
                                          ) -> np.ndarray:
        """Template-ensembled text features: encode every (template, text)
        pair and average per text (reference clip_utils.py:152-159), as a
        single fused device program.  The text axis is bucketed to a power
        of two so repeat queries of any small category count share one
        compile."""
        n = len(texts)
        if not n:
            empty = np.zeros((0, self.feat_dim), np.float32)
            return jnp.asarray(empty) if as_device else empty
        n_t = len(MULTIPLE_TEMPLATES)
        prompts = [t.format(x) for x in texts for t in MULTIPLE_TEMPLATES]
        tokens = self.tokenizer(prompts, self.cfg.context_length)
        n_pad = 1 << max(n - 1, 0).bit_length()
        if n_pad > n:
            tokens = np.concatenate(
                [tokens, np.tile(tokens[-n_t:], (n_pad - n, 1))])
        dev = self._template_encoder()(self.params, jnp.asarray(tokens))[:n]
        return dev if as_device else \
            np.asarray(jax.device_get(dev), np.float32)

    # -- image -------------------------------------------------------------

    def get_img_feats(self, img: np.ndarray) -> np.ndarray:
        """L2-normalised image features for one HWC uint8 image
        (reference get_img_feats, clip_utils.py:96-103)."""
        return self.get_imgs_feats_batch([img], batch_size=1)

    def get_imgs_feats_batch(self, imgs: Sequence[np.ndarray],
                             batch_size: int = 64) -> np.ndarray:
        """Batched image features (reference clip_utils.py:113-130)."""
        out = np.zeros((len(imgs), self.feat_dim), np.float32)
        for start in range(0, len(imgs), batch_size):
            chunk = imgs[start:start + batch_size]
            batch = preprocess_images(chunk, self.cfg.image_size)
            pad = batch_size - batch.shape[0]
            if pad:
                batch = np.concatenate(
                    [batch, np.tile(batch[-1:], (pad, 1, 1, 1))], axis=0)
            feats = np.asarray(
                jax.device_get(self._encode_image(self.params,
                                                  jnp.asarray(batch))),
                np.float32)
            feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
            out[start:start + batch_size] = feats[:batch_size - pad]
        return out

    # -- scoring -----------------------------------------------------------

    def get_lseg_score(self, landmarks: List[str], map_feats: np.ndarray,
                       use_multiple_templates: bool = False,
                       avg_mode: int = 0, add_other: bool = True
                       ) -> np.ndarray:
        """Score map features against landmark texts (reference
        get_lseg_score, clip_utils.py:196-242) with the matmul on TPU."""
        landmarks_other = list(landmarks)
        if add_other and landmarks_other[-1] != "other":
            landmarks_other = landmarks_other + ["other"]

        # text feats stay in HBM end-to-end (as_device): fetching them
        # to host first cost a full tunnel RTT per query
        if use_multiple_templates and avg_mode == 0:
            text_feats = self.get_text_feats_multiple_templates(
                landmarks_other, as_device=True)
        elif use_multiple_templates:
            prompts = [t.format(x) for x in landmarks_other
                       for t in MULTIPLE_TEMPLATES]
            text_feats = self.get_text_feats(prompts, as_device=True)
        else:
            text_feats = self.get_text_feats(landmarks_other,
                                             as_device=True)

        scores = np.asarray(jax.device_get(score_features(
            self._map_feats_device(map_feats), text_feats)))
        if use_multiple_templates and avg_mode == 1:
            scores = scores.reshape(-1, len(landmarks_other),
                                    len(MULTIPLE_TEMPLATES)).mean(axis=2)
        return scores

    def _map_feats_device(self, map_feats: np.ndarray) -> jnp.ndarray:
        """Device-resident flattened map features, cached across queries —
        repeated index queries over the same map must not re-upload the
        multi-GB (N, D) matrix every call.

        The cache key is (object id, shape, content fingerprint): 1024
        evenly-spaced rows are hashed so in-place mutation of the same
        array is detected and re-uploads instead of silently reusing stale
        device features (ADVICE r2).  The fingerprint is SAMPLED — a
        mutation confined to a narrow unsampled slice can evade it; after
        partial in-place edits call :meth:`drop_map_cache` explicitly
        (also releases the HBM copy when done querying a map)."""
        key = (id(map_feats), map_feats.shape,
               _array_fingerprint(map_feats))
        if getattr(self, "_map_dev_key", None) != key:
            flat = map_feats.reshape(-1, map_feats.shape[-1])
            self._map_dev = jnp.asarray(flat)
            self._map_dev_key = key
        return self._map_dev

    def drop_map_cache(self) -> None:
        """Release the cached device copy of the last-queried map (frees
        the multi-GB HBM buffer; the next query re-uploads)."""
        self._map_dev = None
        self._map_dev_key = None

    def get_lseg_argmax(self, landmarks: List[str], map_feats: np.ndarray,
                        use_multiple_templates: bool = False,
                        avg_mode: int = 0, add_other: bool = True
                        ) -> np.ndarray:
        """Per-voxel best-landmark index, (N,) int32 — the fused-kernel
        fast path for the reference's score-then-np.argmax pattern
        (clip_utils.py:196-242 + vlmap.py:123-125): the (N, C) score
        matrix never leaves the device (only N int32 come back)."""
        if use_multiple_templates and avg_mode == 1:
            # template-averaged scores can't fuse; fall back
            scores = self.get_lseg_score(landmarks, map_feats,
                                         use_multiple_templates, avg_mode,
                                         add_other)
            return np.argmax(scores, axis=1).astype(np.int32)
        landmarks_other = list(landmarks)
        if add_other and landmarks_other[-1] != "other":
            landmarks_other = landmarks_other + ["other"]
        if use_multiple_templates:
            text_feats = self.get_text_feats_multiple_templates(
                landmarks_other, as_device=True)
        else:
            text_feats = self.get_text_feats(landmarks_other,
                                             as_device=True)
        return np.asarray(jax.device_get(score_argmax(
            self._map_feats_device(map_feats), text_feats)))
