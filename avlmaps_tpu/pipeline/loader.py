"""Host-side frame pipeline: decode + normalise + batch, prefetched on a
background thread so the TPU never waits on PNG decode.

The reference loads one frame at a time inline with inference
(cv2.imread / np.load per iteration, avlmaps/map/vlmap_builder.py:118-120);
here decode runs ahead of the device through a bounded queue (double
buffering: BASELINE.json north-star's async input pipeline).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclass
class FrameBatch:
    """One host-side batch of frames, ready for device transfer."""

    frame_ids: np.ndarray  # (B,) int32, -1 for padding frames
    rgb: np.ndarray  # (B, H, W, 3) float32, normalised to [-1, 1]
    depth: np.ndarray  # (B, H, W) float32 metres
    pose_tf: np.ndarray  # (B, 4, 4) float32 point-cloud transform (cam->map)


def load_rgb(path) -> np.ndarray:
    """BGR png -> RGB uint8 (reference vlmap_builder.py:118-119)."""
    if cv2 is not None:
        bgr = cv2.imread(str(path))
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def load_depth(path) -> np.ndarray:
    """npy depth (reference mapping_utils.py load_depth_npy)."""
    with open(path, "rb") as f:
        return np.load(f)


def _batch_to_device(batch):
    """Move a Frame/CanvasBatch's payload arrays onto the device, keeping
    ``frame_ids`` as host numpy (the consumer's control loop reads it)."""
    import dataclasses

    import jax

    moved = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if f.name != "frame_ids" and isinstance(v, np.ndarray):
            moved[f.name] = jax.device_put(v)
    return dataclasses.replace(batch, **moved)


class _QueueLoader:
    """Shared producer-thread plumbing: chunk frame ids into fixed-size
    batches on a bounded queue, apply an optional ``transform`` and
    ``device_put`` on the producer thread, re-raise producer failures in
    the consumer.  Subclasses implement ``_n_frames()`` and
    ``_make_batch(chunk)`` (which must pad to ``batch_size`` with repeats,
    frame_id = -1)."""

    batch_size: int
    skip_ids: set
    transform = None
    device_put = False
    _queue: "queue.Queue"

    def _n_frames(self) -> int:
        raise NotImplementedError

    def _make_batch(self, chunk):
        raise NotImplementedError

    def _producer(self):
        try:
            ids = [i for i in range(self._n_frames())
                   if i not in self.skip_ids]
            bs = self.batch_size
            for start in range(0, len(ids), bs):
                batch = self._make_batch(ids[start:start + bs])
                if self.transform is not None:
                    batch = self.transform(batch)
                if self.device_put:
                    batch = _batch_to_device(batch)
                self._queue.put(batch)
            self._queue.put(None)
        except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
            # a dead producer must not leave the consumer blocked forever
            self._queue.put(exc)

    def __iter__(self) -> Iterator:
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()
        while True:
            batch = self._queue.get()
            if batch is None:
                return
            if isinstance(batch, BaseException):
                raise RuntimeError(
                    "frame producer thread failed") from batch
            yield batch

    def __len__(self) -> int:
        n = len([i for i in range(self._n_frames())
                 if i not in self.skip_ids])
        return (n + self.batch_size - 1) // self.batch_size


class PrefetchLoader(_QueueLoader):
    """Bounded-queue background prefetcher yielding fixed-size FrameBatches.

    The last batch is padded with repeats (frame_id = -1) so every device
    step sees the same static shapes.
    """

    def __init__(self, rgb_paths: Sequence, depth_paths: Sequence,
                 pose_tfs: Sequence[np.ndarray], batch_size: int = 4,
                 depth: int = 4, normalize=None,
                 skip_ids: Optional[set] = None, depth_mm: bool = False,
                 transform=None, device_put: bool = False):
        """``normalize``: None -> the LSeg host normalisation (float32
        batches); False -> raw uint8 RGB — 4x less host->device traffic and
        no per-pixel host float math (normalise on device instead, see
        make_frame_step(rgb_uint8=True)); or a callable.

        ``depth_mm=True`` ships depth as uint16 millimetres (halves the
        depth bytes; 0.5 mm quantisation « the 5 cm voxel) — pair with a
        step that rescales on device (make_frame_step handles it).

        ``transform``: optional ``FrameBatch -> Any`` applied on the
        producer thread (e.g. pipeline.transport.make_canvas_transform) so
        per-batch host prep overlaps the device link.

        ``device_put=True`` additionally moves the batch's arrays to the
        device ON THE PRODUCER THREAD (frame_ids stays host numpy for the
        control loop): the host->device transfer overlaps the next batch's
        decode instead of serialising with the consumer's step dispatch —
        on hosts with a slow device link that serialisation is most of the
        device-vs-e2e fps gap.  jnp.asarray on an already-device array is
        a no-op, so consumers are unchanged."""
        from avlmaps_tpu.models.lseg.window import normalize_image

        self.rgb_paths = list(rgb_paths)
        self.depth_paths = list(depth_paths)
        self.pose_tfs = list(pose_tfs)
        self.batch_size = batch_size
        self.normalize = normalize_image if normalize is None else normalize
        self.skip_ids = skip_ids or set()
        self.depth_mm = depth_mm
        self.transform = transform
        self.device_put = device_put
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread: Optional[threading.Thread] = None

    def _frame(self, i: int):
        rgb = load_rgb(self.rgb_paths[i])
        if self.normalize is not False:
            rgb = self.normalize(rgb).astype(np.float32)
        depth = load_depth(self.depth_paths[i])
        if depth.ndim == 3:
            depth = depth[..., 0]
        if self.depth_mm:
            depth = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        else:
            depth = depth.astype(np.float32)
        return rgb, depth, np.asarray(self.pose_tfs[i], np.float32)

    def _n_frames(self) -> int:
        return len(self.rgb_paths)

    def _make_batch(self, chunk) -> FrameBatch:
        bs = self.batch_size
        frames = [self._frame(i) for i in chunk]
        while len(frames) < bs:  # pad with repeats, marked invalid
            frames.append(frames[-1])
        fids = np.array(list(chunk) + [-1] * (bs - len(chunk)), np.int32)
        return FrameBatch(
            frame_ids=fids,
            rgb=np.stack([f[0] for f in frames]),
            depth=np.stack([f[1] for f in frames]),
            pose_tf=np.stack([f[2] for f in frames]),
        )


def load_pose(path):
    """Single-line ``px py pz qx qy qz qw`` pose file -> (pos (3,1), rot
    (3,3)) (reference mapping_utils.load_pose, :75-85)."""
    from avlmaps_tpu.geometry.transforms import quat_xyzw_to_matrix

    with open(path) as f:
        row = [float(x) for x in f.readline().split()]
    pos = np.asarray(row[:3], float).reshape(3, 1)
    return pos, quat_xyzw_to_matrix(np.asarray(row[3:], float))


def load_calib(path) -> np.ndarray:
    """ROS-style camera-calibration YAML -> 3x3 intrinsics (reference
    mapping_utils.load_calib, :64-72: skips the first two header lines)."""
    import yaml

    with open(path) as f:
        f.readline()
        f.readline()
        data = yaml.safe_load(f)
    arr = data["camera_matrix"]["data"]
    return np.asarray([float(x) for x in arr], np.float32).reshape(3, 3)


def load_obj2cls_dict(path) -> dict:
    """``obj_id: cls_id, cls_name`` lines -> {obj_id: (cls_id, name)}
    (reference mapping_utils.load_obj2cls_dict, :625-635) — the semantic
    object->class remap consumed by robot.sim.save_obs."""
    out = {}
    with open(path) as f:
        for line in f:
            row = line.split(":")
            if len(row) < 2:
                continue
            obj_id = int(row[0])
            cls_id = int(row[1].split(",")[0].strip())
            cls_name = row[1].split(",")[1].strip()
            out[obj_id] = (cls_id, cls_name)
    return out
