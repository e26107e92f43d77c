"""Dataset generation: render RGB-D-semantic sequences at recorded poses and
synthesise ESC-50-augmented audio tracks.

Reference: dataset/generate_dataset.py + avlmaps/utils/audio_utils.py.
Stage gating: scene rendering needs habitat-sim (skipped with a message when
absent); audio synthesis is ffmpeg-FREE here — sounds are mixed into a wav
directly with numpy (the reference shells out to ffmpeg amix/adelay,
audio_utils.py:125-227), and the per-sequence ``audio.wav`` output is
exactly what SoundMap consumes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from avlmaps_tpu.config import load_config
from avlmaps_tpu.robot.sim import HABITAT_AVAILABLE
from avlmaps_tpu.utils.audio import read_wav, write_wav
from avlmaps_tpu.utils.esc50 import ESC50Meta


# ---------------------------------------------------------------------------
# stage 1: render frames at poses (habitat-gated)
# ---------------------------------------------------------------------------


def generate_scene_data(save_dir: Path, scene_path: Path, poses: np.ndarray,
                        camera_height: float = 1.5, width: int = 640,
                        height: int = 480) -> None:
    """Render rgb/depth/semantic at each recorded pose
    (reference generate_scene_data, dataset/generate_dataset.py:42-96)."""
    if not HABITAT_AVAILABLE:
        print("habitat-sim not installed: skipping scene rendering "
              f"for {scene_path}")
        return
    import cv2
    from avlmaps_tpu.robot.sim import HabitatSimulator
    from avlmaps_tpu.geometry.transforms import pose_vec_to_tf

    sim = HabitatSimulator(str(scene_path), {
        "sensor_height": camera_height, "width": width, "height": height,
        "color_sensor": True, "depth_sensor": True, "semantic_sensor": True,
    })
    (save_dir / "rgb").mkdir(parents=True, exist_ok=True)
    (save_dir / "depth").mkdir(exist_ok=True)
    (save_dir / "semantic").mkdir(exist_ok=True)
    for i, pose in enumerate(poses):
        out_rgb = save_dir / "rgb" / f"{i:06d}.png"
        if out_rgb.exists():
            continue
        sim.set_agent_tf(pose_vec_to_tf(pose))
        obs = sim.get_observation()
        cv2.imwrite(str(out_rgb), obs["color_sensor"][:, :, [2, 1, 0]])
        np.save(save_dir / "depth" / f"{i:06d}.npy", obs["depth_sensor"])
        if "semantic_sensor" in obs:
            np.save(save_dir / "semantic" / f"{i:06d}.npy",
                    obs["semantic_sensor"])
    sim.close()


# ---------------------------------------------------------------------------
# stage 2: audio slot selection (pure geometry)
# ---------------------------------------------------------------------------


def select_audio_frames(poses: np.ndarray, avoid_pos: np.ndarray,
                        fps: float = 25, clip_s: float = 5.0,
                        min_dist: float = 2.0
                        ) -> Tuple[List[Tuple[int, int]], np.ndarray]:
    """Pick clip_s-long frame windows whose trajectory stays >= min_dist
    away from all previously-used sound positions (reference
    select_audio_frames, audio_utils.py:49-91)."""
    seq_pos = poses[:, :3]
    pairs: List[Tuple[int, int]] = []
    l = 0
    n = seq_pos.shape[0]
    while l < n:
        r = min(l + int(clip_s * fps), n - 1)
        group = seq_pos[l:r]
        if group.shape[0] == 0:
            break
        dists = np.linalg.norm(group[:, None, :] - avoid_pos[None], axis=-1)
        if dists.min() > min_dist:
            pairs.append((l, r))
            avoid_pos = np.concatenate(
                [avoid_pos, np.unique(group, axis=0)], axis=0)
            l = r + int(fps)
            continue
        near = np.where(dists.min(axis=1) <= min_dist + 1.0)[0] + l
        l = int(near.max()) + 1
    return pairs, avoid_pos


# ---------------------------------------------------------------------------
# stage 3: sound insertion (numpy mixing, ffmpeg-free)
# ---------------------------------------------------------------------------


def assign_sounds_to_sequence(seq_dir: Path, esc50: ESC50Meta,
                              categories: List[str], frame_pairs,
                              fps: float, sample_rate: int,
                              rng: np.random.Generator,
                              difficulty_level: str) -> None:
    """Mix one random ESC-50 clip of an allowed category into each selected
    slot of the sequence's soundtrack; write audio.wav + the range/category
    meta file the sound-map consumes (reference assign_sound_to_video,
    audio_utils.py:125-227, without the video mux)."""
    poses = np.loadtxt(seq_dir / "poses.txt")
    duration_s = len(poses) / fps
    track = np.zeros(int(duration_s * sample_rate) + sample_rate,
                     np.float32)
    meta_lines = []
    for (s_frame, e_frame) in frame_pairs:
        cat = categories[int(rng.integers(len(categories)))]
        paths = esc50.paths_for(cat)
        if not paths:
            continue
        clip_path = paths[int(rng.integers(len(paths)))]
        clip, _ = read_wav(clip_path, sample_rate)
        start = int(s_frame / fps * sample_rate)
        end = min(start + clip.shape[0], track.shape[0])
        track[start:end] += clip[:end - start]
        meta_lines.append(f"{s_frame},{e_frame},{clip_path},{cat}")
    write_wav(seq_dir / "audio.wav", np.clip(track, -1, 1), sample_rate)
    meta = seq_dir / f"range_and_audio_meta_{difficulty_level}.txt"
    meta.write_text("\n".join(meta_lines))


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--scene-dir", default="",
                        help="Matterport3D scene dir (habitat rendering)")
    parser.add_argument("--esc50-meta", default="")
    parser.add_argument("--esc50-audio", default="")
    parser.add_argument("--config", default=None)
    args = parser.parse_args()

    cfg = load_config(args.config)
    cc = cfg.sound_data_collect_params
    rng = np.random.default_rng(cc.seed)
    dataset = Path(args.data_dir) / "vlmaps_dataset"
    scene_dirs = sorted([d for d in dataset.iterdir() if d.is_dir()])

    for scene_dir in scene_dirs:
        poses_path = scene_dir / "poses.txt"
        if poses_path.exists() and args.scene_dir:
            scene_name = scene_dir.name.split("_")[0]
            scene_path = (Path(args.scene_dir) / scene_name
                          / f"{scene_name}.glb")
            generate_scene_data(scene_dir, scene_path,
                                np.loadtxt(poses_path),
                                cfg.params.camera_height)

        if not (args.esc50_meta and args.esc50_audio):
            continue
        esc50 = ESC50Meta(args.esc50_meta, args.esc50_audio)
        categories = cfg.sound_config.level_categories(cc.difficulty)
        avoid = np.full((1, 3), np.inf, np.float32)
        audio_video = scene_dir / "audio_video"
        if not audio_video.exists():
            continue
        for seq_dir in sorted(d for d in audio_video.iterdir()
                              if d.is_dir()):
            poses = np.loadtxt(seq_dir / "poses.txt")
            pairs, avoid = select_audio_frames(
                poses, avoid, cc.fps, min_dist=cc.min_dist_between_sound)
            assign_sounds_to_sequence(seq_dir, esc50, categories, pairs,
                                      cc.fps, cc.sample_rate, rng,
                                      cc.difficulty)
        print(f"audio generated for {scene_dir.name}")


if __name__ == "__main__":
    main()
