"""Build the AVLMap for one scene (reference application/create_map.py).

Usage:
  python application/create_map.py --data-dir /path/to/avlmaps_data \
      [--scene-id 0] [--config path/to/cfg.yaml]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from avlmaps_tpu.config import load_config
from avlmaps_tpu.map.avlmap import AVLMap


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", required=True,
                        help="root dir containing avlmaps_dataset/")
    parser.add_argument("--scene-id", type=int, default=0)
    parser.add_argument("--config", default=None, help="optional YAML config")
    parser.add_argument("--pack-first", action="store_true",
                        help="pack the scene to scene.avpack before building "
                             "(decode-once ingestion, pipeline/packed.py); "
                             "subsequent builds auto-detect the pack")
    args = parser.parse_args()

    config = load_config(args.config)
    config.data_paths.avlmaps_data_dir = args.data_dir
    config.scene_id = args.scene_id

    dataset = Path(args.data_dir) / "avlmaps_dataset"
    if not dataset.exists():
        dataset = Path(args.data_dir) / "vlmaps_dataset"
    data_dirs = sorted([x for x in dataset.iterdir() if x.is_dir()])

    scene_dir = data_dirs[config.scene_id]
    if args.pack_first and not (scene_dir / "scene.avpack").exists():
        from tools.pack_scene import main as pack_main

        pack_main([str(scene_dir)])

    avlmap = AVLMap(config, data_dir=str(data_dirs[config.scene_id]))
    avlmap.create_map(data_dirs[config.scene_id])
    print(f"map created for {data_dirs[config.scene_id]}")


if __name__ == "__main__":
    main()
