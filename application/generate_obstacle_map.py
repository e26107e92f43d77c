"""Show / save the raw and CLIP-customised obstacle maps
(reference application/generate_obstacle_map.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from avlmaps_tpu.config import load_config
from avlmaps_tpu.robot.lang_robot import LangRobot


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--scene-id", type=int, default=0)
    parser.add_argument("--config", default=None)
    parser.add_argument("--out-prefix", default="obstacles")
    args = parser.parse_args()

    import cv2

    config = load_config(args.config)
    dataset = Path(args.data_dir) / "avlmaps_dataset"
    if not dataset.exists():  # same fallback as create_map/index_map
        dataset = Path(args.data_dir) / "vlmaps_dataset"
    data_dirs = sorted([x for x in dataset.iterdir() if x.is_dir()])

    robot = LangRobot(config)
    robot.load_scene_map(data_dirs[args.scene_id], config.map_config)
    obs = (robot.map.obstacles_cropped.astype(np.uint8)) * 255
    cv2.imwrite(f"{args.out_prefix}_raw.png", obs)

    robot.map.customize_obstacle_map(
        config.map_config.potential_obstacle_names,
        config.map_config.obstacle_names)
    custom = (robot.map.get_customized_obstacle_cropped()
              .astype(np.uint8)) * 255
    cv2.imwrite(f"{args.out_prefix}_customized.png", custom)
    print(f"wrote {args.out_prefix}_raw.png and "
          f"{args.out_prefix}_customized.png")


if __name__ == "__main__":
    main()
