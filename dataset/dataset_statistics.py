"""Count generated audio sequences / events per scene
(reference dataset/dataset_statistics.py:21-52)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--level", default="level_3")
    args = parser.parse_args()

    dataset = Path(args.data_dir) / "vlmaps_dataset"
    total_seqs = total_events = 0
    for scene_dir in sorted(d for d in dataset.iterdir() if d.is_dir()):
        audio_video = scene_dir / "audio_video"
        if not audio_video.exists():
            continue
        n_seqs = n_events = 0
        for seq_dir in sorted(d for d in audio_video.iterdir()
                              if d.is_dir()):
            meta = seq_dir / f"range_and_audio_meta_{args.level}.txt"
            wav = seq_dir / "audio.wav"
            if wav.exists() or meta.exists():
                n_seqs += 1
            if meta.exists():
                n_events += sum(1 for line in meta.read_text().splitlines()
                                if line.strip())
        print(f"{scene_dir.name}: {n_seqs} audio sequences, "
              f"{n_events} sound events")
        total_seqs += n_seqs
        total_events += n_events
    print(f"TOTAL: {total_seqs} sequences, {total_events} events")


if __name__ == "__main__":
    main()
