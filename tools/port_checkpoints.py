"""Port the reference's downloaded checkpoints into flax parameter files.

Usage:
  python tools/port_checkpoints.py --lseg demo_e200.ckpt \
      --clip ViT-B-32.pt --audioclip AudioCLIP-Partial-Training.pt \
      --out ported/

Each provided checkpoint is converted with the corresponding porter
(models/{lseg,clip,audioclip}/port.py) and written as a msgpack file loadable
with flax.serialization — the runtime encoders accept the resulting trees
directly (LSegNet.apply / ClipEncoder(params=...) / AudioClipEncoder).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def save_tree(variables, out_path: Path) -> None:
    from flax import serialization

    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(serialization.to_bytes(variables))
    print(f"wrote {out_path}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lseg", help="demo_e200.ckpt path")
    parser.add_argument("--clip", help="OpenAI CLIP .pt path")
    parser.add_argument("--audioclip",
                        help="AudioCLIP-Partial-Training.pt path")
    parser.add_argument("--out", default="ported")
    args = parser.parse_args()
    out = Path(args.out)

    if args.lseg:
        from avlmaps_tpu.models.lseg.port import load_lseg_checkpoint

        save_tree(load_lseg_checkpoint(args.lseg), out / "lseg.msgpack")
    if args.clip:
        from avlmaps_tpu.models.clip.port import load_clip_checkpoint

        cfg, variables = load_clip_checkpoint(args.clip)
        save_tree(variables, out / "clip.msgpack")
        print(f"  clip config: embed={cfg.embed_dim} "
              f"vision={cfg.vision_width}x{cfg.vision_layers} "
              f"text={cfg.text_width}x{cfg.text_layers}")
    if args.audioclip:
        from avlmaps_tpu.models.audioclip.port import (
            load_audioclip_checkpoint,
        )

        save_tree(load_audioclip_checkpoint(args.audioclip),
                  out / "audioclip.msgpack")
    if not (args.lseg or args.clip or args.audioclip):
        parser.error("provide at least one checkpoint path")


if __name__ == "__main__":
    main()
