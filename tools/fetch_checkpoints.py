"""Fetch the reference's pretrained checkpoints and port them to flax.

The reference ships a download script (download_checkpoints.bash:1-14) that
pulls the AudioCLIP release assets from GitHub and the LSeg demo checkpoint
from Google Drive; SuperPoint/SuperGlue/NetVLAD weights come from their
upstream repos (hloc's fetch paths).  This is the equivalent entry point:

  python tools/fetch_checkpoints.py --dest checkpoints/ [--port ported/]

Network-gated like ffmpeg/habitat/gdown elsewhere in the tree: every asset
that cannot be fetched prints its URL and the exact offline procedure
instead of failing the rest.  With --port, every checkpoint that IS present
afterwards is converted with tools/port_checkpoints.py into msgpack trees
the runtime encoders load directly.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import urllib.error
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Direct-download assets (reference download_checkpoints.bash:2-5 plus the
# upstream weights the reference assumes are already on disk).
HTTP_ASSETS = {
    "AudioCLIP-Partial-Training.pt":
        "https://github.com/AndreyGuzhov/AudioCLIP/releases/download/v0.1/"
        "AudioCLIP-Partial-Training.pt",
    "bpe_simple_vocab_16e6.txt.gz":
        "https://github.com/AndreyGuzhov/AudioCLIP/releases/download/v0.1/"
        "bpe_simple_vocab_16e6.txt.gz",
    "superpoint_v1.pth":
        "https://github.com/magicleap/SuperPointPretrainedNetwork/raw/master/"
        "superpoint_v1.pth",
    "superglue_indoor.pth":
        "https://github.com/magicleap/SuperGluePretrainedNetwork/raw/master/"
        "models/weights/superglue_indoor.pth",
    "ViT-B-32.pt":
        "https://openaipublic.azureedge.net/clip/models/"
        "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/"
        "ViT-B-32.pt",
    "superglue_outdoor.pth":
        "https://github.com/magicleap/SuperGluePretrainedNetwork/raw/master/"
        "models/weights/superglue_outdoor.pth",
    "Pitts30K_struct.mat":
        "https://cvg-data.inf.ethz.ch/hloc/netvlad/Pitts30K_struct.mat",
    "Wav2CLIP.pt":
        "https://github.com/descriptinc/lyrebird-wav2clip/releases/"
        "download/v0.1.0-alpha/Wav2CLIP.pt",
}

# Google-Drive assets need gdown (reference download_checkpoints.bash:9-11).
GDRIVE_ASSETS = {
    "demo_e200.ckpt":
        "https://drive.google.com/file/d/"
        "1ayk6NXURI_vIPlym16f_RG3ffxBWHxvb/view",
}


def _fetch_http(url: str, out: Path) -> bool:
    try:
        print(f"fetching {url}")
        with urllib.request.urlopen(url, timeout=60) as resp, \
                open(out, "wb") as f:
            while chunk := resp.read(1 << 20):
                f.write(chunk)
        return True
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        print(f"  SKIPPED ({e}); offline procedure: download {url} and "
              f"place it at {out}")
        out.unlink(missing_ok=True)
        return False


def _fetch_gdrive(url: str, out: Path) -> bool:
    try:
        import gdown
    except ImportError:
        print(f"  SKIPPED (gdown not installed); offline procedure: open "
              f"{url} in a browser and save the file as {out}")
        return False
    try:
        print(f"fetching {url}")
        gdown.download(url, str(out), fuzzy=True)
        return out.exists()
    except Exception as e:  # gdown raises plain Exceptions on quota/network
        print(f"  SKIPPED ({e}); offline procedure: open {url} and save "
              f"the file as {out}")
        return False


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dest", default="checkpoints",
                        help="directory for the raw torch checkpoints")
    parser.add_argument("--port", metavar="OUT_DIR",
                        help="after fetching, port everything present to "
                             "flax msgpack trees in OUT_DIR")
    args = parser.parse_args()

    dest = Path(args.dest)
    dest.mkdir(parents=True, exist_ok=True)
    present: dict[str, Path] = {}
    for name, url in HTTP_ASSETS.items():
        out = dest / name
        if out.exists() or _fetch_http(url, out):
            present[name] = out
    for name, url in GDRIVE_ASSETS.items():
        out = dest / name
        if out.exists() or _fetch_gdrive(url, out):
            present[name] = out

    print(f"\n{len(present)}/{len(HTTP_ASSETS) + len(GDRIVE_ASSETS)} "
          f"checkpoints available in {dest}")
    if not args.port:
        return

    port_args = [sys.executable, str(REPO / "tools" / "port_checkpoints.py"),
                 "--out", args.port]
    flag_for = {"demo_e200.ckpt": "--lseg", "ViT-B-32.pt": "--clip",
                "AudioCLIP-Partial-Training.pt": "--audioclip",
                "superpoint_v1.pth": "--superpoint",
                "superglue_indoor.pth": "--superglue",
                "Pitts30K_struct.mat": "--netvlad",
                "Wav2CLIP.pt": "--wav2clip"}
    for name, flag in flag_for.items():
        if name in present:
            port_args += [flag, str(present[name])]
    if len(port_args) <= 4 and "superglue_outdoor.pth" not in present:
        print("nothing to port")
        return
    rc = 0
    if len(port_args) > 4:
        print("porting:", " ".join(port_args[1:]))
        rc = subprocess.call(port_args)
    if "superglue_outdoor.pth" in present:
        # second pass: --superglue takes one path per invocation; the port
        # CLI picks the superglue_outdoor manifest + output name by filename
        outdoor_args = port_args[:4] + [
            "--superglue", str(present["superglue_outdoor.pth"])]
        print("porting:", " ".join(outdoor_args[1:]))
        rc = subprocess.call(outdoor_args) or rc
    raise SystemExit(rc)


if __name__ == "__main__":
    main()
