"""Port the reference's downloaded checkpoints into flax parameter files.

Usage:
  python tools/port_checkpoints.py --lseg demo_e200.ckpt \
      --clip ViT-B-32.pt --audioclip AudioCLIP-Partial-Training.pt \
      --superpoint superpoint_v1.pth --wav2clip wav2clip.pt --out ported/

Each provided checkpoint is converted with the corresponding porter
(models/{lseg,clip,audioclip}/port.py) and written as a msgpack file loadable
with flax.serialization — the runtime encoders accept the resulting trees
directly (LSegNet.apply / ClipEncoder(params=...) / AudioClipEncoder).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

# checkpoint flag -> (manifest name, loader that yields the raw state dict
# exactly as the porter will see it)
MANIFEST_FOR = {
    "lseg": "lseg_demo_e200",
    "clip": "clip_vitb32",
    "audioclip": "audioclip_partial",
    "superpoint": "superpoint_v1",
    "superglue": "superglue_indoor",
    "netvlad": "netvlad_pitts30k",
    "wav2clip": "wav2clip_resnet18",
}


def _manifest_name(flag: str, path: str) -> str | None:
    name = MANIFEST_FOR.get(flag)
    if flag == "superglue" and "outdoor" in Path(path).name.lower():
        return "superglue_outdoor"
    return name


def _flatten_netvlad_mat(path: str) -> dict:
    """Flat manifest-key view of a matconvnet NetVLAD file: weighted
    layers enumerated in order as ``layers.<i>_<name>.weights.<j>`` plus
    the averageImage — the inverse of ckpt_manifest.assemble_netvlad_mat's
    key scheme (relu/pool layers carry no arrays and are skipped, so the
    enumeration is interleaving-insensitive)."""
    import numpy as np
    from scipy.io import loadmat

    from avlmaps_tpu.models.netvlad.port import _as_list, _weights_pair

    net = loadmat(path, simplify_cells=True)["net"]
    out = {}
    i = 0
    for layer in _as_list(net["layers"]):
        if not isinstance(layer, dict) or _weights_pair(layer) is None:
            continue
        for j, w in enumerate(_as_list(layer["weights"])):
            out[f"layers.{i:02d}_{layer.get('name', '')}.weights.{j}"] = \
                np.asarray(w)
        i += 1
    meta = net.get("meta")
    if isinstance(meta, dict):
        norm = meta.get("normalization")
        if isinstance(norm, dict) and "averageImage" in norm:
            out["meta.normalization.averageImage"] = np.asarray(
                norm["averageImage"])
    return out


def _raw_state_dict(flag: str, path: str):
    if flag == "netvlad":
        return _flatten_netvlad_mat(path)
    import torch

    if flag == "clip":
        try:
            return torch.jit.load(path, map_location="cpu").state_dict()
        except RuntimeError:
            pass
    sd = torch.load(path, map_location="cpu", weights_only=False)
    return sd.get("state_dict", sd) if isinstance(sd, dict) else sd


def check_against_manifest(flag: str, path: str, strict: bool) -> None:
    """Diff the real checkpoint's keys/shapes against the recorded contract
    (tools/ckpt_manifests/, VERDICT r3 #4) BEFORE porting, so structural
    drift is reported as a summary instead of a porter KeyError."""
    from ckpt_manifest import diff_state_dict, format_diff, load_manifest

    name = _manifest_name(flag, path)
    if name is None or str(path).endswith(".msgpack"):
        return
    try:
        manifest = load_manifest(name)
    except FileNotFoundError:
        print(f"  [{flag}] no manifest {name}.json — skipping contract "
              "check (run tools/gen_ckpt_manifests.py)")
        return
    diff = diff_state_dict(_raw_state_dict(flag, path), manifest)
    drift = any(diff.values())
    print(f"  [{flag}] manifest {name}: {format_diff(diff)}")
    if strict and drift:
        raise SystemExit(
            f"{path} drifts from {name}.json; re-pin with "
            "--record-manifests once the file is verified, or port "
            "without --strict-manifest")


def record_manifests(args) -> None:
    """Re-pin manifests from the real downloaded files (ground truth
    supersedes the derived enumeration)."""
    from ckpt_manifest import MANIFEST_DIR, record_manifest, save_manifest

    for flag in MANIFEST_FOR:
        path = getattr(args, flag)
        if not path:
            continue
        name = _manifest_name(flag, path)
        sd = _raw_state_dict(flag, path)
        manifest = record_manifest(
            sd, artifact=Path(path).name, source=str(path),
            container="matconvnet" if flag == "netvlad" else "state_dict")
        save_manifest(manifest, MANIFEST_DIR / f"{name}.json")
        print(f"re-pinned {name}.json from {path} "
              f"({len(manifest['keys'])} keys)")


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
    parser.add_argument("--superpoint", help="superpoint_v1.pth path")
    parser.add_argument("--superglue",
                        help="superglue_{indoor,outdoor}.pth path")
    parser.add_argument("--wav2clip",
                        help="wav2clip resnet18 state-dict path")
    parser.add_argument("--netvlad",
                        help="matconvnet Pitts30K NetVLAD .mat path")
    parser.add_argument("--lseg-layers", type=int, default=24,
                        help="ViT depth of the LSeg checkpoint")
    parser.add_argument("--out", default="ported")
    parser.add_argument("--strict-manifest", action="store_true",
                        help="fail (instead of warn) when a checkpoint "
                             "drifts from its tools/ckpt_manifests contract")
    parser.add_argument("--record-manifests", action="store_true",
                        help="re-pin tools/ckpt_manifests/*.json from the "
                             "given real files instead of porting")
    args = parser.parse_args()
    out = Path(args.out)

    if args.record_manifests:
        record_manifests(args)
        return
    for flag in MANIFEST_FOR:
        if getattr(args, flag):
            check_against_manifest(flag, getattr(args, flag),
                                   args.strict_manifest)

    if args.lseg:
        from avlmaps_tpu.models.lseg.port import load_lseg_checkpoint

        save_tree(load_lseg_checkpoint(args.lseg, vit_layers=args.lseg_layers),
                  out / "lseg.msgpack")
    if args.clip:
        from avlmaps_tpu.models.clip.port import load_clip_checkpoint

        from avlmaps_tpu.models.clip.port import config_to_jsonable

        cfg, variables = load_clip_checkpoint(args.clip)
        save_tree(variables, out / "clip.msgpack")
        (out / "clip.config.json").write_text(
            json.dumps(config_to_jsonable(cfg)))
        print(f"  clip config: embed={cfg.embed_dim} "
              f"vision={cfg.vision_width}x{cfg.vision_layers} "
              f"text={cfg.text_width}x{cfg.text_layers}")
    if args.audioclip:
        from avlmaps_tpu.models.audioclip.port import (
            config_to_jsonable as ac_config_to_jsonable,
            load_audioclip_checkpoint_with_config,
        )

        ac_cfg, ac_vars = load_audioclip_checkpoint_with_config(
            args.audioclip)
        save_tree(ac_vars, out / "audioclip.msgpack")
        (out / "audioclip.config.json").write_text(
            json.dumps(ac_config_to_jsonable(ac_cfg)))
    if args.superpoint:
        from avlmaps_tpu.models.superpoint.port import (
            load_superpoint_checkpoint,
        )

        sp_cfg, sp_vars = load_superpoint_checkpoint(args.superpoint)
        save_tree(sp_vars, out / "superpoint.msgpack")
        print(f"  superpoint config: channels={sp_cfg.channels} "
              f"desc={sp_cfg.desc_dim}")
    if args.superglue:
        from avlmaps_tpu.models.superglue.port import (
            load_superglue_checkpoint,
        )

        sg_cfg, sg_vars = load_superglue_checkpoint(args.superglue)
        sg_out = ("superglue_outdoor.msgpack"
                  if "outdoor" in Path(args.superglue).name.lower()
                  else "superglue.msgpack")
        save_tree(sg_vars, out / sg_out)
        print(f"  superglue config: desc={sg_cfg.desc_dim} "
              f"layers={sg_cfg.gnn_layers}")
    if args.wav2clip:
        import torch

        from avlmaps_tpu.models.wav2clip import port_wav2clip_state_dict

        sd = torch.load(args.wav2clip, map_location="cpu",
                        weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        save_tree(port_wav2clip_state_dict(sd), out / "wav2clip.msgpack")
    if args.netvlad:
        from avlmaps_tpu.models.netvlad.port import load_netvlad_mat

        nv_params, nv_avg, nv_cfg = load_netvlad_mat(args.netvlad)
        save_tree(nv_params, out / "netvlad.msgpack")
        (out / "netvlad.config.json").write_text(json.dumps({
            "clusters": nv_cfg.clusters, "dim": nv_cfg.dim,
            "whiten_dim": nv_cfg.whiten_dim,
            "average_image": [float(v) for v in nv_avg]}))
        print(f"  netvlad config: clusters={nv_cfg.clusters} "
              f"dim={nv_cfg.dim} whiten={nv_cfg.whiten_dim}")
    if not (args.lseg or args.clip or args.audioclip or args.superpoint
            or args.superglue or args.wav2clip or args.netvlad):
        parser.error("provide at least one checkpoint path")


if __name__ == "__main__":
    main()
