"""Recall-parity harness (the north-star metric's missing half).

Builds the SAME scene's VLMap twice — (a) with the torch oracle network and
an independent host-loop sequential fusion (the reference's algorithm,
avlmaps/map/vlmap_builder.py:102-183), and (b) with the flax stack through
VLMapBuilder (ported weights, TPU fusion kernels) — then scores both maps
against the same text features and reports landmark top-1 indexing
agreement: the thing the reference's users actually consume
(avlmaps/map/vlmap.py index_map + avlmaps/utils/clip_utils.py:96-159).

Runs end-to-end on synthetic weights out of the box:

    python tools/recall_parity.py --tiny

With real checkpoints (demo_e200.ckpt; weights load into both stacks):

    python tools/recall_parity.py --scene DIR --lseg-ckpt demo_e200.ckpt \
        [--clip-ckpt ViT-B-32.pt --landmarks "chair,table,sofa"]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# ---------------------------------------------------------------------------
# synthetic scene: colored geometric rooms so landmarks differ spatially
# ---------------------------------------------------------------------------


def write_synthetic_scene(root: Path, n_frames: int = 6, h: int = 32,
                          w: int = 32, seed: int = 0) -> Path:
    import cv2

    rng = np.random.default_rng(seed)
    (root / "rgb").mkdir(parents=True, exist_ok=True)
    (root / "depth").mkdir(exist_ok=True)
    poses = []
    for i in range(n_frames):
        # vertical color bands: distinct "objects" at distinct depths
        rgb = np.zeros((h, w, 3), np.uint8)
        for b, color in enumerate([(220, 40, 40), (40, 220, 40),
                                   (40, 40, 220), (220, 220, 40)]):
            rgb[:, b * w // 4:(b + 1) * w // 4] = color
        rgb = np.clip(rgb.astype(np.int32)
                      + rng.integers(-20, 20, rgb.shape), 0, 255
                      ).astype(np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"), rgb[:, :, ::-1])
        depth = np.zeros((h, w), np.float32)
        for b in range(4):
            depth[:, b * w // 4:(b + 1) * w // 4] = 0.4 + 0.25 * b
        depth += rng.uniform(-0.02, 0.02, depth.shape).astype(np.float32)
        np.save(root / "depth" / f"{i:06d}.npy", depth)
        poses.append([0.03 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    np.savetxt(root / "poses.txt", np.asarray(poses))
    return root


# ---------------------------------------------------------------------------
# oracle map build: torch network + numpy sequential fusion
# ---------------------------------------------------------------------------


def oracle_build_map(torch_model, scene: Path, cfg, base2cam, base_tf,
                     out_dim: int, batch_size: int, seed: int):
    """Host-loop map build mirroring the reference algorithm with the torch
    network; consumes the SAME pixel-sample stream as VLMapBuilder (same
    seed, same batching), so the two maps differ only by the network +
    fusion implementations under test."""
    import torch
    from avlmaps_tpu.geometry.transforms import pose_vec_to_tf
    from avlmaps_tpu.geometry.projection import get_sim_cam_mat
    from avlmaps_tpu.map.vlmap_builder import sample_pixels
    from avlmaps_tpu.models.lseg.window import normalize_image, plan_windows
    from avlmaps_tpu.pipeline.loader import load_depth, load_rgb

    gs, cs, vh = cfg.gs, cfg.cs, cfg.vh
    rgb_paths = sorted((scene / "rgb").glob("*.png"))
    depth_paths = sorted((scene / "depth").glob("*.npy"))
    base_poses = np.loadtxt(scene / "poses.txt")
    if base_poses.ndim == 1:
        base_poses = base_poses[None]

    inv_bt = np.linalg.inv(base_tf)
    init_base_tf = base_tf @ pose_vec_to_tf(base_poses[0]) @ inv_bt
    inv_init = np.linalg.inv(init_base_tf)
    pose_tfs = [inv_init @ (base_tf @ pose_vec_to_tf(v) @ inv_bt)
                @ base_tf @ base2cam for v in base_poses]

    probe = np.asarray(load_depth(depth_paths[0]), np.float32)
    h, w = probe.shape[:2]
    max_pts = cfg.point_budget(h, w)
    base_size = getattr(cfg, "lseg_base_size", 520)
    crop_size = getattr(cfg, "lseg_crop_size", 480)
    height, width, _, _, crops = plan_windows(h, w, base_size, crop_size)
    if (height, width) != (h, w) or len(crops) != 1:
        raise ValueError("oracle supports single-window full-image eval "
                         "only; set lseg_base_size = lseg_crop_size = image "
                         "size")
    calib = cfg.calib_matrix()
    inv_calib = np.linalg.inv(calib).astype(np.float32)
    feat_intr = get_sim_cam_mat(height, width).astype(np.float32)

    rng = np.random.default_rng(seed)
    # sequential per-voxel running weighted mean (associative form)
    feats_acc: dict = {}

    n = len(rgb_paths)
    for start in range(0, n, batch_size):
        idx = sample_pixels(rng, h, w, cfg.depth_sample_rate, max_pts,
                            batch_size)
        for bi in range(batch_size):
            fi = start + bi
            if fi >= n:
                continue
            rgb = np.asarray(load_rgb(rgb_paths[fi]))
            depth = np.asarray(load_depth(depth_paths[fi]), np.float32)
            rgb_norm = normalize_image(rgb).astype(np.float32)
            with torch.no_grad():
                canvas = torch_model(torch.from_numpy(
                    rgb_norm.transpose(2, 0, 1)[None]))[0]
            canvas = canvas.numpy().transpose(1, 2, 0)  # (H, W, D)
            if canvas.shape[:2] != (height, width):
                raise ValueError(f"oracle canvas {canvas.shape[:2]} != "
                                 f"({height}, {width})")

            sample = idx[bi]
            px = (sample % w).astype(np.float32)
            py = (sample // w).astype(np.float32)
            z = depth.reshape(-1)[sample]
            uv1 = np.stack([px + 0.5, py + 0.5, np.ones_like(px)], axis=-1)
            rays = uv1 @ inv_calib.T
            pc_local = rays * z[:, None]
            zmask = (z > cfg.min_depth) & (z < cfg.max_depth)
            pose = pose_tfs[fi].astype(np.float32)
            pc_global = pc_local @ pose[:3, :3].T + pose[:3, 3]

            row = np.trunc(gs / 2 - np.trunc(pc_global[:, 0] / cs)
                           ).astype(np.int64)
            col = np.trunc(gs / 2 - np.trunc(pc_global[:, 1] / cs)
                           ).astype(np.int64)
            hh = np.trunc(pc_global[:, 2] / cs).astype(np.int64)
            in_grid = ((row >= 0) & (row < gs) & (col >= 0) & (col < gs)
                       & (hh >= 0) & (hh < vh))

            uvw = pc_local @ feat_intr.T
            fx = np.trunc(uvw[:, 0] / uvw[:, 2] - 0.5).astype(np.int64)
            fy = np.trunc(uvw[:, 1] / uvw[:, 2] - 0.5).astype(np.int64)
            in_feat = (fx >= 0) & (fx < width) & (fy >= 0) & (fy < height)
            alpha = np.exp(-np.sum(pc_local ** 2, axis=1) / (2 * 0.6))
            ok = zmask & in_grid & in_feat
            for j in np.nonzero(ok)[0]:
                key = (int(row[j]), int(col[j]), int(hh[j]))
                f = canvas[fy[j], fx[j]]
                a = float(alpha[j])
                if key in feats_acc:
                    sf, sw = feats_acc[key]
                    feats_acc[key] = (sf + a * f, sw + a)
                else:
                    feats_acc[key] = (a * f.astype(np.float64), a)

    keys = sorted(feats_acc)
    pos = np.asarray(keys, np.int32).reshape(-1, 3)
    feat = np.stack([feats_acc[k][0] / feats_acc[k][1] for k in keys]
                    ).astype(np.float32)
    return pos, feat


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def landmark_text_features(landmarks, out_dim: int, clip_ckpt=None):
    """Text features for scoring.  With a CLIP checkpoint: the real
    prompt-ensembled embeddings (both maps see the same matrix either way,
    so parity is measured identically)."""
    if clip_ckpt:
        from avlmaps_tpu.models.clip import ClipEncoder

        enc = ClipEncoder.from_checkpoint(str(clip_ckpt))
        return np.asarray(
            enc.get_text_feats_multiple_templates(landmarks), np.float32)
    rng = np.random.default_rng(42)
    t = rng.normal(size=(len(landmarks), out_dim)).astype(np.float32)
    return t / np.linalg.norm(t, axis=1, keepdims=True)


def score_top1(feat: np.ndarray, text: np.ndarray) -> np.ndarray:
    fn = feat / np.maximum(np.linalg.norm(feat, axis=1, keepdims=True),
                           1e-8)
    return np.argmax(fn @ text.T, axis=1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", type=Path, default=None,
                    help="scene dir (rgb/ depth/ poses.txt); synthetic if "
                         "omitted")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny synthetic-weight mode (default when no "
                         "checkpoint is given)")
    ap.add_argument("--medium", action="store_true",
                    help="medium-scale synthetic-weight mode (VERDICT r4 "
                         "#8): 12-layer width-256 towers with the real "
                         "hook spacing, 192x192 frames")
    ap.add_argument("--lseg-ckpt", type=Path, default=None)
    ap.add_argument("--clip-ckpt", type=Path, default=None)
    ap.add_argument("--landmarks", type=str,
                    default="chair,table,sofa,bed,plant")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=Path, default=None,
                    help="write the JSON report here too")
    args = ap.parse_args(argv)

    import os

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # this image's sitecustomize force-registers the axon TPU plugin
        # ignoring JAX_PLATFORMS; honor the caller's platform pin so CI can
        # run this harness on CPU (tests/conftest.py does the same)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from avlmaps_tpu.config import load_config
    from avlmaps_tpu.geometry.projection import get_sim_cam_mat
    from avlmaps_tpu.geometry.transforms import (
        build_base2cam_tf, build_base_transform)
    from avlmaps_tpu.map.vlmap_builder import VLMapBuilder
    from avlmaps_tpu.models.lseg import LSegNet, LSegConfig
    from avlmaps_tpu.models.lseg.port import port_lseg_state_dict
    from tools.torch_reference.lseg_torch import (
        TorchLSegSpec, build_torch_lseg, export_reference_state_dict,
        load_reference_state_dict)

    tiny = args.lseg_ckpt is None and not args.medium
    landmarks = [s.strip() for s in args.landmarks.split(",") if s.strip()]

    tmp = None
    scene = args.scene
    if scene is None:
        tmp = tempfile.TemporaryDirectory()
        hw = 192 if args.medium else 32
        scene = write_synthetic_scene(Path(tmp.name) / "scene",
                                      n_frames=4 if args.medium else 6,
                                      h=hw, w=hw)
    scene = Path(scene)

    # --- networks: one weight set, two stacks --------------------------
    if tiny:
        spec = TorchLSegSpec.tiny16()
        torch_model = build_torch_lseg(spec, seed=args.seed)
        flax_cfg = LSegConfig.tiny16()
        out_dim = spec.out_dim
    elif args.medium:
        spec = TorchLSegSpec.medium()
        torch_model = build_torch_lseg(spec, seed=args.seed)
        flax_cfg = LSegConfig.medium()
        out_dim = spec.out_dim
    else:
        import torch as _torch

        spec = TorchLSegSpec()
        torch_model = build_torch_lseg(spec, seed=args.seed)
        ckpt = _torch.load(args.lseg_ckpt, map_location="cpu",
                           weights_only=False)
        sd_ckpt = ckpt.get("state_dict", ckpt)
        load_reference_state_dict(torch_model, sd_ckpt)
        flax_cfg = LSegConfig.vitl16()
        out_dim = spec.out_dim
    sd = export_reference_state_dict(torch_model)
    variables = port_lseg_state_dict(sd, vit_layers=spec.layers)
    model = LSegNet(flax_cfg)

    # --- shared build config --------------------------------------------
    import cv2  # noqa: F401  (scene IO)

    probe = np.load(sorted((scene / "depth").glob("*.npy"))[0])
    h, w = probe.shape[:2]
    cfg = load_config()
    mc = cfg.map_config
    if tiny:
        mc.grid_size = 64
        mc.cell_size = 0.1
        mc.pose_info.camera_height = 0.8
        mc.capacity = 16384
        mc.depth_sample_rate = 4
        mc.max_pts_per_frame = 256
        mc.max_depth = 6.0
    elif args.medium:
        mc.grid_size = 128
        mc.cell_size = 0.05
        mc.pose_info.camera_height = 0.8
        mc.capacity = 32768
        mc.depth_sample_rate = 36  # 192^2/36 = 1024 points per frame
        mc.max_pts_per_frame = 1024
        mc.max_depth = 6.0
    mc.cam_calib_mat = tuple(get_sim_cam_mat(h, w).reshape(-1))
    mc.lseg_base_size = max(h, w)
    mc.lseg_crop_size = max(h, w)
    base2cam = build_base2cam_tf(mc.pose_info.base2cam_rot,
                                 mc.pose_info.camera_height)
    base_tf = build_base_transform(mc.pose_info.base_forward_axis,
                                   mc.pose_info.base_left_axis,
                                   mc.pose_info.base_up_axis)

    # --- build (a): flax stack ------------------------------------------
    builder = VLMapBuilder(
        scene, mc, scene / "poses.txt",
        sorted((scene / "rgb").glob("*.png")),
        sorted((scene / "depth").glob("*.npy")),
        base2cam, base_tf, lseg_apply=model.apply, lseg_params=variables,
        feat_dim=out_dim, batch_size=args.batch_size, seed=args.seed)
    m = builder.create_mobile_base_map(save_every=0, progress=False)
    print(f"[flax]   {m.grid_pos.shape[0]} voxels")

    # --- build (b): torch oracle ----------------------------------------
    opos, ofeat = oracle_build_map(torch_model, scene, mc, base2cam,
                                   base_tf, out_dim, args.batch_size,
                                   args.seed)
    print(f"[oracle] {opos.shape[0]} voxels")

    # --- compare ---------------------------------------------------------
    text = landmark_text_features(landmarks, out_dim,
                                  clip_ckpt=args.clip_ckpt)
    if text.shape[1] != out_dim:
        raise ValueError(f"text dim {text.shape[1]} != map dim {out_dim}")
    f_top1 = score_top1(m.grid_feat, text)
    o_top1 = score_top1(ofeat, text)

    fkey = {tuple(p): i for i, p in enumerate(m.grid_pos)}
    okey = {tuple(p): i for i, p in enumerate(opos)}
    common = sorted(set(fkey) & set(okey))
    union = set(fkey) | set(okey)
    agree = sum(int(f_top1[fkey[k]] == o_top1[okey[k]]) for k in common)
    cos = [float(np.dot(
        m.grid_feat[fkey[k]] / max(np.linalg.norm(m.grid_feat[fkey[k]]),
                                   1e-8),
        ofeat[okey[k]] / max(np.linalg.norm(ofeat[okey[k]]), 1e-8)))
        for k in common]
    per_landmark = {}
    for ci, name in enumerate(landmarks):
        fv = {k for k in common if f_top1[fkey[k]] == ci}
        ov = {k for k in common if o_top1[okey[k]] == ci}
        denom = len(fv | ov)
        per_landmark[name] = (len(fv & ov) / denom) if denom else 1.0

    report = {
        "mode": ("tiny-synthetic" if tiny else
                 "medium-synthetic" if args.medium else "real-checkpoint"),
        "voxels_flax": int(m.grid_pos.shape[0]),
        "voxels_oracle": int(opos.shape[0]),
        "voxel_iou": len(common) / max(len(union), 1),
        "top1_agreement": agree / max(len(common), 1),
        "feature_cos_mean": float(np.mean(cos)) if cos else 0.0,
        "feature_cos_min": float(np.min(cos)) if cos else 0.0,
        "per_landmark_iou": per_landmark,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))
    if tmp:
        tmp.cleanup()
    # Voxel membership is network-independent (pose/depth/trunc math only);
    # the residual IoU gap is single-ulp trunc flips where a point lands
    # exactly on a cell boundary — device-f32 vs host-f32 accumulation
    # order in the pose matmul.  At 192x192 medium scale (4096 points)
    # that is ~0.2% of voxels; top-1 agreement on the common voxels is the
    # recall contract and must stay ~1.0 at every scale.
    iou_min = 0.97 if args.medium else 0.99
    ok = (report["voxel_iou"] > iou_min and report["top1_agreement"] > 0.99)
    print("RECALL PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
