"""Visual-localization accuracy eval: SuperPoint+MNN vs ORB fallback.

Renders a synthetic textured trajectory (known camera translations via
image-plane shifts at constant depth), perturbs the queries
(brightness/noise), and reports per-method median/mean translation error
through VisualMap.refine_pose — the quality evidence for swapping the
matcher class (reference: SuperPoint+SuperGlue,
avlmaps/utils/localization_utils.py:127-145,247-273).

    python tools/loc_eval.py [--superpoint-ckpt superpoint_v1.pth]

Without a checkpoint the SuperPoint row runs random conv weights (still
locally distinctive descriptors; the real weights strictly improve it).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

H, W = 240, 320
DEPTH = 2.0


def textured_canvas(rng, h, w):
    import cv2

    canvas = np.full((h, w, 3), 30, np.uint8)
    for _ in range(500):
        x, y = int(rng.integers(0, w - 8)), int(rng.integers(0, h - 8))
        sz = int(rng.integers(3, 9))
        color = tuple(int(c) for c in rng.integers(40, 255, 3))
        cv2.rectangle(canvas, (x, y), (x + sz, y + sz), color, -1)
    return canvas


def perturb(img, rng, brightness=20, noise=6):
    out = img.astype(np.int32) + int(rng.integers(-brightness, brightness))
    out = out + rng.integers(-noise, noise, img.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def build_scene(root: Path, translations, rng):
    import cv2

    from avlmaps_tpu.geometry.projection import get_sim_cam_mat

    fx = get_sim_cam_mat(H, W)[0, 0]
    max_shift = int(round(fx * max(translations) / DEPTH)) + 1
    tex = textured_canvas(rng, H, W + max_shift)
    (root / "rgb").mkdir(parents=True, exist_ok=True)
    (root / "depth").mkdir(exist_ok=True)
    cv2.imwrite(str(root / "rgb" / "000000.png"), tex[:, :W][:, :, ::-1])
    np.save(root / "depth" / "000000.npy",
            np.full((H, W), DEPTH, np.float32))
    np.savetxt(root / "poses.txt", np.asarray([[0, 0, 0, 0, 0, 0, 1.0]]))
    queries = []
    for tx in translations:
        shift = int(round(fx * tx / DEPTH))
        queries.append((shift * DEPTH / fx, perturb(tex[:, shift:W + shift],
                                                    rng)))
    return queries


def evaluate(vmap, queries, intr):
    errs, fails = [], 0
    for tx_true, q in queries:
        cam_tf = vmap.refine_pose(q, 0, intr)
        if cam_tf is None:
            fails += 1
            continue
        delta = cam_tf[:3, 3] - vmap._ref_cam_tf(0)[:3, 3]
        errs.append(float(np.linalg.norm(delta - np.array([tx_true, 0, 0]))))
    return {
        "n": len(queries),
        "failures": fails,
        "median_err_m": float(np.median(errs)) if errs else None,
        "mean_err_m": float(np.mean(errs)) if errs else None,
        "max_err_m": float(np.max(errs)) if errs else None,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--superpoint-ckpt", type=Path, default=None)
    ap.add_argument("--superglue-ckpt", type=Path, default=None,
                    help="superglue_{indoor,outdoor}.pth; adds a "
                    "superpoint_superglue row to the report")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    from avlmaps_tpu.config import load_config
    from avlmaps_tpu.geometry.projection import get_sim_cam_mat
    from avlmaps_tpu.geometry.transforms import pose_vec_to_tf
    from avlmaps_tpu.map.visual_map import VisualMap
    from avlmaps_tpu.models.superpoint import (
        SuperPointConfig, SuperPointExtractor, load_superpoint_checkpoint)

    rng = np.random.default_rng(args.seed)
    translations = [0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4]
    tmp = tempfile.TemporaryDirectory()
    root = Path(tmp.name) / "scene"
    queries = build_scene(root, translations, rng)
    intr = get_sim_cam_mat(H, W)

    cfg = load_config()
    cfg.map_config.cam_calib_mat = tuple(intr.reshape(-1))

    def make_vmap(superpoint=None, superglue=None):
        m = VisualMap(cfg.map_config, str(root), superpoint=superpoint,
                      superglue=superglue)
        m.data_dir = root
        m.poses = np.stack([pose_vec_to_tf([0, 0, 0, 0, 0, 0, 1.0])])
        m.descriptors = np.ones((1, 8), np.float32)
        return m

    if args.superpoint_ckpt:
        sp_cfg, sp_vars = load_superpoint_checkpoint(
            str(args.superpoint_ckpt))
        sp = SuperPointExtractor(sp_cfg, params=sp_vars)
        sp_mode = "superpoint_v1 weights"
    else:
        sp = SuperPointExtractor(SuperPointConfig(
            channels=(8, 8, 16, 16), det_ch=32, desc_ch=32, desc_dim=32,
            max_keypoints=1024, score_threshold=0.0))
        sp_mode = "random weights (pass --superpoint-ckpt for the real ones)"

    report = {
        "superpoint_mode": sp_mode,
        "orb": evaluate(make_vmap(None), queries, intr),
        "superpoint_mnn": evaluate(make_vmap(sp), queries, intr),
    }
    if args.superglue_ckpt:
        from avlmaps_tpu.models.superglue import (
            SuperGlueMatcher, load_superglue_checkpoint)

        sg_cfg, sg_vars = load_superglue_checkpoint(str(args.superglue_ckpt))
        sg = SuperGlueMatcher(sg_cfg, params=sg_vars)
        report["superpoint_superglue"] = evaluate(
            make_vmap(sp, superglue=sg), queries, intr)
    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))
    tmp.cleanup()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
