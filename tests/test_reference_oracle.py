"""Golden tests against the REFERENCE TREE ITSELF (/root/reference).

Strictly stronger than the hand-written tools/torch_reference oracles: the
reference's own code is imported (file-spec import, skip-if-deps-missing)
and our implementations are checked against it directly (VERDICT r2 next #4).

Live here: avlmaps/utils/mapping_utils.py (geometry + HDF5 schema),
esc50_utils, the AudioCLIP audio tower (ESResNeXt-FBSP), and the full LSeg
net — both towers run the reference's OWN model code via minimal import
shims.  AudioCLIP's blocked imports are trainer-side and never touch the
audio path (_install_audioclip_import_shims); LSeg's blocked imports are
``timm`` and ``clip`` (lseg_vit.py:1-7), whose only uses on the
pixel-encoding path are model CONSTRUCTION (timm.create_model at
lseg_vit.py:231 — shimmed with the from-spec, seeded-random
tools/torch_reference/timm_vit.py) and a text branch whose VALUES never
reach the compared output (_install_lseg_import_shims).  Weight parity
against the real downloaded checkpoints is the porters' job
(tools/port_checkpoints.py + tools/ckpt_manifests); these oracles pin CODE
parity under identical random weights.
"""

import importlib
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")


def _import_reference(rel_path: str, name: str):
    """Import one reference module from its file, skipping on any missing
    third-party dependency (the reference pins none of them here)."""
    path = REFERENCE / rel_path
    if not path.exists():
        pytest.skip(f"reference tree not present: {path}")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    try:
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    except ImportError as e:
        sys.modules.pop(name, None)
        pytest.skip(f"reference module {rel_path} needs {e.name}")
    return mod


@pytest.fixture(scope="module")
def ref_mu():
    return _import_reference("avlmaps/utils/mapping_utils.py",
                             "ref_mapping_utils")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


class TestGeometryVsReference:
    """Our geometry twins vs the reference's actual functions."""

    def test_pose_vec_to_tf(self, ref_mu, rng):
        from avlmaps_tpu.geometry.transforms import pose_vec_to_tf

        for _ in range(20):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            vec = np.concatenate([rng.uniform(-5, 5, 3), q])
            np.testing.assert_allclose(pose_vec_to_tf(vec),
                                       ref_mu.cvt_pose_vec2tf(vec),
                                       atol=1e-12)

    def test_depth2pc(self, ref_mu, rng):
        from avlmaps_tpu.geometry.projection import depth_to_pointcloud

        depth = rng.uniform(0.05, 12.0, (48, 64))
        calib = np.array([[32, 0, 32], [0, 32, 24], [0, 0, 1.0]])
        pc_ref, mask_ref = ref_mu.depth2pc(depth, intr_mat=calib,
                                           min_depth=0.1, max_depth=6.0)
        pts, mask = depth_to_pointcloud(depth, calib, min_depth=0.1,
                                        max_depth=6.0)
        np.testing.assert_allclose(pts, pc_ref.T, atol=1e-10)
        np.testing.assert_array_equal(mask, mask_ref)

    def test_depth2pc_default_fov(self, ref_mu, rng):
        from avlmaps_tpu.geometry.projection import depth_to_pointcloud

        depth = rng.uniform(0.05, 12.0, (30, 40))
        pc_ref, mask_ref = ref_mu.depth2pc(depth)
        pts, mask = depth_to_pointcloud(depth, fov=90, max_depth=10.0)
        np.testing.assert_allclose(pts, pc_ref.T, atol=1e-10)
        np.testing.assert_array_equal(mask, mask_ref)

    def test_transform_pc(self, ref_mu, rng):
        from avlmaps_tpu.geometry.projection import transform_points
        from avlmaps_tpu.geometry.transforms import pose_vec_to_tf

        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        pose = pose_vec_to_tf(np.concatenate([rng.uniform(-2, 2, 3), q]))
        pc = rng.normal(size=(3, 100))
        np.testing.assert_allclose(transform_points(pc.T, pose),
                                   ref_mu.transform_pc(pc, pose).T,
                                   atol=1e-10)

    def test_grid_converters_scalar(self, ref_mu, rng):
        from avlmaps_tpu.geometry.grid import (
            base_pos_to_grid_id, grid_id_to_base_pos, pos_to_grid_id_2d,
            grid_id_to_pos_2d)

        gs, cs = 100, 0.05
        for _ in range(50):
            x, y, z = rng.uniform(-2.4, 2.4, 3)
            assert base_pos_to_grid_id(gs, cs, x, y, z) == \
                ref_mu.base_pos2grid_id_3d(gs, cs, x, y, z)
            assert pos_to_grid_id_2d(gs, cs, x, y) == \
                ref_mu.pos2grid_id(gs, cs, x, y)
        for _ in range(20):
            r, c, h = (int(rng.integers(0, gs)), int(rng.integers(0, gs)),
                       int(rng.integers(0, 30)))
            np.testing.assert_allclose(
                grid_id_to_base_pos(r, c, h, cs, gs),
                ref_mu.grid_id2base_pos_3d(r, c, h, cs, gs))
            np.testing.assert_allclose(
                grid_id_to_pos_2d(gs, cs, r, c),
                ref_mu.grid_id2pos(gs, cs, r, c))

    def test_grid_converters_batch(self, ref_mu, rng):
        from avlmaps_tpu.geometry.grid import (
            base_pos_to_grid_id_batch, grid_id_to_base_pos_batch)

        gs, cs = 100, 0.05
        pos = rng.uniform(-2.4, 2.4, (200, 3))
        ref = np.concatenate(
            ref_mu.base_pos2grid_id_3d_batch(gs, cs, pos), axis=1)
        np.testing.assert_array_equal(
            base_pos_to_grid_id_batch(gs, cs, pos), ref)

        grid = rng.integers(0, gs, (200, 3)).astype(np.int32)
        ref_pos = np.stack(
            ref_mu.grid_id2base_pos_3d_batch(grid, cs, gs), axis=1)
        np.testing.assert_allclose(
            grid_id_to_base_pos_batch(grid, cs, gs), ref_pos)

    def test_base_rot_mat2theta(self, ref_mu, rng):
        from avlmaps_tpu.geometry.transforms import base_rot_mat_to_theta

        for _ in range(10):
            th = rng.uniform(-np.pi, np.pi)
            rot = np.array([[np.cos(th), -np.sin(th), 0],
                            [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
            assert base_rot_mat_to_theta(rot) == pytest.approx(
                ref_mu.base_rot_mat2theta(rot))

    def test_intrinsics_and_projection(self, ref_mu, rng):
        from avlmaps_tpu.geometry.projection import (
            get_sim_cam_mat, get_sim_cam_mat_with_fov, project_points)

        np.testing.assert_allclose(get_sim_cam_mat(720, 1080),
                                   ref_mu.get_sim_cam_mat(720, 1080))
        np.testing.assert_allclose(
            get_sim_cam_mat_with_fov(720, 1080, 90),
            ref_mu.get_sim_cam_mat_with_fov(720, 1080, 90))

        cam = get_sim_cam_mat(48, 64)
        pts = rng.uniform(0.2, 4.0, (100, 3))
        pts[:, :2] -= 2.0
        x, y, z = project_points(cam, pts)  # ours: (N, 3)
        xr, yr, zr = ref_mu.project_points(cam, pts.T.copy())  # ref: (3, N)
        np.testing.assert_array_equal(x, xr)
        np.testing.assert_array_equal(y, yr)
        np.testing.assert_allclose(z, zr)
        # scalar variant too
        for p in pts[:10]:
            assert project_points(cam, p[None])[0][0] == \
                ref_mu.project_point(cam, p.copy())[0]

    def test_grid_id_jax_matches_reference_hot_loop(self, ref_mu, rng):
        """The jax converter reproduces the reference hot loop's scalar
        double-truncation (vlmap_builder.py:137) — spot-checked against the
        reference's own scalar function."""
        import jax.numpy as jnp

        from avlmaps_tpu.geometry.grid import base_pos_to_grid_id_jax

        gs, cs = 100, 0.05
        pos = rng.uniform(-2.4, 2.4, (500, 3)).astype(np.float32)
        got = np.asarray(base_pos_to_grid_id_jax(gs, cs, jnp.asarray(pos)))
        ref = np.array([ref_mu.base_pos2grid_id_3d(
            gs, cs, float(p[0]), float(p[1]), float(p[2])) for p in pos])
        np.testing.assert_array_equal(got, ref)


class TestHdf5SchemaVsReference:
    """Byte-level interop: our saver <-> the reference's loader and back."""

    def _arrays(self, rng, n=50, gs=20, vh=8, d=16):
        grid_feat = rng.normal(size=(n, d)).astype(np.float32)
        grid_pos = rng.integers(0, [gs, gs, vh], (n, 3)).astype(np.int32)
        weight = rng.uniform(0, 5, n).astype(np.float32)
        occ = np.full((gs, gs, vh), -1, np.int32)
        occ[grid_pos[:, 0], grid_pos[:, 1], grid_pos[:, 2]] = np.arange(n)
        grid_rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
        return grid_feat, grid_pos, weight, occ, grid_rgb

    def test_ours_saved_reference_loads(self, ref_mu, rng, tmp_path):
        from avlmaps_tpu.map.voxel_map import save_3d_map

        gf, gp, w, occ, rgb = self._arrays(rng)
        p = tmp_path / "ours.h5df"
        save_3d_map(p, gf, gp, w, occ, {0, 3, 7}, grid_rgb=rgb)
        (mapped, gf2, gp2, w2, occ2, rgb2) = ref_mu.load_3d_map(str(p))
        assert sorted(mapped) == [0, 3, 7]
        np.testing.assert_array_equal(gf2, gf)
        np.testing.assert_array_equal(gp2, gp)
        np.testing.assert_array_equal(w2, w)
        np.testing.assert_array_equal(occ2, occ)
        np.testing.assert_array_equal(rgb2, rgb)

    def test_reference_saved_ours_loads(self, ref_mu, rng, tmp_path):
        from avlmaps_tpu.map.voxel_map import SparseVoxelMap, load_3d_map

        gf, gp, w, occ, rgb = self._arrays(rng)
        p = tmp_path / "ref.h5df"
        # the reference's Set[int] annotation is aspirational — np.array(set)
        # fails, so its callers pass lists (vlmap_builder.py:327)
        ref_mu.save_3d_map(str(p), gf, gp, w, occ, [1, 2], grid_rgb=rgb)
        mapped, gf2, gp2, w2, occ2, rgb2 = load_3d_map(p)
        assert sorted(mapped) == [1, 2]
        np.testing.assert_array_equal(gf2, gf)
        np.testing.assert_array_equal(occ2, occ)
        m = SparseVoxelMap.load(p)
        np.testing.assert_array_equal(m.grid_feat, gf)
        np.testing.assert_array_equal(m.grid_rgb, rgb)

    def test_clip_sparse_map_interop(self, ref_mu, rng, tmp_path):
        from avlmaps_tpu.map.voxel_map import (
            save_clip_sparse_map, load_clip_sparse_map)

        feats = rng.normal(size=(12, 768)).astype(np.float32)
        poses = [np.eye(4) for _ in range(12)]
        ours = tmp_path / "ours_clip.h5df"
        save_clip_sparse_map(ours, feats, poses)
        f2, p2 = ref_mu.load_clip_sparse_map(str(ours))
        np.testing.assert_array_equal(f2, feats)
        assert np.asarray(p2).shape == (12, 4, 4)

        ref = tmp_path / "ref_clip.h5df"
        ref_mu.save_clip_sparse_map(str(ref), feats, poses)
        f3, p3 = load_clip_sparse_map(ref)
        np.testing.assert_array_equal(f3, feats)


class TestEsc50VsReference:
    def test_meta_parsing_matches(self, rng, tmp_path):
        ref = _import_reference("avlmaps/utils/esc50_utils.py",
                                "ref_esc50_utils")
        from avlmaps_tpu.utils.esc50 import ESC50Meta

        meta = tmp_path / "esc50.csv"
        audio = tmp_path / "audio"
        audio.mkdir()
        rows = ["filename,fold,target,category,esc10,src_file,take"]
        for i, (fold, cat) in enumerate([(1, "dog"), (1, "rain"), (2, "dog"),
                                         (1, "dog"), (3, "siren")]):
            rows.append(f"{fold}-10000{i}-A-0.wav,{fold},0,{cat},True,1,A")
        meta.write_text("\n".join(rows))

        ours = ESC50Meta(meta, audio)
        theirs = ref.ESC50Meta(str(meta), str(audio))
        ref_dict = theirs.get_category_name_to_path_dict(tar_fold=1)
        # fold-1 filter and category->paths must agree (the reference
        # presents category names with underscores replaced by spaces)
        assert sorted(c.replace("_", " ") for c in ours.categories) == \
            sorted(ref_dict.keys())
        for cat in ours.categories:
            assert sorted(str(p) for p in ours.paths_for(cat)) == \
                sorted(ref_dict[cat.replace("_", " ")])


# ---------------------------------------------------------------------------
# model towers: importable only where the reference's heavyweight deps exist
# ---------------------------------------------------------------------------


def _install_audioclip_import_shims():
    """Make the reference's OWN AudioCLIP tower importable offline.

    ``AudioCLIP(pretrained=False)`` is asset-free, and its audio tower
    (ESResNeXt-FBSP — the code this oracle exists to check) needs only
    torch/numpy/scipy/termcolor.  Three imports block it in this sandbox,
    none of them on the audio path:

    * ``torchvision`` — referenced only as ``tv.models.resnet50`` /
      ``resnext50_32x4d`` loading_funcs (called only when pretrained) and
      as the ``tv.transforms.ToTensor`` base class of a dataset transform;
    * ``ignite_trainer`` — the package ``__init__`` pulls pytorch-ignite +
      visdom, but the model only uses ``AbstractNet``/``AbstractTransform``
      from its dependency-light ``_interfaces.py``, which we load from the
      reference tree itself;
    * ``model.clip.clip`` — builds a BPE tokenizer at import time from an
      asset the tree does not ship; only ``tokenize`` is imported and the
      audio path never calls it.

    Returns the list of sys.modules keys installed (for cleanup).  Real
    installations of these packages are left untouched.
    """
    import types

    installed = []

    if "torchvision" not in sys.modules:
        def _no_pretrained(*a, **k):
            raise RuntimeError("pretrained tower loading disabled in tests")

        class _PlaceholderTransform:  # base class only, never invoked
            def __init__(self, *a, **k):
                pass

        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace(resnet50=_no_pretrained,
                                          resnext50_32x4d=_no_pretrained)
        tv.transforms = types.SimpleNamespace(
            ToTensor=_PlaceholderTransform, Compose=_PlaceholderTransform,
            Resize=_PlaceholderTransform, CenterCrop=_PlaceholderTransform,
            Normalize=_PlaceholderTransform)
        sys.modules["torchvision"] = tv
        installed.append("torchvision")

    if "ignite_trainer" not in sys.modules:
        ifc = _import_reference(
            "avlmaps/audioclip/ignite_trainer/_interfaces.py",
            "ref_ignite_interfaces")
        it = types.ModuleType("ignite_trainer")
        it.AbstractNet = ifc.AbstractNet
        it.AbstractTransform = ifc.AbstractTransform
        sys.modules["ignite_trainer"] = it
        installed.append("ignite_trainer")

    if "avlmaps.audioclip.utils.datasets" not in sys.modules:
        # avlmaps.audioclip.utils/__init__ does ``from . import datasets``,
        # pulling the vestigial ESC-50/US8K torch Datasets and their whole
        # dependency tail (librosa, soundfile, sklearn) — trainer-only code
        # the model towers never touch.  Pre-seeding the subpackage makes
        # that import a no-op.
        sys.modules["avlmaps.audioclip.utils.datasets"] = types.ModuleType(
            "avlmaps.audioclip.utils.datasets")
        installed.append("avlmaps.audioclip.utils.datasets")

    if "model.clip.clip" not in sys.modules:
        def _no_tokenize(*a, **k):
            raise RuntimeError("bundled-clip tokenize unavailable offline "
                               "(BPE asset not shipped in the tree)")

        clip_clip = types.ModuleType("model.clip.clip")
        clip_clip.tokenize = _no_tokenize
        sys.modules["model.clip.clip"] = clip_clip
        installed.append("model.clip.clip")

    return installed


def _install_lseg_import_shims():
    """Make the reference's OWN LSeg net importable and runnable offline.

    Two imports block lseg_net.py in this sandbox, neither of which
    contributes VALUES to the compared output (``pixel_encoding``):

    * ``timm`` — used only as ``timm.create_model("vit_large_patch16_384",
      pretrained=True)`` (lseg_vit.py:231); shimmed with the from-spec,
      structurally-identical, seeded-random-init ViT in
      tools/torch_reference/timm_vit.py.  ``pretrained`` weights are
      network-blocked here; the oracle pins code parity under identical
      random weights (the porter tools own real-weight parity).
    * ``clip`` — used as ``clip.load("ViT-B/32")`` (lseg_vit.py:230, the
      returned model's only call on this path is ``encode_text``, feeding
      the ``logits_per_image`` output we do not compare) and
      ``clip.tokenize`` (token ids only ever reach encode_text).  The shim
      returns deterministic tensors of the right shapes/dtypes; half dtype
      for encode_text because the reference matmuls it against the
      half-cast pixel encoding (lseg_net.py:194-196).

    Returns sys.modules keys installed (for cleanup).  Installed
    unconditionally (shadowing any real install for the test's duration)
    so the oracle is hermetic and seed-deterministic everywhere.
    """
    import torch

    installed, shadowed = [], {}
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    try:
        from tools.torch_reference import timm_vit
    finally:
        sys.path.pop(0)

    for name in ("timm", "clip"):
        if name in sys.modules:
            shadowed[name] = sys.modules[name]

    timm = types.ModuleType("timm")
    timm.create_model = timm_vit.create_model
    sys.modules["timm"] = timm
    installed.append("timm")

    class _ClipTextStub:
        @staticmethod
        def encode_text(tokens):
            g = torch.Generator().manual_seed(11)
            return torch.randn(tokens.shape[0], 512, generator=g).half()

    def _tokenize(texts, context_length=77):
        if isinstance(texts, str):
            texts = [texts]
        return torch.zeros(len(texts), context_length, dtype=torch.long)

    clip = types.ModuleType("clip")
    clip.load = lambda name, device="cpu", jit=False: (_ClipTextStub(), None)
    clip.tokenize = _tokenize
    sys.modules["clip"] = clip
    installed.append("clip")
    return installed, shadowed


def _import_reference_lseg_net():
    """Import the reference's lseg_net.py WITH package context, so its
    relative import chain (lseg_net -> .lseg_blocks -> .lseg_vit) resolves
    against the reference tree itself."""
    pkg_dir = REFERENCE / "avlmaps" / "lseg" / "modules" / "models"
    if not pkg_dir.exists():
        pytest.skip(f"reference tree not present: {pkg_dir}")
    pkg = types.ModuleType("ref_lseg_models")
    pkg.__path__ = [str(pkg_dir)]
    sys.modules["ref_lseg_models"] = pkg
    try:
        return importlib.import_module("ref_lseg_models.lseg_net")
    except ImportError as e:
        pytest.skip(f"reference lseg_net needs {e.name}")


class TestModelTowersVsReference:
    def test_lseg_forward_parity(self):
        """The reference's OWN LSegEncNet (ViT-L/16 surgery + DPT scratch +
        head, lseg_net.py:231-336) vs our flax port, identical random
        weights.  96x96 input: exercises the pos-embed resize (24x24 -> 6x6)
        and every decoder stage at ~25x less compute than a 480 crop."""
        import torch

        shims, shadowed = _install_lseg_import_shims()
        try:
            ref_net = _import_reference_lseg_net()

            from avlmaps_tpu.models.lseg import LSegConfig, LSegNet
            from avlmaps_tpu.models.lseg.port import port_lseg_state_dict

            model = ref_net.LSegEncNet("", features=256, arch_option=0,
                                       block_depth=0, activation="lrelu",
                                       crop_size=480)
            model.eval()  # frozen BN running stats, as the mapping path
            # runs it (vlmap_builder.py:254: model.eval())

            # randomise what torch's default init leaves at identity so a
            # mis-ported LN/BN affine or BN running stat cannot hide
            g = torch.Generator().manual_seed(3)
            with torch.no_grad():
                for _, p in model.named_parameters():
                    p.add_(torch.randn(p.shape, generator=g) * 0.05)
                for name, buf in model.named_buffers():
                    if not buf.dtype.is_floating_point:
                        continue
                    if "running_var" in name:
                        buf.copy_(torch.rand(buf.shape, generator=g)
                                  * 1.5 + 0.25)
                    elif "running_mean" in name:
                        buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)

            variables = port_lseg_state_dict(model.state_dict())
            x = np.random.default_rng(0).normal(
                size=(1, 3, 96, 96)).astype(np.float32)
            with torch.no_grad():
                ref_out, _ = model(torch.from_numpy(x), "")

            import jax.numpy as jnp

            ours = np.asarray(LSegNet(LSegConfig.vitl16()).apply(
                variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
        finally:
            for key in [k for k in sys.modules
                        if k.startswith("ref_lseg_models")] + shims:
                sys.modules.pop(key, None)
            sys.modules.update(shadowed)
        # the reference half-casts the scaled unit-norm encoding (values in
        # [-14.3, 14.3]) before its final upsample (lseg_net.py:194); ours
        # stays f32, so the half rounding (~4e-3) IS the expected noise
        # floor.  Per-pixel normalisation also amplifies f32 op-order
        # differences where the head output norm is small, so a handful of
        # elements (observed: ~30 of 4.7M) land a few half-ULPs out — bound
        # the bulk at the half-cast scale and the tail separately.
        diff = np.abs(ours.transpose(0, 3, 1, 2) - ref_out.numpy())
        assert np.mean(diff) < 2e-3, f"bulk mean err {np.mean(diff):.2e}"
        assert np.percentile(diff, 99.99) < 2e-2, \
            f"99.99% quantile {np.percentile(diff, 99.99):.2e}"
        assert diff.max() < 5e-2, f"tail max err {diff.max():.2e}"

    def test_audioclip_audio_tower_parity(self):
        pytest.importorskip("termcolor")
        shims = _install_audioclip_import_shims()
        sys.path.insert(0, str(REFERENCE / "avlmaps" / "audioclip"))
        sys.path.insert(0, str(REFERENCE))
        try:
            ref_ac = _import_reference(
                "avlmaps/audioclip/model/audioclip.py", "ref_audioclip")
            self._check_audio_tower(ref_ac)
        finally:
            sys.path.remove(str(REFERENCE))
            sys.path.remove(str(REFERENCE / "avlmaps" / "audioclip"))
            for key in [k for k in sys.modules
                        if k == "model" or k.startswith("model.")
                        or k.startswith("avlmaps.")
                        or k == "avlmaps"] + shims:
                sys.modules.pop(key, None)

    @staticmethod
    def _check_audio_tower(ref_ac):
        import torch

        from avlmaps_tpu.models.audioclip import AudioClip, AudioClipConfig
        from avlmaps_tpu.models.audioclip.port import port_audioclip_state_dict

        model = ref_ac.AudioCLIP(pretrained=False)
        model.eval()  # frozen BN running stats — the inference-only
        # configuration the mapping path uses (sound_map.py:37-47)
        sd = model.state_dict()
        cfg = AudioClipConfig()
        variables = port_audioclip_state_dict(sd)
        clips = np.random.default_rng(1).normal(
            size=(2, 220500)).astype(np.float32) * 0.1
        with torch.no_grad():
            ref_feats = model.encode_audio(torch.from_numpy(clips)).numpy()
        import jax.numpy as jnp

        ours = np.asarray(AudioClip(cfg).apply(
            variables, jnp.asarray(clips), method=AudioClip.encode_audio))
        np.testing.assert_allclose(ours, ref_feats, atol=1e-2)
