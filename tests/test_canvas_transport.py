"""Canvas transport (pipeline/transport.py): host-side resize parity with
the device kernel, and build parity between the lean canvas step and the
full-frame step (same program minus transport; reference hot loop
avlmaps/map/vlmap_builder.py:118-178)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.geometry.projection import get_sim_cam_mat
from avlmaps_tpu.map.vlmap_builder import (
    make_frame_step, make_frame_step_canvas, sample_pixels,
)
from avlmaps_tpu.models.lseg import LSegNet, LSegConfig
from avlmaps_tpu.models.lseg.window import plan_windows
from avlmaps_tpu.ops.resize import resize_bilinear_align_corners
from avlmaps_tpu.ops.voxel_fusion import (
    export_fusion_state, init_fusion_state,
)
from avlmaps_tpu.pipeline.loader import FrameBatch, PrefetchLoader
from avlmaps_tpu.pipeline.transport import (
    make_canvas_transform, resize_canvas_u8,
)

# W chosen so every crop's patch grid is even (the DPT pyramid's /2 stage
# needs it — the reference's 480 crop gives grid 30)
H, W = 32, 64
GS, CS, VH = 64, 0.1, 8


@pytest.fixture(scope="module")
def tiny_lseg():
    cfg = LSegConfig.tiny16()
    model = LSegNet(cfg)
    # init at a square crop: the DPT pyramid (like the reference's) only
    # ever sees square sliding-window crops; params are size-independent
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, H, H, 3), jnp.float32))
    return model, params


class TestHostResize:
    def test_exact_matches_device_align_corners(self, rng):
        img = rng.integers(0, 255, (2, 37, 53, 3)).astype(np.uint8)
        got = resize_canvas_u8(img, 24, 30, exact=True).astype(np.float32)
        ref = np.asarray(resize_bilinear_align_corners(
            jnp.asarray(img, jnp.float32), 24, 30))
        # same bilinear weights; the only difference is the uint8 rounding
        assert np.abs(got - ref).max() <= 0.5 + 1e-3

    def test_fast_path_within_one_level(self, rng):
        """cv2.remap fast path: weights quantised to 1/32 -> at most one
        uint8 level off the exact separable resize."""
        img = rng.integers(0, 255, (2, 37, 53, 3)).astype(np.uint8)
        fast = resize_canvas_u8(img, 24, 30).astype(int)
        exact = resize_canvas_u8(img, 24, 30, exact=True).astype(int)
        assert np.abs(fast - exact).max() <= 1

    def test_identity_when_same_size(self, rng):
        img = rng.integers(0, 255, (13, 17, 3)).astype(np.uint8)
        np.testing.assert_array_equal(resize_canvas_u8(img, 13, 17), img)

    def test_upscale_exact_at_corners(self, rng):
        img = rng.integers(0, 255, (1, 4, 4, 3)).astype(np.uint8)
        out = resize_canvas_u8(img, 7, 7)
        np.testing.assert_array_equal(out[:, 0, 0], img[:, 0, 0])
        np.testing.assert_array_equal(out[:, -1, -1], img[:, -1, -1])


class TestCanvasStepParity:
    def _run_both(self, tiny_lseg, rng, base_size, crop_size):
        model, params = tiny_lseg
        calib = get_sim_cam_mat(H, W)
        b, n = 2, 64
        rgb_u8 = rng.integers(0, 255, (b, H, W, 3)).astype(np.uint8)
        depth = rng.uniform(0.3, 0.9, (b, H, W)).astype(np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        poses[:, 0, 3] = 0.05 * np.arange(b)
        idx = sample_pixels(np.random.default_rng(3), H, W, 16, n, b)

        # frame transport (uint8 RGB + mm depth, device resize)
        fstep = make_frame_step(model.apply, gs=GS, cs=CS, vh=VH,
                                calib_mat=calib, image_hw=(H, W),
                                base_size=base_size, crop_size=crop_size,
                                max_depth=6.0, rgb_uint8=True)
        fstate = init_fusion_state(GS, VH, 24, 4096)
        depth_mm = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        fstate = fstep(fstate, params, jnp.asarray(rgb_u8),
                       jnp.asarray(depth_mm), jnp.asarray(poses),
                       jnp.asarray(idx), jnp.ones((b,), bool))
        f_out = export_fusion_state(fstate, GS, VH)

        # canvas transport (host resize + gathers)
        ch, cw, _, _, _ = plan_windows(H, W, base_size, crop_size)
        transform = make_canvas_transform(lambda bb: idx[:bb], (ch, cw))
        batch = transform(FrameBatch(
            frame_ids=np.arange(b, dtype=np.int32), rgb=rgb_u8,
            depth=depth, pose_tf=poses))
        cstep = make_frame_step_canvas(model.apply, gs=GS, cs=CS, vh=VH,
                                       calib_mat=calib, image_hw=(H, W),
                                       base_size=base_size,
                                       crop_size=crop_size, max_depth=6.0,
                                       half_res_apply=False)
        cstate = init_fusion_state(GS, VH, 24, 4096)
        cstate = cstep(cstate, params, jnp.asarray(batch.canvas),
                       jnp.asarray(batch.z_mm), jnp.asarray(batch.rgb_pts),
                       jnp.asarray(batch.pose_tf),
                       jnp.asarray(batch.sample_idx), jnp.ones((b,), bool))
        c_out = export_fusion_state(cstate, GS, VH)
        return f_out, c_out

    def test_identity_canvas_is_exact(self, tiny_lseg, rng):
        """base=crop=input size: the canvas is the raw frame, so both
        transports run the identical program — outputs match to f32."""
        (ff, fp, fw, focc, frgb), (cf, cp, cw_, cocc, crgb) = \
            self._run_both(tiny_lseg, rng, W, W)
        assert ff.shape == cf.shape and ff.shape[0] > 0
        np.testing.assert_array_equal(fp, cp)
        np.testing.assert_array_equal(focc, cocc)
        np.testing.assert_allclose(fw, cw_, rtol=1e-6)
        np.testing.assert_allclose(ff, cf, rtol=1e-5, atol=1e-5)
        # canvas ships exact uint8 colours; the frame path's
        # normalise/denormalise f32 roundtrip can truncate one level down
        np.testing.assert_allclose(frgb.astype(int), crgb.astype(int),
                                   atol=1)

    def test_resized_canvas_close(self, tiny_lseg, rng):
        """With a real resize the canvas is re-quantised to uint8
        (<=0.5/127.5 per pixel); geometry stays identical, features close."""
        (ff, fp, fw, focc, frgb), (cf, cp, cw_, cocc, crgb) = \
            self._run_both(tiny_lseg, rng, H, H)
        assert ff.shape == cf.shape and ff.shape[0] > 0
        np.testing.assert_array_equal(fp, cp)
        np.testing.assert_array_equal(focc, cocc)
        np.testing.assert_allclose(fw, cw_, rtol=1e-6)
        np.testing.assert_allclose(frgb.astype(int), crgb.astype(int),
                                   atol=1)
        # random-init tiny LSeg amplifies input deltas; just demand the
        # voxel features track the frame-transport ones closely in relative
        # terms (the u8 perturbation is ~0.4% of the input range)
        denom = np.maximum(np.abs(ff), 1e-3)
        assert np.median(np.abs(cf - ff) / denom) < 0.05


class TestWholeCanvasEval:
    def test_per_pixel_function_matches_sliding(self, rng):
        """For a receptive-field-free (per-pixel) model, the whole-canvas
        single forward and the count-normalised sliding window are the SAME
        function — exact agreement validates the coordinate/masking math."""
        from avlmaps_tpu.models.lseg.window import (
            features_at_points, whole_canvas_features_at_points,
        )

        def per_pixel_apply(params, x):  # (B, h, w, 3) -> (B, h, w, 8)
            v = x * params
            return jnp.concatenate(
                [v, v[..., :1] * 2.0, v.sum(-1, keepdims=True),
                 v[..., 1:2] - v[..., 2:3], jnp.cos(v[..., :1]),
                 jnp.sin(v[..., 2:3])], axis=-1)

        b, n = 2, 40
        img = jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32))
        px = jnp.asarray(rng.integers(0, W, (b, n)).astype(np.int32))
        py = jnp.asarray(rng.integers(0, H, (b, n)).astype(np.int32))
        params = jnp.float32(0.7)
        slide = features_at_points(per_pixel_apply, params, img, px, py,
                                   base_size=W, crop_size=H)
        whole = whole_canvas_features_at_points(per_pixel_apply, params,
                                                img, px, py)
        np.testing.assert_allclose(np.asarray(slide), np.asarray(whole),
                                   rtol=1e-5, atol=1e-5)

    def test_half_res_tiny16_build(self, tiny_lseg, rng):
        """Whole-canvas mode through the canvas step with a real (tiny)
        LSeg at half-res output: produces a populated map."""
        model, params = tiny_lseg
        half = lambda p, x: model.apply(p, x, upsample=False)  # noqa: E731
        step = make_frame_step_canvas(half, gs=GS, cs=CS, vh=VH,
                                      calib_mat=get_sim_cam_mat(H, W),
                                      image_hw=(H, W), base_size=W,
                                      crop_size=W, max_depth=6.0,
                                      half_res_apply=True,
                                      lseg_eval="whole")
        b, n = 2, 64
        canvas = jnp.asarray(rng.integers(0, 255, (b, H, W, 3)), jnp.uint8)
        z_mm = jnp.asarray((rng.uniform(0.3, 0.9, (b, n)) * 1000.0
                            ).astype(np.uint16))
        rgb_pts = jnp.asarray(rng.integers(0, 255, (b, n, 3)), jnp.uint8)
        pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        idx = jnp.asarray(sample_pixels(np.random.default_rng(5), H, W, 16,
                                        n, b))
        state = init_fusion_state(GS, VH, 24, 4096)
        state = step(state, params, canvas, z_mm, rgb_pts, pose, idx,
                     jnp.ones((b,), bool))
        feats, pos, weight, occ, rgbs = export_fusion_state(state, GS, VH)
        assert feats.shape[0] > 0
        assert np.isfinite(feats).all()


class TestBuilderCanvasTransport:
    def test_build_via_loader_transform(self, tmp_path, tiny_lseg):
        """PrefetchLoader(transform=...) end-to-end on disk frames."""
        import cv2

        model, params = tiny_lseg
        root = tmp_path / "scene"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        rng = np.random.default_rng(0)
        nf = 5
        for i in range(nf):
            cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            np.save(root / "depth" / f"{i:06d}.npy",
                    rng.uniform(0.3, 0.9, (H, W)).astype(np.float32))
        poses = [np.eye(4, dtype=np.float32)] * nf

        ch, cw, _, _, _ = plan_windows(H, W, W, W)
        srng = np.random.default_rng(1)
        transform = make_canvas_transform(
            lambda b: sample_pixels(srng, H, W, 16, 64, b), (ch, cw))
        loader = PrefetchLoader(
            sorted((root / "rgb").glob("*.png")),
            sorted((root / "depth").glob("*.npy")),
            poses, batch_size=2, normalize=False, transform=transform)
        step = make_frame_step_canvas(model.apply, gs=GS, cs=CS, vh=VH,
                                      calib_mat=get_sim_cam_mat(H, W),
                                      image_hw=(H, W), base_size=W,
                                      crop_size=W, max_depth=6.0,
                                      half_res_apply=False)
        state = init_fusion_state(GS, VH, 24, 4096)
        seen = 0
        for batch in loader:
            assert batch.canvas.dtype == np.uint8
            assert batch.z_mm.dtype == np.uint16
            state = step(state, params, jnp.asarray(batch.canvas),
                         jnp.asarray(batch.z_mm),
                         jnp.asarray(batch.rgb_pts),
                         jnp.asarray(batch.pose_tf),
                         jnp.asarray(batch.sample_idx),
                         jnp.asarray(batch.frame_ids >= 0))
            seen += int((batch.frame_ids >= 0).sum())
        assert seen == nf
        feats, pos, weight, occ, rgbs = export_fusion_state(state, GS, VH)
        assert feats.shape[0] > 0


class TestShardedWholeCanvas:
    def test_sharded_whole_matches_single_device(self, tiny_lseg, rng):
        """lseg_eval='whole' reaches the sharded canvas body: the 8-device
        build equals the single-device whole-canvas step (f32 wire)."""
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        model, params = tiny_lseg
        half = lambda p, x: model.apply(p, x, upsample=False)  # noqa: E731
        calib = get_sim_cam_mat(H, W)
        step = make_frame_step_canvas(half, gs=GS, cs=CS, vh=VH,
                                      calib_mat=calib, image_hw=(H, W),
                                      base_size=W, crop_size=W,
                                      half_res_apply=True,
                                      lseg_eval="whole")
        n_dev, n = 8, 64
        b = n_dev
        canvas = jnp.asarray(rng.integers(0, 255, (b, H, W, 3)), jnp.uint8)
        z_mm = jnp.asarray((rng.uniform(0.3, 0.9, (b, n)) * 1000.0
                            ).astype(np.uint16))
        rgb_pts = jnp.asarray(rng.integers(0, 255, (b, n, 3)), jnp.uint8)
        pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        idx = jnp.asarray(sample_pixels(np.random.default_rng(5), H, W, 16,
                                        n, b))
        fvalid = jnp.ones((b,), bool)

        state = init_fusion_state(GS, VH, 24, 4096)
        state = step(state, params, canvas, z_mm, rgb_pts, pose, idx, fvalid)
        f1, p1, w1, o1, _ = export_fusion_state(state, GS, VH)

        mesh = make_mesh(n_dev)
        fusion = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                               capacity=4096 * n_dev, calib_mat=calib,
                               image_hw=(H, W), lseg_apply=half,
                               base_size=W, crop_size=W,
                               half_res_apply=True,
                               payload_dtype=jnp.float32,
                               transport="canvas", lseg_eval="whole")
        fusion.step(params, canvas, z_mm, rgb_pts, pose, idx, fvalid)
        f2, p2, w2, o2, _ = fusion.export()

        np.testing.assert_array_equal(o1 >= 0, o2 >= 0)
        k1, k2 = np.lexsort(p1.T), np.lexsort(p2.T)
        np.testing.assert_array_equal(p1[k1], p2[k2])
        np.testing.assert_allclose(f1[k1], f2[k2], rtol=1e-3, atol=1e-3)

    def test_whole_requires_canvas_transport(self):
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        with pytest.raises(ValueError):
            ShardedFusion(make_mesh(8), gs=GS, cs=CS, vh=VH, feat_dim=8,
                          capacity=64, calib_mat=get_sim_cam_mat(H, W),
                          image_hw=(H, W), lseg_apply=lambda p, x: x,
                          transport="frame", lseg_eval="whole")
