"""The sharded (multi-chip) path compiled by the REAL TPU toolchain
(VERDICT r4 #5): all mesh tests in tests/ run on the virtual CPU mesh, so
a Mosaic-side rejection of shard_map-wrapped Pallas kernels would surface
only on a real pod.  One chip is enough to validate the lowering — a
mesh-of-1 runs the exact same shard_map programs (collectives included,
as self-loops) through the TPU compiler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avlmaps_tpu.geometry.projection import get_sim_cam_mat
from avlmaps_tpu.map.vlmap_builder import (
    make_frame_step_canvas, sample_pixels,
)
from avlmaps_tpu.models.lseg import LSegConfig, LSegNet
from avlmaps_tpu.ops.voxel_fusion import (
    export_fusion_state, init_fusion_state,
)

H, W = 32, 32
GS, CS, VH = 64, 0.1, 8


@pytest.fixture(scope="module")
def tiny_lseg():
    cfg = LSegConfig.tiny16()
    model = LSegNet(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, H, W, 3), jnp.float32))
    return model, params


def _canvas_inputs(rng, b, n):
    canvas = jnp.asarray(rng.integers(0, 255, (b, H, W, 3)), jnp.uint8)
    z_mm = jnp.asarray((rng.uniform(0.3, 0.9, (b, n)) * 1000.0
                        ).astype(np.uint16))
    rgb_pts = jnp.asarray(rng.integers(0, 255, (b, n, 3)), jnp.uint8)
    pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    idx = jnp.asarray(sample_pixels(np.random.default_rng(5), H, W, 16,
                                    n, b))
    fvalid = jnp.ones((b,), bool)
    return canvas, z_mm, rgb_pts, pose, idx, fvalid


class TestShardedFusionOnChip:
    @pytest.mark.parametrize("routing", ["all_gather", "all_to_all"])
    def test_mesh_of_1_matches_single_device(self, tiny_lseg, rng, routing):
        """ShardedFusion (canvas transport, whole-canvas eval) on a
        mesh-of-1 over the real chip: shard_map + Pallas dedup scatter +
        the all_gather/all_to_all payload exchange must compile under
        Mosaic and reproduce the unsharded step's map."""
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        model, params = tiny_lseg
        half = lambda p, x: model.apply(p, x, upsample=False)  # noqa: E731
        calib = get_sim_cam_mat(H, W)
        b, n = 2, 64
        inputs = _canvas_inputs(rng, b, n)

        step = make_frame_step_canvas(half, gs=GS, cs=CS, vh=VH,
                                      calib_mat=calib, image_hw=(H, W),
                                      base_size=W, crop_size=W,
                                      half_res_apply=True,
                                      lseg_eval="whole")
        state = init_fusion_state(GS, VH, 24, 4096)
        state = step(state, params, *inputs)
        f1, p1, w1, o1, _ = export_fusion_state(state, GS, VH)
        assert (o1 >= 0).sum() > 0

        mesh = make_mesh(1)
        fusion = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                               capacity=4096, calib_mat=calib,
                               image_hw=(H, W), lseg_apply=half,
                               base_size=W, crop_size=W,
                               half_res_apply=True,
                               payload_dtype=jnp.float32,
                               transport="canvas", lseg_eval="whole",
                               payload_routing=routing)
        fusion.step(params, *inputs)
        f2, p2, w2, o2, _ = fusion.export()

        np.testing.assert_array_equal(o1 >= 0, o2 >= 0)
        k1, k2 = np.lexsort(p1.T), np.lexsort(p2.T)
        np.testing.assert_array_equal(p1[k1], p2[k2])
        np.testing.assert_allclose(w1[k1], w2[k2], rtol=1e-5)
        np.testing.assert_allclose(f1[k1], f2[k2], rtol=1e-3, atol=1e-3)


class TestShardedScoreArgmaxOnChip:
    def test_mesh_of_1_matches_kernel(self, rng):
        """sharded_score_argmax = score_argmax Pallas kernel under
        shard_map — the Mosaic lowering of a pallas_call inside a
        shard_map body on real hardware."""
        from avlmaps_tpu.ops.similarity import score_argmax
        from avlmaps_tpu.parallel.sharded import (
            make_mesh, sharded_score_argmax,
        )

        feats = rng.normal(size=(4096, 512)).astype(np.float32)
        text = rng.normal(size=(8, 512)).astype(np.float32)
        got = sharded_score_argmax(make_mesh(1), feats, text)
        want = np.asarray(score_argmax(jnp.asarray(feats),
                                       jnp.asarray(text),
                                       normalize_map=True,
                                       normalize_text=True))
        np.testing.assert_array_equal(got, want)
