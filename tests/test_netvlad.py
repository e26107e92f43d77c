"""NetVLAD global descriptor: flax-vs-torch golden parity, VLAD math
oracle, matconvnet .mat porter, and VisualMap retrieval integration
(reference selects hloc NetVLAD at localization_utils.py:134-136)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.models.netvlad import (
    NetVLAD, NetVLADConfig, NetVLADEncoder, load_netvlad_encoder,
    load_netvlad_mat,
)

CFG = NetVLADConfig.tiny()  # clusters 4, dim 32, whiten 16


@pytest.fixture(scope="module")
def tiny_netvlad():
    model = NetVLAD(CFG)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 3), jnp.float32))
    return model, params


class TestNetVLADModule:
    def test_output_unit_norm_and_shape(self, tiny_netvlad, rng):
        model, params = tiny_netvlad
        x = jnp.asarray(rng.normal(size=(3, 16, 16, 3)).astype(np.float32))
        out = np.asarray(model.apply(params, x))
        assert out.shape == (3, CFG.whiten_dim)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   rtol=1e-5)

    def test_vlad_math_vs_numpy_oracle(self, tiny_netvlad, rng):
        """The einsum VLAD (agg - mass*centers) equals the literal
        per-cluster residual sum."""
        model, params = tiny_netvlad
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))

        # reproduce the head on host from the same backbone activations
        from avlmaps_tpu.models.netvlad.model import VGGBackbone

        feats = np.asarray(VGGBackbone(CFG).apply(
            {"params": params["params"]["backbone"]}, x))
        n = feats.shape[1] * feats.shape[2]
        f = feats.reshape(n, CFG.dim)
        f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        p = params["params"]
        logits = f @ np.asarray(p["assign"]["kernel"]) \
            + np.asarray(p["assign"]["bias"])
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        a = e / e.sum(axis=1, keepdims=True)
        centers = np.asarray(p["centers"])
        vlad = np.zeros((CFG.clusters, CFG.dim), np.float32)
        for k in range(CFG.clusters):  # literal residual formulation
            vlad[k] = (a[:, k:k + 1] * (f - centers[k])).sum(axis=0)
        vlad /= np.maximum(np.linalg.norm(vlad, axis=1, keepdims=True),
                           1e-12)
        v = vlad.reshape(-1)
        v /= max(np.linalg.norm(v), 1e-12)
        out = v @ np.asarray(p["whiten"]["kernel"]) \
            + np.asarray(p["whiten"]["bias"])
        out /= max(np.linalg.norm(out), 1e-12)

        got = np.asarray(model.apply(params, x))[0]
        np.testing.assert_allclose(got, out, rtol=1e-4, atol=1e-5)

    def test_golden_vs_torch(self, rng):
        """Activation parity against the independent torch re-derivation
        (tools/torch_reference/netvlad_torch.py), weights copied over."""
        import torch
        from tools.torch_reference.netvlad_torch import (
            TorchNetVLAD, TorchNetVLADSpec,
        )

        torch.manual_seed(0)
        tm = TorchNetVLAD(TorchNetVLADSpec(clusters=CFG.clusters,
                                           dim=CFG.dim,
                                           whiten_dim=CFG.whiten_dim)).eval()
        params = {"params": {
            "backbone": {
                "conv_0": {
                    "kernel": tm.conv0.weight.detach().numpy().transpose(
                        2, 3, 1, 0),
                    "bias": tm.conv0.bias.detach().numpy()},
                "conv_1": {
                    "kernel": tm.conv1.weight.detach().numpy().transpose(
                        2, 3, 1, 0),
                    "bias": tm.conv1.bias.detach().numpy()},
            },
            "assign": {"kernel": tm.assign.weight.detach().numpy().T,
                       "bias": tm.assign.bias.detach().numpy()},
            "centers": tm.centers.detach().numpy(),
            "whiten": {"kernel": tm.whiten.weight.detach().numpy().T,
                       "bias": tm.whiten.bias.detach().numpy()},
        }}
        params = jax.tree.map(jnp.asarray, params)
        x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
        got = np.asarray(NetVLAD(CFG).apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestNetVLADPorter:
    def _write_mat(self, path, rng):
        """Synthesize the matconvnet layout (net.layers struct array with
        name/weights, net.meta.normalization.averageImage)."""
        from scipy.io import savemat

        d, k, wd = CFG.dim, CFG.clusters, CFG.whiten_dim
        layers = [
            {"name": "conv1_1",
             "weights": np.empty(2, object)},
            {"name": "relu1_1"},
            {"name": "pool1"},
            {"name": "conv1_2",
             "weights": np.empty(2, object)},
            {"name": "vlad:core",
             "weights": np.empty(3, object)},
            {"name": "WPCA",
             "weights": np.empty(2, object)},
        ]
        layers[0]["weights"][0] = rng.normal(
            size=(3, 3, 3, d)).astype(np.float32)
        layers[0]["weights"][1] = rng.normal(size=(d,)).astype(np.float32)
        layers[3]["weights"][0] = rng.normal(
            size=(3, 3, d, d)).astype(np.float32)
        layers[3]["weights"][1] = rng.normal(size=(d,)).astype(np.float32)
        layers[4]["weights"][0] = rng.normal(
            size=(1, 1, d, k)).astype(np.float32)
        layers[4]["weights"][1] = rng.normal(size=(k,)).astype(np.float32)
        layers[4]["weights"][2] = rng.normal(size=(d, k)).astype(np.float32)
        layers[5]["weights"][0] = rng.normal(
            size=(1, 1, k * d, wd)).astype(np.float32)
        layers[5]["weights"][1] = rng.normal(size=(wd,)).astype(np.float32)
        avg = np.asarray([103.0, 116.0, 123.0], np.float32).reshape(1, 3)
        savemat(path, {"net": {
            "layers": layers,
            "meta": {"normalization": {"averageImage": avg}},
        }})
        return layers, avg

    def test_port_roundtrip(self, tmp_path, rng):
        mat = tmp_path / "netvlad.mat"
        layers, avg = self._write_mat(mat, rng)
        params, average, cfg = load_netvlad_mat(str(mat))
        assert cfg.clusters == CFG.clusters and cfg.dim == CFG.dim
        np.testing.assert_allclose(average, avg.reshape(-1), rtol=1e-6)
        np.testing.assert_allclose(
            params["params"]["backbone"]["conv_0"]["kernel"],
            layers[0]["weights"][0], rtol=1e-6)
        np.testing.assert_allclose(
            params["params"]["assign"]["kernel"],
            layers[4]["weights"][0].reshape(CFG.dim, CFG.clusters),
            rtol=1e-6)
        # the .mat stores NEGATED centers (hloc: center_w = -weights[1])
        np.testing.assert_allclose(
            params["params"]["centers"],
            -layers[4]["weights"][2].T, rtol=1e-6)

        enc = load_netvlad_encoder(str(mat))
        img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        out = enc.get_img_feats(img)
        assert out.shape == (1, CFG.whiten_dim)
        np.testing.assert_allclose(np.linalg.norm(out), 1.0, rtol=1e-5)


class TestVisualMapWithNetVLAD:
    def test_retrieval_integration(self, tmp_path, rng):
        """NetVLADEncoder drops into VisualMap's retrieval seam: nearest
        frame of a near-duplicate query is the source frame."""
        import cv2

        from avlmaps_tpu.config import load_config
        from avlmaps_tpu.map.visual_map import VisualMap

        root = tmp_path / "scene"
        (root / "rgb").mkdir(parents=True)
        n = 4
        imgs = []
        for i in range(n):
            img = np.zeros((16, 16, 3), np.uint8)
            img[:, : 4 * (i + 1)] = 255  # distinct coverage per frame
            imgs.append(img)
            cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"), img)
        poses = np.zeros((n, 7))
        poses[:, -1] = 1.0
        np.savetxt(root / "poses.txt", poses)

        enc = NetVLADEncoder(CFG, image_size=16)
        vm = VisualMap(load_config().map_config, clip_encoder=enc)
        vm.create_and_load_map(root)
        assert vm.descriptors.shape == (n, CFG.whiten_dim)
        hits = [int(vm.retrieve(imgs[i])[0]) for i in range(n)]
        assert hits == list(range(n))
