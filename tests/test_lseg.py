"""LSeg tests: window planning parity, merge semantics vs a numpy oracle,
and golden weight-port parity against a tiny torch re-implementation of the
reference architecture (incl. BatchNorm folding)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.models.lseg import (
    LSegNet, LSegConfig, plan_windows, sliding_window_features,
    features_at_points, normalize_image, port_lseg_state_dict,
    strip_net_prefix, LOGIT_SCALE,
)


class TestWindowPlan:
    def test_reference_geometry_1080x720(self):
        """The dataset's 1080x720 frames (reference lseg_utils.py:42-96)."""
        height, width, ph, pw, crops = plan_windows(720, 1080)
        assert (height, width) == (347, 520)
        assert (ph, pw) == (480, 520)
        assert crops == [(0, 480, 0, 480), (0, 480, 320, 520)]

    def test_square_640x480(self):
        height, width, ph, pw, crops = plan_windows(480, 640)
        assert (height, width) == (390, 520)
        assert (ph, pw) == (480, 520)
        assert len(crops) == 2

    def test_small_image_single_window(self):
        height, width, ph, pw, crops = plan_windows(100, 100, base_size=96,
                                                    crop_size=128)
        assert crops == [(0, 128, 0, 128)]


class TestSlidingWindowMerge:
    def test_count_normalised_average(self):
        """Mock model: identity on channel 0 => merged canvas must equal the
        resized input wherever windows overlap (average of identical
        values), validating scatter + count normalisation."""

        def apply_fn(params, x):  # (B, c, c, 3) -> (B, c, c, 4)
            return jnp.concatenate([x, x[..., :1] * 2.0], axis=-1)

        h, w = 72, 108
        img = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, h, w, 3)),
            jnp.float32)
        out = sliding_window_features(apply_fn, None, img, base_size=52,
                                      crop_size=48)
        height, width, ph, pw, crops = plan_windows(h, w, 52, 48)
        assert out.shape == (2, height, width, 4)
        from avlmaps_tpu.ops.resize import resize_bilinear_align_corners
        ref = np.asarray(resize_bilinear_align_corners(img, height, width))
        np.testing.assert_allclose(np.asarray(out[..., :3]), ref, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[..., 3]), ref[..., 0] * 2,
                                   rtol=1e-5, atol=1e-5)

    def test_features_at_points_gather(self):
        def apply_fn(params, x):
            return x

        img = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 64, 64, 3)), jnp.float32)
        px = jnp.asarray([[0, 5, 51]], jnp.int32)
        py = jnp.asarray([[0, 7, 51]], jnp.int32)
        got = features_at_points(apply_fn, None, img, px, py, base_size=52,
                                 crop_size=48)
        canvas = sliding_window_features(apply_fn, None, img, 52, 48)
        for i, (x, y) in enumerate([(0, 0), (5, 7), (51, 51)]):
            np.testing.assert_allclose(np.asarray(got[0, i]),
                                       np.asarray(canvas[0, y, x]), rtol=1e-6)


class TestTinyForward:
    def test_shapes_and_norm(self):
        cfg = LSegConfig.tiny()
        model = LSegNet(cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 64, 64, 24)  # patch 8: pyramid one octave above patch-16, output 2x input
        assert np.isfinite(np.asarray(out)).all()

    def test_pos_embed_resize_path(self):
        cfg = LSegConfig.tiny()
        model = LSegNet(cfg)
        x32 = jnp.zeros((1, 32, 32, 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x32)
        # different input size reuses the same params (pos-embed resized)
        x48 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 48, 48, 3)),
                          jnp.float32)
        out = model.apply(params, x48)
        assert out.shape == (1, 96, 96, 24)


class TestTorchGoldenParity:
    """Tiny torch model mirroring the reference LSegEncNet layer-for-layer
    (timm ViT block conventions + DPT act_postprocess + BN fusion blocks),
    exported as a reference-style state dict, ported, and compared."""

    W, LAYERS, HEADS, P, FEAT, OUT = 32, 4, 2, 8, 16, 24
    RCH = (8, 16, 32, 32)
    GRID = 4  # pretrain grid (32 / 8)

    @pytest.fixture(scope="class")
    def torch_model(self):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        import torch.nn.functional as F

        W, L, H, P = self.W, self.LAYERS, self.HEADS, self.P
        FEAT, OUT, RCH, GRID = self.FEAT, self.OUT, self.RCH, self.GRID

        class Block(tnn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = tnn.LayerNorm(W, eps=1e-6)
                self.norm2 = tnn.LayerNorm(W, eps=1e-6)
                self.attn = tnn.Module()
                self.attn.qkv = tnn.Linear(W, 3 * W)
                self.attn.proj = tnn.Linear(W, W)
                self.mlp = tnn.Module()
                self.mlp.fc1 = tnn.Linear(W, 4 * W)
                self.mlp.fc2 = tnn.Linear(4 * W, W)

            def forward(self, x):
                b, t, _ = x.shape
                h = self.norm1(x)
                qkv = self.attn.qkv(h).reshape(b, t, 3, H, W // H)
                q, k, v = qkv.permute(2, 0, 3, 1, 4)
                a = (q @ k.transpose(-2, -1)) * (W // H) ** -0.5
                a = a.softmax(dim=-1)
                h = (a @ v).transpose(1, 2).reshape(b, t, W)
                x = x + self.attn.proj(h)
                h = self.norm2(x)
                x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
                return x

        class RCU(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(FEAT, FEAT, 3, padding=1, bias=False)
                self.conv2 = tnn.Conv2d(FEAT, FEAT, 3, padding=1, bias=False)
                self.bn1 = tnn.BatchNorm2d(FEAT)
                self.bn2 = tnn.BatchNorm2d(FEAT)

            def forward(self, x):
                out = F.relu(x)
                out = self.bn1(self.conv1(out))
                out = F.relu(out)
                out = self.bn2(self.conv2(out))
                return out + x

        class Fusion(tnn.Module):
            def __init__(self):
                super().__init__()
                self.resConfUnit1 = RCU()
                self.resConfUnit2 = RCU()
                self.out_conv = tnn.Conv2d(FEAT, FEAT, 1)

            def forward(self, *xs):
                out = xs[0]
                if len(xs) == 2:
                    out = out + self.resConfUnit1(xs[1])
                out = self.resConfUnit2(out)
                out = F.interpolate(out, scale_factor=2, mode="bilinear",
                                    align_corners=True)
                return self.out_conv(out)

        class TinyLSeg(tnn.Module):
            def __init__(self):
                super().__init__()
                pm = tnn.Module()
                pm.patch_embed = tnn.Module()
                pm.patch_embed.proj = tnn.Conv2d(3, W, P, stride=P)
                pm.cls_token = tnn.Parameter(torch.randn(1, 1, W) * 0.02)
                pm.pos_embed = tnn.Parameter(
                    torch.randn(1, GRID * GRID + 1, W) * 0.02)
                pm.blocks = tnn.ModuleList([Block() for _ in range(L)])
                self.pretrained_model = pm
                # act_postprocess: readout project + 1x1 + resample
                def ap(lvl, ch):
                    m = tnn.Module()
                    proj = tnn.Module()
                    proj.add_module("0", tnn.Linear(2 * W, W))
                    m.project = proj
                    m.conv = tnn.Conv2d(W, ch, 1)
                    if lvl == 0:
                        m.resample = tnn.ConvTranspose2d(ch, ch, 4, stride=4)
                    elif lvl == 1:
                        m.resample = tnn.ConvTranspose2d(ch, ch, 2, stride=2)
                    elif lvl == 3:
                        m.resample = tnn.Conv2d(ch, ch, 3, stride=2,
                                                padding=1)
                    else:
                        m.resample = None
                    return m
                self.aps = tnn.ModuleList([ap(i, RCH[i]) for i in range(4)])
                self.scratch_convs = tnn.ModuleList([
                    tnn.Conv2d(RCH[i], FEAT, 3, padding=1, bias=False)
                    for i in range(4)])
                self.refinenets = tnn.ModuleList(
                    [Fusion() for _ in range(4)])
                self.head1 = tnn.Conv2d(FEAT, OUT, 1)

            def forward(self, x):
                b, c, h, w = x.shape
                gh, gw = h // P, w // P
                pm = self.pretrained_model
                t = pm.patch_embed.proj(x).flatten(2).transpose(1, 2)
                cls = pm.cls_token.expand(b, -1, -1)
                t = torch.cat([cls, t], dim=1)
                pos = pm.pos_embed
                if gh != GRID or gw != GRID:
                    tok, grid = pos[:, :1], pos[0, 1:]
                    grid = grid.reshape(1, GRID, GRID, -1).permute(0, 3, 1, 2)
                    grid = F.interpolate(grid, size=(gh, gw), mode="bilinear")
                    grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
                    pos = torch.cat([tok, grid], dim=1)
                t = t + pos
                taps = []
                for i, blk in enumerate(pm.blocks):
                    t = blk(t)
                    taps.append(t)
                layers = []
                for lvl in range(4):
                    a = taps[lvl]
                    ro = torch.cat(
                        [a[:, 1:], a[:, :1].expand_as(a[:, 1:])], dim=-1)
                    a = F.gelu(self.aps[lvl].project._modules["0"](ro))
                    a = a.transpose(1, 2).reshape(b, W, gh, gw)
                    a = self.aps[lvl].conv(a)
                    if self.aps[lvl].resample is not None:
                        a = self.aps[lvl].resample(a)
                    layers.append(self.scratch_convs[lvl](a))
                path = self.refinenets[3](layers[3])
                path = self.refinenets[2](path, layers[2])
                path = self.refinenets[1](path, layers[1])
                path = self.refinenets[0](path, layers[0])
                feats = self.head1(path)
                ish = feats.shape
                f = feats.permute(0, 2, 3, 1).reshape(-1, OUT)
                f = f / f.norm(dim=-1, keepdim=True)
                f = f * (1 / 0.07)
                f = f.reshape(ish[0], ish[2], ish[3], OUT).permute(0, 3, 1, 2)
                return F.interpolate(f, scale_factor=2, mode="bilinear",
                                     align_corners=True)

        torch.manual_seed(0)
        m = TinyLSeg()
        # randomise BN running stats so folding is actually exercised
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
        return m.eval()

    def _state_dict(self, m):
        """Re-key the tiny torch model into the reference checkpoint naming
        (net.pretrained.model..., net.pretrained.act_postprocessK...,
        net.scratch...)."""
        import torch

        sd = {}
        pm = m.pretrained_model
        sd["net.pretrained.model.patch_embed.proj.weight"] = \
            pm.patch_embed.proj.weight
        sd["net.pretrained.model.patch_embed.proj.bias"] = \
            pm.patch_embed.proj.bias
        sd["net.pretrained.model.cls_token"] = pm.cls_token
        sd["net.pretrained.model.pos_embed"] = pm.pos_embed
        for i, blk in enumerate(pm.blocks):
            p = f"net.pretrained.model.blocks.{i}"
            sd[f"{p}.norm1.weight"] = blk.norm1.weight
            sd[f"{p}.norm1.bias"] = blk.norm1.bias
            sd[f"{p}.norm2.weight"] = blk.norm2.weight
            sd[f"{p}.norm2.bias"] = blk.norm2.bias
            sd[f"{p}.attn.qkv.weight"] = blk.attn.qkv.weight
            sd[f"{p}.attn.qkv.bias"] = blk.attn.qkv.bias
            sd[f"{p}.attn.proj.weight"] = blk.attn.proj.weight
            sd[f"{p}.attn.proj.bias"] = blk.attn.proj.bias
            sd[f"{p}.mlp.fc1.weight"] = blk.mlp.fc1.weight
            sd[f"{p}.mlp.fc1.bias"] = blk.mlp.fc1.bias
            sd[f"{p}.mlp.fc2.weight"] = blk.mlp.fc2.weight
            sd[f"{p}.mlp.fc2.bias"] = blk.mlp.fc2.bias
        for lvl in range(4):
            ap = f"net.pretrained.act_postprocess{lvl + 1}"
            sd[f"{ap}.0.project.0.weight"] = \
                m.aps[lvl].project._modules["0"].weight
            sd[f"{ap}.0.project.0.bias"] = \
                m.aps[lvl].project._modules["0"].bias
            sd[f"{ap}.3.weight"] = m.aps[lvl].conv.weight
            sd[f"{ap}.3.bias"] = m.aps[lvl].conv.bias
            if m.aps[lvl].resample is not None:
                sd[f"{ap}.4.weight"] = m.aps[lvl].resample.weight
                sd[f"{ap}.4.bias"] = m.aps[lvl].resample.bias
            sd[f"net.scratch.layer{lvl + 1}_rn.weight"] = \
                m.scratch_convs[lvl].weight
        for r in range(4):
            p = f"net.scratch.refinenet{r + 1}"
            fu = m.refinenets[r]
            for name, rcu in (("resConfUnit1", fu.resConfUnit1),
                              ("resConfUnit2", fu.resConfUnit2)):
                sd[f"{p}.{name}.conv1.weight"] = rcu.conv1.weight
                sd[f"{p}.{name}.conv2.weight"] = rcu.conv2.weight
                for bi, bn in (("bn1", rcu.bn1), ("bn2", rcu.bn2)):
                    sd[f"{p}.{name}.{bi}.weight"] = bn.weight
                    sd[f"{p}.{name}.{bi}.bias"] = bn.bias
                    sd[f"{p}.{name}.{bi}.running_mean"] = bn.running_mean
                    sd[f"{p}.{name}.{bi}.running_var"] = bn.running_var
            sd[f"{p}.out_conv.weight"] = fu.out_conv.weight
            sd[f"{p}.out_conv.bias"] = fu.out_conv.bias
        sd["net.scratch.head1.weight"] = m.head1.weight
        sd["net.scratch.head1.bias"] = m.head1.bias
        return sd

    def test_full_forward_parity(self, torch_model):
        import torch

        sd = self._state_dict(torch_model)
        variables = port_lseg_state_dict(sd, vit_layers=self.LAYERS)

        cfg = LSegConfig.tiny()
        model = LSegNet(cfg)
        x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
            np.float32)
        with torch.no_grad():
            expected = torch_model(
                torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected,
                                   rtol=5e-3, atol=5e-3)

    def test_forward_parity_resized_posembed(self, torch_model):
        """48x48 input exercises the pos-embed bilinear resize path."""
        import torch

        sd = self._state_dict(torch_model)
        variables = port_lseg_state_dict(sd, vit_layers=self.LAYERS)
        model = LSegNet(LSegConfig.tiny())
        x = np.random.default_rng(1).normal(size=(1, 48, 48, 3)).astype(
            np.float32)
        with torch.no_grad():
            expected = torch_model(
                torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected,
                                   rtol=5e-3, atol=5e-3)


def test_normalize_image():
    img = np.full((4, 4, 3), 255, np.uint8)
    out = normalize_image(img)
    np.testing.assert_allclose(out, 1.0)
    img0 = np.zeros((4, 4, 3), np.uint8)
    np.testing.assert_allclose(normalize_image(img0), -1.0)


def test_strip_net_prefix():
    sd = {"net.scratch.head1.weight": 1, "other": 2}
    out = strip_net_prefix(sd)
    assert "scratch.head1.weight" in out and "other" in out
