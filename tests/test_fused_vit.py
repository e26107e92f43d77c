"""Parity tests for the fused ViT-block Pallas kernels (ops/fused_vit.py).

The kernels run through the Pallas interpreter on CPU; the production gate
(TPU + bf16) is exercised by tests_tpu/ and the bench.  Reference math is
the unfused einsum/flax path of the same ViTBlock, which is itself
golden-tested against torch in tests/test_lseg.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avlmaps_tpu.models.lseg.vit import ViTBlock
from avlmaps_tpu.ops import fused_vit
from avlmaps_tpu.ops.fused_vit import gelu_matmul, ln_matmul, mha_oneshot


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_mha_oneshot_matches_einsum(rng):
    b, t, heads, hd = 2, 37, 4, 16
    w = heads * hd
    qkv = jnp.asarray(rng.normal(size=(b, t, 3 * w)).astype(np.float32))
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(z):
        return z.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

    scale = 1.0 / np.sqrt(hd)
    logits = jnp.einsum("bhqd,bhkd->bhqk", split_heads(q),
                        split_heads(k)) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", probs, split_heads(v))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, w)

    out = mha_oneshot(qkv, heads, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("ln_chunks", [None, 1, 2, 4])
def test_ln_matmul_matches_flax_ln_dense(rng, monkeypatch, ln_chunks):
    # M deliberately NOT a multiple of the 512 block: exercises the masked
    # partial last block (the production M = 8*901 = 7208 is partial too).
    # ln_chunks=2/4 force the chunked-prologue branches the production fc
    # (N=4096) and qkv (N=3072) layers select via the auto rule.
    monkeypatch.setattr(fused_vit, "LN_CHUNKS", ln_chunks)
    m, k, n = 1100, 96, 256
    eps = 1e-6
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps) * g + c
    ref = ln @ w + bias

    out = ln_matmul(x, g, c, w, bias, eps=eps, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-5)


def test_ln_matmul_auto_rule_chunks_wide_layers(rng, monkeypatch):
    """The auto rule (LN_CHUNKS=None) must pick chunks=2 at the fc width
    (N>=4096), 4 at the qkv width (N>=2048), and 1 below; an explicit 1
    must disable chunking even at the fc width — pinned by spying on the
    kernel partials."""
    import functools as ft
    seen = {}
    orig = fused_vit._blocked_matmul_call

    def spy(kernel, *a, **kw):
        assert isinstance(kernel, ft.partial)
        seen["chunks"] = kernel.keywords.get("chunks")
        return orig(kernel, *a, **kw)

    monkeypatch.setattr(fused_vit, "_blocked_matmul_call", spy)
    k = 32
    x = jnp.asarray(rng.normal(size=(16, k)).astype(np.float32))
    g = jnp.ones((k,), jnp.float32)
    c = jnp.zeros((k,), jnp.float32)
    bias_wide = jnp.zeros((4096,), jnp.float32)
    w_wide = jnp.asarray(rng.normal(size=(k, 4096)).astype(np.float32))

    monkeypatch.setattr(fused_vit, "LN_CHUNKS", None)
    ln_matmul(x, g, c, w_wide, bias_wide, eps=1e-6, interpret=True)
    assert seen["chunks"] == 2
    w_qkv = w_wide[:, :3072]
    ln_matmul(x, g, c, w_qkv, bias_wide[:3072], eps=1e-6, interpret=True)
    assert seen["chunks"] == 4
    w_narrow = w_wide[:, :256]
    ln_matmul(x, g, c, w_narrow, bias_wide[:256], eps=1e-6, interpret=True)
    assert seen["chunks"] == 1
    monkeypatch.setattr(fused_vit, "LN_CHUNKS", 1)
    ln_matmul(x, g, c, w_wide, bias_wide, eps=1e-6, interpret=True)
    assert seen["chunks"] == 1


@pytest.mark.parametrize("gelu_chunks", [1, 2])
def test_gelu_matmul_matches_unfused(rng, monkeypatch, gelu_chunks):
    monkeypatch.setattr(fused_vit, "GELU_CHUNKS", gelu_chunks)
    m, k, n = 530, 128, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    ref = jax.nn.gelu(x, approximate=False) @ w + bias
    out = gelu_matmul(x, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-5)


def test_gelu_matmul_kblocked_matches_unfused(rng):
    # k >= 2048 takes the k-blocked accumulator path (mlp_proj at ViT-L);
    # m=530 also exercises the masked final M block
    m, k, n = 530, 2048, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    ref = jax.nn.gelu(x, approximate=False) @ w + bias
    out = gelu_matmul(x, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-5)


def test_ln_mlp_residual_matches_unfused_chain(rng):
    # m > 512 and not a 512-multiple: exercises the chunks=4 software
    # pipeline AND the masked partial last grid block; k/n1 mirror the
    # ViT shape ratio (n1 = 4k).
    m, k, n1 = 700, 64, 256
    eps = 1e-6
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(k, n1)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(n1,)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(n1, k)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(k,)).astype(np.float32))

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps) * g + c
    ref = x + jax.nn.gelu(ln @ w1 + b1, approximate=False) @ w2 + b2

    out = fused_vit.ln_mlp_residual(x, g, c, w1, b1, w2, b2, eps=eps,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-5)


def test_ln_mlp_residual_oversize_weights_fall_back(rng, monkeypatch):
    # weights past the VMEM-stationary budget must route through the
    # unfused ln_matmul + gelu_matmul pair (same math)
    calls = []
    orig = fused_vit.ln_matmul
    monkeypatch.setattr(fused_vit, "ln_matmul",
                        lambda *a, **kw: calls.append(1) or orig(*a, **kw))
    m, k, n1 = 16, 2048, 4096  # 2048*4096*2 f32 weights = 64 MB > budget
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    g = jnp.ones((k,), jnp.float32)
    c = jnp.zeros((k,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(k, n1)).astype(np.float32) * 0.02)
    b1 = jnp.zeros((n1,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(n1, k)).astype(np.float32) * 0.02)
    b2 = jnp.zeros((k,), jnp.float32)
    out = fused_vit.ln_mlp_residual(x, g, c, w1, b1, w2, b2, eps=1e-6,
                                    interpret=True)
    assert calls, "oversize weights should take the unfused path"
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    ref = x + jax.nn.gelu(ln @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-5)


def _blocks(attn_impl):
    return ViTBlock(width=64, heads=4, mlp_ratio=4, ln_eps=1e-6,
                    dtype=jnp.float32, attn_impl=attn_impl)


def test_fused_block_matches_reference_block(rng):
    """Full fused block (interpreted kernels) == unfused einsum block,
    same params."""
    x = jnp.asarray(rng.normal(size=(2, 19, 64)).astype(np.float32))
    ref_blk = _blocks("einsum")
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    ref = ref_blk.apply(params, x)

    fused_vit.FORCE_INTERPRET = True
    try:
        out = _blocks("fused").apply(params, x)
    finally:
        fused_vit.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fused_init_tree_identical_to_reference(rng):
    """Param trees (structure AND values) from the fused path's param-only
    modules match nn.Dense/nn.LayerNorm init — ported checkpoints and
    TPU-side init are interchangeable with the CPU path."""
    x = jnp.asarray(rng.normal(size=(1, 9, 64)).astype(np.float32))
    p_ref = _blocks("einsum").init(jax.random.PRNGKey(3), x)

    fused_vit.FORCE_INTERPRET = True
    try:
        p_fused = _blocks("fused").init(jax.random.PRNGKey(3), x)
    finally:
        fused_vit.FORCE_INTERPRET = False

    ref_flat = jax.tree_util.tree_flatten_with_path(p_ref)[0]
    fused_flat = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [k for k, _ in ref_flat] == [k for k, _ in fused_flat]
    for (path, a), (_, b) in zip(ref_flat, fused_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))


def test_fused_falls_back_off_tpu(rng):
    """attn_impl='fused' without FORCE_INTERPRET on CPU runs the einsum
    fallback and matches it exactly."""
    x = jnp.asarray(rng.normal(size=(1, 9, 64)).astype(np.float32))
    ref_blk = _blocks("einsum")
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    out = _blocks("fused").apply(params, x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(ref_blk.apply(params, x)))


def test_dense_vit_pads_tokens_and_masks_keys(rng):
    """The fused backbone pads the token axis to the next 8-multiple
    (Mosaic sublane-block requirement) and masks the pad keys; taps must
    match the unpadded einsum backbone at a t % 8 != 0 shape."""
    from avlmaps_tpu.models.lseg.vit import DenseViT, DenseViTConfig

    cfg = dict(patch_size=4, width=64, layers=2, heads=4, mlp_ratio=4,
               hooks=(0, 1), pretrain_grid=3)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 3)).astype(np.float32))
    # 3x3 grid + cls = 10 tokens -> pads to 16 under the fused path
    ref_vit = DenseViT(DenseViTConfig(attn_impl="einsum", **cfg))
    params = ref_vit.init(jax.random.PRNGKey(0), x)
    ref_taps = ref_vit.apply(params, x)

    fused_vit.FORCE_INTERPRET = True
    try:
        taps = DenseViT(DenseViTConfig(attn_impl="fused", **cfg)).apply(
            params, x)
    finally:
        fused_vit.FORCE_INTERPRET = False

    assert len(taps) == len(ref_taps)
    for got, want in zip(taps, ref_taps):
        assert got.shape == want.shape  # pad sliced back off: (2, 10, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)
