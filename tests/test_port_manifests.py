"""Checkpoint key-manifest contracts (VERDICT r3 #4).

tools/ckpt_manifests/*.json record the exact key -> shape layout of the
real release artifacts (download_checkpoints.bash:1-14 + upstream repos).
These tests run every porter against MANIFEST-shaped synthetic state
dicts and pin the ported tree to the flax model's init structure at the
release scale — so a real-weight run can only fail on values, never on
structure — and pin the drift-detection behaviour the port CLI relies on.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from ckpt_manifest import (MANIFEST_DIR, diff_state_dict,  # noqa: E402
                           load_manifest, parse_spec, synthesize_state_dict)

ALL_MANIFESTS = ["lseg_demo_e200", "clip_vitb32", "audioclip_partial",
                 "superpoint_v1", "superglue_indoor", "superglue_outdoor",
                 "netvlad_pitts30k", "wav2clip_resnet18"]


def _paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_paths(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(int(d) for d in np.shape(v))
    return out


@pytest.fixture(scope="module", params=ALL_MANIFESTS)
def manifest(request):
    path = MANIFEST_DIR / f"{request.param}.json"
    if not path.exists():
        pytest.fail(f"{path} missing — run tools/gen_ckpt_manifests.py "
                    "and commit the output")
    return request.param, load_manifest(path)


def test_manifest_wellformed_and_roundtrips(manifest):
    name, m = manifest
    assert m["artifact"] and m["source"] and m["keys"]
    for k, spec in m["keys"].items():
        parse_spec(spec)  # raises on malformed entries
    sd = synthesize_state_dict(m, seed=1)
    diff = diff_state_dict(sd, m)
    assert diff == {"missing": [], "unexpected": [], "mismatched": []}
    # optional keys omitted must still be clean
    sd2 = synthesize_state_dict(m, seed=1, include_optional=False)
    diff2 = diff_state_dict(sd2, m)
    assert diff2 == {"missing": [], "unexpected": [], "mismatched": []}


def test_diff_flags_every_drift_kind():
    m = load_manifest(MANIFEST_DIR / "superpoint_v1.json")
    sd = synthesize_state_dict(m)
    required = next(k for k, s in m["keys"].items()
                    if not parse_spec(s)[2])
    del sd[required]
    sd["stray.key"] = np.zeros((3,), np.float32)
    reshaped = next(k for k in sd if k != "stray.key")
    sd[reshaped] = np.zeros((1, 2, 3), np.float32)
    diff = diff_state_dict(sd, m)
    assert diff["missing"] == [required]
    assert diff["unexpected"] == ["stray.key"]
    assert [k for k, _, _ in diff["mismatched"]] == [reshaped]


def test_lseg_porter_consumes_manifest_shape():
    """demo_e200.ckpt contract: porter output == LSegNet.vitl16 init tree
    (reference strict-load contract, vlmap_builder.py:246-249)."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.lseg.model import LSegConfig, LSegNet
    from avlmaps_tpu.models.lseg.port import port_lseg_state_dict

    sd = synthesize_state_dict(load_manifest("lseg_demo_e200"), seed=2)
    variables = port_lseg_state_dict(sd)

    model = LSegNet(LSegConfig.vitl16())
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, 480, 480, 3), jnp.float32))
    assert _paths(variables["params"]) == _paths(ref["params"])


def test_clip_porter_consumes_manifest_shape():
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.clip.model import Clip
    from avlmaps_tpu.models.clip.port import (config_from_state_dict,
                                              port_clip_state_dict)

    sd = synthesize_state_dict(load_manifest("clip_vitb32"), seed=3)
    cfg = config_from_state_dict(sd)
    assert (cfg.embed_dim, cfg.vision_width, cfg.patch_size,
            cfg.vision_layers, cfg.text_width, cfg.text_layers,
            cfg.image_size) == (512, 768, 32, 12, 512, 12, 224)
    variables = port_clip_state_dict(sd)

    model = Clip(cfg)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.context_length), jnp.int32),
                         jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert _paths(variables["params"]) == _paths(ref["params"])


def test_audioclip_porter_consumes_manifest_shape():
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.audioclip.audioclip import (AudioClip,
                                                        AudioClipConfig)
    from avlmaps_tpu.models.audioclip.port import (config_from_state_dict,
                                                   port_audioclip_state_dict)

    sd = synthesize_state_dict(load_manifest("audioclip_partial"), seed=4)
    cfg = config_from_state_dict(sd)
    base = AudioClipConfig()
    assert cfg.embed_dim == base.embed_dim == 1024
    assert cfg.audio.layers == base.audio.layers
    assert cfg.vision.layers == base.vision.layers
    variables = port_audioclip_state_dict(sd, cfg)

    model = AudioClip(cfg)
    img = cfg.vision.image_size
    ref = jax.eval_shape(
        lambda k, a, v, t: model.init(k, a, v, t,
                                      method=AudioClip.tri_modal),
        jax.random.PRNGKey(0), jnp.zeros((1, 8192), jnp.float32),
        jnp.zeros((1, img, img, 3), jnp.float32),
        jnp.zeros((1, cfg.context_length), jnp.int32))
    assert _paths(variables["params"]) == _paths(ref["params"])


def test_superpoint_porter_consumes_manifest_shape():
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.superpoint.model import SuperPointNet
    from avlmaps_tpu.models.superpoint.port import (config_from_state_dict,
                                                    port_superpoint_state_dict)

    sd = synthesize_state_dict(load_manifest("superpoint_v1"), seed=5)
    cfg = config_from_state_dict(sd)
    assert cfg.desc_dim == 256
    variables = port_superpoint_state_dict(sd)
    model = SuperPointNet(cfg)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 1), jnp.float32))
    assert _paths(variables["params"]) == _paths(ref["params"])


@pytest.mark.parametrize("variant", ["superglue_indoor",
                                     "superglue_outdoor"])
def test_superglue_porter_consumes_manifest_shape(variant):
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.superglue.model import SuperGlueNet
    from avlmaps_tpu.models.superglue.port import (config_from_state_dict,
                                                   port_superglue_state_dict)

    sd = synthesize_state_dict(load_manifest(variant), seed=6)
    cfg = config_from_state_dict(sd)
    assert cfg.desc_dim == 256 and cfg.gnn_layers == 9
    variables = port_superglue_state_dict(sd)
    model = SuperGlueNet(cfg)
    k = 8
    f = lambda: (jnp.zeros((1, k, 2), jnp.float32),  # noqa: E731
                 jnp.zeros((1, k), jnp.float32),
                 jnp.zeros((1, k, cfg.desc_dim), jnp.float32),
                 jnp.ones((1, k), bool))
    ref = jax.eval_shape(
        lambda key: model.init(key, *f(), *f(), (480, 640), (480, 640)),
        jax.random.PRNGKey(0))
    assert _paths(variables["params"]) == _paths(ref["params"])


def _write_netvlad_mat(tmp_path, seed=8):
    from scipy.io import savemat

    from ckpt_manifest import assemble_netvlad_mat

    sd = synthesize_state_dict(load_manifest("netvlad_pitts30k"), seed=seed)
    path = tmp_path / "Pitts30K_struct.mat"
    savemat(str(path), assemble_netvlad_mat(sd))
    return path, sd


def test_netvlad_porter_consumes_manifest_mat(tmp_path):
    """NetVLAD .mat contract (VERDICT r4 #4): synthesize the manifest-shaped
    matconvnet struct, round-trip through scipy savemat/loadmat (the real
    input path, simplify_cells layer/weights cells), and check the porter's
    flax tree against NetVLAD.init at release scale — including the
    center negation and averageImage reduction."""
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.netvlad.model import NetVLAD
    from avlmaps_tpu.models.netvlad.port import load_netvlad_mat

    path, sd = _write_netvlad_mat(tmp_path)
    params, avg, cfg = load_netvlad_mat(str(path))
    assert (cfg.clusters, cfg.dim, cfg.whiten_dim) == (64, 512, 4096)
    np.testing.assert_allclose(
        avg, sd["meta.normalization.averageImage"].reshape(-1, 3
                                                           ).mean(axis=0))
    # the file stores NEGATED centers; the porter recovers the true ones
    raw_centers = sd["layers.13_vlad:core.weights.1"]  # (D, K)
    np.testing.assert_allclose(params["params"]["centers"],
                               -raw_centers.T, rtol=1e-6)

    model = NetVLAD(cfg)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert _paths(params["params"]) == _paths(ref["params"])


def test_wav2clip_porter_consumes_manifest_shape():
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.wav2clip import (Wav2Clip, Wav2ClipConfig,
                                             port_wav2clip_state_dict)

    sd = synthesize_state_dict(load_manifest("wav2clip_resnet18"), seed=9)
    cfg = Wav2ClipConfig()
    variables = port_wav2clip_state_dict(sd, cfg)
    model = Wav2Clip(cfg)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, cfg.sample_rate), jnp.float32))
    assert _paths(variables["params"]) == _paths(ref["params"])


def test_port_cli_netvlad_manifest_diff(tmp_path, capsys):
    """The port CLI's netvlad family diff runs through the .mat flattener
    (weighted-layer enumeration) and reports clean/drift correctly."""
    import port_checkpoints as pc

    path, _ = _write_netvlad_mat(tmp_path, seed=10)
    pc.check_against_manifest("netvlad", str(path), strict=True)
    assert "OK (matches manifest)" in capsys.readouterr().out


def test_manifest_name_picks_superglue_variant():
    import port_checkpoints as pc

    assert pc._manifest_name("superglue", "x/superglue_indoor.pth") == \
        "superglue_indoor"
    assert pc._manifest_name("superglue", "x/superglue_outdoor.pth") == \
        "superglue_outdoor"
    assert pc._manifest_name("netvlad", "Pitts30K_struct.mat") == \
        "netvlad_pitts30k"
    assert pc._manifest_name("wav2clip", "Wav2CLIP.pt") == \
        "wav2clip_resnet18"


def test_port_cli_manifest_check_reports_drift(tmp_path, capsys):
    """port_checkpoints.check_against_manifest: clean file -> OK line;
    drifted file + strict -> SystemExit."""
    torch = pytest.importorskip("torch")
    import port_checkpoints as pc

    m = load_manifest("superpoint_v1")
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          synthesize_state_dict(m, seed=7).items()}
    path = tmp_path / "superpoint_v1.pth"
    torch.save(sd, path)
    pc.check_against_manifest("superpoint", str(path), strict=True)
    assert "OK (matches manifest)" in capsys.readouterr().out

    del sd["convPb.bias"]
    torch.save(sd, path)
    pc.check_against_manifest("superpoint", str(path), strict=False)
    assert "missing: convPb.bias" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        pc.check_against_manifest("superpoint", str(path), strict=True)
