"""Checkpoint key/shape manifest contracts (VERDICT r3 #4).

A manifest records the exact key -> shape/dtype layout of one released
checkpoint artifact (the files download_checkpoints.bash:1-14 and the
upstream repos distribute), so that

* porters are tested against manifest-shaped synthetic state dicts
  (tests/test_port_manifests.py) — a real-weight run can only fail on
  VALUES, never on structure;
* tools/port_checkpoints.py diffs a real checkpoint against its manifest
  BEFORE porting and reports drift (missing / unexpected / mis-shaped
  keys) instead of a porter KeyError mid-stream.

Spec string format (compact, one per key): ``"f32[1024,3,16,16]"`` —
dtype tag + bracketed shape; ``"?i64[]"`` marks a key OPTIONAL (present in
some builds of the artifact, e.g. BatchNorm ``num_batches_tracked`` and
torch-jit meta entries).  Scalars are ``dtype[]``.

Manifests live in tools/ckpt_manifests/*.json; regenerate with
tools/gen_ckpt_manifests.py (pure architectural enumeration — see its
docstring for the derivation sources).  ``record_manifest`` pins a
manifest from a real downloaded file instead, which supersedes the
derived one.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

MANIFEST_DIR = Path(__file__).resolve().parent / "ckpt_manifests"

_DTYPES = {"f32": np.float32, "f16": np.float16, "i64": np.int64,
           "i32": np.int32, "u8": np.uint8, "bool": np.bool_}
_SPEC_RE = re.compile(r"^(\?)?([a-z0-9]+)\[([0-9,]*)\]$")


def spec_of(shape, dtype, optional: bool = False) -> str:
    tag = {v: k for k, v in _DTYPES.items()}[np.dtype(dtype).type]
    body = ",".join(str(int(d)) for d in shape)
    return ("?" if optional else "") + f"{tag}[{body}]"


def parse_spec(spec: str) -> Tuple[Tuple[int, ...], Any, bool]:
    """'?f32[2,3]' -> ((2, 3), np.float32, True)."""
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(f"bad manifest spec: {spec!r}")
    opt, tag, body = m.groups()
    shape = tuple(int(d) for d in body.split(",")) if body else ()
    return shape, _DTYPES[tag], bool(opt)


def load_manifest(name_or_path: str | Path) -> Dict[str, Any]:
    p = Path(name_or_path)
    if not p.suffix:
        p = MANIFEST_DIR / f"{p.name}.json"
    return json.loads(p.read_text())


def save_manifest(manifest: Dict[str, Any], path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(manifest, indent=1, sort_keys=False) + "\n")


def diff_state_dict(sd: Dict[str, Any],
                    manifest: Dict[str, Any]) -> Dict[str, list]:
    """Compare a loaded state dict against a manifest.

    Returns {"missing": [key...], "unexpected": [key...],
             "mismatched": [(key, got_shape, want_shape)...]} — empty lists
    mean the artifact matches the recorded contract.  dtype is NOT
    compared (fp16/fp32 releases of the same artifact both port)."""
    keys = manifest["keys"]
    missing, mismatched = [], []
    for k, spec in keys.items():
        shape, _, optional = parse_spec(spec)
        if k not in sd:
            if not optional:
                missing.append(k)
            continue
        got = tuple(int(d) for d in np.shape(
            sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach")
            else sd[k]))
        if got != shape:
            mismatched.append((k, got, shape))
    unexpected = sorted(set(map(str, sd)) - set(keys))
    return {"missing": missing, "unexpected": unexpected,
            "mismatched": mismatched}


def synthesize_state_dict(manifest: Dict[str, Any], seed: int = 0,
                          include_optional: bool = True,
                          scale: float = 0.05) -> Dict[str, np.ndarray]:
    """Random numpy state dict shaped exactly per the manifest — the
    porter-contract fixture.  Small values keep BN folds / norms sane."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for k, spec in manifest["keys"].items():
        shape, dtype, optional = parse_spec(spec)
        if optional and not include_optional:
            continue
        if np.issubdtype(dtype, np.floating):
            val = rng.normal(size=shape).astype(dtype) * dtype(scale)
            if k.endswith("running_var") or ".bn" in k and k.endswith(
                    "var"):
                val = np.abs(val) + dtype(0.5)
        elif dtype is np.bool_:
            val = np.zeros(shape, dtype)
        else:
            val = np.zeros(shape, dtype)
        sd[k] = val
    return sd


def assemble_netvlad_mat(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Build the nested matconvnet ``net`` struct from a FLAT manifest-shaped
    state dict (keys ``layers.<idx>_<name>.weights.<j>`` and
    ``meta.normalization.averageImage``), suitable for
    ``scipy.io.savemat`` so the NetVLAD porter's real input path
    (``scipy.io.loadmat(..., simplify_cells=True)`` in
    models/netvlad/port.load_netvlad_mat) can be exercised end-to-end
    without the 400 MB release file."""
    layers: Dict[int, Dict[str, Any]] = {}
    avg = None
    for k, v in sd.items():
        if k == "meta.normalization.averageImage":
            avg = v
            continue
        # "layers.<idx>_<name>.weights.<j>"
        rest = k.split(".", 1)[1]
        head, _, j = rest.rsplit(".", 2)
        idx_s, name = head.split("_", 1)
        entry = layers.setdefault(int(idx_s), {"name": name, "weights": {}})
        entry["weights"][int(j)] = v
    cells = []
    for idx in sorted(layers):
        entry = layers[idx]
        w = entry["weights"]
        weights = np.empty(len(w), dtype=object)
        for j in sorted(w):
            weights[j] = w[j]
        cells.append({"name": entry["name"], "weights": weights})
    layer_arr = np.empty(len(cells), dtype=object)
    for i, c in enumerate(cells):
        layer_arr[i] = c
    net: Dict[str, Any] = {"layers": layer_arr}
    if avg is not None:
        net["meta"] = {"normalization": {"averageImage": avg}}
    return {"net": net}


def record_manifest(sd: Dict[str, Any], artifact: str, source: str,
                    container: str) -> Dict[str, Any]:
    """Pin a manifest from a REAL loaded state dict (ground truth beats
    the derived enumeration; run via port_checkpoints.py
    --record-manifests once real files are on disk)."""
    keys = {}
    for k in sd:
        v = sd[k]
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)
        dt = arr.dtype.type
        if dt not in {v2: k2 for k2, v2 in _DTYPES.items()}:
            dt = np.int64 if np.issubdtype(arr.dtype, np.integer) \
                else np.float32
        keys[str(k)] = spec_of(arr.shape, dt)
    return {"artifact": artifact, "source": source, "container": container,
            "derived_from": "recorded from a real downloaded file",
            "keys": keys}


def format_diff(diff: Dict[str, list], limit: int = 8) -> str:
    parts = []
    for kind in ("missing", "unexpected"):
        if diff[kind]:
            shown = ", ".join(diff[kind][:limit])
            more = f" (+{len(diff[kind]) - limit} more)" \
                if len(diff[kind]) > limit else ""
            parts.append(f"{kind}: {shown}{more}")
    if diff["mismatched"]:
        shown = "; ".join(f"{k}: got {g} want {w}"
                          for k, g, w in diff["mismatched"][:limit])
        parts.append(f"mismatched: {shown}")
    return "\n  ".join(parts) if parts else "OK (matches manifest)"
