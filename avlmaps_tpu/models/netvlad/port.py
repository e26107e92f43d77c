"""Port the public VGG16-NetVLAD-Pitts30K matconvnet checkpoint to flax.

HLoc (the toolbox the reference wraps, localization_utils.py:134-136)
distributes NetVLAD as a matconvnet ``.mat`` file
(``Pitts30K_struct.mat`` / ``vd16_pitts30k_conv5_3_vlad_preL2_intra_white``)
and rebuilds a torch module from it at load time.  This porter reads the
same ``.mat`` directly (scipy.io, ``simplify_cells``) and emits flax params
for models/netvlad/model.py:

* ``net.layers[*]`` entries named ``conv*`` with a ``weights`` pair
  (kernel HWIO — matconvnet's native layout, no transpose needed — and
  bias) fill ``backbone/conv_i`` in order;
* the VLAD core's soft-assignment 1x1 conv (D, K) + bias fills ``assign``
  and its cluster centers fill ``centers`` (stored as (D, K) -> (K, D)).
  matconvnet files store the NEGATED centers — hloc loads them as
  ``center_w = -mat.net.layers[i].weights[1]`` (hloc extractors/netvlad.py)
  — so the porter negates to recover the true centers the residual
  ``agg - mass*centers`` expects;
* the trailing WPCA 1x1 conv (K*D -> 4096) + bias fills ``whiten``;
* ``net.meta.normalization.averageImage`` becomes the input mean.

matconvnet's VLAD layer derives the assignment weights from the centers
(w = 2*alpha*c, b = -alpha*|c|^2); checkpoints materialise them, so the
porter just copies whatever the file carries.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from avlmaps_tpu.models.netvlad.model import NetVLADConfig, NetVLADEncoder


def _as_list(layers):
    if isinstance(layers, np.ndarray) and layers.dtype == object:
        return list(layers)  # matconvnet cell array
    return layers if isinstance(layers, (list, tuple)) else [layers]


def _weights_pair(layer):
    w = layer.get("weights")
    if w is None:
        return None
    w = _as_list(w)
    kernel = np.asarray(w[0], np.float32)
    bias = np.asarray(w[1], np.float32).reshape(-1) if len(w) > 1 else None
    return kernel, bias


def load_netvlad_mat(path: str) -> Tuple[dict, np.ndarray, NetVLADConfig]:
    """Read the matconvnet file -> (flax params, average_image, config)."""
    from scipy.io import loadmat

    mat = loadmat(path, simplify_cells=True)
    net = mat["net"]
    layers = _as_list(net["layers"])

    convs = []
    assign = centers = whiten = None
    for layer in layers:
        if not isinstance(layer, dict):
            continue
        name = str(layer.get("name", ""))
        pair = _weights_pair(layer)
        if pair is None:
            continue
        kernel, bias = pair
        if name.startswith("conv"):
            convs.append((kernel, bias))
        elif "vlad" in name.lower():
            # weights = [assignment kernel (1,1,D,K) or (D,K), centers (D,K)]
            w = [np.asarray(x, np.float32)
                 for x in _as_list(layer["weights"])]
            a = w[0].reshape(-1, w[0].shape[-1])  # (D, K)
            assign = (a, w[1].reshape(-1) if w[1].ndim == 1 else None)
            cen = w[-1]
            if assign[1] is None and len(w) >= 3:
                assign = (a, w[1].reshape(-1))
                cen = w[2]
            centers = np.asarray(cen, np.float32)
            if centers.shape[0] != a.shape[0]:
                centers = centers.T  # want (D, K)
        elif name.lower().startswith(("wpca", "whit", "postl2_wpca")):
            whiten = (kernel.reshape(-1, kernel.shape[-1]), bias)

    if not convs or assign is None or centers is None or whiten is None:
        raise ValueError(
            f"unrecognised NetVLAD .mat layout: convs={len(convs)}, "
            f"vlad={'ok' if assign is not None else 'missing'}, "
            f"whiten={'ok' if whiten is not None else 'missing'}")

    d = convs[-1][0].shape[-1]
    k = assign[0].shape[-1]
    cfg = NetVLADConfig(clusters=k, dim=d, whiten_dim=whiten[0].shape[-1])

    backbone = {}
    for i, (kernel, bias) in enumerate(convs):
        backbone[f"conv_{i}"] = {"kernel": kernel, "bias": bias}

    assign_b = assign[1]
    if assign_b is None:
        assign_b = np.zeros(k, np.float32)
    params = {"params": {
        "backbone": backbone,
        "assign": {"kernel": assign[0], "bias": assign_b},
        "centers": -centers.T,  # (K, D); file stores negated centers
        "whiten": {"kernel": whiten[0],
                   "bias": (whiten[1] if whiten[1] is not None
                            else np.zeros(cfg.whiten_dim, np.float32))},
    }}

    avg = np.zeros(3, np.float32)
    meta = net.get("meta") if isinstance(net, dict) else None
    if isinstance(meta, dict):
        norm = meta.get("normalization")
        if isinstance(norm, dict) and "averageImage" in norm:
            avg = np.asarray(norm["averageImage"],
                             np.float32).reshape(-1, 3).mean(axis=0)
    return params, avg, cfg


def load_netvlad_encoder(path: str) -> NetVLADEncoder:
    """One-call loader: .mat -> ready NetVLADEncoder."""
    import jax

    params, avg, cfg = load_netvlad_mat(path)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    return NetVLADEncoder(cfg, params=params, average_image=avg)
