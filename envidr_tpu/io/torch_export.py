"""Export our param pytrees as reference-compatible PyTorch checkpoints.

Round-trip counterpart of :mod:`envidr_tpu.io.torch_import`: a user of the
reference framework can consume models trained here (relighting env nets,
rendering-MLP bundles, full model state dicts).  Also reimplements
``extract_env_ckpt`` (``/root/reference/nerf/sph_loader.py:356-379``).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, List

import numpy as np


def _t(x):
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))


def mlp_to_state(layers: List[dict], prefix: str) -> "OrderedDict":
    sd = OrderedDict()
    for i, layer in enumerate(layers):
        sd[f"{prefix}.{i}.weight"] = _t(np.asarray(layer["w"]).T)
        if "b" in layer:
            sd[f"{prefix}.{i}.bias"] = _t(layer["b"])
    return sd


def network_state_dict(params: dict) -> "OrderedDict":
    """Full model params -> reference-named state dict (nerf/network.py names)."""
    sd = OrderedDict()
    if "encoder" in params:
        sd["encoder.embeddings"] = _t(params["encoder"]["embeddings"])
    if "sdf_density" in params:
        for k, v in params["sdf_density"].items():
            sd[f"sdf_density.{k}"] = _t(v)
    for name in ("sdf_net", "diffuse_net", "color_net", "renv_net",
                 "env_net", "diffuse_env_net"):
        if name in params:
            sd.update(mlp_to_state(params[name], name))
    if "roughness_layer" in params:
        sd["roughness_layer.weight"] = _t(np.asarray(params["roughness_layer"]["w"]).T)
        sd["roughness_layer.bias"] = _t(params["roughness_layer"]["b"])
    if "env_nets" in params:
        n_env = np.asarray(params["env_nets"][0]["w"]).shape[0]
        for e in range(n_env):
            layers = [{k: np.asarray(v)[e] for k, v in layer.items()}
                      for layer in params["env_nets"]]
            sd.update(mlp_to_state(layers, f"env_nets.{e}"))
    return sd


def save_model_pth(params: dict, path: str, extra: Dict | None = None):
    import torch

    payload = {"model": network_state_dict(params)}
    if extra:
        payload.update(extra)
    torch.save(payload, path)
    return path


def extract_env_ckpts(params: dict, out_dir: str) -> List[str]:
    """Split stacked env_nets into standalone env_net_{i}.pth relighting files
    with the reference's key quirk ('env_net{layer}.weight')."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    assert "env_nets" in params, "no stacked env_nets in params"
    n_env = np.asarray(params["env_nets"][0]["w"]).shape[0]
    paths = []
    for e in range(n_env):
        sd = OrderedDict()
        for i, layer in enumerate(params["env_nets"]):
            sd[f"env_net{i}.weight"] = _t(np.asarray(layer["w"])[e].T)
            if "b" in layer:
                sd[f"env_net{i}.bias"] = _t(np.asarray(layer["b"])[e])
        p = os.path.join(out_dir, f"env_net_{e}.pth")
        torch.save({"model": sd}, p)
        paths.append(p)
    return paths
