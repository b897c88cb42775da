"""Import PyTorch ``.pth`` checkpoints from the reference framework.

Supports every shipped artifact format (checkpoint feature parity required by
SURVEY.md §5.4):

  * full model checkpoints  — ``{'model': {'sdf_net.0.weight': ...}}``
  * rendering-MLP bundles   — ``ckpts/rendering_mlps.pth`` (diffuse/renv/color)
  * per-env relighting nets — ``ckpts/env_ckpts/env_net_{i}.pth``
    (keys ``env_net{layer}.weight``, produced by ``extract_env_ckpt``,
    ``/root/reference/nerf/sph_loader.py:356-379``)
  * demo Sequential nets    — ``demo/*.pth`` (keys ``0.weight, 2.weight, ...``)

Torch Linear weights are [out, in]; ours are [in, out] — transposed on import.
weight-norm parametrized layers (geometric init, network.py:216-217) are
collapsed to plain weights: w = g * v / ||v||_row.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np


def _to_numpy(t):
    import torch  # local import: torch is host-side only

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file to a flat {key: ndarray} dict (unwraps {'model': ...})."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: _to_numpy(v) for k, v in sd.items() if hasattr(v, "shape") or
            isinstance(v, (int, float, np.ndarray))}


def _collapse_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = dict(sd)
    for k in list(sd):
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            v = sd[k]
            g = sd[base + "weight_g"]
            norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1, keepdims=True)
            out[base + "weight"] = g * v / np.maximum(norm, 1e-12)
            out.pop(k)
            out.pop(base + "weight_g", None)
    return out


def mlp_from_state(sd: Dict[str, np.ndarray], prefix: str = "") -> List[dict]:
    """Collect ``{prefix}{i}.weight/bias`` into an ordered list of linears.

    Handles ModuleList (0,1,2,...), Sequential-with-activations (0,2,4,...),
    and the env-ckpt quirk ``env_net0.weight`` (no dot before the index).
    """
    sd = _collapse_weight_norm(sd)
    pat = re.compile(
        re.escape(prefix) + r"\.?(\d+)\.weight$") if prefix else re.compile(r"(\d+)\.weight$")
    found = []
    for k in sd:
        m = pat.fullmatch(k)
        if m:
            found.append((int(m.group(1)), k))
    found.sort()
    layers = []
    for idx, wkey in found:
        w = sd[wkey]
        layer = {"w": np.ascontiguousarray(w.T)}
        bkey = wkey[: -len("weight")] + "bias"
        if bkey in sd:
            layer["b"] = sd[bkey]
        layers.append(layer)
    if not layers:
        raise KeyError(f"no linear layers under prefix {prefix!r}")
    return layers


def subdict(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def network_params_from_state(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Build a full params pytree from a reference full-model state dict.

    cfg: NetworkConfig — decides which sub-nets to expect.
    Missing sub-nets are skipped (caller merges over freshly-initialized params
    — mirrors ``strict=False`` loading, ``nerf/utils.py:1616-1622``).
    """
    import jax.numpy as jnp
    import jax

    sd = _collapse_weight_norm(sd)
    params: dict = {}

    if "encoder.embeddings" in sd:
        params["encoder"] = {"embeddings": jnp.asarray(sd["encoder.embeddings"])}
    if "sdf_density.beta" in sd:
        params["sdf_density"] = {"beta": jnp.asarray(sd["sdf_density.beta"])}
    if "sdf_density.variance" in sd:
        params["sdf_density"] = {"variance": jnp.asarray(sd["sdf_density.variance"])}

    def try_mlp(name):
        try:
            return [
                {k: jnp.asarray(v) for k, v in l.items()}
                for l in mlp_from_state(sd, name)
            ]
        except KeyError:
            return None

    for name in ("sdf_net", "diffuse_net", "color_net", "renv_net",
                 "env_net", "diffuse_env_net", "bg_net"):
        layers = try_mlp(name)
        if layers is not None:
            params[name] = layers

    if "roughness_layer.weight" in sd:
        params["roughness_layer"] = {
            "w": jnp.asarray(sd["roughness_layer.weight"].T),
            "b": jnp.asarray(sd["roughness_layer.bias"]),
        }

    # stacked per-env nets: env_nets.{e}.{l}.weight
    env_ids = sorted({int(m.group(1)) for k in sd
                      for m in [re.match(r"env_nets\.(\d+)\.", k)] if m})
    if env_ids:
        nets = [mlp_from_state(subdict(sd, f"env_nets.{e}."), "") for e in env_ids]
        params["env_nets"] = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *nets)

    return params


def load_env_net(path: str) -> List[dict]:
    """One relighting env MLP from an ``env_net_{i}.pth`` (or demo) file."""
    import jax.numpy as jnp

    sd = load_state_dict(path)
    # keys are 'env_net{l}.weight' (ckpts) or '{2l}.weight' (demo Sequential)
    try:
        layers = mlp_from_state(sd, "env_net")
    except KeyError:
        layers = mlp_from_state(sd, "")
    return [{k: jnp.asarray(v) for k, v in l.items()} for l in layers]


def load_mlp(path: str, prefix: str = "") -> List[dict]:
    import jax.numpy as jnp

    layers = mlp_from_state(load_state_dict(path), prefix)
    return [{k: jnp.asarray(v) for k, v in l.items()} for l in layers]
