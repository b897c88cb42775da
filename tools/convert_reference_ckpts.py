"""Convert the reference's shipped .pth checkpoints into self-contained .npz
assets (pretrained rendering MLPs + 11 relighting env nets + demo nets), so
the framework's relighting/demo applications work without the reference repo
mounted.

    python tools/convert_reference_ckpts.py [--ref /root/reference] [--out assets]
"""
import os as _os
_os.environ.setdefault("JAX_PLATFORMS", "cpu")  # numpy-only tool; never touch the TPU
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from envidr_tpu.io.torch_import import load_state_dict, mlp_from_state  # noqa: E402


def flatten_mlp(layers, prefix):
    out = {}
    for i, l in enumerate(layers):
        out[f"{prefix}.{i}.w"] = np.asarray(l["w"])
        if "b" in l:
            out[f"{prefix}.{i}.b"] = np.asarray(l["b"])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref", default="/root/reference")
    p.add_argument("--out", default="assets")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)

    sd = load_state_dict(f"{a.ref}/ckpts/rendering_mlps.pth")
    data = {}
    for name in ("diffuse_net", "renv_net", "color_net"):
        data.update(flatten_mlp(mlp_from_state(sd, name), name))
    np.savez(os.path.join(a.out, "rendering_mlps.npz"), **data)

    envs = {}
    for i in range(11):
        sd_e = load_state_dict(f"{a.ref}/ckpts/env_ckpts/env_net_{i}.pth")
        try:
            layers = mlp_from_state(sd_e, "env_net")
        except KeyError:
            layers = mlp_from_state(sd_e, "")
        envs.update(flatten_mlp(layers, f"env_{i}"))
    np.savez(os.path.join(a.out, "env_nets.npz"), **envs)

    demo = {}
    for name in ("sdf_net", "diffuse_net", "specular_net"):
        layers = mlp_from_state(load_state_dict(f"{a.ref}/demo/{name}.pth"), "")
        demo.update(flatten_mlp(layers, name))
    demo["xyz_encoding"] = np.loadtxt(f"{a.ref}/demo/xyz_encoding.txt")
    np.savez(os.path.join(a.out, "demo_nets.npz"), **demo)
    print(f"wrote {a.out}/rendering_mlps.npz env_nets.npz demo_nets.npz")


if __name__ == "__main__":
    main()
