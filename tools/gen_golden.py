"""Generate golden parity fixtures from the reference implementation.

Runs the reference's *behavior* (shipped checkpoints + the executable spec in
``/root/reference/demo.ipynb``) once, on CPU torch, and freezes inputs/outputs
as .npz fixtures under ``tests/golden/``.  Our JAX framework is then tested
against these fixtures without needing the reference repo at test time.

Usage:  python tools/gen_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

sys.path.insert(0, REF)  # for the pure-torch ide_encoder module (no CUDA needed)
import math  # noqa: E402

np.math = math  # the reference targets numpy<2 where np.math existed
from ide_encoder import IntegratedDirEncoder  # noqa: E402


def gen_ide_fixture():
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(128, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # include the zero-xy edge case the encoder guards against
    dirs[0] = [0.0, 0.0, 1.0]
    dirs[1] = [0.0, 0.0, -1.0]
    rough = np.abs(rng.normal(size=(128, 1))).astype(np.float32) * 0.5
    out = {}
    for deg in (2, 3, 4, 5):
        enc = IntegratedDirEncoder(deg_view=deg)
        with torch.no_grad():
            y = enc(torch.from_numpy(dirs), torch.from_numpy(rough))
            y_wo_j = enc.forward_wo_j(torch.from_numpy(dirs), torch.from_numpy(rough))
        out[f"deg{deg}"] = y.numpy()
        out[f"deg{deg}_wo_j"] = y_wo_j.numpy()
        # scalar-roughness variant
        with torch.no_grad():
            y0 = enc(torch.from_numpy(dirs), 0.64)
        out[f"deg{deg}_r0.64"] = y0.numpy()
    np.savez(os.path.join(OUT, "ide.npz"), dirs=dirs, rough=rough, **out)
    print("wrote ide.npz")


def _seq(in_dim, out_dim, hidden, nlayers):
    net = []
    for _ in range(nlayers - 1):
        net += [nn.Linear(in_dim, hidden), nn.ReLU()]
        in_dim = hidden
    net += [nn.Linear(in_dim, out_dim)]
    return nn.Sequential(*net)


def gen_demo_fixture():
    """Execute the demo.ipynb pipeline (cells 10-17) and freeze outputs."""
    feat_dim = 12
    sdf_net = _seq(32 + 5, feat_dim + 2, 64, 3)
    env_net = _seq(38, feat_dim, 160, 4)
    diffuse_net = _seq(feat_dim * 2, 3, 32, 2)
    specular_net = _seq(feat_dim * 2 + 3 + 1, 3, 64, 3)
    sdf_net.load_state_dict(torch.load(f"{REF}/demo/sdf_net.pth", map_location="cpu"))
    diffuse_net.load_state_dict(torch.load(f"{REF}/demo/diffuse_net.pth", map_location="cpu"))
    specular_net.load_state_dict(torch.load(f"{REF}/demo/specular_net.pth", map_location="cpu"))
    encoder_dir = IntegratedDirEncoder(deg_view=4)
    xyz_encoding = torch.from_numpy(np.loadtxt(f"{REF}/demo/xyz_encoding.txt")).float()

    # camera: theta=123, phi=0 as in the notebook defaults; subsample rays
    sys.path.pop(0)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from envidr_tpu.geometry.rays import pose_spherical, nerf_matrix_to_ngp

    W = H = 800
    camera_angle_x = 0.6194058656692505
    focal = W / (2 * np.tan(camera_angle_x / 2))
    intrinsics = (focal, focal, W / 2, H / 2)

    pose = nerf_matrix_to_ngp(pose_spherical(123.0, -0.0, 4.0))
    pose_t = torch.from_numpy(pose)[None]

    i, j = torch.meshgrid(torch.linspace(0, W - 1, W), torch.linspace(0, H - 1, H),
                          indexing="ij")
    i = i.t().reshape(1, H * W) + 0.5
    j = j.t().reshape(1, H * W) + 0.5
    zs = torch.ones_like(i)
    xs = (i - intrinsics[2]) / intrinsics[0] * zs
    ys = (j - intrinsics[3]) / intrinsics[1] * zs
    directions = torch.stack((xs, ys, zs), dim=-1)
    directions = directions / torch.norm(directions, dim=-1, keepdim=True)
    rays_d = (directions @ pose_t[:, :3, :3].transpose(-1, -2)).view(-1, 3)
    rays_o = pose_t[:, None, :3, 3].expand_as(rays_d[None]).reshape(-1, 3)

    sub = slice(None, None, 101)  # every 101st pixel
    rays_o, rays_d = rays_o[sub].contiguous(), rays_d[sub].contiguous()

    ray_cam_dot = torch.bmm(rays_d.view(-1, 1, 3), rays_o.view(-1, 3, 1)).squeeze(-1)
    nabla = ray_cam_dot**2 - (rays_o.norm(2, 1, keepdim=True) ** 2 - 1.0)
    nabla_sqrt = torch.sqrt(nabla.clamp_min(0.0))
    nears = -ray_cam_dot - nabla_sqrt
    mask = (nabla >= -1e-4)[..., 0]

    cases = [
        dict(roughness=0.0, metallic=0.2, base_color=[20 / 255, 70 / 255, 160 / 255], env=2),
        dict(roughness=0.55, metallic=0.9, base_color=[0.8, 0.3, 0.1], env=7),
    ]
    fix = dict(rays_o=rays_o.numpy(), rays_d=rays_d.numpy(), mask=mask.numpy(),
               nears=nears.numpy(), xyz_encoding=xyz_encoding.numpy(), pose=pose)
    for ci, c in enumerate(cases):
        env_net.load_state_dict(torch.load(
            f"{REF}/demo/envs/env_net_{c['env']}.pth", map_location="cpu"))
        with torch.no_grad():
            m = mask
            dirs = rays_d[m]
            xyzs = rays_o[m] + dirs * nears[m]
            normals = xyzs
            material_vec = torch.tensor([c["roughness"], c["metallic"], *c["base_color"]])
            h = torch.cat([xyz_encoding, material_vec], dim=0)[None]
            h = sdf_net(h)
            geo_feat = F.normalize(h[..., 1:1 + feat_dim], dim=-1)
            geo_feat = geo_feat.repeat(xyzs.shape[0], 1)
            kappa_inv = 1.0 * nn.Softplus()(h[..., -1] - 1.0)[0]

            n_enc = encoder_dir(normals, 0.64)
            w_o = -dirs
            w_r = 2 * torch.sum(w_o * normals, dim=-1, keepdim=True) * normals - w_o
            w_r_enc = encoder_dir(w_r, kappa_inv)
            n_dot_v = torch.sum(normals * w_o, dim=-1, keepdim=True)

            diffuse_env = F.normalize(env_net(n_enc), dim=-1)
            diffuse_color = diffuse_net(
                torch.cat([geo_feat, diffuse_env], dim=-1)).sigmoid()
            specular_env = F.normalize(env_net(w_r_enc), dim=-1)
            specular_color = specular_net(
                torch.cat([geo_feat, normals, specular_env, n_dot_v], dim=-1)).sigmoid()

        fix[f"case{ci}_diffuse"] = diffuse_color.numpy()
        fix[f"case{ci}_specular"] = specular_color.numpy()
        fix[f"case{ci}_kappa_inv"] = kappa_inv.numpy()
        fix[f"case{ci}_material"] = np.array(
            [c["roughness"], c["metallic"], *c["base_color"], c["env"]], dtype=np.float32)
    np.savez(os.path.join(OUT, "demo_render.npz"), **fix)
    print("wrote demo_render.npz")


if __name__ == "__main__":
    torch.manual_seed(0)
    gen_ide_fixture()
    gen_demo_fixture()
