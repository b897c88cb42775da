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


# ---------------------------------------------------------------------------
# Full-image sphere render + env unwrap goldens (VERDICT.md #4)
# ---------------------------------------------------------------------------
#
# Freezes the reference's *sphere-mode pipeline behavior*
# (``/root/reference/nerf/render_func/sph_ray.py:34-309``) image-for-image:
# real pretrained rendering MLPs (``ckpts/rendering_mlps.pth``) + real env nets
# (``ckpts/env_ckpts/env_net_{2,7}.pth``), driven by a *synthetic* geometry
# net (freq-encoded SDF MLP with seeded weights — the reference ships no
# geometry checkpoint for the env sphere).  All math below re-derives the
# reference formulas in torch on CPU.

SPH = dict(  # configs/neural_renderer.ini subset that shapes the math
    radius=0.95, num_step=12, step_size=0.002, beta=0.1,
    roughness_bias=-1.0, roughness_act_scale=1.0, roughness_scale=1.0,
    diffuse_kappa_inv=0.64, light_intensity_scale=1.0, intensity_scale=1.0,
    geo_feat_dim=12, env_feat_dim=12, deg_view=4, multires=6,
)


def _freq_t(x, degree):
    """Reference FreqEncoder layout: [x, sin(2^d x), cos(2^d x) ...]."""
    outs = [x]
    for d in range(degree):
        xb = x * (2.0 ** d)
        outs += [torch.sin(xb), torch.cos(xb)]
    return torch.cat(outs, dim=-1)


def _laplace_sigma(sdf, beta):
    """LaplaceDensity.density_func (network.py:32-37)."""
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * sdf.sign() * torch.expm1(-sdf.abs() / beta))


def _synth_geometry_net():
    """Seeded synthetic sphere-mode SDF net: freq(6)+material(5) -> 64x64 -> 14."""
    torch.manual_seed(7)
    in_dim = 3 + 3 * 2 * SPH["multires"] + 5
    return _seq(in_dim, 1 + SPH["geo_feat_dim"] + 1, 64, 3)


def _forward_geometry_t(sdf_net, xyzs, material):
    """forward_geometry (network.py:381-495) for the sphere config."""
    x = _freq_t(xyzs, SPH["multires"])
    mat = torch.cat([
        material["roughness"] + torch.zeros_like(x[..., :1]),
        material["metallic"] + torch.zeros_like(x[..., :1]),
        torch.as_tensor(material["color"][:3], dtype=x.dtype)
        + torch.zeros_like(x[..., :3]),
    ], dim=-1)                                   # concate_material_params order
    h = torch.cat([x, mat], dim=-1)
    for l, lin in enumerate(m for m in sdf_net if isinstance(m, nn.Linear)):
        h = lin(h)
        if l != 2:
            h = F.relu(h)
    sdf = h[..., 0]
    geo_feat = F.normalize(h[..., 1:1 + SPH["geo_feat_dim"]], dim=-1)
    raw_rough = h[..., 1 + SPH["geo_feat_dim"]:2 + SPH["geo_feat_dim"]]
    roughness = (SPH["roughness_act_scale"]
                 * F.softplus(raw_rough + SPH["roughness_bias"])
                 * SPH["roughness_scale"])
    return sdf, geo_feat, roughness


def _run_mlp(layers, h, n_layers):
    for l, lin in enumerate(layers):
        h = lin(h)
        if l != n_layers - 1:
            h = F.relu(h)
    return h


def _load_linears(path, prefix=""):
    """Reference .pth -> list of nn.Linear (handles `env_net0.weight` quirk)."""
    import re
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    pat = re.compile(re.escape(prefix) + r"\.?(\d+)\.weight$") if prefix \
        else re.compile(r"(\d+)\.weight$")
    found = sorted((int(m.group(1)), k) for k in sd if (m := pat.fullmatch(k)))
    layers = []
    for _, wk in found:
        w = sd[wk]
        lin = nn.Linear(w.shape[1], w.shape[0])
        lin.weight.data = w
        lin.bias.data = sd[wk[:-len("weight")] + "bias"]
        layers.append(lin)
    return layers


def _forward_color_t(nets, enc, geo_feat, normals_enc, w_r_enc, n_dot_w_o,
                     n_env_enc, env_layers):
    """forward_color (network.py:524-698), sphere config: wo_viewdir,
    normal_with_mlp, env branch, diffuse_with_env concat fusion."""
    n_env_feat = F.normalize(_run_mlp(env_layers, n_env_enc, 4), dim=-1)
    h_d = torch.cat([geo_feat, n_env_feat], dim=-1)
    c_diffuse = torch.sigmoid(_run_mlp(nets["diffuse"], h_d, 2))

    w_r_feat = F.normalize(_run_mlp(env_layers, w_r_enc, 4), dim=-1)
    h = torch.cat([geo_feat, normals_enc, w_r_feat, n_dot_w_o], dim=-1)
    c_specular = torch.sigmoid(_run_mlp(nets["color"], h, 3))
    return (c_diffuse + c_specular) * SPH["intensity_scale"], c_diffuse, c_specular


def gen_sphere_fixture():
    """Full-image golden of run_sph (sph_ray.py:34-221)."""
    from ide_encoder import IntegratedDirEncoder

    sdf_net = _synth_geometry_net()
    nets = {
        "diffuse": _load_linears(f"{REF}/ckpts/rendering_mlps.pth", "diffuse_net"),
        "color": _load_linears(f"{REF}/ckpts/rendering_mlps.pth", "color_net"),
    }
    env2 = _load_linears(f"{REF}/ckpts/env_ckpts/env_net_2.pth", "env_net")
    env7 = _load_linears(f"{REF}/ckpts/env_ckpts/env_net_7.pth", "env_net")
    enc = IntegratedDirEncoder(deg_view=SPH["deg_view"])

    # camera at get_pose-style spherical position, 24x24 rays (incl. miss rays)
    H = W = 24
    fov = 0.8
    focal = W / (2 * np.tan(fov / 2))
    torch.manual_seed(3)
    cam = torch.tensor([2.2, 2.0, 2.4])
    fwd = F.normalize(-cam, dim=0)
    up0 = torch.tensor([0.0, -1.0, 0.0])
    right = F.normalize(torch.cross(fwd, up0, dim=0), dim=0)
    up = F.normalize(torch.cross(right, fwd, dim=0), dim=0)
    i, j = torch.meshgrid(torch.arange(W), torch.arange(H), indexing="xy")
    xs = (i + 0.5 - W / 2) / focal
    ys = (j + 0.5 - H / 2) / focal
    dirs_cam = torch.stack([xs, ys, torch.ones_like(xs)], dim=-1).reshape(-1, 3)
    rays_d = F.normalize(
        dirs_cam @ torch.stack([right, up, fwd], dim=0), dim=-1)
    rays_o = cam[None].expand_as(rays_d).contiguous()

    # get_sphere_intersections (sph_ray.py:18-32)
    r = SPH["radius"]
    ray_cam_dot = torch.bmm(rays_d.view(-1, 1, 3), rays_o.view(-1, 3, 1)).squeeze(-1)
    nabla = ray_cam_dot ** 2 - (rays_o.norm(2, 1, keepdim=True) ** 2 - r ** 2)
    nabla_sqrt = torch.sqrt(nabla.clamp_min(0.0))
    nears = -ray_cam_dot - nabla_sqrt
    fars = -ray_cam_dot + nabla_sqrt
    mask = (nabla >= -1e-4)[..., 0]

    S = SPH["num_step"]
    z_radius = SPH["step_size"] * (S - 1) / 2
    z_vals = torch.linspace(-z_radius, z_radius, S)[None, :] + nears    # [N, S]
    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]  # [N, S, 3]

    cases = [
        dict(roughness=0.1, metallic=0.9, color=[0.8, 0.75, 0.7], env=0),
        dict(roughness=0.6, metallic=0.2, color=[0.2, 0.5, 0.8], env=1),
    ]
    fix = dict(rays_o=rays_o.numpy(), rays_d=rays_d.numpy(),
               mask=mask.numpy(), H=np.int32(H), W=np.int32(W))
    for i_l, lin in enumerate(m for m in sdf_net if isinstance(m, nn.Linear)):
        fix[f"sdf_net.{i_l}.w"] = lin.weight.detach().numpy()
        fix[f"sdf_net.{i_l}.b"] = lin.bias.detach().numpy()

    for ci, c in enumerate(cases):
        env_layers = env2 if c["env"] == 0 else env7
        material = {"roughness": torch.tensor(c["roughness"]),
                    "metallic": torch.tensor(c["metallic"]),
                    "color": c["color"]}
        xyzs_g = xyzs.clone().requires_grad_(True)
        sdf, geo_feat, roughness = _forward_geometry_t(sdf_net, xyzs_g, material)
        normals = torch.autograd.grad(sdf.sum(), xyzs_g, create_graph=False)[0]
        normals = F.normalize(normals, dim=-1, eps=1e-10)
        with torch.no_grad():
            sdf = sdf.detach()
            geo_feat = geo_feat.detach()
            roughness = roughness.detach()
            sigmas = _laplace_sigma(sdf, SPH["beta"])

            # get_color_mlp_extra_params (renderer.py:147-180)
            d_b = rays_d[:, None, :].expand(-1, S, -1)
            w_o = -d_b
            normals_enc = normals                        # multires_normal=0
            w_r = 2 * torch.sum(w_o * normals, dim=-1, keepdim=True) * normals - w_o
            w_r_enc = enc(w_r, roughness) * SPH["light_intensity_scale"]
            n_dot_w_o = torch.sum(normals * w_o, dim=-1, keepdim=True)
            n_env_enc = enc(normals, SPH["diffuse_kappa_inv"]) \
                * SPH["light_intensity_scale"]

            rgbs, c_dif, c_spec = _forward_color_t(
                nets, enc, geo_feat, normals_enc, w_r_enc, n_dot_w_o,
                n_env_enc, env_layers)

            # compositing (sph_ray.py:103-151), dense-masked equivalent
            deltas = z_vals[..., 1:] - z_vals[..., :-1]
            deltas = torch.cat(
                [deltas, SPH["step_size"] * torch.ones_like(deltas[..., :1])], -1)
            alphas = 1 - torch.exp(-deltas * sigmas)
            alphas_shifted = torch.cat(
                [torch.ones_like(alphas[..., :1]), 1 - alphas + 1e-15], -1)
            weights = alphas * torch.cumprod(alphas_shifted, -1)[..., :-1]
            weights = weights * mask[:, None]
            weights_sum = weights.sum(-1, keepdim=True)

            bg = torch.ones(rays_o.shape[0], 3)
            ori_z = ((z_vals - nears) / (fars.max() - nears)).clamp(0, 1)
            depth = (weights * ori_z).sum(-1) * mask

            image = (weights[..., None] * rgbs).sum(-2) + (1 - weights_sum) * bg
            image = torch.where(mask[:, None], image, bg)
            dif_img = (weights[..., None] * c_dif).sum(-2) + (1 - weights_sum) * bg
            dif_img = torch.where(mask[:, None], dif_img, bg)
            spec_img = (weights[..., None] * c_spec).sum(-2) + (1 - weights_sum) * bg
            spec_img = torch.where(mask[:, None], spec_img, bg)
            n_img = (weights[..., None] * normals).sum(-2)
            n_img = F.normalize(n_img, dim=-1)
            n_img = torch.where(mask[:, None], n_img, torch.zeros_like(n_img))
            rough_img = (weights[..., None] * roughness).sum(-2) * mask[:, None]

        fix[f"case{ci}_material"] = np.array(
            [c["roughness"], c["metallic"], *c["color"], c["env"]], np.float32)
        fix[f"case{ci}_image"] = image.numpy()
        fix[f"case{ci}_depth"] = depth.numpy()
        fix[f"case{ci}_weights_sum"] = (weights_sum[..., 0] * mask).numpy()
        fix[f"case{ci}_normal_image"] = n_img.numpy()
        fix[f"case{ci}_diffuse_image"] = dif_img.numpy()
        fix[f"case{ci}_specular_image"] = spec_img.numpy()
        fix[f"case{ci}_roughness_image"] = rough_img.numpy()
    np.savez(os.path.join(OUT, "sphere_render.npz"), **fix)
    print("wrote sphere_render.npz")


def gen_unwrap_fixture():
    """64x128 env unwrap golden (unwrap_env_sphere, sph_ray.py:223-309)."""
    from ide_encoder import IntegratedDirEncoder
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from envidr_tpu.geometry.lighting import gen_light_xyz  # formula-parity-tested

    sdf_net = _synth_geometry_net()
    nets = {
        "diffuse": _load_linears(f"{REF}/ckpts/rendering_mlps.pth", "diffuse_net"),
        "color": _load_linears(f"{REF}/ckpts/rendering_mlps.pth", "color_net"),
    }
    enc = IntegratedDirEncoder(deg_view=SPH["deg_view"])
    env_h, env_w = 64, 128

    # camera from get_pose(0, 0, 4) (provider.py:69-93): centers=(0,4,0)
    rays_o = torch.tensor([[0.0, 4.0, 0.0]])
    rays_d = F.normalize(-rays_o, dim=-1)
    r = SPH["radius"]
    ray_cam_dot = torch.bmm(rays_d.view(-1, 1, 3), rays_o.view(-1, 3, 1)).squeeze(-1)
    nabla = ray_cam_dot ** 2 - (rays_o.norm(2, 1, keepdim=True) ** 2 - r ** 2)
    nears = -ray_cam_dot - torch.sqrt(nabla.clamp_min(0.0))
    xyzs = rays_o + rays_d * nears                                   # [1, 3]

    lxyz, _ = gen_light_xyz(env_h, env_w, 1.0)
    lxyz = lxyz.reshape(-1, 3)[:, [1, 2, 0]]                         # sph_ray:251
    w_r = torch.from_numpy(
        (lxyz / np.linalg.norm(lxyz, axis=-1, keepdims=True))).float()
    n_pix = w_r.shape[0]

    material = {"roughness": torch.tensor(0.4), "metallic": torch.tensor(0.8),
                "color": [0.7, 0.6, 0.5]}
    fix = dict(material=np.array([0.4, 0.8, 0.7, 0.6, 0.5], np.float32),
               env_h=np.int32(env_h), env_w=np.int32(env_w))
    for i_l, lin in enumerate(m for m in sdf_net if isinstance(m, nn.Linear)):
        fix[f"sdf_net.{i_l}.w"] = lin.weight.detach().numpy()
        fix[f"sdf_net.{i_l}.b"] = lin.bias.detach().numpy()

    with torch.no_grad():
        sdf, geo_feat, roughness = _forward_geometry_t(sdf_net, xyzs, material)
        geo_feats = geo_feat.repeat(n_pix, 1)
        dirs = rays_d
        normals = -dirs.repeat(n_pix, 1)                             # sph_ray:287

        normals_enc = normals
        n_dot_w_o = torch.sum(normals * -dirs, dim=-1, keepdim=True)
        n_env_enc = enc(normals, SPH["diffuse_kappa_inv"]) \
            * SPH["light_intensity_scale"]
        w_r_enc = enc(w_r, roughness)                                # sph_ray:297

        for ei, env_i in enumerate((2, 7)):
            env_layers = _load_linears(
                f"{REF}/ckpts/env_ckpts/env_net_{env_i}.pth", "env_net")
            rgbs, _, _ = _forward_color_t(
                nets, enc, geo_feats, normals_enc, w_r_enc, n_dot_w_o,
                n_env_enc, env_layers)
            fix[f"env{env_i}_image"] = rgbs.reshape(env_h, env_w, 3).numpy()
    fix["roughness"] = roughness.numpy()
    np.savez(os.path.join(OUT, "unwrap_env.npz"), **fix)
    print("wrote unwrap_env.npz")


def gen_sphere_grad_fixture():
    """Gradient golden of the sphere shade path (VERDICT r3 missing #1a).

    Same composition as :func:`gen_sphere_fixture` but fully differentiable:
    normals come from ``create_graph=True`` autograd (renderer.py:182-198
    semantics), so d(loss)/d(sdf_net params) flows THROUGH the normal
    computation — torch double backward vs our jax.grad.
    Loss = <image, Wfix> + 0.05 * mean((|raw_grad| - 1)^2)  (eikonal-style).
    """
    from ide_encoder import IntegratedDirEncoder

    sdf_net = _synth_geometry_net()
    # Condition the sdf output channel: with raw seeded weights the sdf takes
    # O(1) values across the thin shell, the Laplace density saturates, and
    # the fp32 gradient problem becomes ~100% noise (measured: torch f32 vs
    # f64 grads differ by the gradients' own magnitude).  Scaling the output
    # row keeps |sdf| ~ 0.05 — smooth densities, well-conditioned grads.
    with torch.no_grad():
        out_lin = [mm for mm in sdf_net if isinstance(mm, nn.Linear)][-1]
        out_lin.weight[0] *= 0.05
        out_lin.bias[0] = 0.0
    nets = {
        "diffuse": _load_linears(f"{REF}/ckpts/rendering_mlps.pth", "diffuse_net"),
        "color": _load_linears(f"{REF}/ckpts/rendering_mlps.pth", "color_net"),
    }
    env2 = _load_linears(f"{REF}/ckpts/env_ckpts/env_net_2.pth", "env_net")
    enc = IntegratedDirEncoder(deg_view=SPH["deg_view"])

    H = W = 12
    fov = 0.8
    focal = W / (2 * np.tan(fov / 2))
    torch.manual_seed(11)
    cam = torch.tensor([2.2, 2.0, 2.4])
    fwd = F.normalize(-cam, dim=0)
    up0 = torch.tensor([0.0, -1.0, 0.0])
    right = F.normalize(torch.cross(fwd, up0, dim=0), dim=0)
    up = F.normalize(torch.cross(right, fwd, dim=0), dim=0)
    i, j = torch.meshgrid(torch.arange(W), torch.arange(H), indexing="xy")
    xs = (i + 0.5 - W / 2) / focal
    ys = (j + 0.5 - H / 2) / focal
    dirs_cam = torch.stack([xs, ys, torch.ones_like(xs)], dim=-1).reshape(-1, 3)
    rays_d = F.normalize(dirs_cam @ torch.stack([right, up, fwd], dim=0), dim=-1)
    rays_o = cam[None].expand_as(rays_d).contiguous()

    r = SPH["radius"]
    ray_cam_dot = torch.bmm(rays_d.view(-1, 1, 3), rays_o.view(-1, 3, 1)).squeeze(-1)
    nabla = ray_cam_dot ** 2 - (rays_o.norm(2, 1, keepdim=True) ** 2 - r ** 2)
    nabla_sqrt = torch.sqrt(nabla.clamp_min(0.0))
    nears = -ray_cam_dot - nabla_sqrt
    fars = -ray_cam_dot + nabla_sqrt
    mask = (nabla >= -1e-4)[..., 0]

    S = SPH["num_step"]
    z_radius = SPH["step_size"] * (S - 1) / 2
    z_vals = torch.linspace(-z_radius, z_radius, S)[None, :] + nears
    xyzs = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    material = {"roughness": torch.tensor(0.1), "metallic": torch.tensor(0.9),
                "color": [0.8, 0.75, 0.7]}

    xyzs_g = xyzs.clone().requires_grad_(True)
    sdf, geo_feat, roughness = _forward_geometry_t(sdf_net, xyzs_g, material)
    raw_grad = torch.autograd.grad(sdf.sum(), xyzs_g, create_graph=True)[0]
    normals = F.normalize(raw_grad, dim=-1, eps=1e-10)
    sigmas = _laplace_sigma(sdf, SPH["beta"])

    d_b = rays_d[:, None, :].expand(-1, S, -1)
    w_o = -d_b
    normals_enc = normals
    w_r = 2 * torch.sum(w_o * normals, dim=-1, keepdim=True) * normals - w_o
    w_r_enc = enc(w_r, roughness) * SPH["light_intensity_scale"]
    n_dot_w_o = torch.sum(normals * w_o, dim=-1, keepdim=True)
    n_env_enc = enc(normals, SPH["diffuse_kappa_inv"]) \
        * SPH["light_intensity_scale"]
    rgbs, _, _ = _forward_color_t(
        nets, enc, geo_feat, normals_enc, w_r_enc, n_dot_w_o, n_env_enc, env2)

    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = torch.cat(
        [deltas, SPH["step_size"] * torch.ones_like(deltas[..., :1])], -1)
    alphas = 1 - torch.exp(-deltas * sigmas)
    alphas_shifted = torch.cat(
        [torch.ones_like(alphas[..., :1]), 1 - alphas + 1e-15], -1)
    weights = alphas * torch.cumprod(alphas_shifted, -1)[..., :-1]
    weights = weights * mask[:, None]
    weights_sum = weights.sum(-1, keepdim=True)
    bg = torch.ones(rays_o.shape[0], 3)
    image = (weights[..., None] * rgbs).sum(-2) + (1 - weights_sum) * bg
    image = torch.where(mask[:, None], image, bg)

    g = torch.Generator().manual_seed(42)
    w_fix = torch.rand(image.shape, generator=g)
    loss = (image * w_fix).sum() \
        + 0.05 * ((raw_grad.norm(dim=-1) - 1.0) ** 2).mean()
    loss.backward()

    fix = dict(rays_o=rays_o.numpy(), rays_d=rays_d.detach().numpy(),
               w_fix=w_fix.numpy(), loss=loss.detach().numpy(),
               material=np.array([0.1, 0.9, 0.8, 0.75, 0.7], np.float32))
    for i_l, lin in enumerate(m for m in sdf_net if isinstance(m, nn.Linear)):
        fix[f"sdf_net.{i_l}.w"] = lin.weight.detach().numpy()
        fix[f"sdf_net.{i_l}.b"] = lin.bias.detach().numpy()
        fix[f"grad.sdf_net.{i_l}.w"] = lin.weight.grad.numpy()
        fix[f"grad.sdf_net.{i_l}.b"] = lin.bias.grad.numpy()
    for name, layers in (("diffuse_net", nets["diffuse"]),
                         ("color_net", nets["color"]), ("env_net", env2)):
        for i_l, lin in enumerate(layers):
            fix[f"grad.{name}.{i_l}.w"] = lin.weight.grad.numpy()
            fix[f"grad.{name}.{i_l}.b"] = lin.bias.grad.numpy()
    np.savez(os.path.join(OUT, "sphere_grads.npz"), **fix)
    print("wrote sphere_grads.npz  loss=%.6f" % float(loss))


def _hash_encode_t(x01, embeddings, levels):
    """Pure-torch replica of the reference hash encoder forward
    (hashencoder.cu:140-205: pos = x*scale, floor, smoothstep weights,
    dense row-major index mod hashmap_size).  ``levels`` is a list of
    (offset, size, scale, resolution); all levels here are DENSE so the
    prime-XOR branch (cu:55-72) never triggers and torch long indexing is
    exact.  Differentiable to any order via autograd."""
    outs = []
    for (off, size, scale, res) in levels:
        table = embeddings[off:off + size]
        pos = x01 * scale
        pg = torch.floor(pos)
        frac = pos - pg
        w = frac * frac * (3.0 - 2.0 * frac)          # smoothstep
        pg = pg.long()
        acc = 0.0
        for corner in range(8):
            offs = [(corner >> d) & 1 for d in range(3)]
            wsel = 1.0
            for d in range(3):
                wsel = wsel * (w[..., d] if offs[d] else 1.0 - w[..., d])
            cpos = pg + torch.tensor(offs, dtype=torch.long)
            idx = (cpos[..., 0] + cpos[..., 1] * res
                   + cpos[..., 2] * res * res) % size
            acc = acc + wsel[..., None] * table[idx]
        outs.append(acc)
    return torch.cat(outs, dim=-1)


def gen_volume_grad_fixture():
    """Gradient golden of a full volume-render step (VERDICT r3 missing #1b).

    non_cuda_ray.py:13-182 semantics on CPU torch: hash encoding (smoothstep)
    -> SDF MLP -> normals via ``create_graph=True`` double backward
    (renderer.py:182-198) -> Laplace density (straight-through beta clamp,
    network.py:39-44) -> color MLP -> alpha compositing -> mse + eikonal
    loss.  Freezes d(loss)/d(embeddings, MLP params, beta) — the exact
    gradients our hand-written hashgrid custom_vjp must reproduce.
    """
    torch.manual_seed(23)
    L, C, base, desired, log2_hm = 4, 2, 4, 32, 16
    log2s = np.log2(desired / base) / (L - 1)
    levels, off = [], 0
    for lvl in range(L):
        scale = float(np.exp2(lvl * log2s) * base - 1.0)   # cu:151
        res = int(np.ceil(scale)) + 1                      # cu:152
        size = min(2 ** log2_hm, res ** 3)                 # hashgrid.py:133
        assert res ** 3 <= size, "fixture levels must be dense"
        levels.append((off, size, scale, res))
        off += size
    emb = (torch.rand(off, C) * 2e-1 - 1e-1).requires_grad_(True)

    # geometry + color MLPs (plain Linear stacks; weights frozen to the npz)
    mlp1 = _seq(L * C + 3, 1 + 8, 64, 2)
    mlp2 = _seq(8 + 3 + 3, 3, 64, 2)
    beta = torch.tensor(0.08, requires_grad=True)

    # rays through the [-0.8, 0.8] cube interior
    g = torch.Generator().manual_seed(5)
    N, K = 24, 12
    center = torch.rand((N, 3), generator=g) * 0.6 - 0.3
    rays_o = F.normalize(torch.randn((N, 3), generator=g), dim=-1) * 1.5
    rays_d = F.normalize(center - rays_o, dim=-1)
    t_mid = (center - rays_o).norm(dim=-1, keepdim=True)
    z_vals = t_mid + torch.linspace(-0.35, 0.35, K)[None, :]
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    xyz = xyz.clamp(-0.8, 0.8)
    target = torch.rand((N, 3), generator=g)

    xyz_g = xyz.clone().requires_grad_(True)
    x01 = (xyz_g + 1.0) / 2.0
    feats = _hash_encode_t(x01, emb, levels)
    h = torch.cat([feats, xyz_g], dim=-1)
    for l, lin in enumerate(m for m in mlp1 if isinstance(m, nn.Linear)):
        h = lin(h)
        if l != 1:
            h = F.relu(h)
    sdf = h[..., 0]
    geo_feat = h[..., 1:9]
    raw_grad = torch.autograd.grad(sdf.sum(), xyz_g, create_graph=True)[0]
    normals = F.normalize(raw_grad, dim=-1, eps=1e-10)

    # straight-through beta clamp (network.py:39-44) + Laplace density
    beta_clamp = beta.detach().clamp(1e-4, 1.0)
    beta_eff = beta + (beta_clamp - beta.detach())
    sigmas = _laplace_sigma(sdf, beta_eff)

    dirs = rays_d[:, None, :].expand(-1, K, -1)
    hc = torch.cat([geo_feat, normals, dirs], dim=-1)
    for l, lin in enumerate(m for m in mlp2 if isinstance(m, nn.Linear)):
        hc = lin(hc)
        if l != 1:
            hc = F.relu(hc)
    rgbs = torch.sigmoid(hc)

    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = torch.cat([deltas, torch.full_like(deltas[..., :1], 0.07)], -1)
    alphas = 1 - torch.exp(-deltas * sigmas)
    alphas_shifted = torch.cat(
        [torch.ones_like(alphas[..., :1]), 1 - alphas + 1e-15], -1)
    weights = alphas * torch.cumprod(alphas_shifted, -1)[..., :-1]
    weights_sum = weights.sum(-1, keepdim=True)
    image = (weights[..., None] * rgbs).sum(-2) + (1 - weights_sum) * 1.0

    loss = F.mse_loss(image, target) \
        + 0.01 * ((raw_grad.norm(dim=-1) - 1.0) ** 2).mean()
    loss.backward()

    fix = dict(
        rays_o=rays_o.numpy(), rays_d=rays_d.numpy(), z_vals=z_vals.numpy(),
        target=target.numpy(), loss=loss.detach().numpy(),
        embeddings=emb.detach().numpy(),
        beta=beta.detach().numpy(),
        spec=np.array([L, C, base, desired, log2_hm], np.int64),
        image=image.detach().numpy(),
        grad_embeddings=emb.grad.numpy(),
        grad_beta=beta.grad.numpy(),
    )
    for name, net in (("mlp1", mlp1), ("mlp2", mlp2)):
        for i_l, lin in enumerate(m for m in net if isinstance(m, nn.Linear)):
            fix[f"{name}.{i_l}.w"] = lin.weight.detach().numpy()
            fix[f"{name}.{i_l}.b"] = lin.bias.detach().numpy()
            fix[f"grad.{name}.{i_l}.w"] = lin.weight.grad.numpy()
            fix[f"grad.{name}.{i_l}.b"] = lin.bias.grad.numpy()
    np.savez(os.path.join(OUT, "volume_grads.npz"), **fix)
    print("wrote volume_grads.npz  loss=%.6f" % float(loss))


if __name__ == "__main__":
    torch.manual_seed(0)
    gen_ide_fixture()
    gen_demo_fixture()
    gen_sphere_fixture()
    gen_unwrap_fixture()
    gen_sphere_grad_fixture()
    gen_volume_grad_fixture()
