"""Unwrap a trained env MLP into a 512x1024 lat-long environment image.

Reimplements ``unwrap_env_sphere`` (``/root/reference/nerf/render_func/
sph_ray.py:223-309``): one camera ray hits the sphere; its geo_feat is
broadcast to every light direction; IDE(w_r grid, unwrap_roughness) drives the
specular MLP which *is* the (neurally encoded) environment.

    python -m envidr_tpu.apps.unwrap --ckpt ws/checkpoints/epXXXX.ckpt \
        --env-net /root/reference/ckpts/env_ckpts/env_net_3.pth --out env3.png
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from envidr_tpu.geometry.lighting import gen_light_xyz
from envidr_tpu.geometry.rays import linear_to_srgb
from envidr_tpu.models.network import (
    NetworkConfig, forward_color, forward_geometry, get_color_mlp_extra_params,
)
from envidr_tpu.ops.ide import ide_encode


def unwrap_env(params, cfg: NetworkConfig, *, env_h: int = 512,
               env_w: int = 1024, radius: float = 0.95,
               material=None, unwrap_roughness: float | None = None,
               env_index=0, chunk: int = 65536) -> np.ndarray:
    """Returns a [env_h, env_w, 3] linear-space environment image."""
    # camera matches the reference's get_pose(theta=0, phi=0, radius=4)
    # (provider.py:69-93): centers = [r sinθ sinφ, r cosθ, r sinθ cosφ] = (0,4,0)
    cam = jnp.asarray([0.0, 4.0, 0.0])
    d = -cam / jnp.linalg.norm(cam)
    surf = cam + (4.0 - radius) * d                          # first sphere hit
    dirs = d[None, :]

    if "xyz_encoding" in params:
        # pretrained-sphere mode: the hash encoding of a surface point is given
        # (the sphere has uniform material — demo.ipynb's single-point trick)
        from envidr_tpu.models.mlp import apply_linear, softplus_beta, feat_act
        mat_vec = jnp.asarray([material["roughness"], material["metallic"],
                               *jnp.asarray(material["color"])[:3]], jnp.float32)
        h = jnp.concatenate([params["xyz_encoding"], mat_vec])[None]
        for l, layer in enumerate(params["sdf_net"]):
            h = apply_linear(layer, h)
            if l != len(params["sdf_net"]) - 1:
                h = jax.nn.relu(h)
        geo_feat = feat_act(h[..., 1:1 + cfg.geo_feat_dim], cfg.geo_feat_act)
        raw = h[..., 1 + cfg.geo_feat_dim:2 + cfg.geo_feat_dim]
        roughness = (cfg.roughness_act_scale
                     * jax.nn.softplus(raw + cfg.roughness_bias)
                     * cfg.roughness_scale)
    else:
        geo = forward_geometry(params, cfg, surf[None, :], material)
        geo_feat = geo["geo_feat"]
        roughness = geo["roughness"]
    if unwrap_roughness is not None:
        roughness = jnp.full_like(
            roughness if roughness is not None else jnp.ones((1, 1)),
            unwrap_roughness)
    normals = -dirs                                          # facing the camera

    lxyz, _ = gen_light_xyz(env_h, env_w, 1.0)
    lxyz = lxyz.reshape(-1, 3)[:, [1, 2, 0]]                 # sph_ray.py:251-252
    w_r = lxyz / np.linalg.norm(lxyz, axis=-1, keepdims=True)
    n_pix = w_r.shape[0]

    normals_enc, _, n_dot_w_o, n_env_enc = get_color_mlp_extra_params(
        params, cfg, normals, dirs, roughness)

    @jax.jit
    def shade(w_r_chunk):
        m = w_r_chunk.shape[0]
        w_r_enc = ide_encode(w_r_chunk, roughness[0, 0] if roughness is not None
                             else 0.0, deg_view=cfg.sh_degree)
        w_r_enc = w_r_enc * cfg.light_intensity_scale
        gf = jnp.broadcast_to(geo_feat, (m, geo_feat.shape[-1]))
        ne = jnp.broadcast_to(normals_enc, (m, normals_enc.shape[-1])) \
            if normals_enc is not None else None
        nd = jnp.broadcast_to(n_dot_w_o, (m, 1)) if n_dot_w_o is not None else None
        nee = jnp.broadcast_to(n_env_enc, (m, n_env_enc.shape[-1])) \
            if n_env_enc is not None else None
        rgb, aux = forward_color(params, cfg, gf,
                                 jnp.broadcast_to(dirs, (m, 3)), ne, w_r_enc,
                                 nd, env_index=env_index, n_env_enc=nee,
                                 roughness=jnp.broadcast_to(
                                     roughness, (m, 1)) if roughness is not None else None)
        return rgb  # diffuse + specular, as unwrap_env_sphere (sph_ray.py:299)

    out = []
    pad = (-n_pix) % chunk
    w_r_arr = np.concatenate([w_r, np.tile([[0, 0, 1.0]], (pad, 1))]) if pad else w_r
    for s in range(0, n_pix + pad, chunk):
        out.append(np.asarray(shade(jnp.asarray(w_r_arr[s:s + chunk], jnp.float32))))
    img = np.concatenate(out)[:n_pix].reshape(env_h, env_w, 3)
    return img


def main(argv=None):
    import envidr_tpu
    envidr_tpu.apply_device_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--env-net", default="", help=".pth env MLP to unwrap")
    p.add_argument("--mlps", default="/root/reference/ckpts/rendering_mlps.pth",
                   help="rendering MLP bundle (.pth)")
    p.add_argument("--roughness", type=float, default=0.7)
    p.add_argument("--metallic", type=float, default=0.9)
    p.add_argument("--color", type=float, nargs=3, default=[0.7, 0.7, 0.7])
    p.add_argument("--size", type=int, nargs=2, default=[256, 512])
    p.add_argument("--out", default="unwrap.png")
    p.add_argument("--env-index", type=int, default=None,
                   help="which stacked env net to unwrap (ckpt mode); "
                        "defaults to opt.unwrap_env_id (main_nerf.py:101-102)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override Options fields (same dialect as the CLI)")
    args = p.parse_args(argv)

    from envidr_tpu.config import load_options, network_config, _parse_value

    if args.config:
        overrides = {}
        for kv in args.set:
            k, v = kv.split("=", 1)
            overrides[k.strip()] = _parse_value(v)
        opt = load_options(args.config, **overrides)
        if args.env_index is None:
            args.env_index = opt.unwrap_env_id if opt.unwrap_env_id >= 0 else 0
        cfg = network_config(opt)
        from envidr_tpu.train.trainer import Trainer
        tr = Trainer(opt, cfg)
        tr.load_checkpoint(args.ckpt or "latest")
        params = tr.state["ema"]
        material = None
        if cfg.in_roughness or cfg.in_metallic or cfg.in_base_color:
            # material-conditioned pretrains need explicit conditioning
            material = {"roughness": args.roughness,
                        "metallic": args.metallic,
                        "color": jnp.asarray([*args.color, 1.0])}
        radius = opt.env_sph_radius
    else:
        # pretrained-MLP mode: build the sphere network from reference ckpts
        cfg = NetworkConfig(
            env_sph_mode=False, in_roughness=1, in_metallic=1, in_base_color=3,
            hidden_dim_env=160, roughness_act_scale=1.0, use_renv=True,
        )
        from envidr_tpu.io.torch_import import (
            load_state_dict, network_params_from_state, load_env_net)
        from envidr_tpu.models.network import init_network_params
        params = init_network_params(jax.random.PRNGKey(0), cfg)
        params.update(network_params_from_state(load_state_dict(args.mlps), cfg))
        if args.env_net:
            params["env_net"] = load_env_net(args.env_net)
        # demo sdf net + frozen surface-point encoding drive geo_feat/roughness
        from envidr_tpu.io.torch_import import load_mlp
        params["sdf_net"] = load_mlp("/root/reference/demo/sdf_net.pth")
        params["xyz_encoding"] = jnp.asarray(
            np.loadtxt("/root/reference/demo/xyz_encoding.txt"), jnp.float32)
        material = {"roughness": args.roughness, "metallic": args.metallic,
                    "color": jnp.asarray([*args.color, 1.0])}
        radius = 0.95
        if args.env_index is None:
            args.env_index = 0

    img = unwrap_env(params, cfg, env_h=args.size[0], env_w=args.size[1],
                     material=material, unwrap_roughness=args.roughness,
                     radius=radius, env_index=args.env_index)
    img8 = (np.clip(np.asarray(linear_to_srgb(jnp.asarray(img))), 0, 1)
            * 255).astype(np.uint8)
    import imageio.v2 as imageio
    imageio.imwrite(args.out, img8)
    print(f"unwrapped env -> {args.out} ({args.size[0]}x{args.size[1]}, "
          f"mean={img.mean():.4f})")


if __name__ == "__main__":
    main()
