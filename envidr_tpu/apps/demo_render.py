"""Render the pretrained neural sphere (the reference's demo.ipynb) as a CLI.

Loads the reference-format demo checkpoints (``demo/*.pth``) through the
torch importer and renders a surface-shaded sphere with the jitted pipeline:

    python -m envidr_tpu.apps.demo_render --ckpt-dir /root/reference/demo \
        --theta 123 --phi 0 --roughness 0.0 --metallic 0.2 \
        --color 20 70 160 --env 2 --size 400 --out demo.png
"""

from __future__ import annotations

import argparse
import functools

import numpy as np

import jax
import jax.numpy as jnp

from envidr_tpu.geometry.rays import (
    full_image_rays, linear_to_srgb, nerf_matrix_to_ngp, pose_spherical,
    reflect_dir, sphere_intersections,
)
from envidr_tpu.io.torch_import import load_env_net, load_mlp
from envidr_tpu.models.mlp import apply_mlp, unit_norm
from envidr_tpu.ops.ide import ide_encode


@functools.partial(jax.jit, static_argnames=("H", "W"))
def render(nets, pose, intrinsics, material_vec, H: int, W: int):
    sdf_net, env_net, diffuse_net, specular_net = nets
    rays_o, rays_d = full_image_rays(pose[None], intrinsics, H, W)
    rays_o, rays_d = rays_o[0], rays_d[0]
    nears, _, mask = sphere_intersections(rays_o, rays_d, 1.0)

    dirs = rays_d
    xyzs = rays_o + dirs * nears
    normals = xyzs  # unit sphere: normal == position

    feat_dim = 12
    h = apply_mlp(sdf_net, jnp.concatenate([nets_xyz_encoding, material_vec])[None],
                  act=jax.nn.relu)
    geo_feat = unit_norm(h[..., 1:1 + feat_dim])
    geo_feat = jnp.broadcast_to(geo_feat, (xyzs.shape[0], feat_dim))
    kappa_inv = jax.nn.softplus(h[..., -1] - 1.0)[0]

    n_enc = ide_encode(normals, 0.64, deg_view=4)
    w_o = -dirs
    w_r = reflect_dir(w_o, normals)
    w_r_enc = ide_encode(w_r, kappa_inv, deg_view=4)
    n_dot_v = jnp.sum(normals * w_o, axis=-1, keepdims=True)

    diffuse_env = unit_norm(apply_mlp(env_net, n_enc, act=jax.nn.relu))
    diffuse = jax.nn.sigmoid(apply_mlp(
        diffuse_net, jnp.concatenate([geo_feat, diffuse_env], -1), act=jax.nn.relu))
    specular_env = unit_norm(apply_mlp(env_net, w_r_enc, act=jax.nn.relu))
    specular = jax.nn.sigmoid(apply_mlp(
        specular_net,
        jnp.concatenate([geo_feat, normals, specular_env, n_dot_v], -1),
        act=jax.nn.relu))

    rgb = jnp.clip(linear_to_srgb(diffuse + specular), 0.0, 1.0)
    img = jnp.where(mask[:, None], rgb, 1.0)
    return img.reshape(H, W, 3)


def main(argv=None):
    import envidr_tpu
    envidr_tpu.apply_device_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", default="/root/reference/demo")
    p.add_argument("--theta", type=float, default=123.0)
    p.add_argument("--phi", type=float, default=0.0)
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--roughness", type=float, default=0.0)
    p.add_argument("--metallic", type=float, default=0.2)
    p.add_argument("--color", type=int, nargs=3, default=[20, 70, 160])
    p.add_argument("--env", type=int, default=2, help="environment index 0..10")
    p.add_argument("--size", type=int, default=400)
    p.add_argument("--out", default="demo.png")
    args = p.parse_args(argv)

    global nets_xyz_encoding
    nets_xyz_encoding = jnp.asarray(
        np.loadtxt(f"{args.ckpt_dir}/xyz_encoding.txt"), jnp.float32)
    nets = (
        load_mlp(f"{args.ckpt_dir}/sdf_net.pth"),
        load_env_net(f"{args.ckpt_dir}/envs/env_net_{args.env}.pth"),
        load_mlp(f"{args.ckpt_dir}/diffuse_net.pth"),
        load_mlp(f"{args.ckpt_dir}/specular_net.pth"),
    )

    H = W = args.size
    camera_angle_x = 0.6194058656692505
    focal = W / (2 * np.tan(camera_angle_x / 2))
    intrinsics = (focal, focal, W / 2, H / 2)
    pose = jnp.asarray(nerf_matrix_to_ngp(
        pose_spherical(args.theta, -args.phi, args.radius)))
    material_vec = jnp.asarray(
        [args.roughness, args.metallic, *(c / 255.0 for c in args.color)], jnp.float32)

    img = render(nets, pose, intrinsics, material_vec, H, W)
    img8 = np.asarray(jnp.round(img * 255)).astype(np.uint8)
    try:
        import imageio.v2 as imageio
        imageio.imwrite(args.out, img8)
    except ImportError:
        from PIL import Image
        Image.fromarray(img8).save(args.out)
    print(f"devices={jax.devices()} wrote {args.out} "
          f"({H}x{W}, mean={img.mean():.4f}, fg_frac={(img8.min(-1) < 255).mean():.3f})")


if __name__ == "__main__":
    main()
