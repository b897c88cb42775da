"""NaN hunt, stage 2: pass-level bisect of render_scene_indirect.

Rebuilds the 3-pass body (render/indirect.py:58-112) with gradient taps:
  A  pass-1 geometry outputs only
  B  pass-2 secondary render (through pass-1 depth/normals)
  C  pass-3 with the reflection input forcibly zeroed (renv gate starved)
  D  the real thing
Usage mirrors debug_indir_nan.py.
"""
import argparse
import dataclasses
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.geometry.rays import reflect_dir, sampled_rays
from envidr_tpu.ops.density import SQRT3
from envidr_tpu.ops.grid import OccupancyGrid
from envidr_tpu.render.indirect import IndirectOptions
from envidr_tpu.render.scene import SceneRenderOptions, render_scene
from envidr_tpu.train.schedules import resolve


def nan_leaves(tree):
    bad = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        bad += int(np.sum(~np.isfinite(np.asarray(leaf))) > 0)
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/scenes/shiny3_indir.ini")
    ap.add_argument("--ckpt", default="/tmp/shiny3_ep0170.ckpt")
    ap.add_argument("--epoch", type=int, default=50)
    ap.add_argument("--num-rays", type=int, default=1024)
    ap.add_argument("--img", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    opt = load_options(args.config, workspace="/tmp/debug_indir")
    cfg = network_config(opt)
    sched = resolve(opt, args.epoch, args.epoch * 60)

    with open(args.ckpt, "rb") as f:
        payload = pickle.load(f)
    params = jax.tree.map(jnp.asarray, payload["params"])
    grid = OccupancyGrid(*[jnp.asarray(x) for x in payload["grid"]])
    bitfield = grid.bitfield

    ds = NeRFDataset(opt.path, "train", scale=opt.scale, offset=opt.offset)
    pose = jnp.asarray(ds.poses[args.img])[None]
    intrinsics = jnp.asarray(ds.intrinsics, jnp.float32)

    key = jax.random.PRNGKey(args.seed)
    k_rays, _, k_perturb = jax.random.split(key, 3)
    rays = sampled_rays(k_rays, pose, intrinsics, ds.H, ds.W, args.num_rays)
    rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]
    n = rays_o.shape[0]
    bg = jnp.ones((n, 3))
    aabb = jnp.asarray([-opt.bound] * 3 + [opt.bound] * 3, jnp.float32)
    K = int(sched.early_stop_steps)
    ropts = SceneRenderOptions(
        max_steps=opt.max_steps, num_samples=K,
        early_stop_steps=sched.early_stop_steps, dt_gamma=opt.dt_gamma,
        T_thresh=opt.T_thresh, min_near=opt.min_near,
        use_bg_net=cfg.bg_radius > 0, coarse_march=opt.coarse_march)
    iopts = IndirectOptions(
        indir_max_steps=opt.indir_max_steps,
        indir_early_stop_steps=opt.indir_early_stop_steps,
        indir_num_samples=min(K, max(opt.indir_early_stop_steps, 16)),
        grad_rays=False, grad_rays_scale=opt.grad_rays_scale)
    weights = {k: jnp.asarray(v) for k, v in sched.weights.items()}
    traced = dict(cos_anneal_ratio=sched.cos_anneal_ratio,
                  beta_cap=weights["_beta_cap"], beta_min=weights["_beta_min"])

    dt = 2.0 * SQRT3 / iopts.indir_max_steps
    k1, k2, k3 = jax.random.split(k_perturb, 3)

    def pass1(p):
        geo_opts = dataclasses.replace(ropts, geometry_only=True,
                                       with_loss_aux=False)
        geo = render_scene(p, cfg, geo_opts, bitfield, rays_o, rays_d, bg,
                           aabb, key=k1,
                           normal_anneal_ratio=sched.normal_anneal_ratio,
                           **traced)
        return geo

    def pass2(p, stop_rays):
        geo = pass1(p)
        normals = geo["normal_image"]
        depth = geo["depth"] - dt
        weights_sum = geo["weights_sum"]
        ref_mask = jax.lax.stop_gradient(
            (depth != 0.0) & (weights_sum > 0.9))
        ref_o = rays_o + depth[:, None] * rays_d
        ref_d = reflect_dir(-rays_d, normals)
        if stop_rays:
            ref_o = jax.lax.stop_gradient(ref_o)
            ref_d = jax.lax.stop_gradient(ref_d)
        sec_opts = dataclasses.replace(
            ropts, max_steps=iopts.indir_max_steps,
            early_stop_steps=iopts.indir_early_stop_steps,
            num_samples=iopts.indir_num_samples, min_near=dt * 2.0,
            geometry_only=False, with_loss_aux=False,
            grad_ray=iopts.grad_rays, grad_rays_scale=iopts.grad_rays_scale,
            use_bg_net=False)
        sec = render_scene(p, cfg, sec_opts, bitfield, ref_o, ref_d, 0.0,
                           aabb, key=k2,
                           normal_anneal_ratio=sched.normal_anneal_ratio,
                           **traced)
        r_images = jnp.concatenate(
            [sec["image"], sec["weights_sum"][:, None]], axis=-1)
        r_images = jnp.where(ref_mask[:, None], r_images, 0.0)
        return r_images

    def pass3(p, r_images):
        main_opts = dataclasses.replace(ropts, geometry_only=False,
                                        use_bg_net=False)
        out = render_scene(p, cfg, main_opts, bitfield, rays_o, rays_d, bg,
                           aabb, key=k3, r_images=r_images,
                           normal_anneal_ratio=sched.normal_anneal_ratio,
                           **traced)
        return out

    probes = {
        "A  pass1 normals+depth": lambda p: (
            jnp.sum(pass1(p)["normal_image"]) + jnp.sum(pass1(p)["depth"])),
        "A2 pass1 weights_sum": lambda p: jnp.sum(pass1(p)["weights_sum"]),
        "B  pass2 r_images": lambda p: jnp.sum(pass2(p, stop_rays=False)),
        "B2 pass2 r_images (rays detached)": lambda p: jnp.sum(
            pass2(p, stop_rays=True)),
        "C  pass3, zero reflection": lambda p: jnp.sum(
            pass3(p, jnp.zeros((n, 4)))["image"]),
        "C2 pass3, finite fake reflection": lambda p: jnp.sum(
            pass3(p, 0.5 * jnp.ones((n, 4)))["image"]),
        "D  full (pass2 -> pass3)": lambda p: jnp.sum(
            pass3(p, pass2(p, stop_rays=False))["image"]),
    }
    for name, fn in probes.items():
        try:
            g = jax.jit(jax.grad(fn))(params)
            bad = nan_leaves(g)
            print(f"[{name}] bad-leaves={bad}", flush=True)
            del g
        except Exception as e:  # keep bisecting even if one probe breaks
            print(f"[{name}] ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
