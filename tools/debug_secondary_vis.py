"""Why is secondary-ray visibility ~0 on the trained shiny3 ckpt?

The S4 probe found the roughness gate OPEN (fix worked) but r_vis
(pass-2 weights_sum) ~ 0.0002 over every contact ray: reflected rays
accumulate nothing, so renv_mask stays shut and renv_net still gets zero
gradient.  Hypotheses:
  H1  sample-budget starvation: the secondary march's K budget is spent
      on the mirror's own surface voxels (ref_o sits dt inside the
      mirror's occupancy shell) before reaching the bowl
  H2  wrong reflection directions (normals)
  H3  the bowl region is pruned from the occupancy grid
Reports, for each contact ray batch: secondary march counts, the t-range
of selected samples, weights_sum under K in {16, 32, 64, 128}, and the
analytic expectation (ray->bowl distance).
CPU-safe; reads the workspace best.ckpt.
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.geometry.rays import (full_image_rays, near_far_from_aabb,
                                      reflect_dir)
from envidr_tpu.ops.density import SQRT3
from envidr_tpu.ops.grid import OccupancyGrid
from envidr_tpu.ops.marching import march_rays
from envidr_tpu.render.scene import SceneRenderOptions, render_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/scenes/shiny3_indir.ini")
    ap.add_argument("--ckpt",
                    default="exps/scenes/shiny3_indir/checkpoints/best.ckpt")
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()

    opt = load_options(args.config, workspace="/tmp/dbg_sec")
    cfg = network_config(opt)
    import pickle
    with open(args.ckpt, "rb") as f:
        payload = pickle.load(f)
    params = jax.tree.map(jnp.asarray, payload["ema"])
    grid = OccupancyGrid(*[jnp.asarray(x) for x in payload["grid"]])
    bitfield = grid.bitfield
    print("ckpt epoch", payload["epoch"])

    # contact rays of the most-contact val view (same selection as probe)
    from tools.compare_shiny import contact_mask
    from tools import gen_synth_scene as gss
    ds = NeRFDataset(opt.path, "val", scale=opt.scale)
    with open(os.path.join(opt.path, "transforms_val.json")) as f:
        meta = json.load(f)
    H, W = ds.H, ds.W
    focal = 0.5 * W / np.tan(0.5 * meta["camera_angle_x"])
    views = []
    for vi, fr in enumerate(meta["frames"]):
        pose_raw = np.array(fr["transform_matrix"], np.float32)
        cmask = contact_mask(pose_raw, H, W, focal, gss.SHINY3_SPHERES)
        views.append((vi, cmask))
    vi, cmask = max(views, key=lambda v: int(v[1].sum()))
    idx = np.nonzero(cmask.reshape(-1))[0]
    idx = idx[np.linspace(0, len(idx) - 1, min(args.n, len(idx))).astype(int)]
    rays_o, rays_d = full_image_rays(
        jnp.asarray(ds.poses[vi])[None], ds.intrinsics, H, W)
    o, d = rays_o[0][idx], rays_d[0][idx]

    aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3)
    ropts = SceneRenderOptions(
        max_steps=opt.max_steps, num_samples=64,
        early_stop_steps=opt.early_stop_steps, dt_gamma=opt.dt_gamma,
        T_thresh=opt.T_thresh, min_near=opt.min_near, perturb=False,
        grid_size=128)
    geo_opts = dataclasses.replace(ropts, geometry_only=True,
                                   with_loss_aux=False)
    geo = render_scene(params, cfg, geo_opts, bitfield, o, d, 1.0, aabb)
    dt = 2.0 * SQRT3 / 1024
    normals = geo["normal_image"]
    depth = geo["depth"] - dt
    ws1 = np.asarray(geo["weights_sum"])
    print(f"pass1: weights_sum mean={ws1.mean():.3f} depth "
          f"mean={float(jnp.mean(depth)):.3f}")
    ref_o = o + depth[:, None] * d
    ref_d = reflect_dir(-d, normals)
    rl = np.asarray(jnp.linalg.norm(ref_d, axis=-1))
    print(f"|ref_d|: mean={rl.mean():.4f} min={rl.min():.4f} "
          f"max={rl.max():.4f}")
    # mirror geometry: center/radius of sphere 0 (the mirror)
    center0, radius0 = gss.SHINY3_SPHERES[0][:2]
    c = jnp.asarray(center0, jnp.float32) * opt.scale
    r = float(radius0) * opt.scale
    surf_dist = np.asarray(jnp.linalg.norm(ref_o - c, axis=-1)) - r
    print(f"ref_o dist-to-mirror-surface: mean={surf_dist.mean():+.4f} "
          f"min={surf_dist.min():+.4f} (negative = inside)")

    nears, fars = near_far_from_aabb(ref_o, ref_d, aabb, 2.0 * dt)
    for K in (16, 32, 64, 128):
        m = march_rays(ref_o, ref_d, nears, fars, bitfield,
                       bound=cfg.bound, grid_size=128, dt_gamma=opt.dt_gamma,
                       max_steps=1024, num_samples=K, early_stop_steps=K,
                       coarse_march=False)
        counts = np.asarray(m.counts)
        ts = np.asarray(m.ts)
        mask = np.asarray(m.mask)
        t_lo = np.where(mask, ts, np.inf).min(axis=1)
        t_hi = np.where(mask, ts, -np.inf).max(axis=1)
        sec_opts = dataclasses.replace(
            ropts, max_steps=1024, early_stop_steps=K, num_samples=K,
            min_near=2.0 * dt, geometry_only=False, with_loss_aux=False,
            use_bg_net=False)
        sec = render_scene(params, cfg, sec_opts, bitfield, ref_o, ref_d,
                           0.0, aabb)
        ws = np.asarray(sec["weights_sum"])
        print(f"K={K:4d}: counts mean={counts.mean():6.1f} "
              f"t_first={np.nanmean(np.where(np.isfinite(t_lo), t_lo, np.nan)):.4f} "
              f"t_last={np.nanmean(np.where(np.isfinite(t_hi), t_hi, np.nan)):.4f} "
              f"r_vis mean={ws.mean():.4f} >0.9={float((ws > 0.9).mean()):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
