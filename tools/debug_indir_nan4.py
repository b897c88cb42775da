"""NaN hunt, stage 4: probe the REAL marched sample positions.

Reconstructs the exact march of pass-1 (render/scene.py:93-100), dumps the
sample-position statistics, and feeds those positions to the standalone
second-order probe (which was CLEAN on uniform points).  If it turns bad
here, chunk down to the poison samples and print them.
"""
import argparse
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
from envidr_tpu.geometry.rays import sampled_rays, near_far_from_aabb
from envidr_tpu.models.network import forward_geometry, _safe_normalize
from envidr_tpu.ops.grid import OccupancyGrid
from envidr_tpu.ops.marching import march_rays
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
    aabb = jnp.asarray([-opt.bound] * 3 + [opt.bound] * 3, jnp.float32)
    K = int(sched.early_stop_steps)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, opt.min_near)
    m = march_rays(rays_o, rays_d, nears, fars, bitfield,
                   bound=cfg.bound, grid_size=128, dt_gamma=opt.dt_gamma,
                   max_steps=opt.max_steps, num_samples=K,
                   early_stop_steps=sched.early_stop_steps,
                   perturb_key=k_perturb, coarse_march=opt.coarse_march)
    xyzs = np.asarray(m.xyzs).reshape(-1, 3)
    dts = np.asarray(m.dts).reshape(-1)
    counts = np.asarray(m.counts)
    print(f"marched: xyz min={xyzs.min():.4f} max={xyzs.max():.4f} "
          f"finite={np.isfinite(xyzs).all()}  dts min={dts.min():.3e} "
          f"max={dts.max():.3e}  counts mean={counts.mean():.1f}", flush=True)

    valid = np.asarray(m.mask).reshape(-1)

    def s_probe(p, pts):
        def sdf_sum(q):
            return jnp.sum(forward_geometry(p, cfg, q, None)["sdf"])
        grads = jax.grad(sdf_sum)(pts)
        return jnp.sum(_safe_normalize(grads))

    probe = jax.jit(jax.grad(s_probe))
    g = probe(params, jnp.asarray(xyzs))
    print(f"[marched xyz standalone] bad-leaves={nan_leaves(g)}", flush=True)
    del g

    # localize
    bad_idx = []
    B = xyzs.shape[0]
    for i in range(0, B, 4096):
        g = probe(params, jnp.asarray(xyzs[i:i + 4096]))
        if nan_leaves(g):
            bad_idx.append(i)
        del g
    print(f"bad 4096-chunks at {bad_idx[:8]} ({len(bad_idx)})", flush=True)
    if bad_idx:
        i0 = bad_idx[0]
        sub = xyzs[i0:i0 + 4096]
        hit = []
        for j in range(0, 4096, 64):
            g = probe(params, jnp.asarray(sub[j:j + 64]))
            if nan_leaves(g):
                hit.append(j)
            del g
        j0 = hit[0]
        blk = sub[j0:j0 + 64]
        for k in range(64):
            g = probe(params, jnp.asarray(blk[k:k + 1]))
            if nan_leaves(g):
                pt = blk[k]
                gi = i0 + j0 + k
                print(f"POISON sample #{gi} xyz={pt} valid={valid[gi]} "
                      f"ray={gi // K} slot={gi % K} "
                      f"count={counts[gi // K]}", flush=True)
                # primal gradient magnitude there
                def sdf_sum(q):
                    return jnp.sum(forward_geometry(params, cfg, q, None)["sdf"])
                gr = jax.grad(sdf_sum)(jnp.asarray(pt[None]))
                print(f"   dsdf/dx={np.asarray(gr)} "
                      f"|g|={float(jnp.linalg.norm(gr)):.3e}", flush=True)
            del g


if __name__ == "__main__":
    main()
