"""NaN hunt, stage 3: inside pass-1's normal/depth backward.

Probes:
  N   grad of sum(normal_image) alone
  Dp  grad of sum(depth) alone
  S   standalone second-order: params-grad of sum(safe_normalize(dsdf/dx))
      on a synthetic xyz batch (renderer removed entirely)
  S2  same but only where |dsdf/dx| is healthy (>0.1): masked
Chunked localization when S is bad: which xyz points poison the batch.
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
from envidr_tpu.geometry.rays import sampled_rays
from envidr_tpu.models.network import forward_geometry, _safe_normalize
from envidr_tpu.ops.grid import OccupancyGrid
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
    traced = dict(cos_anneal_ratio=sched.cos_anneal_ratio,
                  beta_cap=jnp.asarray(sched.weights["_beta_cap"]),
                  beta_min=jnp.asarray(sched.weights["_beta_min"]))

    def pass1(p):
        geo_opts = dataclasses.replace(ropts, geometry_only=True,
                                       with_loss_aux=False)
        return render_scene(p, cfg, geo_opts, bitfield, rays_o, rays_d, bg,
                            aabb, key=k_perturb,
                            normal_anneal_ratio=sched.normal_anneal_ratio,
                            **traced)

    for name, fn in {
        "N  sum normal_image": lambda p: jnp.sum(pass1(p)["normal_image"]),
        "Dp sum depth": lambda p: jnp.sum(pass1(p)["depth"]),
    }.items():
        g = jax.jit(jax.grad(fn))(params)
        print(f"[{name}] bad-leaves={nan_leaves(g)}", flush=True)
        del g

    # ---- standalone second-order probe (no renderer) ----
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (4096, 3)), jnp.float32)

    def normals_at(p, pts):
        def sdf_sum(q):
            return jnp.sum(forward_geometry(p, cfg, q, None)["sdf"])
        grads = jax.grad(sdf_sum)(pts)
        return _safe_normalize(grads), grads

    def s_probe(p, pts):
        nrm, _ = normals_at(p, pts)
        return jnp.sum(nrm)

    g = jax.jit(jax.grad(s_probe))(params, xyz)
    bad = nan_leaves(g)
    print(f"[S  standalone d(normalize(dsdf/dx))/dparams] bad-leaves={bad}",
          flush=True)
    del g

    nrm, raw = jax.jit(lambda p, q: normals_at(p, q))(params, xyz)
    mag = np.asarray(jnp.linalg.norm(raw, axis=-1))
    print(f"   |dsdf/dx|: min={mag.min():.3e} p1={np.percentile(mag,1):.3e} "
          f"med={np.median(mag):.3e} max={mag.max():.3e}", flush=True)

    if bad:
        # chunk to localize the poisonous points
        bad_pts = []
        for i in range(0, xyz.shape[0], 256):
            chunk = xyz[i:i + 256]
            g = jax.jit(jax.grad(s_probe))(params, chunk)
            if nan_leaves(g):
                bad_pts.append((i, mag[i:i + 256].min()))
            del g
        print(f"   bad chunks: {bad_pts[:10]} ({len(bad_pts)} total)",
              flush=True)
        if bad_pts:
            i = bad_pts[0][0]
            chunk = xyz[i:i + 256]
            # per-point: 16-point mini chunks
            for j in range(0, 256, 16):
                g = jax.jit(jax.grad(s_probe))(params, chunk[j:j + 16])
                if nan_leaves(g):
                    sub = chunk[j:j + 16]
                    m = mag[i + j:i + j + 16]
                    for k in range(16):
                        gk = jax.jit(jax.grad(s_probe))(params, sub[k:k + 1])
                        if nan_leaves(gk):
                            print(f"   POISON xyz={np.asarray(sub[k])} "
                                  f"|grad|={m[k]:.3e}", flush=True)
                        del gk
                    break
                del g


if __name__ == "__main__":
    main()
