"""Diagnose the round-1 train-vs-eval quality gap (VERDICT.md weak #1).

Loads exps/synth_spheres/checkpoints/ep0060.ckpt on CPU and measures:
  1. Laplace beta + density stats (is the SDF sharpening at all?)
  2. eval render with raw params vs EMA params (PSNR each)
  3. a train-style render (perturb, K=64, random bg) of the same pixels vs the
     eval-style render — the reported train L1 should reproduce or not.

Run: ENVIDR_DEVICE=cpu JAX_PLATFORMS=cpu python tools/diag_quality.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from envidr_tpu.config import load_options, network_config
from envidr_tpu.train.trainer import Trainer
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.ops.density import laplace_beta

opt = load_options("configs/synth_spheres.ini")
cfg = network_config(opt)
trainer = Trainer(opt, cfg, workspace="exps/synth_spheres")
ok = trainer.load_checkpoint("exps/synth_spheres/checkpoints/ep0060.ckpt")
assert ok

params = trainer.state["params"]
ema = trainer.state["ema"]

beta = float(laplace_beta(params["sdf_density"], opt.beta_min, cfg.beta_max))
beta_ema = float(laplace_beta(ema["sdf_density"], opt.beta_min, cfg.beta_max))
print(f"beta(params) = {beta:.5f}   beta(ema) = {beta_ema:.5f}  (init 0.1)")

grid = trainer.state["grid"]
occ = np.asarray(grid.bitfield)
print(f"occupancy: {occ.mean():.4f} of cells occupied, density grid mean "
      f"{float(np.asarray(grid.density).mean()):.4f}")

val = NeRFDataset("data/synth_spheres", "val", scale=opt.scale, offset=opt.offset,
                  downscale=2)
train = NeRFDataset("data/synth_spheres", "train", scale=opt.scale,
                    offset=opt.offset, downscale=2)

# --- 2. eval-style renders --------------------------------------------------
def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(mse)

gt = val.images[0].astype(np.float32) / 255.0
gt_rgb = gt[..., :3] * gt[..., 3:] + (1.0 - gt[..., 3:])

for tag, use_ema in (("params", False), ("ema", True)):
    res = trainer.render_image(val.poses[0], val.intrinsics, val.H, val.W,
                               use_ema=use_ema)
    p = psnr(np.clip(res["image"], 0, 1), gt_rgb)
    print(f"eval render ({tag}): PSNR = {p:.2f}  ws mean={res['weights_sum'].mean():.3f}"
          f"  ws>0.5 frac={np.mean(res['weights_sum'] > 0.5):.3f}")
    np.save(f"/tmp/diag_{tag}_img.npy", res["image"])

# --- 3. train-style render of train image 0 --------------------------------
from envidr_tpu.geometry.rays import sampled_rays
from envidr_tpu.render.scene import SceneRenderOptions, render_scene
from envidr_tpu.train.schedules import resolve

sched = resolve(opt, 60, trainer.global_step)
K = trainer.sample_budget(sched)
print(f"train K = {K}, early_stop={sched.early_stop_steps}, max_steps={sched.max_steps}")

key = jax.random.PRNGKey(1234)
k_rays, k_bg, k_perturb = jax.random.split(key, 3)
pose = jnp.asarray(train.poses[0])[None]
intr = jnp.asarray(train.intrinsics, jnp.float32)
num_rays = 4096
rays = sampled_rays(k_rays, pose, intr, train.H, train.W, num_rays)
rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]
img = np.asarray(train.images[0])
pix = jnp.take(jnp.asarray(img), rays["inds"][0], axis=0).astype(jnp.float32) / 255.0

aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)

ropts_train = SceneRenderOptions(
    max_steps=sched.max_steps, num_samples=K,
    early_stop_steps=sched.early_stop_steps, dt_gamma=opt.dt_gamma,
    T_thresh=opt.T_thresh, min_near=opt.min_near, perturb=True, training=True,
    grid_size=128)
ropts_eval = SceneRenderOptions(
    max_steps=opt.max_steps, num_samples=opt.eval_samples_budget,
    early_stop_steps=opt.early_stop_steps, dt_gamma=opt.dt_gamma,
    T_thresh=opt.T_thresh, min_near=opt.min_near, grid_size=128)

bg_rand = jax.random.uniform(k_bg, (num_rays, 3))
bg_white = jnp.ones((num_rays, 3))
gt_rand = pix[..., :3] * pix[..., 3:] + bg_rand * (1.0 - pix[..., 3:])
gt_white = pix[..., :3] * pix[..., 3:] + bg_white * (1.0 - pix[..., 3:])

out_t = render_scene(params, cfg, ropts_train, grid.bitfield, rays_o, rays_d,
                     bg_rand, aabb, key=k_perturb)
out_tw = render_scene(params, cfg, ropts_train, grid.bitfield, rays_o, rays_d,
                      bg_white, aabb, key=k_perturb)
out_e = render_scene(params, cfg, ropts_eval, grid.bitfield, rays_o, rays_d,
                     bg_white, aabb)

l1_t = float(jnp.mean(jnp.abs(out_t["image"] - gt_rand)))
l1_tw = float(jnp.mean(jnp.abs(out_tw["image"] - gt_white)))
l1_e = float(jnp.mean(jnp.abs(out_e["image"] - gt_white)))
print(f"train-style render, random bg: L1 = {l1_t:.4f} (logged ~0.039)")
print(f"train-style render, white  bg: L1 = {l1_tw:.4f}")
print(f"eval-style  render, white  bg: L1 = {l1_e:.4f}")
print(f"train-vs-eval same-pixel diff: "
      f"{float(jnp.mean(jnp.abs(out_tw['image'] - out_e['image']))):.4f}")
print(f"ws train={float(out_t['weights_sum'].mean()):.3f} "
      f"eval={float(out_e['weights_sum'].mean()):.3f}  "
      f"alpha gt={float(pix[..., 3].mean()):.3f}")
# per-ray counts
print(f"counts train mean={float(out_t['counts'].mean()):.1f} "
      f"eval mean={float(out_e['counts'].mean()):.1f}")
