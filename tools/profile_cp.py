"""CP (flagship) train-step component profile on the chip.

Attributes the CP step (ty ~98 ms at 4096 rays) to march / render-fwd /
fwd+bwd / optimizer, to locate the next perf target after the scatter wall
was removed (docs/PERF_R2.md).

Run (single-tenant TPU):  timeout 2400 python -u tools/profile_cp.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import envidr_tpu
envidr_tpu.apply_device_env()
envidr_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.train.trainer import Trainer
from envidr_tpu.train.schedules import resolve

print(f"devices: {jax.devices()}", flush=True)


def timeit(fn, iters=10, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    s = jax.tree.leaves(r)[0]
    _ = float(jnp.sum(s))  # forced materialization (tunnel under-reports
    # with block_until_ready alone — CLAUDE.md)
    return (time.perf_counter() - t0) / iters


opt = load_options("configs/synth_spheres_cp.ini", path="data/synth_spheres",
                   workspace="/tmp/profile_cp")
cfg = network_config(opt)
trainer = Trainer(opt, cfg)
ds = NeRFDataset(opt.path, "train", scale=opt.scale)
sched = resolve(opt, 1, 0)
trainer._sched = sched
K = trainer.sample_budget(sched)
step_fn = trainer._get_train_step(sched, K, sched.num_rays, ds.H, ds.W,
                                  ds.C, "scene")
trainer.update_extra_state()

batch = {"pose": ds.device_poses[0], "image": ds.device_images[0],
         "intrinsics": jnp.asarray(ds.intrinsics, jnp.float32),
         "img_idx": jnp.asarray(0, jnp.int32)}
weights = {k: jnp.asarray(v) for k, v in sched.weights.items()}
key = jax.random.PRNGKey(0)
state = trainer.state

# full step (donated state threaded through)
for _ in range(3):
    key, sub = jax.random.split(key)
    state, m = step_fn(state, batch, sub, weights)
_ = float(m["loss"])
t0 = time.perf_counter()
for _ in range(10):
    key, sub = jax.random.split(key)
    state, m = step_fn(state, batch, sub, weights)
_ = float(m["loss"])
t_full = (time.perf_counter() - t0) / 10
print(f"full step: {t_full*1e3:8.1f} ms ({sched.num_rays/t_full:,.0f} rays/s) K={K}",
      flush=True)

# components at the same shapes
from envidr_tpu.geometry.rays import near_far_from_aabb, sampled_rays
from envidr_tpu.ops.marching import march_rays
from envidr_tpu.render.scene import SceneRenderOptions, render_scene

params = state["params"]
bitfield = state["grid"].bitfield
aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3)
N = sched.num_rays
rng = np.random.default_rng(0)
o = jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (N, 1)), jnp.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
nears, fars = near_far_from_aabb(o, d, aabb, opt.min_near)

ropts = SceneRenderOptions(
    max_steps=sched.max_steps, num_samples=K,
    early_stop_steps=sched.early_stop_steps, dt_gamma=opt.dt_gamma,
    T_thresh=opt.T_thresh, min_near=opt.min_near, perturb=False,
    grid_size=128)

march = jax.jit(lambda: march_rays(
    o, d, nears, fars, bitfield, bound=cfg.bound, grid_size=128,
    dt_gamma=opt.dt_gamma, max_steps=sched.max_steps, num_samples=K,
    early_stop_steps=sched.early_stop_steps))
print(f"march only:        {timeit(march)*1e3:8.1f} ms", flush=True)

fwd = jax.jit(lambda: render_scene(params, cfg, ropts, bitfield, o, d, 1.0,
                                   aabb)["image"])
print(f"render fwd:        {timeit(fwd)*1e3:8.1f} ms", flush=True)


def loss_fn(p):
    out = render_scene(p, cfg, ropts, bitfield, o, d, 1.0, aabb)
    l = jnp.mean(out["image"])
    if out.get("sdf_gradients") is not None:
        l = l + jnp.mean((jnp.linalg.norm(out["sdf_gradients"], axis=-1) - 1) ** 2)
    return l


gradf = jax.jit(lambda: jax.grad(loss_fn)(params))
print(f"fwd+bwd (grad):    {timeit(gradf)*1e3:8.1f} ms", flush=True)

# encoder-only contraction cost at sample scale
from envidr_tpu.models.network import forward_geometry
xs = jax.random.uniform(jax.random.PRNGKey(1), (N * K, 3), minval=-1, maxval=1)
enc = jax.jit(lambda: forward_geometry(params, cfg, xs, None, None)["sdf"])
print(f"geometry fwd (N*K):{timeit(enc)*1e3:8.1f} ms", flush=True)
