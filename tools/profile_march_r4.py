"""Round-4 march A/B on the chip: dense vs coarse_march, plus step impact.

Run (single-tenant TPU, AFTER the campaign frees the chip):
    timeout 2400 python -u tools/profile_march_r4.py
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
    _ = float(jnp.sum(s))  # forced materialization (CLAUDE.md)
    return (time.perf_counter() - t0) / iters


def bench_step(coarse: bool):
    opt = load_options("configs/synth_spheres_cp.ini",
                       path="data/synth_spheres",
                       workspace="/tmp/profile_march",
                       coarse_march=coarse)
    cfg = network_config(opt)
    trainer = Trainer(opt, cfg)
    ds = NeRFDataset(opt.path, "train", scale=opt.scale)
    sched = resolve(opt, 1, 0)
    trainer._sched = sched
    K = trainer.sample_budget(sched)
    step = trainer._get_train_step(sched, K, sched.num_rays, ds.H, ds.W,
                                   ds.C, "scene")
    trainer.update_extra_state()
    batch = {"pose": ds.device_poses[0], "image": ds.device_images[0],
             "intrinsics": jnp.asarray(ds.intrinsics, jnp.float32)}
    weights = {k: jnp.asarray(v) for k, v in sched.weights.items()}
    state = trainer.state
    key = jax.random.PRNGKey(0)

    def one():
        nonlocal state, key
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub, weights)
        return m

    t = timeit(one)
    print(f"coarse={coarse}: step {t*1e3:7.1f} ms "
          f"({opt.num_rays/t:,.0f} rays/s) K={K}", flush=True)
    # NOTE: trainer.state was DONATED by the first step — use the live state
    grid_bitfield = state["grid"].bitfield

    # march-only timing
    from envidr_tpu.ops.marching import march_rays
    from envidr_tpu.geometry.rays import (near_far_from_aabb, sampled_rays)
    rays = sampled_rays(jax.random.PRNGKey(1), ds.device_poses[:1],
                        jnp.asarray(ds.intrinsics, jnp.float32),
                        ds.H, ds.W, opt.num_rays)
    ro, rd = rays["rays_o"][0], rays["rays_d"][0]
    aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(ro, rd, aabb, opt.min_near)
    bf = grid_bitfield

    march = jax.jit(lambda o, d, n, f, b: march_rays(
        o, d, n, f, b, bound=cfg.bound, grid_size=128, dt_gamma=0.0,
        max_steps=sched.max_steps, num_samples=K,
        early_stop_steps=sched.early_stop_steps, coarse_march=coarse))
    tm = timeit(lambda: march(ro, rd, nears, fars, bf))
    print(f"coarse={coarse}: march {tm*1e3:6.1f} ms", flush=True)
    return t


td = bench_step(False)
tc = bench_step(True)
print(f"step speedup: {td/tc:.2f}x", flush=True)
