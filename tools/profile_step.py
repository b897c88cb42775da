"""Scene train-step component profile at the bench workload.

Times, on the chip, with the current encoder settings:
  march-only, render fwd, fwd+bwd (grad), full train step —
and the same with hash_scatter_impl='mixed' — so BENCH movements can be
attributed to ops.  (Round-1 attribution: march 66 ms, fwd 131 ms,
bwd-scatter 456 ms of a 587 ms step.)

Run (single-tenant TPU):  timeout 2400 python -u tools/profile_step.py
"""
import os
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


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = jax.tree.leaves(r)[0]
    _ = float(jnp.asarray(s).ravel()[0])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def run(tag, **overrides):
    opt = load_options("configs/synth_spheres.ini", path="data/synth_spheres",
                       workspace="/tmp/profile_step", **overrides)
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

    # the step donates its state arg — must thread it through
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub, weights)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub, weights)
    _ = float(m["loss"])
    t = (time.perf_counter() - t0) / 10
    print(f"[{tag}] full train step: {t*1e3:8.1f} ms "
          f"({sched.num_rays/t:,.0f} rays/s)  K={K}", flush=True)

    # grid update cost (full sweep vs slab)
    lm = None
    t = timeit(lambda: trainer._update_grid_fn(
        state["params"], state["grid"], key, lm, fraction=1), iters=3)
    print(f"[{tag}] grid update full sweep: {t*1e3:8.1f} ms", flush=True)
    t = timeit(lambda: trainer._update_grid_fn(
        state["params"], state["grid"], key, lm, fraction=4), iters=3)
    print(f"[{tag}] grid update 1/4 slab:   {t*1e3:8.1f} ms", flush=True)
    del trainer, state
    return


run("custom_vjp")
run("autodiff", hash_custom_grad=False)
