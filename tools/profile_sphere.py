"""Sphere-mode (env pretrain) step profile: compile time + step time.

Round-1 facts (CLAUDE.md): sphere-mode compile was 20-26 min (second-order
eikonal graph through hash gathers) and the step ~2.3 s at 16384 rays — both
made the neural-renderer pretrain non-iterable (3 epochs in round 1).
The hand-written rolled_tiled VJP (4c63f0b) was built to shrink exactly this
graph.  This measures, on the chip:

  * compile wall-time of the sphere train step (analytic normals)
  * per-step wall-time over 5 steps
  * same with numerical_normals=True (first-order escape hatch)

Run (single-tenant TPU):  timeout 3600 python -u tools/profile_sphere.py
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

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.env_dataset import EnvSphereDataset as EnvDataset
from envidr_tpu.train.trainer import Trainer
from envidr_tpu.train.schedules import resolve

print(f"devices: {jax.devices()}", flush=True)


def profile(name, **overrides):
    if os.environ.get("PROFILE_SPHERE_RAYS"):  # CPU smoke hook
        overrides["num_rays"] = int(os.environ["PROFILE_SPHERE_RAYS"])
    opt = load_options("configs/neural_renderer_synth.ini",
                       workspace=f"/tmp/profile_sphere_{name}", **overrides)
    cfg = network_config(opt)
    trainer = Trainer(opt, cfg, workspace=f"/tmp/profile_sphere_{name}")
    ds = EnvDataset(opt.path, "train")
    sched = resolve(opt, 1, 0)
    trainer._sched = sched
    step_fn = trainer._get_train_step(sched, 0, sched.num_rays, ds.H, ds.W,
                                      ds.C, "sphere")
    import numpy as np
    batch = {"pose": ds.device_poses[0], "image": ds.device_images[0],
             "intrinsics": jnp.asarray(ds.intrinsics, jnp.float32),
             "img_idx": jnp.asarray(0, jnp.int32),
             "env_index": int(ds.host_env_indices[0])
             if hasattr(ds, "host_env_indices")
             else int(np.asarray(ds.env_indices[0])),
             "material": ds.materials[0]}
    r_all = getattr(ds, "device_r_images", None)
    if r_all is not None:
        batch["r_images"] = r_all[0]
    weights = {k: jnp.asarray(v) for k, v in sched.weights.items()}
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    key, sub = jax.random.split(key)
    state, m = step_fn(trainer.state, batch, sub, weights)
    _ = float(m["loss"])
    compile_s = time.time() - t0
    print(f"[{name}] compile+first step: {compile_s:.1f}s", flush=True)

    t0 = time.time()
    for i in range(5):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, batch, sub, weights)
    _ = float(m["loss"])
    dt = (time.time() - t0) / 5
    print(f"[{name}] step: {dt*1e3:.0f} ms  "
          f"({sched.num_rays/dt:.0f} rays/s)", flush=True)
    del trainer, state
    return dt


def main():
    # VERDICT r5 #5: the sphere pretrain step (~8.2k rays/s in round 1) gates
    # every quality campaign.  Arms: the shipping config (hashgrid_diff +
    # XLA scatter backward), the r3/r4 scatter reroutes (sorted segment-sum,
    # mixed Pallas), the 2x-cheaper rolled_tiled indexing, and the CP
    # encoder that made the SCENE step 6x faster.  All interface-compatible
    # with the rendering MLPs (encoding_pos only changes geometry features).
    arm_defs = {
        "base_xla": {},
        "sorted": dict(hash_scatter_impl="sorted"),
        "mixed": dict(hash_scatter_impl="mixed"),
        "rolled_sorted": dict(encoding_pos="rolled_tiled",
                              hash_scatter_impl="sorted"),
        "cp": dict(encoding_pos="cp", cp_rank=32),
        "numerical": dict(numerical_normals=True),
    }
    default = "base_xla,sorted,mixed,rolled_sorted,cp"
    arms = os.environ.get("PROFILE_SPHERE_ARMS", default).split(",")
    results = {}
    for name in arms:
        results[name] = profile(name, **arm_defs[name])
    best = min(results, key=results.get)
    base = results.get("base_xla", results[arms[0]])
    rays = int(os.environ.get("PROFILE_SPHERE_RAYS", 16384))
    print(f"== summary ({rays} rays/step) ==", flush=True)
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {k:14s} {v*1e3:7.0f} ms  {rays/v:8.0f} rays/s  "
              f"{base/v:5.2f}x vs base", flush=True)
    print(f"best: {best} ({base/results[best]:.2f}x)", flush=True)


main()
