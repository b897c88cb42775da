"""Benchmark: training throughput (rays/s, fwd+bwd) of the flagship scene model.

Prints ONE JSON line:  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md) — the baseline is
our own round-1 measurement on one TPU v5e chip (5_000 rays/s), so
``vs_baseline`` tracks our improvement across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_RAYS_PER_SEC = 5_000.0  # round-1 measured, 1x TPU v5e chip


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import envidr_tpu
    envidr_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from envidr_tpu.config import load_options, network_config
    from envidr_tpu.train.trainer import Trainer
    from envidr_tpu.train.schedules import resolve

    root = os.path.dirname(os.path.abspath(__file__))
    from envidr_tpu.data.fixtures import ensure_synth_spheres
    data_dir = ensure_synth_spheres(os.path.join(root, "data", "synth_spheres"))

    # Default = the CP/MXU flagship recipe: beats the hash grid on BOTH val
    # PSNR (31.1 vs 28.1 dB) and step time (docs/QUALITY_R2.md, PERF_R2.md).
    # The reference-parity hash path remains benchable via
    # ENVIDR_BENCH_CONFIG=configs/synth_spheres.ini.
    cfg_path = os.environ.get(
        "ENVIDR_BENCH_CONFIG", os.path.join(root, "configs", "synth_spheres_cp.ini"))
    overrides = {}
    if os.environ.get("ENVIDR_BENCH_RAYS"):
        overrides["num_rays"] = int(os.environ["ENVIDR_BENCH_RAYS"])
    opt = load_options(cfg_path, path=data_dir, workspace="/tmp/envidr_bench",
                       **overrides)
    cfg = network_config(opt)
    trainer = Trainer(opt, cfg)

    from envidr_tpu.data.nerf_dataset import NeRFDataset
    ds = NeRFDataset(opt.path, "train", scale=opt.scale)
    sched = resolve(opt, 1, 0)
    trainer._sched = sched
    K = trainer.sample_budget(sched)
    step_fn = trainer._get_train_step(sched, K, sched.num_rays, ds.H, ds.W,
                                      ds.C, "scene")
    trainer.update_extra_state()

    imgs, poses = ds.device_images, ds.device_poses
    intr = jnp.asarray(ds.intrinsics, jnp.float32)
    weights = {k: jnp.asarray(v) for k, v in sched.weights.items()}
    key = jax.random.PRNGKey(0)

    def one_step(i):
        nonlocal key
        key, sub = jax.random.split(key)
        batch = {"pose": poses[i % len(ds)], "image": imgs[i % len(ds)],
                 "intrinsics": intr}
        trainer.state, m = step_fn(trainer.state, batch, sub, weights)
        return m

    # warmup (includes compile)
    for i in range(3):
        m = one_step(i)
    float(m["loss"])
    if "mean_count" in m:  # let eval derive its adaptive K like training does
        trainer.mean_count = float(m["mean_count"])

    n_steps = 20
    t0 = time.time()
    for i in range(n_steps):
        m = one_step(3 + i)
    float(m["loss"])  # sync
    dt = time.time() - t0

    rays_per_sec = sched.num_rays * n_steps / dt
    out = {
        "metric": "train_rays_per_sec_fwd_bwd",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "config": os.path.basename(cfg_path),
        "coarse_march": bool(opt.coarse_march),
    }
    # eval-path throughput (weak #8): chunked full-image render
    t0 = time.time()
    res = trainer.render_image(ds.poses[0], ds.intrinsics, ds.H, ds.W,
                               use_ema=False)
    _ = float(np.asarray(res["image"]).sum())
    t0 = time.time()          # second render: compiled path only
    res = trainer.render_image(ds.poses[0], ds.intrinsics, ds.H, ds.W,
                               use_ema=False)
    _ = float(np.asarray(res["image"]).sum())
    out["eval_rays_per_sec"] = round(ds.H * ds.W / (time.time() - t0), 1)

    # GSPMD scaling probe: sharded-step overhead on an 8-virtual-device CPU
    # mesh (the only multi-device signal available without a pod slice; real
    # >=2-host efficiency is a BASELINE.md target for pod hardware).
    try:
        import subprocess
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["JAX_PLATFORMS"] = "cpu"
        p = subprocess.run(
            [sys.executable, os.path.join(root, "tools", "bench_scaling.py")],
            capture_output=True, text=True, timeout=1200, env=env)
        row = json.loads(p.stdout.strip().splitlines()[-1])
        # time(8192 rays, 8-vdev sharded) / time(8192 rays, 1 device), CPU
        # host: ~1.0 = GSPMD partitioning adds no overhead (vdevs share the
        # same cores, so this measures overhead, not speedup)
        out["gspmd_overhead_ratio"] = row["gspmd_overhead_ratio"]
        # WEAK scaling: rays/s per vdev at constant 1024 rays/vdev (CPU)
        out["weak_rays_per_sec_per_vdev"] = row.get(
            "weak_rays_per_sec_per_vdev")
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
