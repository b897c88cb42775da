"""CLI entry point — the ``main_nerf.py`` equivalent.

    python -m envidr_tpu.apps.cli --config configs/synth_spheres.ini
    python -m envidr_tpu.apps.cli --config ... --test
    python -m envidr_tpu.apps.cli --config ... --test --swap_env path.pth

Mirrors ``/root/reference/main_nerf.py:13-204``: config loading, workspace
layout, train/eval/test flows, post-train mesh export.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="", help=".ini config (reference dialect)")
    p.add_argument("--test", action="store_true")
    p.add_argument("--workspace", default=None)
    p.add_argument("--path", default=None, help="dataset root")
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--eval-interval", type=int, default=None)
    p.add_argument("--swap_env", default="", help="relight: env net .pth to swap in")
    p.add_argument("--ckpt", default="latest")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--save-mesh", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest workspace checkpoint")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override any Options field (repeatable), e.g. "
                        "--set hash_scatter_impl=mixed --set num_rays=8192")
    return p


def main(argv=None):
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks
    args = build_argparser().parse_args(argv)

    from envidr_tpu.config import load_options, network_config
    overrides = {}
    for k in ("workspace", "path", "iters", "seed"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    if args.eval_interval is not None:
        overrides["eval_interval"] = args.eval_interval
    from envidr_tpu.config import _parse_value
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides[k.strip()] = _parse_value(v.strip())
    opt = load_options(args.config, **overrides)

    import envidr_tpu
    envidr_tpu.apply_device_env()
    envidr_tpu.enable_compilation_cache()
    import jax
    from envidr_tpu.data.nerf_dataset import NeRFDataset
    from envidr_tpu.train.trainer import Trainer

    cfg = network_config(opt)
    trainer = Trainer(opt, cfg)
    os.makedirs(opt.workspace, exist_ok=True)
    with open(os.path.join(opt.workspace, "args.json"), "w") as f:
        json.dump({k: str(v) for k, v in dataclasses.asdict(opt).items()}, f,
                  indent=1)

    mode = "sphere" if opt.env_sph_mode else "scene"
    log_path = os.path.join(opt.workspace, "log.txt")

    def log(msg):
        print(msg)
        with open(log_path, "a") as f:
            f.write(msg + "\n")

    if args.swap_env:
        trainer.load_checkpoint(args.ckpt)
        trainer.swap_env_net(args.swap_env, split_diffuse=opt.split_diffuse_env)

    def make_dataset(split, test_skip=1):
        if opt.env_sph_mode or opt.render_env_on_sphere:
            from envidr_tpu.data.env_dataset import EnvSphereDataset
            return EnvSphereDataset(opt.path, split, scale=opt.scale,
                                    offset=opt.offset,
                                    with_renv=opt.train_renv)
        return NeRFDataset(opt.path, split, scale=opt.scale, offset=opt.offset,
                           downscale=args.downscale, test_skip=test_skip,
                           fp16_preload=opt.fp16 and opt.preload)

    if args.test:
        if not args.swap_env:
            trainer.load_checkpoint(args.ckpt)
        test_set = make_dataset(opt.test_split, opt.test_skip)
        trainer.update_extra_state(full=opt.extra_state_full_update)
        # opt.test_ids selects specific frames (main_nerf.py:129-134)
        ids = [i for i in opt.test_ids if i < len(test_set)] or None
        psnr = trainer.evaluate(
            test_set, mode=mode, max_images=len(test_set), track_best=False,
            indices=ids,
            dump_dir=os.path.join(opt.workspace, opt.val_folder_name, "test"))
        log(f"[test] PSNR = {psnr:.3f}")
        outdir = os.path.join(opt.workspace, "results")
        os.makedirs(outdir, exist_ok=True)
        render_kw = {}
        if mode == "sphere":  # sphere renders need material/env conditioning
            render_kw = dict(
                material=test_set.materials[0],
                env_index=int(np.asarray(test_set.env_indices[0])))
        res = trainer.render_image(test_set.poses[0], test_set.intrinsics,
                                   test_set.H, test_set.W, mode=mode,
                                   **render_kw)
        _save_images(res, outdir, "test_0", opt)
        return psnr

    train_set = make_dataset("train")
    try:
        val_set = make_dataset("val")
    except FileNotFoundError:
        val_set = train_set

    resumed = False
    if args.resume:
        resumed = trainer.load_checkpoint(args.ckpt)
        if resumed and opt.extra_state_full_update:
            # one full-grid sweep right after resume (main_nerf.py:113,
            # utils.py:1208-1212 one-shot semantics)
            trainer.update_extra_state(full=True)
    if opt.geometric_cue and not resumed:
        trainer.train_geometric_cue()
    max_epochs = args.max_epochs
    if max_epochs is None:
        max_epochs = int(np.ceil(opt.iters / max(len(train_set), 1)))
    log(f"[train] {len(train_set)} images, {max_epochs} epochs, mode={mode}, "
        f"devices={jax.devices()}")

    if not opt.env_sph_mode:
        trainer.mark_untrained_grid(train_set.poses, train_set.intrinsics)
    best = -1.0
    for ep in range(trainer.epoch, max_epochs):
        try:
            stats = trainer.train_one_epoch(train_set, mode=mode)
        except Exception as e:
            # emergency checkpoint on any failure (utils.py:970-983)
            path = trainer.save_checkpoint(name=f"emergency_ep{trainer.epoch:04d}")
            log(f"[error] {type(e).__name__}: {e}; saved {path}")
            raise
        nf = int(stats.get("notfinite", 0))
        log(f"[ep {trainer.epoch:4d}] loss={stats['loss']:.5f} "
            f"color={stats.get('color', 0):.5f} "
            f"rays/s={stats['rays_per_sec']:.0f} "
            f"K={trainer.sample_budget(trainer._sched) if mode == 'scene' else 12} "
            f"mean_count={trainer.mean_count:.1f} t={stats['time']:.1f}s"
            + (f" NOTFINITE={nf}" if nf else ""))
        eval_int = opt.eval_interval if opt.eval_interval > 0 else 50
        if (ep + 1) % eval_int == 0 or ep == max_epochs - 1:
            trainer.save_checkpoint()  # before eval: an eval OOM must not lose work
            psnr = trainer.evaluate(val_set, mode=mode)
            r = (trainer.stats.get("results") or [{}])[-1]
            extra = ""
            if r.get("ssim") is not None:
                extra = f" ssim={r['ssim']:.4f}"
            if r.get("lpips") is not None:
                extra += f" lpips[{r.get('lpips_kind')}]={r['lpips']:.4f}"
            log(f"[eval ep {trainer.epoch}] PSNR = {psnr:.3f}{extra}")
            if psnr > best:
                best = psnr

    outdir = os.path.join(opt.workspace, "results")
    os.makedirs(outdir, exist_ok=True)
    # sphere mode needs material/env conditioning for the render (the crash
    # here used to skip the env-bank export below — r3 pretrain run)
    render_kw = {}
    if mode == "sphere":
        render_kw = dict(
            material=val_set.materials[0],
            env_index=int(np.asarray(val_set.env_indices[0])))
    res = trainer.render_image(val_set.poses[0], val_set.intrinsics,
                               val_set.H, val_set.W, mode=mode, **render_kw)
    _save_images(res, outdir, "final", opt)

    if args.save_mesh:
        from envidr_tpu.apps.mesh_extract import save_mesh
        save_mesh(trainer, os.path.join(opt.workspace, "mesh.obj"))
    if opt.env_sph_mode and "env_nets" in trainer.state["ema"]:
        # post-train relighting export (main_nerf.py:194-198)
        from envidr_tpu.io.torch_export import extract_env_ckpts
        paths = extract_env_ckpts(trainer.state["ema"],
                                  os.path.join(opt.workspace, "env_ckpts"))
        log(f"[export] {len(paths)} env ckpts -> {opt.workspace}/env_ckpts")
    log(f"[done] best PSNR = {best:.3f}")
    return best


def _save_images(res, outdir, tag, opt):
    try:
        import imageio.v2 as imageio
    except ImportError:
        return
    from envidr_tpu.geometry.rays import linear_to_srgb
    import jax.numpy as jnp
    img = res["image"]
    if opt.color_space == "linear":
        img = np.asarray(linear_to_srgb(jnp.asarray(img)))
    imageio.imwrite(os.path.join(outdir, f"{tag}_rgb.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8))
    if "normal_image" in res:
        n = (res["normal_image"] * 0.5 + 0.5)
        imageio.imwrite(os.path.join(outdir, f"{tag}_normal.png"),
                        (np.clip(n, 0, 1) * 255).astype(np.uint8))
    if "depth" in res:
        d = res["depth"]
        d = (d - d.min()) / max(d.max() - d.min(), 1e-6)
        imageio.imwrite(os.path.join(outdir, f"{tag}_depth.png"),
                        (d * 255).astype(np.uint8))


if __name__ == "__main__":
    main()
