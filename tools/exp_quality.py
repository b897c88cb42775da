"""Controlled quality experiments on the synth_spheres scene (VERDICT.md #1).

Round-1 training was stuck in a transparent/fog equilibrium (weights_sum ~0.13
everywhere, train L1 happy because GT is composited over the SAME random bg
the prediction falls back to).  This runs a small matrix of short configs on
the TPU, sequentially in ONE process (single-tenant tunnel), logging eval PSNR
on train AND val views plus ws / beta stats — enough signal to pick the recipe
for the long run.

    timeout 7200 python -u tools/exp_quality.py [names...]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import envidr_tpu
envidr_tpu.apply_device_env()
envidr_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.train.trainer import Trainer

BASE = "configs/synth_spheres.ini"

EXPERIMENTS = {
    # sanity control: plain density field (instant-ngp style). If THIS cannot
    # fit 3 spheres fast, the bug is in rays/marching/compositing, not SDF.
    "density": dict(use_sdf=False, eikonal_loss_weight=0.0,
                    mask_loss_weight=1.0, lr=1e-2, plr=1e-2,
                    density_thresh=10.0, alpha_bg_mode="white"),
    # SDF with the obvious fixes: strong mask loss, white bg, saner lr
    "sdf_mask1": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                      alpha_bg_mode="white"),
    # + geometric (sphere-ish) init, the standard VolSDF/NeuS anti-fog recipe
    "sdf_geo": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                    alpha_bg_mode="white", geometric_init=True),
    # + toaster-style staged regularizers (epoch-scaled from 500->60 budget)
    "sdf_staged": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                       alpha_bg_mode="white",
                       cauchy_loss_weight=0.1, cauchy_loss_start_iter=5,
                       backsdf_loss_weight=5e-3, backsdf_loss_start_iter=5,
                       backsdf_thresh=0.01,
                       eikonal_loss_weight=1e-3, eikonal_loss_start_iter=14),
    # random-bg variant of the winner candidate (reference parity check)
    "sdf_geo_randbg": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                           alpha_bg_mode="random", geometric_init=True),
    # geometric CUE: pre-fit sdf(x)=|x|-r before training (utils.py:1668)
    "sdf_cue": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                    alpha_bg_mode="white", geometric_cue=True),
    # cue + staged cauchy sharpening
    "sdf_cue_staged": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                           alpha_bg_mode="white", geometric_cue=True,
                           cauchy_loss_weight=0.1, cauchy_loss_start_iter=5,
                           eikonal_loss_weight=1e-3, eikonal_loss_start_iter=3),
    # NeuS density instead of Laplace (cos-annealed alpha; from-scratch
    # convergence is NeuS's home turf)
    "neus": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                 alpha_bg_mode="white", use_neus_sdf=True,
                 cos_anneal_steps=500),
    # the round-2 winner recipe, long-run edition: NeuS alpha + cos-anneal
    # escaped the fog equilibrium (14-ep matrix: val 18.6 and climbing while
    # every Laplace config plateaued at 13.6); 60 epochs targets >25 dB.
    "neus_long": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                      alpha_bg_mode="white", use_neus_sdf=True,
                      cos_anneal_steps=500),
    # NeuS recipe on the MXU-native CP encoder (no gather/scatter anywhere):
    # does the factorized field match hash-grid quality on this scene?
    "neus_cp": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                    alpha_bg_mode="white", use_neus_sdf=True,
                    cos_anneal_steps=500, encoding_pos="cp", cp_rank=32),
    # CP long run: 60 epochs is only ~15 min at CP speed
    "neus_cp_long": dict(mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
                         alpha_bg_mode="white", use_neus_sdf=True,
                         cos_anneal_steps=500, encoding_pos="cp", cp_rank=32),
    # The toaster recipe (configs/scenes/toaster.ini): FROZEN pretrained
    # rendering MLPs (geometry must form surfaces to explain appearance —
    # fog can't repaint frozen color nets), coarse-to-fine hash levels,
    # staged cauchy/backsdf/eikonal.  Epoch numbers scaled 500 -> 30.
    "sdf_toaster": dict(
        mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
        alpha_bg_mode="white", geometric_cue=True,
        color_mlp_path="/root/reference/ckpts/rendering_mlps.pth",
        resume_mlps=("specular", "diffuse"), frozen_mlps=("specular", "diffuse"),
        enabled_levels_sched=(10, 5, 20),
        cauchy_loss_weight=0.1, cauchy_loss_start_iter=6,
        backsdf_loss_weight=5e-3, backsdf_loss_start_iter=6,
        backsdf_thresh=0.01,
        eikonal_loss_weight=1e-3, eikonal_loss_start_iter=3),
    # same but color nets free (ablation: is freezing the decisive bit?)
    "sdf_toaster_free": dict(
        mask_loss_weight=1.0, lr=3e-3, plr=3e-3, slr=1e-3,
        alpha_bg_mode="white", geometric_cue=True,
        enabled_levels_sched=(10, 5, 20),
        cauchy_loss_weight=0.1, cauchy_loss_start_iter=6,
        backsdf_loss_weight=5e-3, backsdf_loss_start_iter=6,
        backsdf_thresh=0.01,
        eikonal_loss_weight=1e-3, eikonal_loss_start_iter=3),
}

EPOCHS = int(os.environ.get("EXP_EPOCHS", "14"))
EVAL_EVERY = 7


def run(name, overrides):
    t0 = time.time()
    ws = f"exps/quality_matrix/{name}"
    opt = load_options(BASE, workspace=ws, **overrides)
    cfg = network_config(opt)
    trainer = Trainer(opt, cfg, workspace=ws)

    train_set = NeRFDataset(opt.path, "train", scale=opt.scale, offset=opt.offset)
    val_set = NeRFDataset(opt.path, "val", scale=opt.scale, offset=opt.offset)
    trainer.mark_untrained_grid(train_set.poses, train_set.intrinsics)
    if opt.geometric_cue:
        trainer.train_geometric_cue()

    print(f"=== {name}: {overrides}", flush=True)
    for ep in range(EPOCHS):
        stats = trainer.train_one_epoch(train_set, mode="scene")
        msg = (f"[{name} ep {trainer.epoch:3d}] loss={stats['loss']:.5f} "
               f"color={stats.get('color', 0):.5f} mc={trainer.mean_count:.1f} "
               f"t={stats['time']:.0f}s")
        if (ep + 1) % EVAL_EVERY == 0 or ep == EPOCHS - 1:
            tr_psnr = trainer.evaluate(train_set, max_images=2, use_ema=False,
                                       track_best=False)
            va_psnr = trainer.evaluate(val_set, max_images=2, use_ema=False)
            res = trainer.render_image(val_set.poses[0], val_set.intrinsics,
                                       val_set.H, val_set.W, use_ema=False)
            wsum = res["weights_sum"]
            if cfg.use_sdf and not cfg.use_neus_sdf:
                from envidr_tpu.ops.density import laplace_beta
                beta = float(laplace_beta(trainer.state["params"]["sdf_density"],
                                          opt.beta_min, cfg.beta_max))
            else:
                beta = float("nan")
            msg += (f" | train_psnr={tr_psnr:.2f} val_psnr={va_psnr:.2f} "
                    f"ws_mean={float(wsum.mean()):.3f} "
                    f"ws>.5={float((wsum > 0.5).mean()):.3f} beta={beta:.4f}")
        print(msg, flush=True)
    trainer.save_checkpoint()
    outdir = os.path.join(ws, "results")
    os.makedirs(outdir, exist_ok=True)
    try:
        import imageio.v2 as imageio
        imageio.imwrite(os.path.join(outdir, "val0_rgb.png"),
                        (np.clip(res["image"], 0, 1) * 255).astype(np.uint8))
    except Exception:
        pass
    print(f"=== {name} done in {time.time()-t0:.0f}s", flush=True)
    del trainer


if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPERIMENTS)
    for n in names:
        run(n, EXPERIMENTS[n])
