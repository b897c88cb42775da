"""Gradient-flow probe of the renv (interreflection) branch.

VERDICT r4 weak #5: both indir and base sit at ~13 dB in the contact region
of shiny2 — is the renv branch even receiving gradient there?  This loads a
trained indir workspace checkpoint and, on contact-region rays of a
mirror-visible val view, reports:

  * renv-branch liveness: fraction of contact rays where renv_mask is ON
    (roughness below thresh AND secondary visibility r_vis > 0.9), and the
    blend distribution (blend ~= 1 means c_renv is multiplied out of the
    specular color even where the mask is on)
  * per-parameter-group gradient norms of the contact-masked color loss
    (renv_net vs color/env/encoder/blend head)

Run (single-tenant TPU or ENVIDR_DEVICE=cpu):
    python -u tools/probe_renv.py --config configs/scenes/shiny2_indir.ini
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import envidr_tpu
envidr_tpu.apply_device_env()
envidr_tpu.enable_compilation_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/scenes/shiny2_indir.ini")
    ap.add_argument("--workspace", default=None)
    ap.add_argument("--ckpt", default="best")
    ap.add_argument("--view", type=int, default=-1,
                    help="val view index; -1 = most mirror pixels")
    ap.add_argument("--max-rays", type=int, default=4096)
    ap.add_argument("--out", default="exps/probe_renv.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from envidr_tpu.config import load_options, network_config
    from envidr_tpu.data.nerf_dataset import NeRFDataset
    from envidr_tpu.train.trainer import Trainer
    from tools.compare_shiny import mirror_mask, contact_mask

    opt = load_options(args.config,
                       **({"workspace": args.workspace} if args.workspace
                          else {}))
    cfg = network_config(opt)
    trainer = Trainer(opt, cfg)
    assert trainer.load_checkpoint(args.ckpt), "no checkpoint"
    trainer.update_extra_state(full=True)

    ds = NeRFDataset(opt.path, "val", scale=opt.scale)
    # analytic masks need the RAW (pre-ngp-conversion) poses
    with open(os.path.join(opt.path, "transforms_val.json")) as f:
        meta = json.load(f)
    H, W = ds.H, ds.W
    focal = 0.5 * W / np.tan(0.5 * meta["camera_angle_x"])
    scene_name = os.path.basename(os.path.normpath(opt.path))
    from tools import gen_synth_scene as gss
    spheres = {"synth_shiny": gss.SHINY_SPHERES,
               "synth_shiny2": gss.SHINY2_SPHERES,
               "synth_shiny3": gss.SHINY3_SPHERES}[scene_name]

    views = []
    for vi, fr in enumerate(meta["frames"]):
        pose_raw = np.array(fr["transform_matrix"], np.float32)
        mm = mirror_mask(pose_raw, H, W, focal, spheres=spheres)
        cm = contact_mask(pose_raw, H, W, focal, spheres)
        views.append((vi, pose_raw, mm, cm))
    views.sort(key=lambda v: -int(v[3].sum()))
    vi, pose_raw, mm, cm = views[0 if args.view < 0 else args.view]
    print(f"view {vi}: mirror px={int(mm.sum())} contact px={int(cm.sum())}",
          flush=True)

    # contact-region rays (cap at max_rays)
    import jax.numpy as jnp
    from envidr_tpu.geometry.rays import full_image_rays
    rays_o, rays_d = full_image_rays(
        jnp.asarray(ds.poses[vi])[None], ds.intrinsics, H, W)
    rays_o, rays_d = np.asarray(rays_o[0]), np.asarray(rays_d[0])
    flat_cm = cm.reshape(-1)
    idx = np.nonzero(flat_cm)[0]
    if len(idx) > args.max_rays:
        idx = idx[np.linspace(0, len(idx) - 1, args.max_rays).astype(int)]
    if len(idx) == 0:
        print("NO contact rays in this view")
        return
    gt = ds.images[vi].astype(np.float32).reshape(-1, ds.C)[idx] / 255.0
    bg = 1.0 if opt.render_bg_color == "white" else 1.0
    if gt.shape[-1] == 4:
        gt = gt[..., :3] * gt[..., 3:] + bg * (1.0 - gt[..., 3:])
    o = jnp.asarray(rays_o[idx])
    d = jnp.asarray(rays_d[idx])

    from envidr_tpu.render.scene import SceneRenderOptions
    from envidr_tpu.render.indirect import render_scene_indirect, IndirectOptions
    aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3)
    ropts = SceneRenderOptions(
        max_steps=opt.max_steps, num_samples=64,
        early_stop_steps=opt.early_stop_steps, dt_gamma=opt.dt_gamma,
        T_thresh=opt.T_thresh, min_near=opt.min_near, perturb=False,
        grid_size=128)
    iopts = IndirectOptions(indir_max_steps=1024, indir_early_stop_steps=32,
                            indir_num_samples=32)
    bitfield = trainer.state["grid"].bitfield
    params = trainer.state["params"]

    def render(p):
        return render_scene_indirect(
            p, cfg, ropts, iopts, bitfield, o, d, bg, aabb)

    res = jax.jit(render)(params)
    stats = {
        "view": int(vi), "n_contact_rays": int(len(idx)),
        "ref_mask_frac": float(np.mean(np.asarray(res["ref_mask"]))),
        "r_vis_mean": float(np.mean(np.asarray(res["r_images"][:, 3]))),
        "r_vis_gt0.9_frac": float(np.mean(np.asarray(res["r_images"][:, 3]) > 0.9)),
    }
    if "renv_mask_image" in res:
        stats["renv_mask_weighted"] = float(
            np.mean(np.asarray(res["renv_mask_image"])))
        stats["blend_weighted_mean"] = float(
            np.mean(np.asarray(res["blend_image"])))
    rough = np.asarray(res["roughness_image"])
    stats["roughness_mean"] = float(rough.mean())
    stats["roughness_below_thresh_frac"] = float(
        np.mean(rough < cfg.indir_roughness_thresh))

    def loss_fn(p):
        out = render_scene_indirect(
            p, cfg, ropts, iopts, bitfield, o, d, bg, aabb)
        img = out["image"]
        from envidr_tpu.geometry.rays import linear_to_srgb
        if opt.color_space == "linear":
            img = linear_to_srgb(jnp.clip(img, 0.0, None))
        return jnp.mean((img - jnp.asarray(gt)) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(params)
    gnorms = {}
    for name, sub in grads.items():
        leaves = jax.tree.leaves(sub)
        if leaves:
            gnorms[name] = float(jnp.sqrt(sum(
                jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)))
    stats["grad_norms_contact"] = gnorms
    pnorms = {name: float(jnp.sqrt(sum(jnp.sum(jnp.asarray(l, jnp.float32)**2)
                                       for l in jax.tree.leaves(sub))))
              for name, sub in params.items() if jax.tree.leaves(sub)}
    stats["grad_over_param"] = {
        k: (gnorms[k] / pnorms[k] if pnorms.get(k) else None)
        for k in gnorms}
    print(json.dumps(stats, indent=1), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(stats, f, indent=1)


if __name__ == "__main__":
    main()
