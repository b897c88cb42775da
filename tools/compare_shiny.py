"""A/B the interreflection pass: indir_ref ON vs OFF on the shiny scene.

Renders val views from both workspaces' best checkpoints and reports full
PSNR plus PSNR restricted to the MIRROR sphere's pixels (computed from the
analytic scene geometry — the mirror is SHINY_SPHERES[0]), where the
interreflection signal lives.  Writes side-by-side panels.

Run after the round-3 campaign:
    python -u tools/compare_shiny.py [--downscale 2] [--n 3]
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


def _pixel_dirs(pose, H, W, focal):
    i, j = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs = np.stack([(i - W / 2) / focal, -(j - H / 2) / focal,
                     -np.ones_like(i)], -1)
    dirs = dirs @ pose[:3, :3].T
    return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)


def mirror_mask(pose, H, W, focal, spheres=None):
    """Rays (pinhole, OpenGL convention — matches tools/gen_synth_scene.py)
    whose FIRST hit among the scene spheres is the mirror sphere."""
    from tools.gen_synth_scene import first_hit, SHINY_SPHERES
    if spheres is None:
        spheres = SHINY_SPHERES
    dirs = _pixel_dirs(pose, H, W, focal)
    idx, _ = first_hit(pose[:3, 3], dirs, spheres)
    return idx == 0


def contact_mask(pose, H, W, focal, spheres):
    """Mirror pixels whose ONE-BOUNCE reflection hits scene geometry — the
    region where the interreflection signal actually lives (the rest of the
    mirror reflects sky and measures env-net fidelity instead)."""
    from tools.gen_synth_scene import first_hit
    dirs = _pixel_dirs(pose, H, W, focal)
    o = np.broadcast_to(pose[:3, 3], dirs.shape)
    idx, t = first_hit(o, dirs, spheres)
    mirror = idx == 0
    t_safe = np.where(mirror, t, 1.0)
    p = o + dirs * t_safe[..., None]
    n = (p - np.asarray(spheres[0][0])) / spheres[0][1]
    refl = dirs - 2 * np.sum(dirs * n, -1, keepdims=True) * n
    idx2, _ = first_hit(p + n * 1e-3, refl, spheres)
    return mirror & (idx2 >= 0)


def psnr(a, b, mask=None):
    d = (a - b) ** 2
    if mask is not None:
        if not mask.any():
            return float("nan")
        d = d[mask]
    return float(-10.0 * np.log10(max(float(np.mean(d)), 1e-10)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--indir-ws", default="exps/scenes/synth_shiny_ours")
    ap.add_argument("--base-ws", default="exps/scenes/synth_shiny_base")
    ap.add_argument("--config", default="configs/scenes/synth_shiny_ours.ini")
    ap.add_argument("--downscale", type=int, default=2)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--out", default="exps/shiny_ab")
    args = ap.parse_args()

    import jax.numpy as jnp
    from envidr_tpu.config import load_options, network_config
    from envidr_tpu.data.nerf_dataset import NeRFDataset
    from envidr_tpu.geometry.rays import linear_to_srgb
    from envidr_tpu.train.trainer import Trainer

    # dataset + analytic sphere list follow the CONFIG's path (v1 or v2)
    opt0 = load_options(args.config)
    data_root = opt0.path or "data/synth_shiny"
    if data_root.rstrip("/").endswith("3"):
        from tools.gen_synth_scene import SHINY3_SPHERES as scene_spheres
    elif data_root.rstrip("/").endswith("2"):
        from tools.gen_synth_scene import SHINY2_SPHERES as scene_spheres
    else:
        from tools.gen_synth_scene import SHINY_SPHERES as scene_spheres
    ds = NeRFDataset(data_root, "val", scale=opt0.scale,
                     downscale=args.downscale)
    # undo the dataset's ngp pose conversion for the analytic mask: use raw json
    with open(os.path.join(data_root, "transforms_val.json")) as f:
        meta = json.load(f)
    focal_full = 400 * 1.25 / args.downscale

    os.makedirs(args.out, exist_ok=True)
    rows = []
    renders = {}
    for tag, ws, over in (
        ("indir", args.indir_ws, {}),
        ("base", args.base_ws,
         {"indir_ref_start_iter": 0, "use_renv": False,
          "resume_mlps": ["specular", "diffuse"]}),
    ):
        opt = load_options(args.config, workspace=ws, **over)
        cfg = network_config(opt)
        tr = Trainer(opt, cfg, workspace=ws)
        assert tr.load_checkpoint("best"), f"no best ckpt in {ws}"
        tr.update_extra_state()
        imgs = []
        for k in range(args.n):
            res = tr.render_image(ds.poses[k], ds.intrinsics, ds.H, ds.W,
                                  use_ema=True)
            pred = np.asarray(res["image"])
            if opt.color_space == "linear":
                pred = np.asarray(linear_to_srgb(jnp.asarray(pred)))
            imgs.append(np.clip(pred, 0, 1))
        renders[tag] = imgs

    import imageio.v2 as imageio
    full_scores = {"indir": [], "base": []}
    mirror_scores = {"indir": [], "base": []}
    contact_scores = {"indir": [], "base": []}
    for k in range(args.n):
        gt4 = ds.images[k].astype(np.float32).reshape(ds.H, ds.W, -1) / 255.0
        gt = gt4[..., :3] * gt4[..., 3:4] + (1 - gt4[..., 3:4])
        pose_raw = np.asarray(meta["frames"][k]["transform_matrix"], np.float32)
        mask = mirror_mask(pose_raw, ds.H, ds.W, focal_full,
                           spheres=scene_spheres)
        cmask = contact_mask(pose_raw, ds.H, ds.W, focal_full, scene_spheres)
        for tag in ("indir", "base"):
            pr = renders[tag][k]
            full_scores[tag].append(psnr(pr, gt))
            mirror_scores[tag].append(psnr(pr, gt, mask))
            contact_scores[tag].append(
                psnr(pr, gt, cmask) if cmask.sum() >= 20 else float("nan"))
        panel = np.concatenate(
            [renders["base"][k], renders["indir"][k], gt,
             np.repeat(mask[..., None], 3, -1).astype(np.float32)], axis=1)
        imageio.imwrite(os.path.join(args.out, f"ab_{k}.png"),
                        (panel * 255).astype(np.uint8))

    n_mirror = int(np.sum(~np.isnan(mirror_scores["indir"])))
    out = {
        "full_psnr_indir": round(float(np.mean(full_scores["indir"])), 3),
        "full_psnr_base": round(float(np.mean(full_scores["base"])), 3),
        # views where the mirror is hidden contribute nan — excluded
        "mirror_psnr_indir": round(float(np.nanmean(mirror_scores["indir"])), 3),
        "mirror_psnr_base": round(float(np.nanmean(mirror_scores["base"])), 3),
        "contact_psnr_indir": round(float(np.nanmean(contact_scores["indir"])), 3),
        "contact_psnr_base": round(float(np.nanmean(contact_scores["base"])), 3),
        "n_views": args.n, "n_mirror_views": n_mirror,
        "downscale": args.downscale,
    }
    print(json.dumps(out))
    with open(os.path.join(args.out, "scores.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
