"""Pre-render the env-sphere pretraining dataset (offline Filament replacement).

The reference renders GT *live* per batch with Open3D/Filament
(``/root/reference/nerf/sph_loader.py:214-301``); per SURVEY.md §7.3 that
belongs off the TPU host.  This tool pre-renders a randomized set with the
SAME distributions (pose theta U[0,360] phi U[-90,90]; roughness U(0,1)^2;
bimodal metallic; constrained base color; random env of N) using the analytic
PBR renderer, plus val/test splits in the reference's annotated
``transforms_{split}.json`` format (``generate_set.py:133-197``).

    python tools/gen_env_dataset.py data/env_sphere_synth --n-train 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from envidr_tpu.geometry.rays import nerf_matrix_to_ngp, pose_spherical
from envidr_tpu.render.pbr import PrefilteredEnv, make_env_bank, render_pbr_sphere

R_MATERIAL = dict(roughness=0.0, metallic=1.0, base_color=(0.8, 0.8, 0.8))


def sample_material(rng, vary_roughness=True, vary_metallic=True,
                    vary_base_color=True, max_roughness=1.0):
    m = {}
    m["roughness"] = float(rng.uniform(0, max_roughness) ** 2) \
        if vary_roughness else 0.3
    if vary_metallic:
        if rng.uniform() < 0.5:
            m["metallic"] = float(abs(rng.normal(0, 0.25)))
        else:
            m["metallic"] = float(1 - abs(rng.normal(0, 0.25)))
        m["metallic"] = float(np.clip(m["metallic"], 0, 1))
    else:
        m["metallic"] = 0.0
    if vary_base_color:
        if m["metallic"] >= 0.5:
            base = rng.integers(170, 255, 3)
        else:
            base = rng.integers(50, 240, 3)
        m["color"] = (base / 255.0).tolist() + [1.0]
    else:
        m["color"] = [0.8, 0.8, 0.8, 1.0]
    return m


def linear_to_srgb(x):
    return np.where(x < 0.0031308, 12.92 * x, 1.055 * np.clip(x, 0, None) ** (1 / 2.4) - 0.055)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", nargs="?", default="data/env_sphere_synth")
    p.add_argument("--n-train", type=int, default=1200)
    p.add_argument("--n-val", type=int, default=24)
    p.add_argument("--n-test", type=int, default=24)
    p.add_argument("--size", type=int, default=400)
    p.add_argument("--n-envs", type=int, default=11)
    p.add_argument("--sph-radius", type=float, default=0.95)
    p.add_argument("--scale", type=float, default=0.8)
    p.add_argument("--cam-radius", type=float, default=4.0)
    p.add_argument("--with-renv", action="store_true",
                   help="also render mirror-sphere r_images (renv training)")
    p.add_argument("--max-roughness", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hdri-dir", default="",
                   help="directory of user-supplied .hdr/.exr/.npy lat-long "
                        "envmaps (the prepare_hdri.sh role); overrides the "
                        "procedural bank")
    p.add_argument("--env-res", type=int, default=64,
                   help="env bank height (width = 2x)")
    args = p.parse_args()

    import imageio.v2 as imageio

    os.makedirs(args.out, exist_ok=True)
    if args.hdri_dir:
        from envidr_tpu.data.hdri import build_env_bank_from_dir
        envs = build_env_bank_from_dir(args.hdri_dir, H=args.env_res,
                                       W=2 * args.env_res)
        print(f"[gen_env_dataset] {len(envs)} HDRIs from {args.hdri_dir}")
    else:
        envs = make_env_bank(args.n_envs, H=args.env_res, W=2 * args.env_res)
    np.savez(os.path.join(args.out, "envmaps.npz"), envs=envs)
    pres = [PrefilteredEnv(e) for e in envs]
    os.makedirs(os.path.join(args.out, "thumbnails"), exist_ok=True)
    for i, e in enumerate(envs):
        imageio.imwrite(os.path.join(args.out, "thumbnails", f"env{i}_srgb.png"),
                        (np.clip(linear_to_srgb(e / (1 + e)), 0, 1) * 255).astype(np.uint8))

    H = W = args.size
    camera_angle_x = 0.6194058656692505
    focal = W / (2 * np.tan(camera_angle_x / 2))
    intr = (focal, focal, W / 2, H / 2)

    for split, n in [("train", args.n_train), ("val", args.n_val),
                     ("test", args.n_test)]:
        rng = np.random.default_rng(args.seed + {"train": 0, "val": 1, "test": 2}[split])
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        frames = []
        for k in range(n):
            theta = rng.uniform(0, 360)
            phi = rng.uniform(-90, 90)
            env_idx = int(rng.integers(0, args.n_envs))
            mat = sample_material(rng, max_roughness=args.max_roughness)
            nerf_pose = pose_spherical(theta, phi, args.cam_radius)
            c2w = nerf_matrix_to_ngp(nerf_pose, scale=args.scale)
            img = render_pbr_sphere(
                pres[env_idx], c2w, intr, H, W, radius=args.sph_radius,
                roughness=mat["roughness"], metallic=mat["metallic"],
                base_color=mat["color"][:3], bg=(0, 0, 0), with_alpha=True)
            # store srgb-encoded 8-bit + alpha (loader linearizes, utils.py:629)
            rgb8 = (np.clip(linear_to_srgb(img[..., :3]), 0, 1) * 255).astype(np.uint8)
            a8 = (img[..., 3:] * 255).astype(np.uint8)
            fp = f"{split}/r_{k}.png"
            imageio.imwrite(os.path.join(args.out, fp),
                            np.concatenate([rgb8, a8], -1))
            frame = {"file_path": fp,
                     "transform_matrix": nerf_pose.tolist(),
                     "env_image_name": f"env{env_idx}",
                     "roughness": mat["roughness"],
                     "metallic": mat["metallic"],
                     "color": mat["color"]}
            if args.with_renv:
                rimg = render_pbr_sphere(
                    pres[env_idx], c2w, intr, H, W, radius=args.sph_radius,
                    bg=(0, 0, 0), with_alpha=False, **R_MATERIAL)
                rfp = f"{split}/r_{k}_renv.png"
                imageio.imwrite(
                    os.path.join(args.out, rfp),
                    (np.clip(linear_to_srgb(rimg), 0, 1) * 255).astype(np.uint8))
                frame["renv_file_path"] = rfp
            frames.append(frame)
            if (k + 1) % 100 == 0:
                print(f"[{split}] {k + 1}/{n}")
        meta = {"camera_angle_x": camera_angle_x,
                "env_images_names": [f"env{i}" for i in range(args.n_envs)],
                "frames": frames}
        with open(os.path.join(args.out, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
