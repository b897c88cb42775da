"""Round-5 NaN hunt: the shiny3 indir arm's opt_state shows notfinite_count
== total_notfinite growing by exactly steps-per-epoch from the indirect
switch-on epoch — EVERY step since the 3-pass render went live has NaN
gradients (optax.apply_if_finite silently skipped them all; params frozen).
r4 never hit this because the roughness gate never opened (probe_renv).

CPU repro against the saved workspace checkpoint: rebuild the trainer's
exact loss_fn (trainer.py:468-522) at a post-switch-on schedule and bisect
which loss term / render output carries the NaN.

Run: ENVIDR_DEVICE=cpu JAX_PLATFORMS=cpu python tools/debug_indir_nan.py \
        [--ckpt exps/scenes/shiny3_indir/checkpoints/ep0120.ckpt]
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.geometry.rays import sampled_rays, srgb_to_linear
from envidr_tpu.render.indirect import IndirectOptions, render_scene_indirect
from envidr_tpu.render.scene import SceneRenderOptions
from envidr_tpu.train.losses import compute_losses
from envidr_tpu.train.schedules import resolve


def finiteness(tree, label):
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        n = np.size(arr)
        nf = int(np.sum(~np.isfinite(arr)))
        if nf:
            bad.append((jax.tree_util.keystr(path), nf, n))
    if bad:
        print(f"[{label}] NON-FINITE in {len(bad)} leaves:")
        for p, nf, n in bad[:12]:
            print(f"    {p}: {nf}/{n}")
    else:
        print(f"[{label}] all finite")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/scenes/shiny3_indir.ini")
    ap.add_argument("--ckpt",
                    default="exps/scenes/shiny3_indir/checkpoints/ep0120.ckpt")
    ap.add_argument("--epoch", type=int, default=50,
                    help="schedule epoch (indir on, grad_rays off at 50)")
    ap.add_argument("--num-rays", type=int, default=1024)
    ap.add_argument("--img", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    opt = load_options(args.config, workspace="/tmp/debug_indir")
    cfg = network_config(opt)
    sched = resolve(opt, args.epoch, args.epoch * 60)
    print("indir_ref:", sched.indir_ref, "grad_rays:", sched.grad_rays)

    with open(args.ckpt, "rb") as f:
        payload = pickle.load(f)
    params = jax.tree.map(jnp.asarray, payload["params"])
    from envidr_tpu.ops.grid import OccupancyGrid
    grid = OccupancyGrid(*[jnp.asarray(x) for x in payload["grid"]])
    bitfield = grid.bitfield
    print("ckpt epoch", payload["epoch"], "step", payload["global_step"])

    ds = NeRFDataset(opt.path, "train", scale=opt.scale,
                     offset=opt.offset)
    pose = jnp.asarray(ds.poses[args.img])[None]
    intrinsics = jnp.asarray(ds.intrinsics, jnp.float32)
    img = np.asarray(ds.images[args.img])

    key = jax.random.PRNGKey(args.seed)
    k_rays, k_bg, k_perturb = jax.random.split(key, 3)
    rays = sampled_rays(k_rays, pose, intrinsics, ds.H, ds.W, args.num_rays)
    rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]
    pix = jnp.asarray(img.reshape(-1, img.shape[-1]))[rays["inds"][0]]
    pix = (pix.astype(jnp.float32) / 255.0
           if np.issubdtype(img.dtype, np.integer) else pix.astype(jnp.float32))
    if opt.color_space == "linear":
        pix = pix.at[..., :3].set(srgb_to_linear(pix[..., :3]))
    n = pix.shape[0]
    if pix.shape[-1] == 4:
        bg = jnp.ones((n, 3))
        gt_rgb = pix[..., :3] * pix[..., 3:] + bg * (1.0 - pix[..., 3:])
        alpha_mask = pix[..., 3]
    else:
        bg = jnp.ones((n, 3))
        gt_rgb = pix[..., :3]
        alpha_mask = None

    aabb = jnp.asarray([-opt.bound] * 3 + [opt.bound] * 3, jnp.float32)
    K = int(sched.early_stop_steps)
    ropts = SceneRenderOptions(
        max_steps=opt.max_steps, num_samples=K,
        early_stop_steps=sched.early_stop_steps, dt_gamma=opt.dt_gamma,
        T_thresh=opt.T_thresh, min_near=opt.min_near,
        use_bg_net=cfg.bg_radius > 0, coarse_march=opt.coarse_march)
    iopts = IndirectOptions(
        indir_max_steps=opt.indir_max_steps,
        indir_early_stop_steps=opt.indir_early_stop_steps,
        indir_num_samples=min(K, max(opt.indir_early_stop_steps, 16)),
        grad_rays=sched.grad_rays, grad_rays_scale=opt.grad_rays_scale)
    weights = {k: jnp.asarray(v) for k, v in sched.weights.items()}

    def render(p):
        return render_scene_indirect(
            p, cfg, ropts, iopts, bitfield, rays_o, rays_d, bg, aabb,
            key=k_perturb, normal_anneal_ratio=sched.normal_anneal_ratio,
            cos_anneal_ratio=sched.cos_anneal_ratio,
            beta_min=weights["_beta_min"], beta_cap=weights["_beta_cap"])

    def loss_fn(p):
        out = render(p)
        total, terms = compute_losses(
            out, gt_rgb, sched.flags, weights, beta=None,
            alpha_mask=alpha_mask, roughness=out.get("roughness"))
        return total, (out, terms)

    print("== forward ==")
    total, (out, terms) = jax.jit(loss_fn)(params)
    print("loss:", float(total),
          {k: float(v) for k, v in terms.items()})
    finiteness(out, "forward outputs")

    print("== full grad ==")
    (total, (out, terms)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    bad = finiteness(grads, "full grads")
    if not bad:
        print("no NaN at this batch — try other --img/--seed/--num-rays")
        return

    # bisect: gradient of the total with all but one loss weight zeroed
    # (the terms dict holds detached scalars, so grad must go through total)
    loss_keys = [k for k in weights if not k.startswith("_")]
    for term in loss_keys:
        w2 = {k: (v if (k == term or k.startswith("_")) else jnp.zeros_like(v))
              for k, v in weights.items()}

        def term_loss(p, w2=w2):
            out = render(p)
            total, _ = compute_losses(out, gt_rgb, sched.flags, w2,
                                      beta=None, alpha_mask=alpha_mask,
                                      roughness=out.get("roughness"))
            return total
        g = jax.jit(jax.grad(term_loss))(params)
        finiteness(g, f"grad[{term} only]")
        del g

    # bisect: gradient of each render output alone (sum-reduced)
    for out_key in ("image", "normal_image", "weights_sum", "roughness"):
        if out.get(out_key) is None:
            continue
        def out_loss(p, k=out_key):
            return jnp.sum(render(p)[k])
        g = jax.jit(jax.grad(out_loss))(params)
        finiteness(g, f"grad[sum {out_key}]")
        del g


if __name__ == "__main__":
    main()
