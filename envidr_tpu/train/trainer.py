"""Training runtime: optimizer groups, jitted train/eval steps, grid upkeep,
EMA, checkpoints.

Functional replacement for the reference ``Trainer``
(``/root/reference/nerf/utils.py:350-1702``).  Structure:

  * All device state lives in one :class:`TrainState` pytree.
  * The train step is a pure jitted function built per static
    :class:`~envidr_tpu.train.schedules.StepSchedule` signature (schedule
    changes that alter structure recompile — weight annealing does not).
  * Optimizer: optax adam(0.9, 0.99, eps=1e-15) with per-group LRs
    (lr/plr/slr/elr, ``get_params`` network.py:772-819) via multi_transform;
    frozen sub-MLPs get the zero transform.
  * Occupancy grid refresh every ``update_extra_interval`` steps
    (utils.py:1204-1213) as a second jitted function.
  * No AMP GradScaler: TPUs train in bf16 compute without loss scaling.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import pickle
import time
from typing import Any, Dict, Optional, Tuple  # noqa: F401

import numpy as np

import jax
import jax.numpy as jnp
import optax

from envidr_tpu.config import Options
from envidr_tpu.geometry.rays import sampled_rays, srgb_to_linear
from envidr_tpu.models.network import (
    NetworkConfig, forward_geometry, init_network_params, sdf_to_sigma,
)
from envidr_tpu.ops.grid import GridSpec, OccupancyGrid, init_grid, mark_untrained, update_grid
from envidr_tpu.render.scene import SceneRenderOptions, render_scene
from envidr_tpu.render.sphere import SphereRenderOptions, render_sphere
from envidr_tpu.train.losses import compute_losses
from envidr_tpu.train.metrics import PSNRMeter
from envidr_tpu.train.schedules import StepSchedule, level_mask, lr_lambda, resolve


# Train state is a plain dict pytree: params / ema / opt_state / grid.


# ---------------------------------------------------------------------------
# optimizer with parameter groups + freezing
# ---------------------------------------------------------------------------

def _param_labels(params: dict, opt: Options) -> dict:
    """Label each top-level param subtree: grid/net/scalar/env/frozen
    (network.py:772-819)."""
    frozen = set(opt.frozen_mlps)

    def label_for(name: str) -> str:
        if opt.train_renv:
            return "net" if name == "renv_net" else "frozen"
        if opt.train_env_only and name not in ("env_net", "env_nets", "renv_net"):
            return "frozen"
        if name == "encoder":
            return "grid"
        if name == "sdf_density":
            return "scalar"
        if name in ("env_net", "env_nets", "diffuse_env_net"):
            return "env"
        if name == "color_net" and "specular" in frozen:
            return "frozen"
        if name == "diffuse_net" and "diffuse" in frozen:
            return "frozen"
        if name == "renv_net" and "renv" in frozen:
            return "frozen"
        return "net"

    return {name: jax.tree.map(lambda _: label_for(name), sub)
            for name, sub in params.items()}


def make_optimizer(params: dict, opt: Options) -> optax.GradientTransformation:
    lr = opt.lr
    plr = opt.plr or lr
    slr = opt.slr or lr
    elr = opt.elr or lr
    sched = lambda step: lr_lambda(int(step) if isinstance(step, int) else step,
                                   opt.iters)

    def group(base_lr):
        return optax.chain(
            # bound rare near-inf gradient spikes (sharp-SDF normal backward)
            optax.clip_by_global_norm(10.0),
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
            optax.scale_by_schedule(lambda s: 0.1 ** jnp.minimum(s / opt.iters, 1.0)),
            optax.scale(-base_lr),
        )

    transforms = {
        "net": group(lr), "grid": group(plr), "scalar": group(slr),
        "env": group(elr), "frozen": optax.set_to_zero(),
    }
    labels = _param_labels(params, opt)
    tx = optax.multi_transform(transforms, labels)
    # skip non-finite updates — the TPU-native analogue of the reference's AMP
    # GradScaler step-skipping (utils.py:1220-1225); one pathological batch
    # must not poison the params
    return optax.apply_if_finite(tx, max_consecutive_errors=10000)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    def __init__(self, opt: Options, cfg: NetworkConfig, *,
                 params: Optional[dict] = None, seed: Optional[int] = None,
                 workspace: Optional[str] = None, mesh=None):
        self.opt = opt
        self.cfg = cfg
        self.mesh = mesh  # jax.sharding.Mesh for ray-parallel training
        self.workspace = workspace or opt.workspace
        os.makedirs(os.path.join(self.workspace, "checkpoints"), exist_ok=True)

        key = jax.random.PRNGKey(opt.seed if seed is None else seed)
        self.key, init_key = jax.random.split(key)
        params = params if params is not None else init_network_params(init_key, cfg)

        # surgical .pth loading: color_mlp_path + resume_mlps (utils.py:509-530)
        if opt.color_mlp_path:
            params = self._resume_mlps(params, opt.color_mlp_path, opt.resume_mlps)

        self.grid_spec = GridSpec(
            grid_size=128, bound=cfg.bound,
            density_thresh=opt.density_thresh, density_scale=1.0)

        self.optimizer = make_optimizer(params, opt)
        self.state = dict(
            params=params,
            ema=jax.tree.map(jnp.copy, params),
            opt_state=self.optimizer.init(params),
            grid=init_grid(self.grid_spec),
        )
        if mesh is not None:
            from envidr_tpu.parallel.mesh import replicate_tree
            self.state = replicate_tree(mesh, self.state)
        self.epoch = 0
        self.global_step = 0
        self.mean_count = -1.0
        self.stats: Dict[str, Any] = {"loss": [], "results": [], "ckpts": [],
                                      "best_result": None}
        self.use_grid = not (opt.env_sph_mode or opt.render_env_on_sphere)
        self._compile_logged = False
        try:  # scalar logging (reference uses tensorboardX too, utils.py:933)
            from tensorboardX import SummaryWriter
            self.tb = SummaryWriter(os.path.join(self.workspace, "run"))
        except Exception:
            self.tb = None

    # ---------------- checkpoint import helpers ----------------

    @staticmethod
    def _merge_tolerant(target, loaded):
        """Shape-mismatch-tolerant leaf merge (utils.py:1603-1614): a smaller
        checkpoint tensor is embedded into the (larger) current tensor's
        leading corner — e.g. hidden_dim_env 160 pretrain into a 256 net."""
        def merge(t, l):
            t = jnp.asarray(t)
            l = jnp.asarray(l)
            if t.shape == l.shape:
                return l
            sl = tuple(slice(0, min(a, b)) for a, b in zip(t.shape, l.shape))
            return t.at[sl].set(l[sl])
        return jax.tree.map(merge, target, loaded)

    def _resume_mlps(self, params, path, which):
        if path.endswith(".ckpt"):  # our own checkpoint format
            with open(path, "rb") as f:
                payload = pickle.load(f)
            loaded = jax.tree.map(jnp.asarray,
                                  payload.get("ema", payload["params"]))
        else:  # reference .pth
            from envidr_tpu.io.torch_import import (
                load_state_dict, network_params_from_state)
            sd = load_state_dict(path)
            loaded = network_params_from_state(sd, self.cfg)
        name_map = {"specular": "color_net", "diffuse": "diffuse_net",
                    "renv": "renv_net", "diffuse_env": "diffuse_env_net",
                    "specular_env": "env_net"}
        out = dict(params)
        if "all" in which:
            # full-state resume (minus optimizer): the renv pretrain needs the
            # ENTIRE pretrained renderer (sdf/encoder/env bank/heads) frozen —
            # loading only the color heads leaves the diffuse branch reading
            # random frozen env_nets and puts an unfixable floor under the
            # loss (reference analogue: renv training starts from the full
            # neural-renderer ckpt, main_nerf.py --ckpt + freeze).
            for key in loaded:
                if key in out:
                    try:
                        out[key] = self._merge_tolerant(out[key], loaded[key])
                    except Exception:
                        out[key] = loaded[key]
            print(f"[trainer] resumed FULL params from {path}")
            which = [w for w in which if w != "all"]
        for w in which:
            key = name_map.get(w)
            if key and key in loaded:
                try:
                    out[key] = self._merge_tolerant(params[key], loaded[key])
                except Exception:
                    out[key] = loaded[key]  # structure mismatch: take as-is
                print(f"[trainer] resumed {key} from {path}")
        return out

    def swap_env_net(self, path: str, split_diffuse: bool = False):
        """Relighting: replace env_net weights (utils.py:1582-1596)."""
        from envidr_tpu.io.torch_import import load_env_net
        new_env = load_env_net(path)
        p = dict(self.state["params"])
        if split_diffuse and "diffuse_env_net" in p:
            p["diffuse_env_net"] = p["env_net"]
        p["env_net"] = new_env
        self.state["params"] = p
        e = dict(self.state["ema"])
        if split_diffuse and "diffuse_env_net" in e:
            e["diffuse_env_net"] = e["env_net"]
        e["env_net"] = new_env
        self.state["ema"] = e

    # ---------------- jitted steps ----------------

    def _density_fn(self, params, level_mask_arr):
        def fn(x):
            geo = forward_geometry(params, self.cfg, x, None, level_mask_arr)
            if self.cfg.use_sdf:
                return sdf_to_sigma(params, self.cfg, geo["sdf"])
            return geo["sigma"]
        return fn

    @functools.cached_property
    def _update_grid_fn(self):
        @functools.partial(jax.jit, static_argnames=("fraction",))
        def fn(params, grid: OccupancyGrid, key, lm, fraction=1):
            return update_grid(grid, self.grid_spec,
                               self._density_fn(params, lm), key,
                               fraction=fraction)
        return fn

    def update_extra_state(self, full: bool = False):
        if not self.use_grid:
            return
        self.key, sub = jax.random.split(self.key)
        lm = level_mask(self._sched.enabled_levels, self.cfg.num_levels) \
            if hasattr(self, "_sched") else None
        # first 16 updates sweep the full grid; afterwards a rotating 1/4
        # slab per update (renderer.py:306-310's warmup-then-subsample).
        # full=True forces a whole-grid sweep (extra_state_full_update,
        # main_nerf.py:113 — used once after a resume).
        it = int(self.state["grid"].iter_density)
        self.state["grid"] = self._update_grid_fn(
            self.state["params"], self.state["grid"], sub, lm,
            fraction=1 if (full or it < 16) else 4)

    def train_geometric_cue(self, steps: int = 500, points: int = 131072,
                            radius: Optional[float] = None):
        """Pre-fit the SDF to an analytic sphere (``utils.py:1668-1692``).

        With hash encodings the weight-space geometric init degenerates to a
        constant field (the reference zeroes all but the first 3 encoding
        channels, network.py:204-208) — regressing sdf(x)=|x|-r directly gives
        a REAL sphere start.  Uses the main optimizer (warm adam moments, like
        the reference); jittered random points instead of the full 128^3 sweep.
        """
        if not self.cfg.use_sdf:
            return
        r = radius if radius is not None else self.cfg.bound * self.opt.scale
        optimizer = self.optimizer
        cfg = self.cfg

        @jax.jit
        def cue_step(state, key):
            pts = jax.random.uniform(key, (points, 3), minval=-cfg.bound,
                                     maxval=cfg.bound)
            def loss_fn(p):
                sdf = forward_geometry(p, cfg, pts, None, None)["sdf"]
                target = jnp.linalg.norm(pts, axis=-1) - r
                return jnp.mean((sdf - target) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, new_opt = optimizer.update(grads, state["opt_state"],
                                                state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            return dict(state, params=new_params, opt_state=new_opt), loss

        for i in range(steps):
            self.key, sub = jax.random.split(self.key)
            self.state, loss = cue_step(self.state, sub)
            if i % 8 == 7:
                jax.block_until_ready(loss)
        loss = float(loss)
        # re-sync EMA to the cued params (the cue is an init, not training)
        self.state["ema"] = jax.tree.map(jnp.copy, self.state["params"])
        print(f"[trainer] geometric cue (sphere r={r:.3f}): mse={loss:.3e}")
        return loss

    def mark_untrained_grid(self, poses, intrinsics):
        if not self.use_grid:
            return
        self.state["grid"] = mark_untrained(
            self.state["grid"], self.grid_spec, jnp.asarray(poses), intrinsics)

    # -- budget: static K from the running mean sample count ---------------

    def sample_budget(self, sched: StepSchedule) -> int:
        if self.opt.samples_budget > 0:
            return self.opt.samples_budget
        cap = sched.early_stop_steps if sched.early_stop_steps > 0 \
            else min(sched.max_steps, 1024)
        if self.mean_count <= 0:
            est = cap
        else:
            est = int(self.mean_count * 1.5) + 8
        # K floor: once the grid prunes hard (mean_count ~4) a 16-sample
        # budget under-samples the thin NeuS shell and training limit-cycles
        # (prune -> miss surface -> loss spike -> re-diffuse).  An explicitly
        # small early_stop_steps cap still wins.
        floor = min(max(16, self.opt.min_samples_budget), max(cap, 16))
        k = floor
        while k < min(est, cap):
            k *= 2
        return int(min(k, max(cap, floor), 1024))

    def _build_train_step(self, sched: StepSchedule, K: int, num_rays: int,
                          H: int, W: int, C: int, mode: str):
        cfg = self.cfg
        mesh = self.mesh
        if sched.diffuse_only or cfg.diffuse_only:
            cfg = dataclasses.replace(cfg, diffuse_only=True)
        opt = self.opt
        grid_spec = self.grid_spec
        optimizer = self.optimizer
        linear_space = opt.color_space == "linear"
        aabb = jnp.asarray(
            list(opt.marching_aabb) if len(opt.marching_aabb) == 6
            else [-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32)
        if len(opt.marching_aabb) == 6:
            aabb = jnp.clip(aabb * opt.scale, -cfg.bound, cfg.bound)

        if mode == "scene":
            ropts = SceneRenderOptions(
                max_steps=sched.max_steps, num_samples=K,
                early_stop_steps=sched.early_stop_steps,
                dt_gamma=opt.dt_gamma, T_thresh=opt.T_thresh,
                min_near=opt.min_near, perturb=True, training=True,
                with_loss_aux=(sched.flags.use_relsdf_loss
                               or sched.flags.use_backsdf_loss
                               or sched.flags.use_orientation_loss
                               or sched.flags.use_dist_bound
                               or sched.flags.use_entropy_loss),
                cos_anneal_ratio=sched.cos_anneal_ratio,
                use_bg_net=cfg.bg_radius > 0,
                stratified_sampling=opt.stratified_sampling,
                coarse_march=opt.coarse_march,
                grid_size=grid_spec.grid_size)
        else:
            ropts = SphereRenderOptions(
                num_step=12, step_size=0.002, radius=opt.env_sph_radius,
                perturb=True, training=True,
                with_surf_sdf=sched.flags.use_sdf_loss,
                with_backsdf=sched.flags.use_backsdf_loss
                or sched.flags.use_eikonal_loss)

        # static gates: whether each schedule is in play at all is an opt-level
        # fact; the per-epoch VALUES ride the traced weights dict (reserved
        # "_" keys) so the cached compiled step never freezes them.
        has_level_sched = bool(opt.enabled_levels_sched)
        has_normal_anneal = opt.normal_anneal_iters > 0
        has_cos_anneal = bool(cfg.use_neus_sdf and opt.cos_anneal_steps > 0)
        lm_static = level_mask(sched.enabled_levels, cfg.num_levels)

        def step(state, batch, key, weights):
            params = state["params"]
            k_rays, k_bg, k_perturb = jax.random.split(key, 3)
            lm = ((jnp.arange(cfg.num_levels) < weights["_levels"])
                  .astype(jnp.float32) if has_level_sched else lm_static)
            normal_anneal = (weights["_normal_anneal"] if has_normal_anneal
                             else 1.0)
            cos_anneal = weights["_cos_anneal"] if has_cos_anneal else None
            beta_cap = (weights["_beta_cap"] if opt.beta_cap_sched
                        and cfg.use_sdf and not cfg.use_neus_sdf else None)
            # traced beta floor: with beta_min_sched the DENSITY clamp must
            # follow the anneal too (reference mutates sdf_density.beta_min,
            # utils.py:1822-1824), not just the loss-side beta
            beta_min_t = (weights["_beta_min"] if opt.beta_min_sched
                          and cfg.use_sdf and not cfg.use_neus_sdf else None)

            image_B = (opt.image_batch
                       if mode == "scene" and opt.image_batch > 1 else 1)
            pose = batch["pose"][None]                          # [1, 4, 4]
            if image_B > 1:
                # image_batch > 1 (main_nerf.py:156 dataloader batch_size):
                # num_rays split evenly across B poses; only the plain
                # random sampler supports image batching
                rays = sampled_rays(k_rays, batch["pose"],
                                    batch["intrinsics"], H, W,
                                    num_rays // image_B)
            elif sched.use_error_map:
                # importance sampling from the per-image error map EMA
                # (utils.py:174-186); the map lives in device state
                from envidr_tpu.geometry.rays import error_map_rays
                em_row = state["error_map"][batch["img_idx"]][None]
                rays = error_map_rays(k_rays, pose, batch["intrinsics"], H, W,
                                      num_rays, em_row)
            elif opt.patch_size > 1:
                # patch sampling for patch-structured losses (utils.py:565)
                from envidr_tpu.geometry.rays import patch_rays
                rays = patch_rays(k_rays, pose, batch["intrinsics"], H, W,
                                  num_rays, opt.patch_size)
            elif opt.center_crop > 0:
                from envidr_tpu.geometry.rays import center_crop_rays
                rays = center_crop_rays(k_rays, pose, batch["intrinsics"],
                                        H, W, num_rays, opt.center_crop,
                                        opt.center_crop_ratio)
            else:
                rays = sampled_rays(k_rays, pose, batch["intrinsics"], H, W,
                                    num_rays)
            if image_B > 1:
                rays_o = rays["rays_o"].reshape(-1, 3)
                rays_d = rays["rays_d"].reshape(-1, 3)
                pix = jnp.take_along_axis(
                    batch["image"], rays["inds"][..., None], axis=1)
                pix = pix.reshape(-1, pix.shape[-1])     # [B*n, C] uint8
            else:
                rays_o = rays["rays_o"][0]
                rays_d = rays["rays_d"][0]
                pix = jnp.take(batch["image"], rays["inds"][0], axis=0)  # [N, C] uint8
            # uint8 preload -> /255; fp16 preload is already normalized
            pix = (pix.astype(jnp.float32) / 255.0
                   if jnp.issubdtype(pix.dtype, jnp.integer)
                   else pix.astype(jnp.float32))
            if mesh is not None:
                from envidr_tpu.parallel.mesh import shard_rays
                rays_o, rays_d, pix = shard_rays(mesh, rays_o, rays_d, pix)
            if linear_space:
                pix = pix.at[..., :3].set(srgb_to_linear(pix[..., :3]))

            r_pix = None
            if "r_images" in batch and batch["r_images"] is not None:
                r_pix = jnp.take(batch["r_images"], rays["inds"][0], axis=0)
                r_pix = (r_pix.astype(jnp.float32) / 255.0
                         if jnp.issubdtype(r_pix.dtype, jnp.integer)
                         else r_pix.astype(jnp.float32))
                if linear_space:
                    r_pix = r_pix.at[..., :3].set(srgb_to_linear(r_pix[..., :3]))
            n_eff = pix.shape[0]   # patch sampling rounds num_rays down
            if C == 4 and cfg.bg_radius <= 0:
                if opt.alpha_bg_mode == "white":
                    bg = jnp.ones((n_eff, 3))
                else:
                    bg = jax.random.uniform(k_bg, (n_eff, 3))
                gt_rgb = pix[..., :3] * pix[..., 3:] + bg * (1.0 - pix[..., 3:])
                alpha_mask = pix[..., 3]
            else:
                bg = jnp.ones((n_eff, 3))
                gt_rgb = pix[..., :3]
                alpha_mask = None

            def loss_fn(p):
                if mode == "scene" and sched.indir_ref:
                    from envidr_tpu.render.indirect import (
                        IndirectOptions, render_scene_indirect)
                    iopts = IndirectOptions(
                        indir_max_steps=opt.indir_max_steps,
                        indir_early_stop_steps=opt.indir_early_stop_steps,
                        indir_num_samples=min(
                            K, max(opt.indir_early_stop_steps, 16)),
                        grad_rays=sched.grad_rays,
                        grad_rays_scale=opt.grad_rays_scale)
                    obj_aabb = (jnp.asarray(opt.obj_aabb, jnp.float32)
                                * opt.scale if opt.obj_aabb else None)
                    out = render_scene_indirect(
                        p, cfg, ropts, iopts, state["grid"].bitfield, rays_o,
                        rays_d, bg, aabb, key=k_perturb, obj_aabb=obj_aabb,
                        level_mask=lm,
                        normal_anneal_ratio=normal_anneal,
                        cos_anneal_ratio=cos_anneal, beta_cap=beta_cap,
                        beta_min=beta_min_t)
                elif mode == "scene" and sched.error_bound:
                    # VolSDF error-bound strategy (renderer.py:373-374)
                    from envidr_tpu.render.volsdf import (
                        VolSDFOptions, render_volsdf)
                    vopts = VolSDFOptions(
                        num_steps=opt.num_steps,
                        upsample_steps=max(opt.upsample_steps, 16),
                        min_near=opt.min_near, perturb=True, training=True)
                    out = render_volsdf(p, cfg, vopts, rays_o, rays_d, bg,
                                        aabb, key=k_perturb, level_mask=lm,
                                        beta_min=beta_min_t, beta_cap=beta_cap)
                elif mode == "scene":
                    out = render_scene(
                        p, cfg, ropts, state["grid"].bitfield, rays_o, rays_d,
                        bg, aabb, key=k_perturb, level_mask=lm,
                        normal_anneal_ratio=normal_anneal,
                        cos_anneal_ratio=cos_anneal, beta_cap=beta_cap,
                        beta_min=beta_min_t)
                else:
                    out = render_sphere(
                        p, cfg, ropts, rays_o, rays_d, bg,
                        material=batch.get("material"),
                        env_index=batch.get("env_index", 0),
                        r_images=r_pix,
                        key=k_perturb, level_mask=lm,
                        normal_anneal_ratio=normal_anneal)
                from envidr_tpu.ops.density import laplace_beta
                beta = laplace_beta(p["sdf_density"], weights["_beta_min"],
                                    cfg.beta_max) if cfg.use_sdf and not cfg.use_neus_sdf else None
                if beta is not None and beta_cap is not None:
                    beta = jnp.minimum(beta, beta_cap)
                neus_inv_s = None
                if cfg.use_sdf and cfg.use_neus_sdf:
                    neus_inv_s = jnp.clip(
                        jnp.exp(p["sdf_density"]["variance"] * 10.0),
                        1e-6, 1e6)
                total, terms = compute_losses(
                    out, gt_rgb, sched.flags, weights, beta=beta,
                    neus_inv_s=neus_inv_s,
                    alpha_mask=alpha_mask, roughness=out.get("roughness"))
                return total, (out, terms)

            (loss, (out, terms)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = optimizer.update(grads, state["opt_state"], params)
            new_params = optax.apply_updates(params, updates)
            new_state = dict(state, params=new_params, opt_state=new_opt)
            # per-STEP EMA, decay 0.95 — an INTENTIONAL deviation: the
            # reference updates once per epoch (utils.py:1252) with
            # torch_ema's (1+n)/(10+n) decay ramp (ema decay 0.95,
            # main_nerf.py:162); that per-epoch cadence lags ~20 epochs and
            # tanks early eval PSNR / best-ckpt selection (measured: 8.5 vs
            # 24.0 dB at ep10 of the env pretrain).  Per-step 0.95 ≈ raw
            # params with ~20-step smoothing.  Disabled (exact tracking)
            # under geometric_init like the reference.
            ema_d = 0.95 if not opt.geometric_init else 0.0
            new_state["ema"] = jax.tree.map(
                lambda e, p: ema_d * e + (1.0 - ema_d) * p,
                state["ema"], new_params)
            if sched.use_error_map:
                # per-ray EMA update of the coarse error grid (utils.py:679-700)
                err = jax.lax.stop_gradient(
                    jnp.mean(jnp.abs(out["image"] - gt_rgb), axis=-1))
                ic = rays["inds_coarse"][0]
                row = state["error_map"][batch["img_idx"]]
                vals = 0.9 * jnp.take(row, ic) + 0.1 * err
                new_state["error_map"] = state["error_map"].at[
                    batch["img_idx"]].set(row.at[ic].set(vals))
            metrics = dict(terms, loss=loss)
            if mode == "scene":
                metrics["mean_count"] = jnp.mean(out["counts"].astype(jnp.float32))
            # surface the NaN-skip counter: apply_if_finite silently drops
            # non-finite updates, which froze a whole arm for 120 epochs in
            # round 5 with no log signal — make the skip count visible
            nf = getattr(new_opt, "total_notfinite", None)
            if nf is not None:
                metrics["notfinite"] = nf.astype(jnp.float32)
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    def _get_train_step(self, sched: StepSchedule, K, num_rays, H, W, C, mode):
        sig = (hash(sched), K, num_rays, H, W, C, mode)
        cache = getattr(self, "_step_cache", None)
        if cache is None:
            cache = self._step_cache = {}
        if sig not in cache:
            cache[sig] = self._build_train_step(sched, K, num_rays, H, W, C, mode)
        return cache[sig]

    # ---------------- epoch loops ----------------

    def train_one_epoch(self, dataset, mode: str = "scene", log_every: int = 50):
        opt = self.opt
        self.epoch += 1
        sched = resolve(opt, self.epoch, self.global_step)
        self._sched = sched
        if (opt.beta_cap_sched and self.cfg.use_sdf
                and not self.cfg.use_neus_sdf):
            # project the learned Laplace beta under the annealed cap
            # (config.beta_cap_sched) — the fog-equilibrium escape lever
            bc_s, bc_e, bc_it = opt.beta_cap_sched
            cap = float(bc_s * (bc_e / bc_s) ** min(self.epoch / bc_it, 1.0))
            sd = dict(self.state["params"]["sdf_density"])
            sd["beta"] = jnp.minimum(jnp.asarray(sd["beta"]), cap)
            self.state["params"] = dict(self.state["params"], sdf_density=sd)
        if opt.error_map and "error_map" not in self.state:
            # lazy: sized by the dataset (provider.py:277-281; init 0.1)
            self.state["error_map"] = jnp.full((len(dataset), 128 * 128), 0.1)
        K = self.sample_budget(sched) if mode == "scene" else 0
        step_fn = self._get_train_step(
            sched, K, sched.num_rays, dataset.H, dataset.W, dataset.C, mode)

        rng = np.random.default_rng(opt.seed * 100003 + self.epoch)
        order = dataset.epoch_order(rng)
        images = dataset.device_images
        poses = dataset.device_poses
        intr = jnp.asarray(dataset.intrinsics, jnp.float32)

        # image_batch > 1 groups B images per step (main_nerf.py:156); the
        # step splits num_rays across them.  Scene mode + plain sampler only.
        image_B = (opt.image_batch
                   if mode == "scene" and opt.image_batch > 1 else 1)
        if image_B > 1:
            rem = len(order) % image_B
            if rem:
                # wrap-pad the trailing partial group (the reference DataLoader
                # defaults to drop_last=False, so every frame trains each epoch)
                order = list(order) + list(order[:image_B - rem])
            n_grp = len(order) // image_B
            order = [np.asarray(order[g * image_B:(g + 1) * image_B])
                     for g in range(n_grp)]

        losses = []
        t0 = time.time()
        for i in order:
            if (self.use_grid and sched.update_extra_interval > 0
                    and self.global_step % sched.update_extra_interval == 0):
                self.update_extra_state()
            self.key, sub = jax.random.split(self.key)
            if image_B > 1:
                batch = {"pose": poses[jnp.asarray(i)],
                         "image": images[jnp.asarray(i)], "intrinsics": intr,
                         "img_idx": jnp.asarray(i[0], jnp.int32)}
            else:
                batch = {"pose": poses[i], "image": images[i],
                         "intrinsics": intr,
                         "img_idx": jnp.asarray(i, jnp.int32)}
            if mode == "sphere":
                batch["env_index"] = int(np.asarray(dataset.env_indices[i])) \
                    if not hasattr(dataset, "host_env_indices") \
                    else int(dataset.host_env_indices[i])
                batch["material"] = dataset.materials[i]
                r_all = getattr(dataset, "device_r_images", None)
                if r_all is not None:
                    batch["r_images"] = r_all[i]
            t_step0 = time.time() if not self._compile_logged else 0.0
            self.state, metrics = step_fn(self.state, batch, sub,
                                          {k: jnp.asarray(v) for k, v in
                                           sched.weights.items()})
            if not self._compile_logged:
                # attribute epoch-1 overhead: first dispatch blocks on the
                # (remote) compile, so its wall time IS the compile cost
                jax.block_until_ready(metrics["loss"])
                print(f"[trainer] first step (incl. compile): "
                      f"{time.time() - t_step0:.1f}s")
                self._compile_logged = True
            losses.append(metrics)
            if len(losses) % 8 == 0:
                # cap the async dispatch queue: the single-tenant tunnel
                # deadlocks when hundreds of steps queue unsynchronized
                jax.block_until_ready(metrics["loss"])
            if mode == "scene" and "mean_count" in metrics:
                mc = float(metrics["mean_count"])
                self.mean_count = mc if self.mean_count < 0 \
                    else 0.9 * self.mean_count + 0.1 * mc
            self.global_step += 1

        avg = {k: float(np.mean([float(m[k]) for m in losses]))
               for k in losses[0]}
        if "notfinite" in avg:  # cumulative counter: report the epoch-end value
            avg["notfinite"] = float(losses[-1]["notfinite"])
        avg["time"] = time.time() - t0
        avg["rays_per_sec"] = sched.num_rays * len(order) / avg["time"]
        self.stats["loss"].append(avg["loss"])
        if self.tb is not None:
            for k, v in avg.items():
                self.tb.add_scalar(f"train/{k}", v, self.global_step)
            self.tb.add_scalar(
                "train/lr", self.opt.lr * lr_lambda(self.global_step, self.opt.iters),
                self.global_step)
        return avg

    # ---------------- evaluation ----------------

    def render_image(self, pose, intrinsics, H, W, *, use_ema: bool = True,
                     bg_color=1.0, env_rot_radian=None, mode: str = "scene",
                     material=None, env_index=0):
        params = self.state["ema"] if use_ema else self.state["params"]
        chunk = self.opt.eval_ray_chunk or 4096  # 0-sentinel: unfinalized opts
        from envidr_tpu.geometry.rays import full_image_rays
        rays_o, rays_d = full_image_rays(
            jnp.asarray(pose)[None], intrinsics, H, W)
        rays_o, rays_d = rays_o[0], rays_d[0]
        aabb = jnp.asarray([-self.cfg.bound] * 3 + [self.cfg.bound] * 3)
        n = rays_o.shape[0]
        pad = (-n) % chunk
        if pad:
            rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3))])
            rays_d = jnp.concatenate([rays_d, jnp.ones((pad, 3))])
        n_chunks = (n + pad) // chunk
        rays_o = rays_o.reshape(n_chunks, chunk, 3)
        rays_d = rays_d.reshape(n_chunks, chunk, 3)
        rot = (jnp.asarray(env_rot_radian, jnp.float32)
               if env_rot_radian is not None else None)
        eval_fn = self._eval_fn(mode, self._eval_samples_budget(mode))
        res = eval_fn(params, self.state["grid"].bitfield, rays_o, rays_d,
                      jnp.asarray(bg_color, jnp.float32), aabb,
                      material, env_index, rot)
        out = {}
        for k, v in res.items():
            if v is None:
                continue
            v = np.asarray(v).reshape((n + pad,) + v.shape[2:])[:n]
            out[k] = v.reshape((H, W) + v.shape[1:])
        return out

    def _eval_samples_budget(self, mode: str) -> int:
        """Eval K: the static opt.eval_samples_budget capped by the trained
        mean-count estimate (same doubling rule as the train-side
        sample_budget) — inference should never sample more than training
        learned it needs (VERDICT weak #4; ref: nerf/render_func/cuda_ray.py
        inference branch marches to mean_count, not a fixed cap)."""
        if mode != "scene":
            return 0
        K = self.opt.eval_samples_budget
        # the marching early-stop bounds samples/ray exactly like training —
        # an eval K above it is pure padding.  Use the RESOLVED schedule's
        # early_stop/max_steps (early_stop_steps_sched etc.), not the raw
        # option, so eval tracks the cap actually in effect this epoch.
        sched = getattr(self, "_sched", None)
        ess = sched.early_stop_steps if sched else self.opt.early_stop_steps
        ms = sched.max_steps if sched else self.opt.max_steps
        cap = ess if ess > 0 else min(ms, 1024)
        K = min(K, max(cap, 16))
        if self.opt.samples_budget <= 0 and self.mean_count > 0:
            est = min(int(self.mean_count * 1.5) + 8, cap)
            k = max(16, self.opt.min_samples_budget)
            while k < est:
                k *= 2
            K = min(K, k)
        return int(K)

    @functools.lru_cache(maxsize=8)
    def _eval_fn(self, mode: str, eval_K: int = 0):
        """Whole-image renderer: ONE jitted call that lax.map's over ray
        chunks (the python-per-chunk loop re-entered the dispatch tunnel ~40x
        per image and ran at half the train rate, VERDICT weak #4)."""
        cfg = self.cfg
        opt = self.opt
        mesh = self.mesh
        from envidr_tpu.parallel.mesh import shard_rays
        if mode == "scene":
            ropts = SceneRenderOptions(
                max_steps=opt.max_steps,
                num_samples=eval_K or opt.eval_samples_budget,
                early_stop_steps=opt.early_stop_steps, dt_gamma=opt.dt_gamma,
                T_thresh=opt.T_thresh, min_near=opt.min_near,
                use_bg_net=cfg.bg_radius > 0,
                coarse_march=opt.coarse_march,
                grid_size=self.grid_spec.grid_size)

            use_indir_eval = bool(cfg.use_renv and opt.indir_ref_start_iter > 0)
            if use_indir_eval:
                # indir-trained models must be EVALUATED with the 3-pass
                # indirect render too — the specular head consumes renv input
                # (reference runs the full indirect path at test time,
                # renderer.py:437-513)
                from envidr_tpu.render.indirect import (
                    IndirectOptions, render_scene_indirect)
                iopts = IndirectOptions(
                    indir_max_steps=opt.indir_max_steps,
                    indir_early_stop_steps=opt.indir_early_stop_steps,
                    indir_num_samples=max(opt.indir_early_stop_steps, 16),
                    grad_rays=False, grad_rays_scale=opt.grad_rays_scale)
                obj_aabb_c = (jnp.asarray(opt.obj_aabb, jnp.float32) * opt.scale
                              if opt.obj_aabb else None)

            def chunk_fn(params, bitfield, rays_o, rays_d, bg, aabb, material,
                         env_index, env_rot):
                # eval rays ride the same data mesh as training; the rendered
                # chunks come back globally addressable (GSPMD's answer to the
                # reference's dist.all_gather eval, utils.py:1353-1371)
                rays_o, rays_d = shard_rays(mesh, rays_o, rays_d)
                if use_indir_eval:
                    out = render_scene_indirect(
                        params, cfg, ropts, iopts, bitfield, rays_o, rays_d,
                        bg, aabb, obj_aabb=obj_aabb_c, env_rot_radian=env_rot)
                else:
                    out = render_scene(params, cfg, ropts, bitfield, rays_o,
                                       rays_d, bg, aabb, env_rot_radian=env_rot)
                keep = ("image", "depth", "weights_sum", "normal_image",
                        "diffuse_image", "specular_image", "roughness_image")
                return {k: out.get(k) for k in keep if k in out}
        else:
            ropts = SphereRenderOptions(radius=opt.env_sph_radius)

            def chunk_fn(params, bitfield, rays_o, rays_d, bg, aabb, material,
                         env_index, env_rot):
                rays_o, rays_d = shard_rays(mesh, rays_o, rays_d)
                out = render_sphere(params, cfg, ropts, rays_o, rays_d, bg,
                                    material=material, env_index=env_index,
                                    env_rot_radian=env_rot)
                keep = ("image", "depth", "weights_sum", "normal_image",
                        "diffuse_image", "specular_image", "roughness_image")
                return {k: out.get(k) for k in keep if k in out}

        @jax.jit
        def fn(params, bitfield, rays_o, rays_d, bg, aabb, material,
               env_index, env_rot=None):
            # rays_o/rays_d: [n_chunks, chunk, 3]; sequential map keeps the
            # per-chunk working set bounded while paying ONE dispatch
            def body(c):
                o, d = c
                return chunk_fn(params, bitfield, o, d, bg, aabb, material,
                                env_index, env_rot)
            return jax.lax.map(body, (rays_o, rays_d))
        return fn

    def evaluate(self, dataset, *, max_images: int = 8, mode: str = "scene",
                 use_ema: bool = True, env_rot_degree_range=None,
                 dump_dir: Optional[str] = None, track_best: bool = True,
                 indices=None):
        """PSNR (+SSIM, +LPIPS when the package exists) eval; optional
        env-rotation sweep (utils.py:1295-1303), visual-item image dumps
        (utils.py:1382-1442), and best-checkpoint tracking (utils.py:1537-1557)."""
        from envidr_tpu.geometry.rays import linear_to_srgb
        from envidr_tpu.train.metrics import LPIPSMeter, SSIMMeter
        meter = PSNRMeter()
        ssim_meter = SSIMMeter()
        # one LPIPS instance per Trainer: re-instantiating re-traces the
        # full-resolution AlexNet graph every eval epoch (slow remote compiler)
        if getattr(self, "_lpips_meter", None) is None:
            self._lpips_meter = LPIPSMeter()
        lpips_meter = self._lpips_meter
        lpips_meter.clear()
        # opt.test_ids / explicit indices select specific frames
        # (main_nerf.py:129-134's dataloader(test_ids=...))
        idxs = (list(indices) if indices else
                list(range(min(len(dataset), max_images))))
        has_gt = getattr(dataset, "images", None) is not None
        if not has_gt:
            track_best = False   # render-only split (colmap slerp test path)
        rots = [None]
        if env_rot_degree_range:
            d0, d1, k = env_rot_degree_range
            rots = list(np.deg2rad(np.linspace(d0, d1, int(k))))
        # test-time bg is a fixed color (utils.py:844)
        bg_val = 1.0 if self.opt.render_bg_color == "white" else 0.0
        for i in idxs:
            material = getattr(dataset, "materials", [None] * len(dataset))[i]
            if self.opt.overwrite_materials and material is not None:
                # utils.py:835-838: force the unwrap material at test time
                material = dict(material,
                                roughness=self.opt.unwrap_roughness,
                                metallic=self.opt.unwrap_metallic,
                                color=list(self.opt.unwrap_color))
            env_index = getattr(dataset, "env_indices",
                                np.zeros(len(dataset), np.int32))[i]
            if self.opt.set_env_net_index > 0:   # utils.py:825-826
                env_index = self.opt.set_env_net_index
            for ri, rot in enumerate(rots):
                res = self.render_image(
                    dataset.poses[i], dataset.intrinsics, dataset.H, dataset.W,
                    mode=mode, use_ema=use_ema, env_rot_radian=rot,
                    bg_color=bg_val, material=material, env_index=env_index)
                pred = res["image"]
                if self.opt.color_space == "linear":
                    pred = np.asarray(linear_to_srgb(jnp.asarray(pred)))
                if rot is None and has_gt:
                    gt = dataset.images[i].astype(np.float32) / 255.0
                    if gt.shape[-1] == 4:
                        gt = gt[..., :3] * gt[..., 3:] \
                            + bg_val * (1.0 - gt[..., 3:])
                    pred_c = np.clip(pred, 0, 1)
                    meter.update(pred_c, gt)
                    ssim_meter.update(pred_c, gt)
                    if lpips_meter.available:
                        lpips_meter.update(pred_c, gt)
                if dump_dir is not None:
                    self._dump_visuals(res, pred, dump_dir,
                                       f"{i:03d}" + (f"_rot{ri}" if rot is not None else ""))
        psnr = meter.measure()
        self.stats.setdefault("results", []).append(
            {"psnr": psnr, "ssim": ssim_meter.measure(),
             "lpips": lpips_meter.measure() if lpips_meter.N else None,
             # 'alex' = true LPIPS weights; 'alex_untrained' = deterministic
             # random trunk fallback (no pretrained weights in this image)
             "lpips_kind": lpips_meter.kind,
             "epoch": self.epoch})
        if self.tb is not None:
            self.tb.add_scalar("eval/psnr", psnr, self.global_step)
            self.tb.add_scalar("eval/ssim", ssim_meter.measure(), self.global_step)
            if lpips_meter.N:
                self.tb.add_scalar(f"eval/lpips_{lpips_meter.kind}",
                                   lpips_meter.measure(), self.global_step)
        best = self.stats.get("best_result")
        if track_best and (best is None or psnr > best):
            self.stats["best_result"] = psnr
            # record the sibling metrics at the selected checkpoint so model
            # selection is auditable beyond the single PSNR scalar
            self.stats["best_result_ssim"] = ssim_meter.measure()
            if lpips_meter.N:
                self.stats["best_result_lpips"] = lpips_meter.measure()
            self.save_checkpoint(name="best", full=False)
        return psnr

    def _dump_visuals(self, res, pred_srgb, outdir, tag):
        try:
            import imageio.v2 as imageio
        except ImportError:
            return
        os.makedirs(outdir, exist_ok=True)
        # opt.img_format picks the dump extension (utils.py:1383-1384); exr
        # has no writer in this image -> png, like the reference's nc fallback
        ext = self.opt.img_format if self.opt.img_format in ("png", "jpg") \
            else "png"
        imageio.imwrite(os.path.join(outdir, f"{tag}_rgb.{ext}"),
                        (np.clip(pred_srgb, 0, 1) * 255).astype(np.uint8))
        items = set(self.opt.visual_items)
        if "normal_image" in res:
            n = res["normal_image"] * 0.5 + 0.5
            imageio.imwrite(os.path.join(outdir, f"{tag}_normal.png"),
                            (np.clip(n, 0, 1) * 255).astype(np.uint8))
        for key, name in (("diffuse_image", "diffuse"),
                          ("specular_image", "specular"),
                          ("roughness_image", "roughness")):
            if name in items and key in res:
                v = res[key]
                if v.shape[-1] == 1:
                    v = np.repeat(v, 3, -1) / max(float(v.max()), 1e-6)
                imageio.imwrite(os.path.join(outdir, f"{tag}_{name}.png"),
                                (np.clip(v, 0, 1) * 255).astype(np.uint8))

    # ---------------- profiling ----------------

    def profile_steps(self, dataset, n_steps: int = 5, mode: str = "scene",
                      out_dir: Optional[str] = None):
        """Capture a jax.profiler device trace over a few train steps
        (SURVEY.md §5.1: first-class tracing replaces the reference's ad-hoc
        CUDA-event timing)."""
        import jax.profiler
        out = out_dir or os.path.join(self.workspace, "profile")
        os.makedirs(out, exist_ok=True)
        jax.profiler.start_trace(out)
        try:
            self.train_one_epoch_steps(dataset, n_steps, mode)
        finally:
            jax.profiler.stop_trace()
        return out

    def train_one_epoch_steps(self, dataset, n_steps, mode):
        """N ad-hoc train steps (the GUI train-per-frame loop, gui.py:89-113).

        Mirrors train_one_epoch's per-step upkeep: lazy error-map init,
        occupancy-grid refresh cadence, sphere-mode batch conditioning
        (env_index / material / r_images), and the post-loop EMA pull."""
        from envidr_tpu.train.schedules import resolve as _resolve
        sched = _resolve(self.opt, max(self.epoch, 1), self.global_step)
        self._sched = sched
        if self.opt.error_map and "error_map" not in self.state:
            self.state["error_map"] = jnp.full((len(dataset), 128 * 128), 0.1)
        K = self.sample_budget(sched) if mode == "scene" else 0
        step_fn = self._get_train_step(sched, K, sched.num_rays, dataset.H,
                                       dataset.W, dataset.C, mode)
        intr = jnp.asarray(dataset.intrinsics, jnp.float32)
        w = {k: jnp.asarray(v) for k, v in sched.weights.items()}
        for i in range(n_steps):
            if (self.use_grid and sched.update_extra_interval > 0
                    and self.global_step % sched.update_extra_interval == 0):
                self.update_extra_state()
            self.key, sub = jax.random.split(self.key)
            j = i % len(dataset)
            batch = {"pose": dataset.device_poses[j],
                     "image": dataset.device_images[j],
                     "intrinsics": intr,
                     "img_idx": jnp.asarray(j, jnp.int32)}
            if mode == "sphere":
                batch["env_index"] = int(dataset.host_env_indices[j]) \
                    if hasattr(dataset, "host_env_indices") \
                    else int(np.asarray(dataset.env_indices[j]))
                batch["material"] = dataset.materials[j]
                r_all = getattr(dataset, "device_r_images", None)
                if r_all is not None:
                    batch["r_images"] = r_all[j]
            self.state, m = step_fn(self.state, batch, sub, w)
            self.global_step += 1
        jax.block_until_ready(m["loss"])
        return {"loss": float(m["loss"]), "steps": n_steps}

    # ---------------- checkpoints ----------------

    @staticmethod
    def _retime_opt_state(opt_state, step: int):
        """Reset every lr-schedule counter inside an optax state tree to
        ``step``.  Used when a checkpoint carries no ``opt_state`` (best.ckpt,
        ``full=False``): without this, ``scale_by_schedule`` restarts at count
        0 → FULL base lr on a model trained to the decay floor — the measured
        round-4 failure (docs/QUALITY_R4.md) that destroyed a 26 dB model in
        10 epochs.  The reference avoids it by keying LambdaLR on the restored
        iter count (main_nerf.py:158, utils.py:1633-1666); this is the optax
        equivalent."""
        import optax

        def walk(node):
            if isinstance(node, optax.ScaleByScheduleState):
                return optax.ScaleByScheduleState(
                    count=jnp.asarray(step, dtype=jnp.asarray(node.count).dtype))
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*[walk(c) for c in node])
            if isinstance(node, tuple):
                return tuple(walk(c) for c in node)
            if isinstance(node, list):
                return [walk(c) for c in node]
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return node

        return walk(opt_state)

    def save_checkpoint(self, name: Optional[str] = None, full: bool = True):
        name = name or f"ep{self.epoch:04d}"
        payload = {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "iters": self.opt.iters,
            "mean_count": self.mean_count,
            "stats": self.stats,
            "params": jax.tree.map(np.asarray, self.state["params"]),
            "ema": jax.tree.map(np.asarray, self.state["ema"]),
            "grid": jax.tree.map(np.asarray, tuple(self.state["grid"])),
        }
        if "error_map" in self.state:
            payload["error_map"] = np.asarray(self.state["error_map"])
        if full:
            payload["opt_state"] = jax.tree.map(
                lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x,
                self.state["opt_state"])
        path = os.path.join(self.workspace, "checkpoints", f"{name}.ckpt")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        if name != "best":
            self.stats["ckpts"].append(path)
            # rolling window (utils.py:1518-1531); best.ckpt is never rotated
            while len(self.stats["ckpts"]) > self.opt.max_keep_ckpt:
                old = self.stats["ckpts"].pop(0)
                if os.path.exists(old):
                    os.remove(old)
        return path

    def load_checkpoint(self, path: Optional[str] = None):
        if path is None or path in ("latest", "best"):
            ckpt_dir = os.path.join(self.workspace, "checkpoints")
            cands = sorted(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else []
            if path == "best" and "best.ckpt" in cands:
                cands = ["best.ckpt"]
            else:
                # prefer regular epoch checkpoints over emergency_* dumps
                # (utils.py:1564-1572; round-1 picked emergency_* by sort order)
                regular = [c for c in cands if c.startswith("ep")]
                cands = regular or cands
            if not cands:
                print("[trainer] no checkpoint found, starting fresh")
                return False
            path = os.path.join(ckpt_dir, cands[-1])
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.epoch = payload["epoch"]
        self.global_step = payload["global_step"]
        self.mean_count = payload.get("mean_count", -1.0)
        self.stats = payload.get("stats", self.stats)
        self.state["params"] = jax.tree.map(jnp.asarray, payload["params"])
        self.state["ema"] = jax.tree.map(jnp.asarray, payload["ema"])
        self.state["grid"] = OccupancyGrid(
            *[jnp.asarray(x) for x in payload["grid"]])
        if "error_map" in payload:
            self.state["error_map"] = jnp.asarray(payload["error_map"])
        restored_opt = False
        if "opt_state" in payload:
            try:
                self.state["opt_state"] = jax.tree.map(
                    lambda tgt, src: jnp.asarray(src) if hasattr(src, "shape") else src,
                    self.state["opt_state"], payload["opt_state"])
                restored_opt = True
            except Exception as e:  # shape mismatch -> reinit (utils.py:1633-1666)
                print(f"[trainer] optimizer state mismatch, reinit: {e}")
        if not restored_opt and self.global_step > 0:
            # best.ckpt is saved full=False (no opt_state).  A fresh optimizer
            # would restart the lr schedule at step 0 (full base lr) — re-key
            # the schedule counters on the restored global_step so the first
            # resumed step lands at the DECAYED lr (main_nerf.py:158 semantics).
            print(f"[trainer] WARNING: checkpoint has no opt_state — "
                  f"re-timing lr schedule to step {self.global_step} "
                  f"(adam moments reinit)")
            self.state["opt_state"] = self._retime_opt_state(
                self.state["opt_state"], self.global_step)
        ck_iters = payload.get("iters")
        if ck_iters is not None and ck_iters != self.opt.iters:
            # extending iters on resume RAISES the decayed lr (0.1^(s/iters))
            # — the other measured round-4 continuation trap
            print(f"[trainer] WARNING: opt.iters={self.opt.iters} differs "
                  f"from checkpoint iters={ck_iters}; the lr decay "
                  f"0.1^(step/iters) will jump accordingly. Prefer resuming "
                  f"with explicit --set lr at the decay floor.")
        print(f"[trainer] loaded {path} (epoch {self.epoch})")
        return True
