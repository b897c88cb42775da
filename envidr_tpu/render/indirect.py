"""Interreflection (indir_ref) three-pass render.

Reimplements the reference's masked three-pass flow
(``/root/reference/nerf/renderer.py:437-513``, SURVEY.md §3.4) with static
shapes: every pass processes ALL rays densely; the boolean gathers/scatters of
the original become per-ray masks (a secondary ray whose mask is off carries a
zeroed reflection image with zero visibility, which routes it through the pure
env branch of the color MLP — identical output, no dynamic shapes).

  pass 1  geometry only      -> normals, depth, weights_sum
  pass 2  reflected rays     -> per-ray reflection color+visibility (r_images)
  pass 3  main render        -> renv branch blends reflection via roughness
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from envidr_tpu.geometry.rays import reflect_dir
from envidr_tpu.models.network import NetworkConfig
from envidr_tpu.ops.density import SQRT3
from envidr_tpu.render.scene import SceneRenderOptions, render_scene


@dataclasses.dataclass(frozen=True)
class IndirectOptions:
    indir_max_steps: int = 1024
    indir_early_stop_steps: int = 32
    indir_num_samples: int = 32      # K budget of the secondary pass
    grad_rays: bool = False
    grad_rays_scale: float = 0.01


def render_scene_indirect(
    params,
    cfg: NetworkConfig,
    opts: SceneRenderOptions,
    iopts: IndirectOptions,
    bitfield: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bg_color,
    aabb: jnp.ndarray,
    *,
    key: Optional[jax.Array] = None,
    obj_aabb: Optional[jnp.ndarray] = None,
    env_rot_radian=None,
    level_mask=None,
    normal_anneal_ratio: float = 1.0,
    cos_anneal_ratio=None,          # traced override — must reach ALL passes
    beta_cap=None,                  # traced Laplace beta cap (beta_cap_sched)
    beta_min=None,                  # traced Laplace beta floor (beta_min_sched)
) -> Dict[str, Any]:
    dt = 2.0 * SQRT3 / iopts.indir_max_steps
    k1, k2, k3 = (jax.random.split(key, 3) if key is not None
                  else (None, None, None))
    traced = dict(cos_anneal_ratio=cos_anneal_ratio, beta_cap=beta_cap,
                  beta_min=beta_min)

    # ---- pass 1: geometry only (renderer.py:442-447) ----
    geo_opts = dataclasses.replace(opts, geometry_only=True, with_loss_aux=False)
    geo = render_scene(params, cfg, geo_opts, bitfield, rays_o, rays_d,
                       bg_color, aabb, key=k1, level_mask=level_mask,
                       normal_anneal_ratio=normal_anneal_ratio, **traced)
    normals = geo["normal_image"]
    depth = geo["depth"] - dt
    weights_sum = geo["weights_sum"]

    ref_mask = (depth != 0.0) & (weights_sum > 0.9)
    ray_mask = (depth != 0.0) & (weights_sum > 0.3)
    ref_o = rays_o + depth[:, None] * rays_d
    ref_d = reflect_dir(-rays_d, normals)
    if obj_aabb is not None:
        inside = jnp.all(ref_o > obj_aabb[:3], -1) & jnp.all(ref_o < obj_aabb[3:], -1)
        ref_mask = ref_mask & inside
    ref_mask = jax.lax.stop_gradient(ref_mask)
    ray_mask = jax.lax.stop_gradient(ray_mask)

    # ---- pass 2: secondary (reflected) rays, bg=0 (renderer.py:462-474) ----
    sec_opts = dataclasses.replace(
        opts,
        max_steps=iopts.indir_max_steps,
        early_stop_steps=iopts.indir_early_stop_steps,
        num_samples=iopts.indir_num_samples,
        min_near=dt * 2.0,
        geometry_only=False, with_loss_aux=False,
        grad_ray=iopts.grad_rays, grad_rays_scale=iopts.grad_rays_scale,
        use_bg_net=False)
    sec = render_scene(params, cfg, sec_opts, bitfield, ref_o, ref_d, 0.0,
                       aabb, key=k2, env_rot_radian=env_rot_radian,
                       level_mask=level_mask,
                       normal_anneal_ratio=normal_anneal_ratio, **traced)
    r_images = jnp.concatenate(
        [sec["image"], sec["weights_sum"][:, None]], axis=-1)        # [N, 4]
    r_images = jnp.where(ref_mask[:, None], r_images, 0.0)

    # ---- pass 3: main render fed with the reflection image ----
    main_opts = dataclasses.replace(opts, geometry_only=False, use_bg_net=False)
    results = render_scene(params, cfg, main_opts, bitfield, rays_o, rays_d,
                           bg_color, aabb, key=k3, r_images=r_images,
                           env_rot_radian=env_rot_radian, level_mask=level_mask,
                           normal_anneal_ratio=normal_anneal_ratio, **traced)
    results["normal_image"] = normals
    results["depth"] = depth
    results["ref_mask"] = ref_mask
    results["ray_mask"] = ray_mask
    results["r_images"] = r_images
    return results
