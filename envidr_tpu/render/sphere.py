"""Sphere-mode renderer: thin-shell sampling around an analytic sphere.

Reimplements ``run_sph`` (``/root/reference/nerf/render_func/sph_ray.py:34-221``)
with fully static shapes: every ray computes the full S-sample shell; rays that
miss the sphere are masked (weights zeroed) instead of boolean-gathered.  This
is the fixed-sample, compaction-free pipeline — the ideal TPU workload
(SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from envidr_tpu.geometry.rays import sphere_intersections
from envidr_tpu.models.network import (
    NetworkConfig, _safe_normalize, forward_geometry, geometry_with_normals,
    get_color_mlp_extra_params, forward_color, sdf_to_sigma,
)
from envidr_tpu.ops.compositing import alphas_from_sigmas, weights_from_alphas


@dataclasses.dataclass(frozen=True)
class SphereRenderOptions:
    """Static knobs of the sphere render (jit-static)."""

    num_step: int = 12
    step_size: float = 0.002
    radius: float = 0.95          # opt.env_sph_radius
    density_scale: float = 1.0
    perturb: bool = False
    need_normals: bool = True     # any normal-dependent feature on
    training: bool = False
    with_surf_sdf: bool = False   # sdf_loss surface samples (sph_ray.py:160-163)
    with_backsdf: bool = False    # relsdf outputs (sph_ray.py:165-178)


def render_sphere(
    params,
    cfg: NetworkConfig,
    opts: SphereRenderOptions,
    rays_o: jnp.ndarray,          # [N, 3]
    rays_d: jnp.ndarray,          # [N, 3]
    bg_color,                     # scalar | [3] | [N, 3]
    *,
    material: Optional[dict] = None,
    env_index=0,
    r_images: Optional[jnp.ndarray] = None,   # [N, C] per-ray (train_renv)
    key: Optional[jax.Array] = None,
    level_mask: Optional[jnp.ndarray] = None,
    normal_anneal_ratio: float = 1.0,
    env_rot_radian=None,
) -> Dict[str, Any]:
    N = rays_o.shape[0]
    S = opts.num_step
    dtype = rays_o.dtype
    bg = jnp.broadcast_to(jnp.asarray(bg_color, dtype), (N, 3))

    nears, fars, mask = sphere_intersections(rays_o, rays_d, opts.radius)
    maskf = mask.astype(dtype)

    z_radius = opts.step_size * (S - 1) / 2.0
    z_vals = jnp.linspace(-z_radius, z_radius, S, dtype=dtype)[None, :] + nears  # [N, S]
    if opts.perturb and key is not None:
        z_vals = z_vals + (jax.random.uniform(key, z_vals.shape, dtype) - 0.5) * opts.step_size

    dirs = rays_d[:, None, :]                                   # [N, 1, 3]
    xyzs = rays_o[:, None, :] + dirs * z_vals[..., None]        # [N, S, 3]

    geo, normals, sdf_gradients = geometry_with_normals(
        params, cfg, xyzs, material, level_mask,
        need_normals=opts.need_normals, normal_anneal_ratio=normal_anneal_ratio)
    sdfs = geo["sdf"]                                           # [N, S]
    roughness = geo["roughness"]
    if roughness is None:
        roughness = jnp.full_like(sdfs[..., None], cfg.default_roughness)

    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], opts.step_size)], axis=-1)

    sigmas = opts.density_scale * sdf_to_sigma(
        params, cfg, sdfs, dirs=jnp.broadcast_to(dirs, xyzs.shape),
        dists=deltas, normals=normals)

    dirs_b = jnp.broadcast_to(dirs, xyzs.shape)
    normals_enc, w_r_enc, n_dot_w_o, n_env_enc = get_color_mlp_extra_params(
        params, cfg, normals, dirs_b, roughness, env_rot_radian)
    if normals_enc is not None and not opts.training:
        normals_enc = jax.lax.stop_gradient(normals_enc)

    r_in = None
    if r_images is not None:
        r_in = jnp.broadcast_to(r_images[:, None, :], (N, S, r_images.shape[-1]))

    rgbs, aux = forward_color(
        params, cfg, geo["geo_feat"], dirs_b, normals_enc, w_r_enc, n_dot_w_o,
        env_index=env_index, n_env_enc=n_env_enc, r_images=r_in,
        roughness=roughness, blend_weight=geo["blend_weight"])

    alphas = sigmas if cfg.use_neus_sdf else alphas_from_sigmas(sigmas, deltas)
    weights = weights_from_alphas(alphas) * maskf[:, None]       # miss rays -> 0
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)       # [N, 1]

    # depth normalized exactly like sph_ray.py:112-115
    ori_z = jnp.clip((z_vals - nears) / (jnp.max(fars) - nears), 0.0, 1.0)
    depth = jnp.sum(weights * ori_z, axis=-1) * maskf

    image_m = jnp.sum(weights[..., None] * rgbs, axis=-2)
    image_m = image_m + (1.0 - weights_sum) * bg
    image = jnp.where(mask[:, None], image_m, bg)

    results: Dict[str, Any] = {
        "image": image,
        "depth": depth,
        "weights_sum": weights_sum[..., 0] * maskf,
        "sigmas": sigmas,
        "sdfs": sdfs,
        "mask": mask,
    }
    if sdf_gradients is not None:
        results["sdf_gradients"] = sdf_gradients

    if normals is not None:
        n_img = jnp.sum(weights[..., None] * jax.lax.stop_gradient(normals), axis=-2)
        n_img = _safe_normalize(n_img)  # smooth: hard guard NaNs in backward at 0
        results["normal_image"] = jnp.where(mask[:, None], n_img, 0.0)

    if cfg.use_diffuse and not cfg.diffuse_only:
        for name, c in (("diffuse_image", aux["c_diffuse"]),
                        ("specular_image", aux["c_specular"])):
            img = jnp.sum(weights[..., None] * c, axis=-2) + (1.0 - weights_sum) * bg
            results[name] = jnp.where(mask[:, None], img, bg)
    r_img = jnp.sum(weights[..., None] * roughness, axis=-2)
    results["roughness_image"] = jnp.where(mask[:, None], r_img, 0.0)

    if opts.with_surf_sdf:
        surf_xyzs = rays_o[:, None, :] + dirs * nears[..., None]
        surf_geo = forward_geometry(params, cfg, surf_xyzs, material, level_mask)
        results["surf_sdfs"] = surf_geo["sdf"][..., 0] * maskf  # [N]

    if opts.with_backsdf:
        relsdf = sdfs[..., 1:] - sdfs[..., :-1]
        results["relsdf"] = relsdf
        results["sdf_weights"] = weights[..., :-1]
        results["sdf_dist"] = deltas[..., :-1]
        if normals is not None:
            cos = jnp.sum(dirs_b * jax.lax.stop_gradient(normals), axis=-1)
            results["cos"] = cos[..., :-1]

    return results
