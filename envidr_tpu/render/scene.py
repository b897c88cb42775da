"""Scene-mode renderer: occupancy-grid marched, masked-dense volume rendering.

Reimplements ``run_cuda`` (``/root/reference/nerf/render_func/cuda_ray.py:15-364``)
— both the training branch (march -> geometry -> color -> composite) and the
inference branch — as ONE static-shape path.  The reference's alive-ray
``while`` loop (:277-346) is a GPU latency optimization; on TPU a fixed
K-sample budget with occupancy culling + transmittance masking does the same
work in a single fused launch, with K chosen from the running mean sample
count (the ``mean_count`` mechanism, renderer.py:354-357).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from envidr_tpu.geometry.rays import near_far_from_aabb, sph_from_ray
from envidr_tpu.models.network import (
    NetworkConfig, _safe_normalize, background_color, forward_color,
    geometry_with_normals, get_color_mlp_extra_params, sdf_to_sigma,
)
from envidr_tpu.ops.compositing import alphas_from_sigmas, weights_from_alphas
from envidr_tpu.ops.marching import march_rays


@dataclasses.dataclass(frozen=True)
class SceneRenderOptions:
    """Static render knobs (jit-static; derived per step by the scheduler)."""

    max_steps: int = 1024
    num_samples: int = 128          # K: static per-ray sample budget
    early_stop_steps: int = -1
    dt_gamma: float = 0.0
    T_thresh: float = 1e-4
    density_scale: float = 1.0
    min_near: float = 0.2
    grid_size: int = 128
    perturb: bool = False
    training: bool = False
    need_normals: bool = True
    geometry_only: bool = False
    with_loss_aux: bool = False     # relsdf/backsdf/orientation sample outputs
    grad_ray: bool = False          # secondary-ray gradient re-attachment
    grad_rays_scale: float = 0.01
    cos_anneal_ratio: float = 1.0
    use_bg_net: bool = False        # bg_radius > 0 and bg model present
    # per-sample stratified jitter AFTER the march instead of perturbing the
    # march itself (cuda_ray.py:78-88)
    stratified_sampling: bool = False
    # two-level occupancy march (ops/marching._march_rays_coarse): ~2.7x
    # fewer gather rows; falls back to the dense march when its
    # restrictions do not hold
    coarse_march: bool = False


def render_scene(
    params,
    cfg: NetworkConfig,
    opts: SceneRenderOptions,
    bitfield: jnp.ndarray,          # [CAS, H^3] bool occupancy
    rays_o: jnp.ndarray,            # [N, 3]
    rays_d: jnp.ndarray,            # [N, 3]
    bg_color,                       # scalar | [3] | [N, 3]
    aabb: jnp.ndarray,              # [6]
    *,
    key: Optional[jax.Array] = None,
    r_images: Optional[jnp.ndarray] = None,   # [N, C] per-ray reflection image
    env_rot_radian=None,
    level_mask: Optional[jnp.ndarray] = None,
    normal_anneal_ratio: float = 1.0,
    cos_anneal_ratio=None,          # traced override of opts.cos_anneal_ratio
    beta_cap=None,                  # traced upper bound on Laplace beta
    beta_min=None,                  # traced override of cfg.beta_min floor
    nears_fars=None,                # optional precomputed (nears, fars)
) -> Dict[str, Any]:
    N = rays_o.shape[0]
    K = opts.num_samples

    if nears_fars is None:
        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, opts.min_near)
    else:
        nears, fars = nears_fars

    if opts.use_bg_net and cfg.bg_radius > 0:
        sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
        bg = background_color(params, cfg, sph, rays_d)       # [N, 3]
    else:
        bg = jnp.broadcast_to(jnp.asarray(bg_color, rays_o.dtype), (N, 3))

    m = march_rays(
        rays_o, rays_d, nears, fars, bitfield,
        bound=cfg.bound, grid_size=opts.grid_size, dt_gamma=opts.dt_gamma,
        max_steps=opts.max_steps, num_samples=K,
        early_stop_steps=opts.early_stop_steps,
        perturb_key=(key if opts.perturb and not opts.stratified_sampling
                     else None),
        coarse_march=opts.coarse_march)

    xyzs = m.xyzs                                             # [N, K, 3]
    dts = m.dts
    if opts.stratified_sampling and opts.training and key is not None:
        # stratified jitter of the marched samples (cuda_ray.py:78-88):
        # roll-differenced noise so consecutive segment lengths stay
        # consistent while each sample moves within +-0.5 dt
        dt_base = 2.0 * 1.7320508075688772 / opts.max_steps
        noise = (jax.random.uniform(jax.random.fold_in(key, 17), dts.shape)
                 * 2.0 - 1.0) * 0.5 * dt_base
        strat = jnp.roll(noise, 1, axis=1) - noise
        dts = dts + strat
        xyzs = xyzs + strat[..., None] * rays_d[:, None, :]
    if opts.grad_ray:
        # re-attach sample positions to ray origins so image gradients flow
        # into secondary-ray origins (cuda_ray.py:100-105)
        s = opts.grad_rays_scale
        xyzs = xyzs - s * jax.lax.stop_gradient(rays_o)[:, None, :] \
            + s * rays_o[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)

    # the color MLPs structurally require normals whenever any normal-derived
    # feature is enabled (cuda_ray.py:32-35)
    need_normals = opts.need_normals or (not opts.geometry_only and (
        cfg.normal_with_mlp or cfg.use_reflected_dir or cfg.use_n_dot_viewdir
        or cfg.diffuse_with_env)) or cfg.use_neus_sdf
    geo, normals, sdf_gradients = geometry_with_normals(
        params, cfg, xyzs, None, level_mask,
        need_normals=need_normals, normal_anneal_ratio=normal_anneal_ratio)
    sdfs = geo["sdf"] if cfg.use_sdf else -geo["sigma"]       # [N, K]
    roughness = geo["roughness"]
    if roughness is None:
        roughness = jnp.full_like(sdfs[..., None], cfg.default_roughness)

    if cfg.use_sdf:
        sigmas = sdf_to_sigma(
            params, cfg, geo["sdf"], dirs=dirs, dists=dts, normals=normals,
            cos_anneal_ratio=(opts.cos_anneal_ratio if cos_anneal_ratio is None
                              else cos_anneal_ratio), beta_cap=beta_cap,
            beta_min=beta_min)
    else:
        sigmas = geo["sigma"]
    sigmas = jnp.where(m.mask, opts.density_scale * sigmas, 0.0)

    alphas = sigmas if cfg.use_neus_sdf else alphas_from_sigmas(sigmas, dts)
    weights = weights_from_alphas(alphas, T_thresh=opts.T_thresh)
    weights = jnp.where(m.mask, weights, 0.0)
    weights_sum = jnp.sum(weights, axis=-1)                   # [N]
    depth = jnp.sum(weights * m.z_vals, axis=-1)
    depth = (depth + nears) * (depth != 0.0)

    results: Dict[str, Any] = {
        "weights_sum": weights_sum,
        "depth": depth,
        "sigmas": sigmas,
        "sdfs": sdfs,
        "counts": m.counts,
        "mask": m.mask,
    }
    if sdf_gradients is not None:
        results["sdf_gradients"] = jnp.where(
            m.mask[..., None], sdf_gradients, 0.0)
        results["weights"] = weights

    if opts.geometry_only:
        n_img = jnp.sum(weights[..., None] * normals, axis=-2)
        # smooth normalization, NOT x/max(|x|,eps): background rays composite
        # to an exactly-zero n_img, where the hard form's backward is
        # 0/0=NaN even under a zero cotangent — and the indirect pass pulls
        # gradient through this image (ref_d), which froze the r5 shiny3
        # indir arm via apply_if_finite skipping every step (notfinite_count
        # == total_notfinite from the switch-on epoch).
        results["normal_image"] = _safe_normalize(n_img)
        results["image"] = None
        results["sphere_bg"] = bg if opts.use_bg_net else None
        return results

    normals_enc, w_r_enc, n_dot_w_o, n_env_enc = get_color_mlp_extra_params(
        params, cfg, normals, dirs, roughness, env_rot_radian)
    r_in = None
    if r_images is not None:
        r_in = jnp.broadcast_to(
            r_images[:, None, :], (N, K, r_images.shape[-1]))

    rgbs, aux = forward_color(
        params, cfg, geo["geo_feat"], dirs, normals_enc, w_r_enc, n_dot_w_o,
        n_env_enc=n_env_enc, r_images=r_in, roughness=roughness,
        blend_weight=geo["blend_weight"])

    image = jnp.sum(weights[..., None] * rgbs, axis=-2)
    image = image + (1.0 - weights_sum[..., None]) * bg
    results["image"] = image

    if normals is not None:
        n_img = jnp.sum(weights[..., None] * jax.lax.stop_gradient(normals), axis=-2)
        # smooth form: the hard max-guard NaNs in backward at n_img == 0
        # (see the geometry_only branch above); gradient still flows via
        # the weights even though normals are detached here
        results["normal_image"] = _safe_normalize(n_img)
    if cfg.use_diffuse and not cfg.diffuse_only:
        results["diffuse_image"] = (
            jnp.sum(weights[..., None] * aux["c_diffuse"], axis=-2)
            + (1.0 - weights_sum[..., None]) * bg)
        results["specular_image"] = (
            jnp.sum(weights[..., None] * aux["c_specular"], axis=-2)
            + (1.0 - weights_sum[..., None]) * bg)
    results["roughness_image"] = jnp.sum(weights[..., None] * roughness, axis=-2)
    results["roughness"] = roughness
    if "renv_mask" in aux:   # indirect-branch observability (renv probe)
        results["renv_mask_image"] = jnp.sum(
            weights * aux["renv_mask"].astype(jnp.float32), axis=-1)
        results["blend_image"] = jnp.sum(
            weights[..., None] * aux["blend"], axis=-2)

    if opts.with_loss_aux:
        # consecutive-sample SDF relations (cuda_ray.py:173-211), compacted:
        # slot k & k+1 of a ray are consecutive marched samples.
        gap = m.ts[..., 1:] - m.ts[..., :-1]                  # dist k -> k+1
        point_mask = m.mask[..., :-1] & m.mask[..., 1:]
        # continuity: gap < 1.2 * dt of the *next* sample (no voxel skip between)
        point_mask = point_mask & (gap < 1.2 * dts[..., 1:])
        relsdf = sdfs[..., 1:] - sdfs[..., :-1]
        cos = jnp.sum(dirs * jax.lax.stop_gradient(normals), axis=-1) \
            if normals is not None else jnp.zeros_like(sdfs)
        est_relsdf = gap * cos[..., :-1]
        results.update(
            relsdf=relsdf, est_relsdf=est_relsdf, cos=cos[..., :-1],
            point_mask=point_mask, sdf_weights=weights[..., :-1], sdf_dist=gap)

    if opts.use_bg_net:
        results["sphere_bg"] = bg
    return results
