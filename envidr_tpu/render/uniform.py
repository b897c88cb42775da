"""Grid-free uniform + importance-sampled volume rendering.

Reimplements the reference's pure-torch path ``run``
(``/root/reference/nerf/render_func/non_cuda_ray.py:13-182``) and
``sample_pdf`` (``render_func/utils.py:4-38``): stratified uniform samples in
[near, far], optional PDF upsampling from the coarse weights, single fused
density+color query, cumprod compositing.  Static shapes throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from envidr_tpu.geometry.rays import near_far_from_aabb
from envidr_tpu.models.network import (
    NetworkConfig, _safe_normalize, geometry_with_normals,
    get_color_mlp_extra_params, forward_color, sdf_to_sigma,
)
from envidr_tpu.ops.compositing import alphas_from_sigmas, weights_from_alphas


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               det: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling of new z values (render_func/utils.py:4-38).

    bins: [N, T+1] edges; weights: [N, T]; returns [N, n_samples].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, T+1]
    if det:
        u = jnp.linspace(0.0 + 0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))
    idx = jnp.sum((u[..., None, :] >= cdf[..., :, None]).astype(jnp.int32),
                  axis=-2)                                      # searchsorted
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 1)
    above = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, jnp.clip(below, 0, bins.shape[-1] - 1), -1)
    bin_a = jnp.take_along_axis(bins, jnp.clip(above, 0, bins.shape[-1] - 1), -1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bin_b + t * (bin_a - bin_b)


@dataclasses.dataclass(frozen=True)
class UniformRenderOptions:
    num_steps: int = 128
    upsample_steps: int = 0
    min_near: float = 0.2
    density_scale: float = 1.0
    perturb: bool = False
    training: bool = False
    T_thresh: float = 0.0


def render_uniform(
    params, cfg: NetworkConfig, opts: UniformRenderOptions,
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, bg_color, aabb: jnp.ndarray, *,
    key: Optional[jax.Array] = None, env_index=0, material=None,
    level_mask=None,
) -> Dict[str, Any]:
    N = rays_o.shape[0]
    T = opts.num_steps
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, opts.min_near)
    nears = jnp.where(nears > 1e9, 2.0, nears)   # missed rays: dummy interval
    fars_c = jnp.where(fars > 1e9, 2.0 + 1e-3, fars)
    miss = fars > 1e9

    z = jnp.linspace(0.0, 1.0, T)
    z_vals = nears[:, None] + (fars_c - nears)[:, None] * z[None, :]
    if opts.perturb and key is not None:
        key, sub = jax.random.split(key)
        dz = (fars_c - nears)[:, None] / T
        z_vals = z_vals + (jax.random.uniform(sub, z_vals.shape) - 0.5) * dz

    def query_sigma(zv):
        xyz = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        xyz = jnp.clip(xyz, -cfg.bound, cfg.bound)
        geo = geometry_with_normals(params, cfg, xyz, material, level_mask,
                                    need_normals=False)[0]
        sdf = geo.get("sdf")
        sig = sdf_to_sigma(params, cfg, sdf) if cfg.use_sdf else geo["sigma"]
        return sig

    if opts.upsample_steps > 0:
        sig_c = query_sigma(z_vals)
        deltas_c = jnp.diff(z_vals, axis=-1)
        deltas_c = jnp.concatenate(
            [deltas_c, 1e4 * jnp.ones_like(deltas_c[..., :1])], -1)
        w_c = weights_from_alphas(
            alphas_from_sigmas(opts.density_scale * sig_c, deltas_c))
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        bins = jnp.concatenate([z_vals[..., :1], mids, z_vals[..., -1:]], -1)
        key, sub = jax.random.split(key) if key is not None else (None, None)
        new_z = sample_pdf(sub if sub is not None else jax.random.PRNGKey(0),
                           bins, w_c, opts.upsample_steps,
                           det=not opts.training)
        z_vals = jnp.sort(jnp.concatenate([z_vals, new_z], -1), axis=-1)
        T = T + opts.upsample_steps

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    xyz = jnp.clip(xyz, -cfg.bound, cfg.bound)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)
    geo, normals, sdf_gradients = geometry_with_normals(
        params, cfg, xyz, material, level_mask, need_normals=True)
    sigmas = opts.density_scale * (
        sdf_to_sigma(params, cfg, geo["sdf"], dirs=dirs,
                     dists=jnp.gradient(z_vals, axis=-1), normals=normals)
        if cfg.use_sdf else geo["sigma"])
    sigmas = jnp.where(miss[:, None], 0.0, sigmas)

    roughness = geo["roughness"]
    if roughness is None:
        roughness = jnp.full_like(sigmas[..., None], cfg.default_roughness)
    normals_enc, w_r_enc, n_dot_w_o, n_env_enc = get_color_mlp_extra_params(
        params, cfg, normals, dirs, roughness)
    rgbs, aux = forward_color(params, cfg, geo["geo_feat"], dirs, normals_enc,
                              w_r_enc, n_dot_w_o, env_index=env_index,
                              n_env_enc=n_env_enc, roughness=roughness,
                              blend_weight=geo["blend_weight"])

    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, 1e4 * jnp.ones_like(deltas[..., :1])], -1)
    alphas = sigmas if cfg.use_neus_sdf else alphas_from_sigmas(sigmas, deltas)
    weights = weights_from_alphas(alphas, T_thresh=opts.T_thresh)
    weights_sum = jnp.sum(weights, axis=-1)
    bg = jnp.broadcast_to(jnp.asarray(bg_color, rays_o.dtype), (N, 3))
    image = jnp.sum(weights[..., None] * rgbs, axis=-2) \
        + (1.0 - weights_sum[..., None]) * bg
    depth = jnp.sum(weights * z_vals, axis=-1)

    out = {"image": image, "depth": depth, "weights_sum": weights_sum,
           "sdfs": geo.get("sdf"), "sigmas": sigmas}
    if sdf_gradients is not None:
        out["sdf_gradients"] = sdf_gradients
    if normals is not None:
        n_img = jnp.sum(weights[..., None] * jax.lax.stop_gradient(normals), -2)
        # smooth normalization: the hard max-guard's backward is NaN at an
        # exactly-zero composite (background rays) — see render/scene.py
        out["normal_image"] = _safe_normalize(n_img)
    return out
