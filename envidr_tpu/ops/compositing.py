"""Volumetric compositing over fixed-length sample axes.

TPU-native replacement for the reference's CUDA per-ray compositing loops
(``/root/reference/raymarching/src/raymarching.cu:530-821`` and the pure-torch
cumprod path ``/root/reference/nerf/render_func/sph_ray.py:103-109``).

Everything is a dense [N_rays, S] computation: transmittance via an exclusive
cumulative product; invalid samples carry sigma = 0 (alpha = 0) so masking is
free.  Gradients come from autodiff of the scan — mathematically identical to
the reference's hand-written suffix-sum backward (``raymarching.cu:732-821``).
"""

from __future__ import annotations

import jax.numpy as jnp


def alphas_from_sigmas(sigmas: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """alpha_i = 1 - exp(-delta_i * sigma_i)."""
    return 1.0 - jnp.exp(-deltas * sigmas)


def weights_from_alphas(alphas: jnp.ndarray, T_thresh: float = 0.0) -> jnp.ndarray:
    """w_i = alpha_i * prod_{j<i} (1 - alpha_j + 1e-15)  (``sph_ray.py:106-107``).

    If T_thresh > 0, samples whose incoming transmittance has dropped below the
    threshold are zeroed (the CUDA kernels' early break, ``raymarching.cu:599``).
    """
    one_minus = 1.0 - alphas + 1e-15
    # exclusive cumprod: T_0 = 1, T_i = prod_{j<i} (1 - alpha_j)
    T = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]], axis=-1), axis=-1)
    w = alphas * T
    if T_thresh > 0.0:
        w = jnp.where(T > T_thresh, w, 0.0)
    return w


def composite(
    weights: jnp.ndarray,          # [N, S]
    values: jnp.ndarray,           # [N, S, C]
) -> jnp.ndarray:
    """sum_i w_i * v_i -> [N, C]."""
    return jnp.sum(weights[..., None] * values, axis=-2)


def composite_rays(
    sigmas: jnp.ndarray,           # [N, S] (or alphas if input_alpha)
    rgbs: jnp.ndarray,             # [N, S, C]
    deltas: jnp.ndarray,           # [N, S]
    z_vals: jnp.ndarray,           # [N, S]
    *,
    input_alpha: bool = False,
    T_thresh: float = 0.0,
):
    """Full train-time composite: returns (weights_sum[N], depth[N], image[N,C], weights[N,S]).

    Mirrors ``kernel_composite_rays_train_forward`` (``raymarching.cu:530-608``)
    incl. the NeuS input-alpha mode (sigma already an alpha).
    """
    alphas = sigmas if input_alpha else alphas_from_sigmas(sigmas, deltas)
    weights = weights_from_alphas(alphas, T_thresh=T_thresh)
    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * z_vals, axis=-1)
    image = composite(weights, rgbs)
    return weights_sum, depth, image, weights
