"""SDF -> density transforms and truncated-exp activation.

Reimplements LaplaceDensity / NeuSDensity / trunc_exp
(``/root/reference/nerf/network.py:17-102``, ``/root/reference/activation.py:5-18``)
as pure functions of a small params pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SQRT3 = 3.0**0.5


@jax.custom_vjp
def trunc_exp(x):
    """exp with gradient-input clamped to [-15, 15] (``activation.py:5-18``)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def laplace_beta(params, beta_min: float = 0.0001, beta_max: float = 1.0):
    """Clamped beta with straight-through gradient (``network.py:39-44``)."""
    beta = params["beta"]
    beta_clamp = jnp.clip(jax.lax.stop_gradient(beta), beta_min, beta_max)
    return beta + (beta_clamp - jax.lax.stop_gradient(beta))


def laplace_density(sdf, beta, alpha=None):
    """alpha * Laplace(0, beta).cdf(-sdf)  (``network.py:32-37``)."""
    if alpha is None:
        alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def init_laplace_params(init_beta: float = 0.1):
    return {"beta": jnp.asarray(init_beta, dtype=jnp.float32)}


def init_neus_params(init_variance: float = 0.3):
    return {"variance": jnp.asarray(init_variance, dtype=jnp.float32)}


def neus_alpha(
    sdf,
    variance,
    dirs=None,
    dists=None,
    gradients=None,
    cos_anneal_ratio: float = 1.0,
    n_detach: bool = False,
):
    """NeuS section-CDF alpha (``network.py:69-102``).

    sdf: [...]; dirs/gradients: [..., 3] or None; dists: [...] or scalar.
    Returns alpha in [0, 1] (NOT a sigma — composite with input_alpha=True).
    """
    inv_s = jnp.clip(jnp.exp(variance * 10.0), 1e-6, 1e6)
    if gradients is not None:
        g = jax.lax.stop_gradient(gradients) if n_detach else gradients
        true_cos = jnp.sum(dirs * g, axis=-1)
        iter_cos = -(
            jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
            + jax.nn.relu(-true_cos) * cos_anneal_ratio
        )  # always non-positive
        est_next = sdf + iter_cos * dists * 0.5
        est_prev = sdf - iter_cos * dists * 0.5
    else:
        est_next = sdf - dists * 0.5
        est_prev = sdf + dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)
