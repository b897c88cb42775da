"""Integrated Directional Encoding (IDE), Ref-NeRF eqs. 6-8 (arxiv 2112.03907).

Real-valued, pure-jnp reimplementation of the reference encoder
(``/root/reference/ide_encoder/ide_encoder.py:57-167``).  The complex-exponential
form ``(x+iy)^m`` is expanded with Euler's formula (mirroring the reference's
``forward_wo_j`` variant, ide_encoder.py:132-167) so the whole encoding runs in
fp32 on the VPU with no complex dtype.

The coefficient tables are tiny (deg<=5 → at most 36 basis pairs) and are baked
as compile-time numpy constants, so XLA folds them into the fused elementwise
graph.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


def _generalized_binomial_coeff(a: float, k: int) -> float:
    return float(np.prod(a - np.arange(k)) / math.factorial(k))


def _assoc_legendre_coeff(l: int, m: int, k: int) -> float:
    # Coefficient of cos^k(theta) * sin^m(theta) in P_l^m(cos theta).
    return (
        (-1) ** m
        * 2**l
        * math.factorial(l)
        / math.factorial(k)
        / math.factorial(l - k - m)
        * _generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l)
    )


def _sph_harm_coeff(l: int, m: int, k: int) -> float:
    return (
        math.sqrt(
            (2.0 * l + 1.0)
            * math.factorial(l - m)
            / (4.0 * math.pi * math.factorial(l + m))
        )
        * _assoc_legendre_coeff(l, m, k)
    )


@functools.lru_cache(maxsize=None)
def _ide_tables(deg_view: int):
    """(ml_array[2,P], mat[l_max+1,P], sigma[P]) as numpy constants."""
    ml_list = [(m, 2**i) for i in range(deg_view) for m in range(2**i + 1)]
    ml_array = np.array(ml_list, dtype=np.int64).T  # [2, P] rows: (m, l)
    l_max = 2 ** (deg_view - 1)
    mat = np.zeros((l_max + 1, ml_array.shape[1]), dtype=np.float64)
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)
    sigma = 0.5 * ml_array[1, :] * (ml_array[1, :] + 1)  # l(l+1)/2 vMF roll-off
    return ml_array, mat, sigma.astype(np.float64)


def ide_output_dim(deg_view: int) -> int:
    return (2**deg_view - 1 + deg_view) * 2


def ide_encode(xyz: jnp.ndarray, roughness=0.0, *, deg_view: int = 4) -> jnp.ndarray:
    """Integrated directional encoding of (approximately unit) directions.

    Args:
        xyz: [..., 3] direction vectors.
        roughness: kappa^-1 of the vMF lobe; scalar or broadcastable [..., 1].
        deg_view: number of SH degree octaves (l = 1, 2, 4, ... 2^(deg_view-1)).

    Returns:
        [..., (2^deg_view - 1 + deg_view) * 2] encoding (real parts ++ imag parts).
    """
    if deg_view > 5:
        raise ValueError("Only deg_view <= 5 is numerically stable.")
    ml_array, mat, sigma = _ide_tables(deg_view)
    dtype = xyz.dtype
    m_arr = jnp.asarray(ml_array[0], dtype=dtype)          # [P]
    mat_j = jnp.asarray(mat, dtype=dtype)                  # [l_max+1, P]
    sigma_j = jnp.asarray(sigma, dtype=dtype)              # [P]
    l_max = mat.shape[0] - 1

    x = xyz[..., 0:1]
    y = xyz[..., 1:2]
    z = xyz[..., 2:3]
    # Parity quirk: at exactly x=y=0 the reference nudges y to 1 to dodge
    # 0^0j (ide_encoder.py:114-115), making the +-z outputs i^m instead of 0.
    # Reproduced so shipped-checkpoint renders match bit-for-bit.
    zero_xy = jnp.logical_and(x == 0, y == 0)
    y = y + zero_xy.astype(dtype)

    # Vandermonde in z: z^k for k = 0..l_max (integer powers — safe for z<0).
    pow_level = jnp.arange(l_max + 1)
    vmz = z ** pow_level                                   # [..., l_max+1]
    z_component = vmz @ mat_j                              # [..., P]

    # (x + iy)^m by repeated complex multiplication — POLYNOMIAL in (x, y).
    # The reference's r^m * e^{i m atan2(y,x)} form (ide_encoder.py:151-157)
    # has singular gradients at x=y=0 (pow of r_sq and atan2 both blow up as
    # the direction approaches +-z — a reflection dir that occurs constantly);
    # the reference even carries a runtime NaN check (ide_encoder.py:125-128)
    # and leans on its AMP GradScaler to skip poisoned steps.  The recurrence
    # below is exactly equal in value with everywhere-smooth gradients.
    m_max = int(ml_array[0].max())
    re_pows = [jnp.ones_like(x)]
    im_pows = [jnp.zeros_like(x)]
    for _ in range(m_max):
        re_pows.append(re_pows[-1] * x - im_pows[-1] * y)
        im_pows.append(re_pows[-2] * y + im_pows[-1] * x)
    re_all = jnp.concatenate(re_pows, axis=-1)             # [..., m_max+1]
    im_all = jnp.concatenate(im_pows, axis=-1)
    m_idx = jnp.asarray(ml_array[0], jnp.int32)            # [P]
    vmxy_re = jnp.take(re_all, m_idx, axis=-1)             # [..., P]
    vmxy_im = jnp.take(im_all, m_idx, axis=-1)

    if isinstance(roughness, (int, float)):
        roughness = jnp.asarray(roughness, dtype=dtype)
    roughness = jnp.asarray(roughness, dtype=dtype)
    kappa_inv = roughness  # scalar or [..., 1]; broadcasts over P
    exp_scale = jnp.exp(-sigma_j * kappa_inv)              # [..., P]

    scaled_z = z_component * exp_scale
    ide_real = vmxy_re * scaled_z
    ide_imag = vmxy_im * scaled_z
    return jnp.concatenate([ide_real, ide_imag], axis=-1)
