"""Classic NeRF frequency (positional) encoding.

Mirrors the reference's FreqEncoder (``/root/reference/freqencoder/freq.py:55-77``
and the pure-torch fallback ``/root/reference/encoding.py:6-44``): output is
``[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{D-1} x), cos(2^{D-1} x)]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_output_dim(input_dim: int, degree: int) -> int:
    if degree <= 0:
        return input_dim
    return input_dim + input_dim * 2 * degree


def freq_encode(x: jnp.ndarray, *, degree: int) -> jnp.ndarray:
    """Positional encoding; identity when degree == 0 (``encoding.py:57-58``)."""
    if degree <= 0:
        return x
    freqs = 2.0 ** jnp.arange(degree, dtype=x.dtype)          # [D]
    xb = x[..., None, :] * freqs[:, None]                     # [..., D, C]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)      # [..., D, 2, C]
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)
