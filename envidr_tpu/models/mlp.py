"""Tiny-MLP building blocks on explicit param pytrees.

A "linear" is ``{'w': [in, out], 'b': [out]} `` (bias optional).  MLP stacks are
lists of linears.  Initialization mirrors the reference's ``init_seq`` /
``xavier_uniform_`` (``/root/reference/nerf/net_init.py:54-109``): hidden layers
get gain sqrt(2) (ReLU), the final layer gain 1; biases start at 0.

Matmuls are emitted with ``preferred_element_type=float32`` so the MXU
accumulates in fp32 even when params/activations are bf16.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def init_linear(key, in_dim: int, out_dim: int, *, bias: bool = True,
                init: str = "xavier_uniform", gain: float = 1.0, dtype=jnp.float32):
    if init == "xavier_uniform":
        std = gain * np.sqrt(2.0 / (in_dim + out_dim))
        lim = std * np.sqrt(3.0)
        w = jax.random.uniform(key, (in_dim, out_dim), dtype, -lim, lim)
    elif init == "kaiming":
        std = np.sqrt(2.0 / in_dim)
        w = std * jax.random.normal(key, (in_dim, out_dim), dtype)
    elif init == "torch_default":
        # torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(in))
        lim = 1.0 / np.sqrt(in_dim)
        w = jax.random.uniform(key, (in_dim, out_dim), dtype, -lim, lim)
    else:
        raise ValueError(f"unknown init {init}")
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def apply_linear(p, x):
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def init_mlp(key, dims: Sequence[int], *, bias: bool = True,
             init: str = "xavier_uniform", hidden_gain: float = np.sqrt(2.0),
             dtype=jnp.float32):
    """dims = [in, h1, ..., out]; returns list of linears.

    Matches ``init_seq`` (net_init.py:96-109): ReLU gain for all but the last
    layer, which uses gain 1.
    """
    layers = []
    n = len(dims) - 1
    keys = jax.random.split(key, n)
    for i in range(n):
        gain = hidden_gain if i < n - 1 else 1.0
        layers.append(init_linear(keys[i], dims[i], dims[i + 1],
                                  bias=bias, init=init, gain=gain, dtype=dtype))
    return layers


def apply_mlp(layers, x, act: Callable = jax.nn.relu, final_act: Callable | None = None):
    n = len(layers)
    for i, p in enumerate(layers):
        x = apply_linear(p, x)
        if i < n - 1:
            x = act(x)
    if final_act is not None:
        x = final_act(x)
    return x


def softplus_beta(x, beta: float = 100.0):
    """torch Softplus(beta): (1/beta) log(1 + exp(beta x)), linear above 20/beta."""
    return jnp.where(x * beta > 20.0, x, jax.nn.softplus(x * beta) / beta)


def unit_norm(x, eps: float = 1e-12):
    """F.normalize(dim=-1) semantics (clamps the norm from below)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def feat_act(x, kind: str):
    """geo_feat / env_feat activation menu (``network.py:432-440, 538-546``)."""
    if kind == "" or kind is None:
        return x
    if kind == "tanh":
        return jnp.tanh(x)
    if kind == "unitNorm":
        return unit_norm(x)
    if kind == "instanceNorm":
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True, ddof=1)
        return (x - mean) / jnp.sqrt(var + 1e-5)
    raise ValueError(f"unknown feat act {kind}")
