"""Multiresolution hash-grid encoder (Instant-NGP), TPU-native.

Reimplements the reference's differentiable hash encoder
(``/root/reference/hashencoder/src/hashencoder.cu:35-254``,
``/root/reference/hashencoder/hashgrid.py:110-168``) and the non-smoothstep
grid encoder (``/root/reference/gridencoder/src/gridencoder.cu:35-120``).

Design notes (TPU-first):
  * The encoder is expressed as pure jnp gathers + elementwise interpolation.
    XLA lowers the gathers to dynamic-slice loads from the HBM-resident table;
    everything else fuses onto the VPU.  Because it is plain jnp, ``jax.grad``
    composes to ANY order — the eikonal / normal losses' double backward
    (hand-written as three CUDA kernels in the reference,
    ``hashencoder.cu:376-434``) falls out of autodiff for free.
  * Per-level geometry (resolution, offset, dense-vs-hashed) is static Python
    metadata; the level loop unrolls at trace time into 16 parallel gathers
    that XLA batches into one fused region.
  * Hash arithmetic runs in uint32 with natural wraparound, matching
    ``fast_hash`` (``hashencoder.cu:35-52``) bit-for-bit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multiresolution hash grid (hashable; jit-static)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    desired_resolution: int | None = 2048
    interpolation: str = "smoothstep"  # 'smoothstep' (hashgrid_diff) | 'linear'

    # derived (filled in __post_init__)
    scale_factor: float = dataclasses.field(init=False)
    offsets: Tuple[int, ...] = dataclasses.field(init=False)
    resolutions: Tuple[int, ...] = dataclasses.field(init=False)
    scales: Tuple[float, ...] = dataclasses.field(init=False)

    def __post_init__(self):
        s = self.per_level_scale
        if self.desired_resolution is not None:
            # hashgrid.py:114-116 — desired_resolution overrides per_level_scale
            s = float(
                np.exp2(np.log2(self.desired_resolution / self.base_resolution)
                        / max(self.num_levels - 1, 1)))
        object.__setattr__(self, "scale_factor", s)
        log2_s = np.log2(s)
        max_params = 2**self.log2_hashmap_size
        offsets, resolutions, scales = [], [], []
        offset = 0
        for lvl in range(self.num_levels):
            # hashencoder.cu:150-152: scale = exp2(level*S)*H - 1; res = ceil(scale)+1
            scale = float(np.exp2(lvl * log2_s) * self.base_resolution - 1.0)
            resolution = int(np.ceil(scale)) + 1
            params_in_level = min(max_params, resolution**self.input_dim)
            offsets.append(offset)
            offset += params_in_level
            resolutions.append(resolution)
            scales.append(scale)
        offsets.append(offset)
        object.__setattr__(self, "offsets", tuple(offsets))
        object.__setattr__(self, "resolutions", tuple(resolutions))
        object.__setattr__(self, "scales", tuple(scales))

    @property
    def table_size(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_hash_params(key, spec: HashGridSpec, std: float = 1e-4, dtype=jnp.float32):
    """U(-1e-4, 1e-4) init (``hashgrid.py:150-152``)."""
    emb = jax.random.uniform(
        key, (spec.table_size, spec.level_dim), dtype=dtype, minval=-std, maxval=std)
    return {"embeddings": emb}


def _corner_indices(pos_grid: jnp.ndarray, level: int, spec: HashGridSpec):
    """Flat table index for integer grid coords pos_grid[..., D] at `level`.

    Mirrors ``get_grid_index`` (``hashencoder.cu:55-72``): dense row-major index
    when resolution^D fits the per-level table, else prime-XOR fast_hash; both
    reduced mod hashmap_size.
    """
    D = spec.input_dim
    resolution = spec.resolutions[level]
    hashmap_size = spec.offsets[level + 1] - spec.offsets[level]
    pg = pos_grid.astype(jnp.uint32)
    if resolution**D <= hashmap_size:
        stride = 1
        index = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(D):
            index = index + pg[..., d] * jnp.uint32(stride)
            stride *= resolution
    else:
        index = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(D):
            index = index ^ (pg[..., d] * jnp.uint32(_PRIMES[d]))
    return (index % jnp.uint32(hashmap_size)).astype(jnp.int32)


def hash_encode(
    inputs: jnp.ndarray,
    embeddings: jnp.ndarray,
    spec: HashGridSpec,
) -> jnp.ndarray:
    """Encode inputs in [0, 1]^D -> [..., L*C].

    Out-of-bound samples produce zeros (``hashencoder.cu:126-148``).
    Differentiable to any order w.r.t. both inputs and embeddings.
    """
    D = spec.input_dim
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)  # [B, 1]

    level_outputs = []
    for lvl in range(spec.num_levels):
        scale = spec.scales[lvl]
        resolution = spec.resolutions[lvl]
        pos = x * scale                              # hashencoder.cu:160 (no +0.5)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        # No clamp: a +1 corner that lands at `resolution` carries interpolation
        # weight exactly 0, and the mod-hashmap reduction keeps it in-bounds —
        # same behavior as the unclamped CUDA kernel (hashencoder.cu:155-205).
        pos_grid = pos_grid.astype(jnp.int32)
        if spec.interpolation == "smoothstep":
            w = frac * frac * (3.0 - 2.0 * frac)     # hashencoder.cu:87-89
        else:
            w = frac
        table = jax.lax.dynamic_slice_in_dim(
            embeddings, spec.offsets[lvl],
            spec.offsets[lvl + 1] - spec.offsets[lvl], axis=0)
        acc = 0.0
        for corner in range(2**D):
            weight = jnp.ones(x.shape[:-1], dtype=x.dtype)
            offs = []
            for d in range(D):
                if corner & (1 << d):
                    weight = weight * w[..., d]
                    offs.append(1)
                else:
                    weight = weight * (1.0 - w[..., d])
                    offs.append(0)
            idx = _corner_indices(pos_grid + jnp.asarray(offs, dtype=jnp.int32),
                                  lvl, spec)
            vals = jnp.take(table, idx, axis=0)      # [B, C]
            acc = acc + weight[..., None] * vals
        level_outputs.append(acc)

    out = jnp.concatenate(level_outputs, axis=-1)    # [B, L*C]
    out = jnp.where(oob, 0.0, out)
    return out.reshape(*prefix, spec.output_dim)


def hash_encode_from_world(
    xyz: jnp.ndarray, embeddings: jnp.ndarray, spec: HashGridSpec, bound: float = 1.0
) -> jnp.ndarray:
    """World coords in [-bound, bound] -> [0,1] -> encode (``hashgrid.py:157-168``)."""
    return hash_encode((xyz + bound) / (2.0 * bound), embeddings, spec)
