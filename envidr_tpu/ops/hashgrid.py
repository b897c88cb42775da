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
    # 'hash': reference-exact prime-XOR hashing (8 row-gathers/level-sample).
    # 'rolled_tiled': TPU-fast path — tiled (dense-mod-S) indexing; the 8
    #   corner offsets become STATIC rolls of each level's table, so a
    #   per-step corner-blocked table [S, 8C] serves each sample with ONE
    #   row gather (8x fewer gather/scatter rows; XLA row-gathers are the
    #   bottleneck op on TPU).  Dense levels (res^3 <= S) are numerically
    #   IDENTICAL to the reference; hashed levels trade prime-XOR collisions
    #   for tiled aliasing (torch-ngp's gridtype='tiled').
    indexing: str = "hash"
    # 'bfloat16' halves the gather/scatter bytes of the rolled path (XLA
    # gathers are byte-capped ~2 GB/s); interpolation still runs in f32.
    table_dtype: str = "float32"

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


def _level_constants(spec: HashGridSpec):
    """Per-level constants as stacked arrays (for the vmapped level body)."""
    L = spec.num_levels
    D = spec.input_dim
    sizes = np.array([spec.offsets[l + 1] - spec.offsets[l] for l in range(L)],
                     np.uint32)
    dense = np.array([spec.resolutions[l] ** D <= sizes[l] for l in range(L)],
                     bool)
    return (
        np.array(spec.scales, np.float32),
        np.array(spec.resolutions, np.uint32),
        sizes,
        dense,
        int(sizes.max()),
    )


def hash_encode(
    inputs: jnp.ndarray,
    embeddings: jnp.ndarray,
    spec: HashGridSpec,
) -> jnp.ndarray:
    """Encode inputs in [0, 1]^D -> [..., L*C].

    Out-of-bound samples produce zeros (``hashencoder.cu:126-148``).
    Differentiable to any order w.r.t. both inputs and embeddings.

    TPU formulation: all L levels are evaluated by ONE vmapped body over
    per-level tables padded to a uniform size — the whole encoder lowers to a
    handful of batched gathers instead of L*2^D separate ones (tiny graphs,
    fast XLA compiles, parallel execution).  Index math follows
    ``get_grid_index`` (``hashencoder.cu:55-72``): dense row-major where
    resolution^D fits the level's table, prime-XOR fast_hash otherwise, both
    in wrapping uint32, reduced mod hashmap_size.
    """
    D = spec.input_dim
    L = spec.num_levels
    C = spec.level_dim
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)  # [B, 1]

    scales, resolutions, sizes, dense, s_max = _level_constants(spec)
    # padded per-level tables [L, S_max, C] (slices are static; XLA fuses the
    # pads away into the gather operand)
    tables = jnp.stack([
        jnp.pad(embeddings[spec.offsets[l]:spec.offsets[l + 1]],
                ((0, s_max - int(sizes[l])), (0, 0)))
        for l in range(L)
    ])
    scales_j = jnp.asarray(scales)
    res_j = jnp.asarray(resolutions)
    sizes_j = jnp.asarray(sizes)
    dense_j = jnp.asarray(dense)
    primes_j = jnp.asarray(np.array(_PRIMES[:D], np.uint32))

    smooth = spec.interpolation == "smoothstep"

    def level_body(table, scale, res, hm, is_dense):
        pos = x * scale                              # hashencoder.cu:160 (no +0.5)
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid
        # No clamp: a +1 corner landing at `resolution` carries interpolation
        # weight exactly 0 and mod-hashmap keeps it in-bounds — same as the
        # unclamped CUDA kernel (hashencoder.cu:155-205).
        pg = pos_grid.astype(jnp.uint32)
        w = frac * frac * (3.0 - 2.0 * frac) if smooth else frac
        strides = jnp.stack([jnp.uint32(1), res, res * res])[:D]
        acc = 0.0
        for corner in range(2**D):
            offs = jnp.asarray([(corner >> d) & 1 for d in range(D)], jnp.uint32)
            wsel = jnp.where(offs[None, :] == 1, w, 1.0 - w)     # [B, D]
            weight = jnp.prod(wsel, axis=-1)                      # [B]
            cpos = pg + offs[None, :]
            idx_dense = jnp.sum(cpos * strides[None, :], axis=-1)  # wraps u32
            idx_hash = cpos[:, 0] * primes_j[0]
            for d in range(1, D):
                idx_hash = idx_hash ^ (cpos[:, d] * primes_j[d])
            idx = jnp.where(is_dense, idx_dense, idx_hash) % hm
            vals = jnp.take(table, idx.astype(jnp.int32), axis=0)  # [B, C]
            acc = acc + weight[..., None] * vals
        return acc                                                # [B, C]

    if spec.indexing == "rolled_tiled":
        # corner-blocked tables, built with STATIC per-level rolls on the
        # UNPADDED slices so wraparound is exactly mod the level's table size
        blocked_tables = []
        gather_dtype = jnp.bfloat16 if spec.table_dtype == "bfloat16" \
            else embeddings.dtype
        for l in range(L):
            tab_l = embeddings[spec.offsets[l]:spec.offsets[l + 1]]
            r = int(resolutions[l])
            rolls = []
            for corner in range(2**D):
                off = sum(((corner >> d) & 1) * (r**d) for d in range(D))
                rolls.append(jnp.roll(tab_l, -(off % int(sizes[l])), axis=0))
            blk = jnp.concatenate(rolls, axis=-1)                     # [S_l, 8C]
            blocked_tables.append(
                jnp.pad(blk, ((0, s_max - int(sizes[l])), (0, 0))))
        blocked_tables = jnp.stack(blocked_tables).astype(gather_dtype)

        def level_body_rolled(blocked, scale, res, hm):
            pos = x * scale
            pos_grid = jnp.floor(pos)
            frac = pos - pos_grid
            pg = pos_grid.astype(jnp.uint32)
            w = frac * frac * (3.0 - 2.0 * frac) if smooth else frac
            strides = jnp.stack([jnp.uint32(1), res, res * res])[:D]
            base = jnp.sum(pg * strides[None, :], axis=-1) % hm       # [B]
            rows = jnp.take(blocked, base.astype(jnp.int32), axis=0)  # [B, 8C]
            rows = rows.astype(x.dtype).reshape(-1, 2**D, C)
            wcs = []
            for corner in range(2**D):
                offs = jnp.asarray([(corner >> d) & 1 for d in range(D)],
                                   jnp.float32)
                wsel = jnp.where(offs[None, :] == 1, w, 1.0 - w)
                wcs.append(jnp.prod(wsel, axis=-1))
            wc = jnp.stack(wcs, axis=-1)                              # [B, 8]
            return jnp.sum(rows * wc[..., None], axis=1)              # [B, C]

        out = jax.vmap(level_body_rolled)(blocked_tables, scales_j, res_j, sizes_j)
    else:
        out = jax.vmap(level_body)(tables, scales_j, res_j, sizes_j, dense_j)
    out = jnp.moveaxis(out, 0, 1).reshape(-1, L * C)              # [B, L*C]
    out = jnp.where(oob, 0.0, out)
    return out.reshape(*prefix, spec.output_dim)


def hash_encode_from_world(
    xyz: jnp.ndarray, embeddings: jnp.ndarray, spec: HashGridSpec, bound: float = 1.0
) -> jnp.ndarray:
    """World coords in [-bound, bound] -> [0,1] -> encode (``hashgrid.py:157-168``)."""
    return hash_encode((xyz + bound) / (2.0 * bound), embeddings, spec)
