"""CP-factorized multiresolution encoder — the MXU-native alternative.

The hash encoder's cost on TPU is per-row table traffic: gathers are
row-latency-bound (~24 ns/row) and XLA scatter-add is ~100 ns/row, so the
backward is a 425 ms wall at the bench workload (CLAUDE.md).  This encoder
removes per-row traffic entirely: features live in per-AXIS 1-D tables
(TensoRF-style CP decomposition, arXiv:2203.09517) and every pass is a
matmul against a "two-hot" interpolation matrix:

    forward   feat = twohot(x) @ T            [B,R] @ [R,rank]   (MXU)
    d_table   dT   = twohot(x)^T @ g          [R,B] @ [B,rank]   (MXU)
    d_x       dx   = (twohot'(x) @ T) . g     [B,R] @ [R,rank]   (MXU)

All three are dense contractions — no gather rows, no scatter rows, no
atomics — and linear interpolation makes the encoder piecewise-linear in x,
so the eikonal double-backward needs no special casing (d2/dx2 == 0; the
mixed d2/dTdx term is yet another two-hot matmul that XLA derives).

Per level l and axis a (x/y/z) the table is [R_l, rank]; the three axis
features combine multiplicatively (CP) and a per-level [rank, C] projection
maps to the hash encoder's output layout [L*C] — a drop-in replacement for
``encoding_pos`` (factory name: 'cp').

The jnp formulation below builds the two-hot matrices as dense [B, R_l]
bf16 tensors per (level, axis).  For coarse levels that is tiny; for the
finest levels XLA tiles the matmul and never materializes more than a
fusion block.  A dedicated Pallas kernel (on-the-fly two-hot tiles) is the
next optimization step if XLA's fusion proves insufficient.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CPSpec:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2                 # C of the output, per level
    rank: int = 32                     # CP rank per level
    base_resolution: int = 16
    desired_resolution: int | None = 2048
    per_level_scale: float = 2.0
    # matmul dtype for the two-hot contractions (f32 accumulate)
    compute_dtype: str = "bfloat16"
    # r5 A/B (tools/bench_cp_encode.py, tools/profile_cp.py on v5e): XLA
    # lowers these formulations CONTEXT-DEPENDENTLY and the winners flip —
    #   'take' (gather-lerp):  2.7 ms standalone fwd, but 362 ms full train
    #       step / 1049 ms render fwd (the 25M take rows hit the ~25 ns/row
    #       HBM gather wall inside the big graph);
    #   'twohot' (dense matmul): 1052 ms standalone fwd (lowered as the
    #       actual dense matmul at MXU peak!), but 47 ms in-context and an
    #       83 ms full step — XLA rewrites the degenerate two-hot matmuls
    #       into something vectorized-gather-shaped when fused.
    # 'twohot' is therefore the production default; 'take' is kept for the
    # parity tests and future-XLA re-evaluation.
    formulation: str = "twohot"

    resolutions: Tuple[int, ...] = dataclasses.field(init=False)
    scales: Tuple[float, ...] = dataclasses.field(init=False)

    def __post_init__(self):
        s = self.per_level_scale
        if self.desired_resolution is not None:
            s = float(np.exp2(
                np.log2(self.desired_resolution / self.base_resolution)
                / max(self.num_levels - 1, 1)))
        resolutions, scales = [], []
        for lvl in range(self.num_levels):
            scale = float(np.exp2(lvl * np.log2(s)) * self.base_resolution - 1.0)
            resolutions.append(int(np.ceil(scale)) + 1)
            scales.append(scale)
        object.__setattr__(self, "resolutions", tuple(resolutions))
        object.__setattr__(self, "scales", tuple(scales))

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def init_cp_params(key, spec: CPSpec, std: float = 0.1):
    """Axis tables [R_l, rank] per level+axis, and [rank, C] projections.

    Tables ~ N(0, std): the CP feature is a triple product, so its scale is
    ~ std^3 * sqrt(rank) ~ 1e-3 — the same small-encoding regime as the hash
    init U(-1e-4, 1e-4); projections are 1/sqrt(rank)-scaled.
    """
    params = {"axes": [], "proj": []}
    table_std = std
    for lvl, R in enumerate(spec.resolutions):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        params["axes"].append([
            jax.random.normal(k, (R, spec.rank), jnp.float32) * table_std
            for k in (k1, k2, k3)])
        params["proj"].append(
            jax.random.normal(k4, (spec.rank, spec.level_dim), jnp.float32)
            * (1.0 / np.sqrt(spec.rank)))
    return params


def _axis_feat(table, pos, R, dtype):
    """Two-hot interpolated lookup of a 1-D table: [B] x [R, rank] -> [B, rank].

    pos in [0, R-1] continuous.  Expressed as a dense [B, R] two-hot matmul
    so the MXU (not the scatter/gather unit) carries both this contraction
    and its transposes under autodiff.
    """
    i0 = jnp.clip(jnp.floor(pos), 0, R - 2)
    frac = (pos - i0).astype(dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (pos.shape[0], R), 1)
    i0i = i0.astype(jnp.int32)[:, None]
    twohot = (jnp.where(cols == i0i, (1.0 - frac)[:, None], 0.0)
              + jnp.where(cols == i0i + 1, frac[:, None], 0.0)).astype(dtype)
    return jnp.dot(twohot, table.astype(dtype),
                   preferred_element_type=jnp.float32)


def _axis_feat_take(table, pos, R):
    """Gather-lerp lookup: [B] x [R, rank] -> [B, rank] in f32.

    Two `jnp.take` rows per sample; the per-level tables are small enough to
    live in VMEM, where XLA's vectorized take runs ~0.1 ns/row (r5 bench) —
    nothing like the 25 ns/row HBM gather-latency wall.  Math identical to
    the two-hot matmul (same lerp), so parity tests compare them exactly.
    """
    i0 = jnp.clip(jnp.floor(pos), 0, R - 2).astype(jnp.int32)
    frac = (pos - i0)[:, None]
    v0 = jnp.take(table, i0, axis=0)
    v1 = jnp.take(table, i0 + 1, axis=0)
    return v0 * (1.0 - frac) + v1 * frac


def cp_encode(inputs: jnp.ndarray, params, spec: CPSpec) -> jnp.ndarray:
    """Encode inputs in [0, 1]^3 -> [..., L*C].  Out-of-bounds -> 0.

    Differentiable to any order w.r.t. inputs and all tables (plain jnp).
    """
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, spec.input_dim)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1, keepdims=True)
    dtype = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32
    take = spec.formulation == "take"
    feats = []
    for lvl in range(spec.num_levels):
        R = spec.resolutions[lvl]
        scale = spec.scales[lvl]
        prod = 1.0
        for a in range(spec.input_dim):
            if take:
                prod = prod * _axis_feat_take(params["axes"][lvl][a],
                                              x[:, a] * scale, R)
            else:
                prod = prod * _axis_feat(params["axes"][lvl][a],
                                         x[:, a] * scale, R, dtype)
        feats.append(jnp.dot(prod, params["proj"][lvl]))      # [B, C]
    out = jnp.concatenate(feats, axis=-1)                     # [B, L*C]
    out = jnp.where(oob, 0.0, out)
    return out.reshape(*prefix, spec.output_dim)


def cp_encode_from_world(xyz, params, spec: CPSpec, bound: float = 1.0):
    return cp_encode((xyz + bound) / (2.0 * bound), params, spec)
