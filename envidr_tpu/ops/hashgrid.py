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
    #   row gather (8x fewer gather/scatter rows; both ops are per-row
    #   latency-bound on TPU — gather ~24ns/row, scatter ~100ns/row).  Dense levels (res^3 <= S) are numerically
    #   IDENTICAL to the reference; hashed levels trade prime-XOR collisions
    #   for tiled aliasing (torch-ngp's gridtype='tiled').
    indexing: str = "hash"
    # 'bfloat16' halves gather/scatter bytes.  Measured (tools/bench_gs3):
    # gathers are row-LATENCY-bound (~24ns/row), so bf16 does NOT speed them
    # up (batched bf16 gather is ~25% slower); kept for memory headroom only.
    table_dtype: str = "float32"
    # Hand-written first+second-order VJP for the rolled path (mirrors the
    # reference's _hash_encode_second_backward plumbing, hashgrid.py:55-104 +
    # hashencoder.cu:258-434).  Exact same math as autodiff, but: (a) corner
    # rows are saved as residuals so the backward re-gathers nothing, (b) the
    # eikonal double-backward adds exactly ONE extra scatter instead of an
    # XLA-autodiff chain, (c) jit graphs shrink ~10x (sphere-mode compile).
    custom_grad: bool = True
    # 'mixed': levels whose table fits VMEM use the Pallas K-accumulator
    # scatter (~24 Mrows/s vs XLA's ~10; ops/pallas_scatter.py), the hashed
    # levels stay on XLA scatter-add.  'xla': all levels via XLA.
    # 'sorted': NO scatter at all — sort rows by table index, cumsum, and
    # difference the cumsum at each slot's boundary (searchsorted); turns the
    # ~100ns/row scatter wall into sort + gathers (~24ns/row) + dense ops.
    scatter_impl: str = "xla"

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


# ---------------------------------------------------------------------------
# rolled_tiled fast path: hand-written first+second-order VJP
# ---------------------------------------------------------------------------
#
# Mirrors the reference's double-backward plumbing (a custom Function whose
# backward is itself a custom Function, ``hashgrid.py:55-104``) and its three
# second-order kernels (``hashencoder.cu:376-434``).  The rolled/blocked table
# layout keeps it at ONE gather row per sample-level forward and ONE scatter
# row per sample-level per backward order.

_CORNERS = np.array([[(c >> d) & 1 for d in range(3)] for c in range(8)],
                    np.float32)                       # [8, 3] corner offsets
_SIGNS = _CORNERS * 2.0 - 1.0                         # d sel / d s


def build_blocked_tables(embeddings: jnp.ndarray, spec: HashGridSpec):
    """[table_size, C] -> [L, S_max, 8C] corner-blocked stacked tables.

    Static per-level rolls on the unpadded slices; wraparound is exactly mod
    the level's table size.  Pure XLA dense ops — autodiff through this gives
    the inverse rolls + sum for free.
    """
    L, D, C = spec.num_levels, spec.input_dim, spec.level_dim
    _, resolutions, sizes, _, s_max = _level_constants(spec)
    gather_dtype = jnp.bfloat16 if spec.table_dtype == "bfloat16" \
        else embeddings.dtype
    blocked_tables = []
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
    return jnp.stack(blocked_tables).astype(gather_dtype)


def _rolled_geom(spec: HashGridSpec, x):
    """Per-level interpolation geometry, batched over levels.

    x: [B, 3] in [0,1].  Returns (base [L,B] i32, sel [L,B,8,3],
    dsel [L,B,8,3] (d sel/d x, incl. scale chain), ddsel [L,B,8,3] (d2)).
    """
    scales, resolutions, sizes, _, _ = _level_constants(spec)
    scales_j = jnp.asarray(scales)[:, None, None]                 # [L,1,1]
    res_j = jnp.asarray(resolutions)[:, None]                     # [L,1]
    sizes_j = jnp.asarray(sizes)[:, None]
    pos = x[None, :, :] * scales_j                                # [L,B,3]
    pg = jnp.floor(pos)
    f = pos - pg
    if spec.interpolation == "smoothstep":
        s = f * f * (3.0 - 2.0 * f)
        ds = 6.0 * f * (1.0 - f)
        dds = 6.0 - 12.0 * f
    else:
        s = f
        ds = jnp.ones_like(f)
        dds = jnp.zeros_like(f)
    pgu = pg.astype(jnp.uint32)
    strides = jnp.stack([jnp.ones_like(res_j), res_j, res_j * res_j],
                        axis=-1).astype(jnp.uint32)               # [L,1,3]
    base = (jnp.sum(pgu * strides, axis=-1) % sizes_j).astype(jnp.int32)
    corners = jnp.asarray(_CORNERS)                               # [8,3]
    signs = jnp.asarray(_SIGNS)
    sel = jnp.where(corners[None, None] == 1.0,
                    s[:, :, None, :], 1.0 - s[:, :, None, :])     # [L,B,8,3]
    dsel = signs[None, None] * ds[:, :, None, :] * scales_j[..., None, :]
    ddsel = signs[None, None] * dds[:, :, None, :] * (scales_j[..., None, :] ** 2)
    # d2 sel/dx2 sign: sel = c + sign*s -> d2 = sign * dds * scale^2;
    # signs already in ddsel above.
    return base, sel, dsel, ddsel


def _w_and_grads(sel, dsel):
    """Corner weights wc [L,B,8] and dwc/dx [L,B,8,3] from sel products."""
    wc = sel[..., 0] * sel[..., 1] * sel[..., 2]
    prod_other = jnp.stack([
        sel[..., 1] * sel[..., 2],
        sel[..., 0] * sel[..., 2],
        sel[..., 0] * sel[..., 1],
    ], axis=-1)                                                   # [L,B,8,3]
    dwc = dsel * prod_other
    return wc, prod_other, dwc


def _gather_rows(blocked, base):
    """[L,S,8C] x [L,B] -> [L,B,8C] (the one batched gather).

    base is always mod the level size — skip XLA's per-row clamp."""
    return jax.vmap(lambda t, i: t.at[i].get(mode="promise_in_bounds"))(
        blocked, base)


def _scatter_rows(blocked_shape_like, base, rows, spec: HashGridSpec = None):
    """[L,B] x [L,B,8C] -> [L,S,8C] scatter-add (the bottleneck op).

    Indices are in-bounds by construction (mod level size), so the XLA path
    skips the per-row clamp (``promise_in_bounds``).  With
    ``spec.scatter_impl == 'mixed'``, VMEM-sized levels run the Pallas
    K-accumulator kernel instead (2.4x the XLA rate; ops/pallas_scatter.py).
    """
    S = blocked_shape_like.shape[1]
    W = rows.shape[-1]

    def one(i, r):
        return jnp.zeros((S, W), jnp.float32).at[i].add(
            r, mode="promise_in_bounds")

    if spec is not None and spec.scatter_impl == "sorted":
        return _sorted_segment_rows(base, rows, S).astype(
            blocked_shape_like.dtype)
    if spec is None or spec.scatter_impl != "mixed":
        return jax.vmap(one)(base, rows).astype(blocked_shape_like.dtype)

    from envidr_tpu.ops.pallas_scatter import fits_vmem, scatter_add_rows
    _, _, sizes, _, s_max = _level_constants(spec)
    interpret = jax.default_backend() != "tpu"
    L = spec.num_levels
    outs: list = [None] * L
    xla_levels = []
    for l in range(L):
        S_l = int(sizes[l])
        if fits_vmem(S_l, W):
            o = scatter_add_rows(base[l], rows[l].astype(jnp.float32),
                                 S=S_l, interpret=interpret)
            outs[l] = jnp.pad(o, ((0, s_max - S_l), (0, 0)))
        else:
            xla_levels.append(l)
    if xla_levels:
        res = jax.vmap(one)(jnp.stack([base[l] for l in xla_levels]),
                            jnp.stack([rows[l] for l in xla_levels]))
        for j, l in enumerate(xla_levels):
            outs[l] = res[j]
    return jnp.stack(outs).astype(blocked_shape_like.dtype)


def _sorted_segment_rows(base, rows, S: int):
    """Scatter-free scatter-add: [L,B] x [L,B,W] -> [L,S,W].

    XLA scatter-add on TPU is hard-capped at ~10 Mrows/s (~100 ns/row,
    measured; flags/bf16/chunking all flat — docs/PERF_R2.md).  This routes
    the same reduction through ops that ARE fast on TPU:

      1. argsort rows by table index        (dense bitonic sort)
      2. gather rows into sorted order      (~24 ns/row)
      3. inclusive cumsum over sorted rows  (dense, bandwidth-bound)
      4. right = searchsorted(keys, 0..S)   (dense binary search, method=sort)
      5. out[s] = P(right[s]) - P(right[s-1])   (one S-row gather + sub)

    No scatter anywhere.  Precision: a GLOBAL cumsum difference has absolute
    error ~eps * (sum of rows before the segment); at training scale
    (B~2M rows/level, non-zero-mean grads) that measured 10% relative error
    on typical segment sums.  So the prefix P is computed CHUNKED:

      * within-chunk cumsum (prefix magnitude capped at ~CS*|row|),
      * an f32 cumsum over per-chunk totals PLUS its own per-step rounding
        error, carried as a second "lo" float (compensated, vectorized —
        no scan), subtracted on the OTHER side of the segment difference so
        the large hi terms cancel exactly for within-chunk segments.

    Measured at B=2M, mean 5e-3 rows: max err 4e-6 (was 2.2e-3 unchunked);
    see tests/test_pallas_scatter.py::test_sorted_segment_rows_training_scale.
    Reference analogue: the CUDA kernel's atomicAdd accumulation
    (hashencoder/src/hashencoder.cu:258-346), re-designed for TPU.
    """
    B = base.shape[1]
    W = rows.shape[-1]
    CS = 4096                                  # chunk size (prefix mag cap)
    C = -(-B // CS)
    Bp = C * CS

    def one(i, r):
        order = jnp.argsort(i)
        keys = i[order]
        vals = r[order].astype(jnp.float32)
        chunks = jnp.pad(vals, ((0, Bp - B), (0, 0))).reshape(C, CS, W)
        within = jnp.cumsum(chunks, axis=1)                    # [C, CS, W]
        totals = within[:, -1]                                 # [C, W]
        # compensated chunk-prefix: hi = f32 cumsum, lo = cumsum of the
        # per-step rounding errors (true prefix ≈ hi - lo)
        hi = jnp.concatenate(
            [jnp.zeros((1, W), jnp.float32), jnp.cumsum(totals, axis=0)])
        e = (hi[1:] - hi[:-1]) - totals
        lo = jnp.concatenate(
            [jnp.zeros((1, W), jnp.float32), jnp.cumsum(e, axis=0)])
        # exclusive within-chunk prefix, flat-addressable by position
        exw = jnp.concatenate(
            [jnp.zeros((C, 1, W), jnp.float32), within[:, :-1]], axis=1)
        exw = jnp.concatenate(
            [exw.reshape(Bp, W), jnp.zeros((1, W), jnp.float32)])

        right = jnp.searchsorted(keys, jnp.arange(S, dtype=keys.dtype),
                                 side="right", method="sort")   # [S] in 0..B
        c = right // CS
        hi_g = hi.at[c].get(mode="promise_in_bounds")
        lo_g = lo.at[c].get(mode="promise_in_bounds")
        ex_g = exw.at[right].get(mode="promise_in_bounds")

        def dshift(a):                      # a[s] - a[s-1], a[-1] := 0
            return a - jnp.concatenate(
                [jnp.zeros((1, W), jnp.float32), a[:-1]])

        return dshift(hi_g) - dshift(lo_g) + dshift(ex_g)

    return jax.vmap(one)(base, rows)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rolled_encode(spec: HashGridSpec, x, blocked):
    out, _ = _rolled_encode_impl(spec, x, blocked)
    return out


def _rolled_encode_impl(spec, x, blocked):
    L, C = spec.num_levels, spec.level_dim
    B = x.shape[0]
    base, sel, dsel, _ = _rolled_geom(spec, x)
    wc, _, _ = _w_and_grads(sel, dsel)
    rows = _gather_rows(blocked, base).astype(x.dtype)            # [L,B,8C]
    rows_c = rows.reshape(L, B, 8, C)
    out = jnp.einsum("lbk,lbkc->lbc", wc, rows_c)                 # [L,B,C]
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)                 # [B]
    out = jnp.where(oob[None, :, None], 0.0, out)
    out = jnp.moveaxis(out, 0, 1).reshape(B, L * C)
    return out, (rows, oob)


def _rolled_encode_fwd(spec, x, blocked):
    out, (rows, oob) = _rolled_encode_impl(spec, x, blocked)
    return out, (x, blocked, rows)


def _rolled_encode_bwd(spec, res, g):
    x, blocked, rows = res
    d_x, d_blocked = _rolled_encode_grad(spec, x, blocked, g, rows)
    return d_x, d_blocked


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rolled_encode_grad(spec, x, blocked, g, rows):
    """First-order backward: (d_x, d_blocked).  Itself custom-differentiable
    (the second-order path of eikonal/normal losses).

    ``rows`` is a saved-residual VALUE of gather(blocked) — its cotangent is
    deliberately severed (zero) and the blocked-gradient contribution is
    returned explicitly instead, so nothing double-counts.  Correct to second
    order, which is all the losses use (renderer.py:182-198)."""
    return _rolled_grad_impl(spec, x, blocked, g, rows)


def _rolled_grad_impl(spec, x, blocked, g, rows):
    L, C = spec.num_levels, spec.level_dim
    B = x.shape[0]
    base, sel, dsel, _ = _rolled_geom(spec, x)
    wc, _, dwc = _w_and_grads(sel, dsel)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
    gl = jnp.moveaxis(g.reshape(B, L, C), 1, 0)                   # [L,B,C]
    gl = jnp.where(oob[None, :, None], 0.0, gl)
    rows_c = rows.reshape(L, B, 8, C).astype(jnp.float32)
    # d_x[b,d] = sum_{l,k,c} g * rows * dwc
    d_x = jnp.einsum("lbc,lbkc,lbkd->bd", gl, rows_c, dwc)
    # d_blocked rows: u[l,b,k,c] = wc * g
    u = (wc[..., None] * gl[:, :, None, :]).reshape(L, B, 8 * C)
    d_blocked = _scatter_rows(blocked, base, u, spec)
    return d_x.astype(x.dtype), d_blocked


def _rolled_grad_fwd(spec, x, blocked, g, rows):
    # symbolic_zeros=True wraps args as CustomVJPPrimal(value, perturbed)
    x, blocked, g, rows = (a.value for a in (x, blocked, g, rows))
    outs = _rolled_grad_impl(spec, x, blocked, g, rows)
    return outs, (x, blocked, g, rows)


def _rolled_grad_bwd(spec, res, ts):
    """Second-order: cotangents (t_x, t_blk) against (d_x, d_blocked) ->
    grads w.r.t. (x, blocked, g, rows).

    Mirrors kernel_grid_second_backward_grad / _embedding
    (``hashencoder.cu:376-434``) plus the exact d2w/dx2 input-input block the
    reference omits (its eikonal never needs it; ours keeps full correctness).
    """
    from jax.custom_derivatives import SymbolicZero
    x, blocked, g, rows = res
    t_x, t_blk = ts
    # symbolic zeros let us DROP whole branches at trace time: the eikonal
    # loss only uses d_x, so t_blk is structurally zero and its 512MB-of-
    # zeros gather + einsums would otherwise execute for nothing.
    tx_zero = isinstance(t_x, SymbolicZero)
    tb_zero = isinstance(t_blk, SymbolicZero)
    L, C = spec.num_levels, spec.level_dim
    B = x.shape[0]
    base, sel, dsel, ddsel = _rolled_geom(spec, x)
    wc, prod_other, dwc = _w_and_grads(sel, dsel)
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)
    gl = jnp.moveaxis(g.reshape(B, L, C), 1, 0)                   # [L,B,C]
    gl = jnp.where(oob[None, :, None], 0.0, gl)
    rows_c = rows.reshape(L, B, 8, C).astype(jnp.float32)
    if not tx_zero:
        t_x = jnp.where(oob[:, None], 0.0, t_x.astype(jnp.float32))

    # gather of the d_blocked cotangent at sample rows
    tb_c = None if tb_zero else _gather_rows(
        t_blk, base).astype(jnp.float32).reshape(L, B, 8, C)

    # --- grad wrt g: t_x . d(d_x)/dg  +  t_blk-path ---
    grad_g = 0.0
    if not tx_zero:
        grad_g = jnp.einsum("bd,lbkc,lbkd->lbc", t_x, rows_c, dwc)
    if not tb_zero:
        grad_g = grad_g + jnp.einsum("lbk,lbkc->lbc", wc, tb_c)
    grad_g = jnp.where(oob[None, :, None], 0.0, grad_g)
    grad_g = jnp.moveaxis(grad_g, 0, 1).reshape(B, L * C).astype(g.dtype)

    # --- grad wrt blocked: scatter of t_x-weighted update rows (the d_x
    #     path) + nothing from the d_blocked path (linear in blocked: none) ---
    if tx_zero:
        grad_blocked = jnp.zeros_like(blocked)
    else:
        u2 = jnp.einsum("bd,lbkd,lbc->lbkc", t_x, dwc, gl).reshape(L, B, 8 * C)
        grad_blocked = _scatter_rows(blocked, base, u2, spec)

    # --- grad wrt x: d2w/dx2 (t_x-path) + d(update-weights)/dx (t_blk) ---
    grad_x = jnp.zeros((B, 3), jnp.float32)
    if not tx_zero:
        gr = jnp.einsum("lbc,lbkc->lbk", gl, rows_c)              # [L,B,8]
        cols = []
        for dp in range(3):
            acc = 0.0
            for d in range(3):
                if d == dp:
                    h = ddsel[..., dp] * prod_other[..., dp]      # [L,B,8]
                else:
                    other = 3 - d - dp
                    h = dsel[..., d] * dsel[..., dp] * sel[..., other]
                acc = acc + jnp.einsum("lbk,lbk,b->b", gr, h, t_x[:, d])
            cols.append(acc)
        grad_x = jnp.stack(cols, axis=-1)
    if not tb_zero:
        grad_x = grad_x + jnp.einsum("lbkc,lbc,lbkd->bd", tb_c, gl, dwc)
    grad_x = jnp.where(oob[:, None], 0.0, grad_x).astype(x.dtype)

    return grad_x, grad_blocked, grad_g, jnp.zeros_like(rows)


_rolled_encode_grad.defvjp(_rolled_grad_fwd, _rolled_grad_bwd,
                           symbolic_zeros=True)
_rolled_encode.defvjp(_rolled_encode_fwd, _rolled_encode_bwd)


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

    if spec.indexing == "rolled_tiled" and spec.custom_grad:
        blocked_tables = build_blocked_tables(embeddings, spec)
        out = _rolled_encode(spec, x, blocked_tables)
        return out.reshape(*prefix, spec.output_dim)

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
            vals = table.at[idx.astype(jnp.int32)].get(
                mode="promise_in_bounds")                         # [B, C]
            acc = acc + weight[..., None] * vals
        return acc                                                # [B, C]

    if spec.indexing == "rolled_tiled":
        blocked_tables = build_blocked_tables(embeddings, spec)

        def level_body_rolled(blocked, scale, res, hm):
            pos = x * scale
            pos_grid = jnp.floor(pos)
            frac = pos - pos_grid
            pg = pos_grid.astype(jnp.uint32)
            w = frac * frac * (3.0 - 2.0 * frac) if smooth else frac
            strides = jnp.stack([jnp.uint32(1), res, res * res])[:D]
            base = jnp.sum(pg * strides[None, :], axis=-1) % hm       # [B]
            rows = blocked.at[base.astype(jnp.int32)].get(
                mode="promise_in_bounds")                             # [B, 8C]
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
