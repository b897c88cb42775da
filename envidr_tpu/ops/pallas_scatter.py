"""Pallas TPU scatter-add for hash-table gradients.

The backward of the hash encoder is one scatter-add of B sample rows into each
level's table — the single most expensive op of the train step (XLA's scatter
is ~10 Mrows/s on v5e regardless of batching/dtype; measured in
``tools/bench_scatter2.py``).  For levels whose table fits VMEM, a Pallas
kernel with K unrolled accumulator slots reaches ~24 Mrows/s (2.4x): the
scalar fori loop is issue-rate-bound, and K independent read-modify-write
chains per trip keep the VPU pipeline fed (K=1 falls off a cliff — the single
RMW chain serializes against VMEM latency).

Replaces the role of ``hashencoder.cu:258-346``'s atomicAdd backward (TPUs
have no atomics; the accumulator slots + dense reduce are the TPU idiom).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Table bytes that can sit in VMEM alongside a batch block (~16 MB total).
_VMEM_BUDGET = 12 * 1024 * 1024
_BLK_B = 4096


def fits_vmem(S: int, W: int, K: int = 2, dtype_bytes: int = 4) -> bool:
    # the (8,128) VMEM tiling pads the lane (last) dim to 128: a [K,S,16]
    # accumulator physically occupies K*S*128 elements (measured: an 81.65MB
    # scoped-vmem request for S=79507 K=2 W=16 inside the train graph)
    w_padded = max(W, 128)
    return K * S * w_padded * dtype_bytes <= _VMEM_BUDGET


def _pick_K(S: int, W: int) -> int:
    for K in (8, 4, 2):
        if fits_vmem(S, W, K):
            return K
    return 0


def _kernel(K: int, blk_b: int, idx_ref, rows_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    stride = blk_b // K

    def body(b, carry):
        for k in range(K):
            bb = b + k * stride
            r = idx_ref[bb]
            out_ref[k, pl.ds(r, 1), :] += rows_ref[pl.ds(bb, 1), :]
        return carry

    jax.lax.fori_loop(0, stride, body, None)


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def scatter_add_rows(idx: jnp.ndarray, rows: jnp.ndarray, *, S: int,
                     interpret: bool = False) -> jnp.ndarray:
    """[B] int32 x [B, W] f32 -> [S, W] f32 scatter-add (VMEM-sized tables).

    Requires ``fits_vmem(S, W)``; caller falls back to XLA otherwise.
    """
    B, W = rows.shape
    K = _pick_K(S, W)
    if K == 0:
        raise ValueError(f"table S={S} W={W} does not fit VMEM")
    pad = (-B) % _BLK_B
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        rows = jnp.concatenate([rows, jnp.zeros((pad, W), rows.dtype)])
    part = pl.pallas_call(
        functools.partial(_kernel, K, _BLK_B),
        out_shape=jax.ShapeDtypeStruct((K, S, W), jnp.float32),
        grid=((B + pad) // _BLK_B,),
        in_specs=[
            pl.BlockSpec((_BLK_B,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLK_B, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, S, W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        # the [K,S,16] accumulator is lane-padded 16->128 by the (8,128)
        # tiling; inside large graphs that blows the default scoped-vmem
        # accounting even though the physical footprint fits — raise the cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx.astype(jnp.int32), rows.astype(jnp.float32))
    return part.sum(axis=0)
