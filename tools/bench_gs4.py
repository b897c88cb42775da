"""Round-4 probes: (a) S-tiled Pallas scatter for VMEM-oversized levels,
(b) train-step component times at the bench workload.

(a) For hashed levels (S=2^19, 32 MB f32) the table cannot sit in VMEM, so
the K-accumulator kernel scans the batch once per table tile and skips rows
outside the tile.  Viability hinges on the skip cost: per-level cost =
B*(hit_cost/n_tiles + skip_cost*(1-1/n_tiles))*n_tiles.  XLA's scatter is
100ns/row; the VMEM hit is ~42ns; this measures the skip.

Run (single-tenant TPU):  timeout 1200 python -u tools/bench_gs4.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 262_144
S = 1 << 19
W = 16

print(f"devices: {jax.devices()}", flush=True)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = jax.tree.leaves(r)[0]
    _ = float(jnp.asarray(s).ravel()[0])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
idx = jax.random.randint(k1, (B,), 0, S, jnp.int32)
rows = jax.random.normal(k2, (B, W), jnp.float32)

BLK_B = 4096


def make_tiled(n_tiles, K, acc_dtype):
    TILE = S // n_tiles

    def kernel(idx_ref, rows_ref, out_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        base = j * TILE
        stride = BLK_B // K

        def body(b, carry):
            for k in range(K):
                bb = b + k * stride
                r = idx_ref[bb] - base

                @pl.when((r >= 0) & (r < TILE))
                def _():
                    out_ref[0, k, pl.ds(r, 1), :] += rows_ref[
                        pl.ds(bb, 1), :].astype(acc_dtype)
            return carry

        jax.lax.fori_loop(0, stride, body, None)

    @jax.jit
    def f(idx, rows):
        part = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_tiles, K, TILE, W), acc_dtype),
            grid=(n_tiles, B // BLK_B),
            in_specs=[
                pl.BlockSpec((BLK_B,), lambda j, i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK_B, W), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, K, TILE, W), lambda j, i: (j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, rows)
        return part.sum(axis=1).reshape(S, W).astype(jnp.float32)
    return f


@jax.jit
def s_xla(idx, rows):
    return jnp.zeros((S, W), jnp.float32).at[idx].add(
        rows, mode="promise_in_bounds")


t = timeit(s_xla, idx, rows)
print(f"XLA scatter S=2^19 (1 level)        {t*1e3:8.2f} ms", flush=True)
t = timeit(s_xla, idx, rows)
print(f"XLA scatter S=2^19 (re-run)         {t*1e3:8.2f} ms", flush=True)

for n_tiles, K, dt in ((8, 2, jnp.float32), (8, 4, jnp.float32),
                       (4, 2, jnp.bfloat16), (2, 1, jnp.bfloat16)):
    TILE = S // n_tiles
    mb = K * TILE * W * (2 if dt == jnp.bfloat16 else 4) / 1e6
    if mb > 13:
        continue
    try:
        t = timeit(make_tiled(n_tiles, K, dt), idx, rows, iters=5)
        print(f"tiled pallas n={n_tiles} K={K} {dt.__name__:8s} ({mb:.0f}MB) "
              f"{t*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"tiled n={n_tiles} K={K} FAILED: {str(e)[:160]}", flush=True)
