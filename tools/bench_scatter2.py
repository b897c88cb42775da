"""Round-2 scatter/gather attack candidates (VERDICT.md weak #2).

Round-1 measurements (tools/bench_scatter.py, real workload B=262k rows,
L=16 levels, W=16 f32, S=2^19):
    gather take batched L=16      101.95 ms   41.1 Mrows/s  2.63 GB/s
    scatter at[].add batched L=16 425.56 ms    9.9 Mrows/s
    pallas fori (S=4096 VMEM)       8.20 ms   32.0 Mrows/s
    argsort alone                 132.55 ms   (dead end)
    one-hot MXU streamed S=2^19   298.96 ms   (dead end)

Hypotheses this file measures:
  A. XLA scatter throughput scales with the leading batch dim (2.8 -> 9.9
     Mrows/s going 1 -> 16 lanes).  Chunk B into G slices per level -> L*G
     lanes, sum the partials densely afterwards (HBM is fast, scatter isn't).
  B. bf16 partials halve scatter bytes (and the dense partial-sum is cheap).
  C. Pallas fori scatter breaks the serial read-modify-write chain with
     K independent VMEM accumulators (unrolled round-robin), then reduces.
     Only fits levels with S*W*4*K <= ~12 MB, but every level costs the SAME
     B scatter-rows, so covering the 4 small levels saves ~25% alone.
  D. bf16 BATCHED gather (round-1 tested only the catastrophic unbatched).

Run (single-tenant TPU -- at most one device process):
    timeout 1800 python -u tools/bench_scatter2.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

B = 262_144
S = 1 << 19
W = 16
L = 16

print(f"devices: {jax.devices()}", flush=True)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = jax.tree.leaves(r)[0]
    _ = float(jnp.asarray(s).ravel()[0])   # force materialization (tunnel)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
idxL = jax.random.randint(k1, (L, B), 0, S, jnp.int32)
rowsL = jax.random.normal(k2, (L, B, W), jnp.float32)

results = {}


def report(name, t, rows_moved):
    results[name] = t
    print(f"{name:52s} {t*1e3:9.2f} ms   {rows_moved/t/1e6:8.1f} Mrows/s",
          flush=True)


# ---------------- A: chunked-batch scatter ----------------
def make_chunked(G, dtype):
    @jax.jit
    def f(idxL, rowsL):
        i = idxL.reshape(L * G, B // G)
        r = rowsL.reshape(L * G, B // G, W).astype(dtype)

        def one(i, r):
            return jnp.zeros((S, W), dtype).at[i].add(r)

        partial = jax.vmap(one)(i, r)                      # [L*G, S, W]
        return partial.reshape(L, G, S, W).sum(axis=1).astype(jnp.float32)
    return f

report("scatter at[].add batched L=16 (anchor)", timeit(
    make_chunked(1, jnp.float32), idxL, rowsL), L * B)

for G in (2, 4):
    try:
        t = timeit(make_chunked(G, jnp.float32), idxL, rowsL)
        report(f"chunked scatter G={G} f32 (L*G={L*G} lanes)", t, L * B)
    except Exception as e:
        print(f"chunked G={G} f32 FAILED: {str(e)[:120]}", flush=True)

for G in (1, 2, 4, 8):
    try:
        t = timeit(make_chunked(G, jnp.bfloat16), idxL, rowsL)
        report(f"chunked scatter G={G} bf16", t, L * B)
    except Exception as e:
        print(f"chunked G={G} bf16 FAILED: {str(e)[:120]}", flush=True)


# ---------------- D: batched bf16 gather ----------------
tableL = jax.random.normal(k3, (L, S, W), jnp.float32)
tableL_bf = tableL.astype(jnp.bfloat16)

@jax.jit
def g_takeL(tabs, idxL):
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(tabs, idxL)

report("gather take batched L=16 f32 (anchor)",
       timeit(g_takeL, tableL, idxL), L * B)
try:
    report("gather take batched L=16 bf16",
           timeit(g_takeL, tableL_bf, idxL), L * B)
except Exception as e:
    print(f"bf16 batched gather FAILED: {str(e)[:120]}", flush=True)


# ---------------- C: pallas multi-accumulator fori ----------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK_B = 4096


def make_pallas_multi(S_lvl, K):
    """K independent accumulators in the output (breaks the RMW chain),
    reduced densely by XLA afterwards."""

    def kernel(idx_ref, rows_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        stride = BLK_B // K

        def body(b, _):
            for k in range(K):
                bb = b + k * stride
                r = idx_ref[bb]
                out_ref[k, pl.ds(r, 1), :] += rows_ref[pl.ds(bb, 1), :]
            return _

        jax.lax.fori_loop(0, stride, body, None)

    @jax.jit
    def f(idx, rows):
        part = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, S_lvl, W), jnp.float32),
            grid=(B // BLK_B,),
            in_specs=[
                pl.BlockSpec((BLK_B,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK_B, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, S_lvl, W), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, rows)
        return part.sum(axis=0)
    return f


idx1 = idxL[0]
rows1 = rowsL[0]
for S_lvl, Ks in ((4096, (1, 2, 4, 8)), (32768, (1, 2, 4)),
                  (131072, (1, 2))):
    idx_s = idx1 % S_lvl
    for K in Ks:
        vmem_mb = K * S_lvl * W * 4 / 1e6
        if vmem_mb > 14:
            continue
        try:
            t = timeit(make_pallas_multi(S_lvl, K), idx_s, rows1, iters=5)
            report(f"pallas fori S={S_lvl} K={K} acc ({vmem_mb:.0f}MB)",
                   t, B)
        except Exception as e:
            print(f"pallas S={S_lvl} K={K} FAILED: {str(e)[:160]}", flush=True)


# ---------------- E: end-to-end with the best scatter ----------------
print("\nsummary (ms):")
for k, v in results.items():
    print(f"  {k}: {v*1e3:.2f}")
