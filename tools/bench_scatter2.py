"""Scatter microbenchmark round 2: can a Pallas fori scatter beat 31 ns/row?

Round-1 findings (tools/bench_scatter.py): XLA batched scatter 9.9 Mrows/s,
Pallas single-accumulator fori scatter on a VMEM table 32 Mrows/s.  The fori
loop is a serialized read-modify-write chain; this round measures whether
interleaving independent accumulators / unrolling hides the RMW latency, plus
the tiling cost for tables larger than VMEM.

    timeout 1800 python -u tools/bench_scatter2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 262_144
W = 16
L = 16
S = 1 << 19

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
rows = jax.random.normal(k2, (B, W), jnp.float32)
idxL = jax.random.randint(k1, (L, B), 0, S, jnp.int32)
rowsL = jax.random.normal(k2, (L, B, W), jnp.float32)


def report(name, t, n_rows):
    print(f"{name:52s} {t*1e3:9.2f} ms   {n_rows/t/1e6:8.1f} Mrows/s",
          flush=True)


# ---- XLA: flat single scatter over all levels ----
@jax.jit
def s_flat(idxL, rowsL):
    off = (jnp.arange(L, dtype=jnp.int32) * S)[:, None]
    flat_idx = (idxL + off).reshape(-1)
    return jnp.zeros((L * S, W), jnp.float32).at[flat_idx].add(
        rowsL.reshape(-1, W))

t = timeit(s_flat, idxL, rowsL, iters=3)
report("XLA flat scatter 4.2M rows", t, L * B)

# ---- XLA: batched bf16 gather (fwd path candidate) ----
tableL_bf = jax.random.normal(k1, (L, S, W), jnp.bfloat16)

@jax.jit
def g_bf16(tableL_bf, idxL):
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(tableL_bf, idxL)

t = timeit(g_bf16, tableL_bf, idxL)
report("XLA batched gather bf16", t, L * B)

tableL_f32 = tableL_bf.astype(jnp.float32)

@jax.jit
def g_f32(tableL, idxL):
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(tableL, idxL)

t = timeit(g_f32, tableL_f32, idxL)
report("XLA batched gather f32 (control)", t, L * B)

# ---- Pallas fori scatter: accumulator count sweep (S=4096 table) ----
S_small = 4096
idx_s = (idxL[0] % S_small).astype(jnp.int32)
BLK = 8192


def make_fori(A, unroll, s_tab, acc_dtype=jnp.float32):
    def kernel(idx_ref, rows_ref, out_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        per = BLK // (A * unroll)

        def body(b, _):
            for a in range(A):
                for u in range(unroll):
                    k = b * (A * unroll) + a * unroll + u
                    r = idx_ref[k]
                    acc[a, pl.ds(r, 1), :] += rows_ref[pl.ds(k, 1), :].astype(
                        acc_dtype)
            return _

        jax.lax.fori_loop(0, per, body, None)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = jnp.sum(acc[...].astype(jnp.float32), axis=0)

    @jax.jit
    def run(idx, rows):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((s_tab, W), jnp.float32),
            grid=(B // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((s_tab, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((A, s_tab, W), acc_dtype)],
        )(idx, rows)

    return run


for A, unroll in ((1, 1), (2, 1), (4, 1), (8, 1), (1, 4), (4, 2), (8, 2)):
    try:
        fn = make_fori(A, unroll, S_small)
        t = timeit(fn, idx_s, rows)
        report(f"pallas fori scatter A={A} unroll={unroll} S=4k", t, B)
    except Exception as e:
        print(f"pallas fori A={A},u={unroll}: FAILED "
              f"[{type(e).__name__}] {str(e)[:160]}", flush=True)

# ---- bigger resident tables: S_tile = 2^17 f32 (8MB), A=1/2 ----
S_big = 1 << 17
idx_b = (idxL[0] % S_big).astype(jnp.int32)
for A in (1, 2):
    try:
        fn = make_fori(A, 1, S_big)
        t = timeit(fn, idx_b, rows)
        report(f"pallas fori scatter A={A} S=2^17 f32", t, B)
    except Exception as e:
        print(f"pallas fori big A={A}: FAILED [{type(e).__name__}] "
              f"{str(e)[:160]}", flush=True)

# bf16 accumulator, S=2^18 (8MB)
S_bf = 1 << 18
idx_bf = (idxL[0] % S_bf).astype(jnp.int32)
try:
    fn = make_fori(2, 1, S_bf, acc_dtype=jnp.bfloat16)
    t = timeit(fn, idx_bf, rows)
    report("pallas fori scatter A=2 S=2^18 bf16", t, B)
except Exception as e:
    print(f"pallas fori bf16: FAILED [{type(e).__name__}] {str(e)[:160]}",
          flush=True)

# ---- Pallas fori gather from VMEM table (control for fwd) ----
def gather_kernel(idx_ref, tab_ref, out_ref):
    def body(b, _):
        r = idx_ref[b]
        out_ref[pl.ds(b, 1), :] = tab_ref[pl.ds(r, 1), :]
        return _

    jax.lax.fori_loop(0, BLK, body, None)

@jax.jit
def g_fori(idx, table_s):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((S_small, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(idx, table_s)

try:
    table_s = tableL_f32[0, :S_small]
    t = timeit(g_fori, idx_s, table_s)
    report("pallas fori gather S=4k", t, B)
except Exception as e:
    print(f"pallas fori gather: FAILED [{type(e).__name__}] {str(e)[:160]}",
          flush=True)
