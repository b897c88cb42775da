"""Microbenchmark: hash-table gather/scatter strategies on the TPU.

The round-1 train step is ~78% backward hash-table scatter (456 ms of 587 ms,
VERDICT.md weak #2).  This measures every candidate replacement at the real
workload shape: B = 262144 sample-rows (4096 rays x K=64), L = 16 levels,
blocked row width 8*C = 16 floats, table S = 2^19 rows per level.

Run (single-tenant TPU -- at most one device process):
    timeout 1800 python tools/bench_scatter.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

B = 262_144          # sample rows per level
S = 1 << 19          # table rows per level
W = 16               # row width (8 corners x C=2)
L = 16               # levels

print(f"devices: {jax.devices()}", flush=True)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    # force real materialization (tunnel under-reports block_until_ready)
    s = jax.tree.leaves(r)[0]
    _ = float(jnp.asarray(s).ravel()[0])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
idx = jax.random.randint(k1, (B,), 0, S, jnp.int32)
rows = jax.random.normal(k2, (B, W), jnp.float32)
table = jax.random.normal(k3, (S, W), jnp.float32)

# batched versions (all 16 levels at once)
idxL = jax.random.randint(k1, (L, B), 0, S, jnp.int32)
rowsL = jax.random.normal(k2, (L, B, W), jnp.float32)
tableL = jax.random.normal(k3, (L, S, W), jnp.float32)

results = {}


def report(name, t, rows_moved, bytes_moved):
    results[name] = t
    print(f"{name:44s} {t*1e3:9.2f} ms   {rows_moved/t/1e6:8.1f} Mrows/s "
          f"{bytes_moved/t/1e9:7.2f} GB/s", flush=True)


# ---------------- gathers ----------------
@jax.jit
def g_take(table, idx):
    return jnp.take(table, idx, axis=0)

t = timeit(g_take, table, idx)
report("gather take [B,16] f32", t, B, B * W * 4)

@jax.jit
def g_takeL(tableL, idxL):
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(tableL, idxL)

t = timeit(g_takeL, tableL, idxL)
report("gather take batched L=16", t, L * B, L * B * W * 4)

@jax.jit
def g_take_bf16(table, idx):
    return jnp.take(table.astype(jnp.bfloat16), idx, axis=0)

t = timeit(g_take_bf16, table, idx)
report("gather take [B,16] bf16", t, B, B * W * 2)

# one-hot matmul gather for a small dense level (S=4096)
S_small = 4096
table_s = table[:S_small]
idx_s = idx % S_small

@jax.jit
def g_onehot(table_s, idx_s):
    oh = jax.nn.one_hot(idx_s, S_small, dtype=jnp.bfloat16)
    return jnp.dot(oh, table_s.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

t = timeit(g_onehot, table_s, idx_s)
report("gather one-hot matmul S=4096", t, B, B * W * 4)

# ---------------- scatters ----------------
@jax.jit
def s_at_add(idx, rows):
    return jnp.zeros((S, W), jnp.float32).at[idx].add(rows)

t = timeit(s_at_add, idx, rows)
report("scatter at[].add f32", t, B, B * W * 4)

@jax.jit
def s_at_addL(idxL, rowsL):
    return jax.vmap(lambda i, r: jnp.zeros((S, W), jnp.float32).at[i].add(r))(
        idxL, rowsL)

t = timeit(s_at_addL, idxL, rowsL)
report("scatter at[].add batched L=16", t, L * B, L * B * W * 4)

@jax.jit
def s_at_add_bf16(idx, rows):
    return jnp.zeros((S, W), jnp.bfloat16).at[idx].add(rows.astype(jnp.bfloat16))

t = timeit(s_at_add_bf16, idx, rows)
report("scatter at[].add bf16", t, B, B * W * 2)

@jax.jit
def s_seg(idx, rows):
    return jax.ops.segment_sum(rows, idx, num_segments=S)

t = timeit(s_seg, idx, rows)
report("segment_sum unsorted", t, B, B * W * 4)

# sort + sorted-scatter
@jax.jit
def s_sorted(idx, rows):
    order = jnp.argsort(idx)
    si = idx[order]
    sr = rows[order]
    return jnp.zeros((S, W), jnp.float32).at[si].add(
        sr, indices_are_sorted=True)

t = timeit(s_sorted, idx, rows)
report("argsort + sorted scatter", t, B, B * W * 4)

@jax.jit
def s_sort_only(idx, rows):
    order = jnp.argsort(idx)
    return idx[order], rows[order]

t = timeit(s_sort_only, idx, rows)
report("  (argsort+permute alone)", t, B, B * W * 4)

@jax.jit
def s_sorted_seg(idx, rows):
    order = jnp.argsort(idx)
    si = idx[order]
    sr = rows[order]
    return jax.ops.segment_sum(sr, si, num_segments=S,
                               indices_are_sorted=True)

t = timeit(s_sorted_seg, idx, rows)
report("argsort + sorted segment_sum", t, B, B * W * 4)

# one-hot matmul scatter for a small level
@jax.jit
def s_onehot(idx_s, rows):
    oh = jax.nn.one_hot(idx_s, S_small, dtype=jnp.bfloat16)
    return jnp.dot(oh.T, rows.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

t = timeit(s_onehot, idx_s, rows)
report("scatter one-hot matmul S=4096", t, B, B * W * 4)

# ---------------- pallas experiments ----------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (a) does jnp.take lower inside a Mosaic kernel? (VMEM-resident small table)
def pl_gather_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

BLK = 4096

@jax.jit
def g_pallas_take(table_s, idx_s):
    return pl.pallas_call(
        pl_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((S_small, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table_s, idx_s)

try:
    t = timeit(g_pallas_take, table_s, idx_s)
    report("pallas take (VMEM table S=4096)", t, B, B * W * 4)
except Exception as e:
    print(f"pallas take: FAILED [{type(e).__name__}] {str(e)[:200]}", flush=True)

# (b) take_along_axis form
def pl_gather_kernel2(tab_ref, idx_ref, out_ref):
    idx2 = idx_ref[:].reshape(-1, 1)
    out_ref[:] = jnp.take_along_axis(
        tab_ref[:], jnp.broadcast_to(idx2, (BLK, W)), axis=0)

@jax.jit
def g_pallas_taa(table_s, idx_s):
    return pl.pallas_call(
        pl_gather_kernel2,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((S_small, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table_s, idx_s)

try:
    t = timeit(g_pallas_taa, table_s, idx_s)
    report("pallas take_along_axis (S=4096)", t, B, B * W * 4)
except Exception as e:
    print(f"pallas taa: FAILED [{type(e).__name__}] {str(e)[:200]}", flush=True)

# (c) pallas one-hot MXU gather, tiled (any-size table streamed from HBM)
#     out[b] = sum_tiles onehot(idx in tile) @ table_tile
TILE_S = 2048
BLK_B = 1024

def pl_onehot_gather_kernel(idx_ref, tab_ref, out_ref):
    j = pl.program_id(1)
    base = j * TILE_S
    idx = idx_ref[:] - base                     # [BLK_B]
    col = jax.lax.broadcasted_iota(jnp.int32, (BLK_B, TILE_S), 1)
    oh = (col == idx.reshape(-1, 1)).astype(jnp.bfloat16)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(oh, tab_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

@jax.jit
def g_pallas_onehot(table, idx):
    return pl.pallas_call(
        pl_onehot_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        grid=(B // BLK_B, S // TILE_S),
        in_specs=[
            pl.BlockSpec((BLK_B,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_S, W), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK_B, W), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table, idx)

try:
    t = timeit(g_pallas_onehot, table, idx)
    report("pallas one-hot MXU gather S=2^19", t, B, B * W * 4)
except Exception as e:
    print(f"pallas onehot gather: FAILED [{type(e).__name__}] {str(e)[:200]}",
          flush=True)

# (d) pallas one-hot MXU scatter, tiled: dtable_tile += onehot^T @ rows
def pl_onehot_scatter_kernel(idx_ref, rows_ref, out_ref):
    i = pl.program_id(1)                       # batch tile index
    j = pl.program_id(0)                       # table tile index
    base = j * TILE_S
    idx = idx_ref[:] - base
    col = jax.lax.broadcasted_iota(jnp.int32, (BLK_B, TILE_S), 1)
    oh = (col == idx.reshape(-1, 1)).astype(jnp.bfloat16)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(oh.T, rows_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

@jax.jit
def s_pallas_onehot(idx, rows):
    return pl.pallas_call(
        pl_onehot_scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.float32),
        grid=(S // TILE_S, B // BLK_B),
        in_specs=[
            pl.BlockSpec((BLK_B,), lambda j, i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK_B, W), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_S, W), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
    )(idx, rows)

try:
    t = timeit(s_pallas_onehot, idx, rows)
    report("pallas one-hot MXU scatter S=2^19", t, B, B * W * 4)
except Exception as e:
    print(f"pallas onehot scatter: FAILED [{type(e).__name__}] {str(e)[:200]}",
          flush=True)

# (e) scalar fori-loop scatter into VMEM-resident table tile
def pl_fori_scatter_kernel(idx_ref, rows_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(b, _):
        r = idx_ref[b]
        out_ref[pl.ds(r, 1), :] += rows_ref[pl.ds(b, 1), :]
        return _

    jax.lax.fori_loop(0, BLK_B, body, None)

@jax.jit
def s_pallas_fori(idx_s, rows):
    return pl.pallas_call(
        pl_fori_scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((S_small, W), jnp.float32),
        grid=(1, B // BLK_B),
        in_specs=[
            pl.BlockSpec((BLK_B,), lambda j, i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK_B, W), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_small, W), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(idx_s, rows)

try:
    t = timeit(s_pallas_fori, idx_s, rows)
    report("pallas fori scatter (S=4096 VMEM)", t, B, B * W * 4)
except Exception as e:
    print(f"pallas fori scatter: FAILED [{type(e).__name__}] {str(e)[:200]}",
          flush=True)

# ---------------- end-to-end hash encode fwd/bwd ----------------
from envidr_tpu.ops.hashgrid import HashGridSpec, hash_encode, init_hash_params

for indexing in ("rolled_tiled", "hash"):
    spec = HashGridSpec(num_levels=16, level_dim=2, base_resolution=16,
                        log2_hashmap_size=19, desired_resolution=2048,
                        interpolation="smoothstep", indexing=indexing)
    emb = init_hash_params(jax.random.PRNGKey(0), spec)["embeddings"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))

    @jax.jit
    def fwd(emb, x):
        return hash_encode(x, emb, spec)

    @jax.jit
    def bwd(emb, x):
        def loss(e, x):
            return jnp.sum(hash_encode(x, e, spec) ** 2)
        return jax.grad(loss, argnums=(0, 1))(emb, x)

    t = timeit(fwd, emb, x, iters=5)
    report(f"hash_encode fwd ({indexing})", t, L * B, L * B * W * 4)
    t = timeit(bwd, emb, x, iters=5)
    report(f"hash_encode grad(emb,x) ({indexing})", t, 2 * L * B,
           2 * L * B * W * 4)

print("\nsummary (ms):")
for k, v in results.items():
    print(f"  {k}: {v*1e3:.2f}")
