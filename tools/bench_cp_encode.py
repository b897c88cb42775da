"""CP encoder forward variants micro-bench (round 5).

profile_r5 attributes ~47 ms of the 83 ms CP step to the geometry forward,
which is dominated by cp_encode: XLA lowers the two-hot contractions to
gather-shaped ops — ~25M rows (B x 16 levels x 3 axes x 2 lerp rows).
Variants that cut the row count:

  twohot      current dense-two-hot formulation (baseline)
  take2       direct gather: T[i0]*(1-f) + T[i0+1]*f     (same rows, no iota)
  paired      T2[i] = concat(T[i], T[i+1]) -> ONE row per (sample,level,axis)
  merged      all levels in one [sum R, 2*rank] table per axis -> one batched
              gather of [B, L] indices per axis (+ paired trick)

Run (single-tenant TPU):  timeout 1800 python -u tools/bench_cp_encode.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import envidr_tpu
envidr_tpu.apply_device_env()
envidr_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from envidr_tpu.ops.cp import CPSpec, init_cp_params, cp_encode

print(f"devices: {jax.devices()}", flush=True)


def timeit(fn, iters=10, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


B = 262144
spec = CPSpec(num_levels=16, level_dim=2, rank=32, base_resolution=16,
              desired_resolution=2048)
key = jax.random.PRNGKey(0)
params = init_cp_params(key, spec)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))
print(f"B={B} levels={spec.num_levels} rank={spec.rank} "
      f"sumR={sum(spec.resolutions)}", flush=True)

# ---- baseline -------------------------------------------------------------
f0 = jax.jit(lambda: cp_encode(x, params, spec))
t = timeit(f0)
print(f"twohot (current): {t*1e3:8.2f} ms", flush=True)
ref = np.asarray(f0())


# ---- take2: plain gather lerp --------------------------------------------
def enc_take2(x):
    feats = []
    for lvl in range(spec.num_levels):
        R = spec.resolutions[lvl]
        scale = spec.scales[lvl]
        prod = 1.0
        for a in range(3):
            pos = x[:, a] * scale
            i0 = jnp.clip(jnp.floor(pos), 0, R - 2).astype(jnp.int32)
            fr = (pos - i0)[:, None]
            T = params["axes"][lvl][a]
            v0 = jnp.take(T, i0, axis=0)
            v1 = jnp.take(T, i0 + 1, axis=0)
            prod = prod * (v0 * (1 - fr) + v1 * fr)
        feats.append(jnp.dot(prod, params["proj"][lvl]))
    return jnp.concatenate(feats, axis=-1)


f1 = jax.jit(lambda: enc_take2(x))
t = timeit(f1)
print(f"take2 (gather):   {t*1e3:8.2f} ms   max|d|={np.abs(np.asarray(f1())-ref).max():.2e}",
      flush=True)

# ---- paired: one row per (sample, level, axis) ----------------------------
paired = [[jnp.concatenate([T, jnp.roll(T, -1, axis=0)], axis=1)
           for T in axes] for axes in params["axes"]]


def enc_paired(x):
    rank = spec.rank
    feats = []
    for lvl in range(spec.num_levels):
        R = spec.resolutions[lvl]
        scale = spec.scales[lvl]
        prod = 1.0
        for a in range(3):
            pos = x[:, a] * scale
            i0 = jnp.clip(jnp.floor(pos), 0, R - 2).astype(jnp.int32)
            fr = (pos - i0)[:, None]
            row = jnp.take(paired[lvl][a], i0, axis=0)     # [B, 2*rank]
            prod = prod * (row[:, :rank] * (1 - fr) + row[:, rank:] * fr)
        feats.append(jnp.dot(prod, params["proj"][lvl]))
    return jnp.concatenate(feats, axis=-1)


f2 = jax.jit(lambda: enc_paired(x))
t = timeit(f2)
print(f"paired (1 row):   {t*1e3:8.2f} ms   max|d|={np.abs(np.asarray(f2())-ref).max():.2e}",
      flush=True)

# ---- merged: single [sumR, 2*rank] table per axis, batched [B, L] gather --
offs = np.cumsum([0] + list(spec.resolutions))[:-1]           # level offsets
merged = [jnp.concatenate([paired[l][a] for l in range(spec.num_levels)],
                          axis=0) for a in range(3)]          # [sumR, 2*rank]
scales = jnp.asarray(spec.scales)                             # [L]
Rm2 = jnp.asarray([r - 2 for r in spec.resolutions])
offs_j = jnp.asarray(offs, jnp.int32)


def enc_merged(x):
    rank = spec.rank
    prod = 1.0
    fr_all = []
    rows_all = []
    for a in range(3):
        pos = x[:, a:a + 1] * scales[None, :]                 # [B, L]
        i0 = jnp.clip(jnp.floor(pos), 0, Rm2[None, :]).astype(jnp.int32)
        fr = pos - i0                                         # [B, L]
        rows = jnp.take(merged[a], i0 + offs_j[None, :], axis=0)  # [B,L,2r]
        feat = rows[..., :rank] * (1 - fr)[..., None] \
            + rows[..., rank:] * fr[..., None]                # [B, L, rank]
        prod = prod * feat
    # per-level projection as one einsum over stacked [L, rank, C]
    projs = jnp.stack(params["proj"])                         # [L, rank, C]
    out = jnp.einsum("blr,lrc->blc", prod, projs)
    return out.reshape(x.shape[0], -1)


f3 = jax.jit(lambda: enc_merged(x))
t = timeit(f3)
print(f"merged (batched): {t*1e3:8.2f} ms   max|d|={np.abs(np.asarray(f3())-ref).max():.2e}",
      flush=True)

# ---- backward cost of the winner vs baseline (tables grad) ----------------
for name, enc in (("twohot", lambda p: cp_encode(x, p, spec)),):
    g = jax.jit(lambda: jax.grad(lambda p: jnp.sum(cp_encode(x, p, spec)))(params))
    print(f"bwd twohot:       {timeit(g)*1e3:8.2f} ms", flush=True)


def loss_merged(tables):
    rank = spec.rank
    prod = 1.0
    for a in range(3):
        pos = x[:, a:a + 1] * scales[None, :]
        i0 = jnp.clip(jnp.floor(pos), 0, Rm2[None, :]).astype(jnp.int32)
        fr = pos - i0
        rows = jnp.take(tables[a], i0 + offs_j[None, :], axis=0)
        feat = rows[..., :rank] * (1 - fr)[..., None] \
            + rows[..., rank:] * fr[..., None]
        prod = prod * feat
    projs = jnp.stack(params["proj"])
    return jnp.sum(jnp.einsum("blr,lrc->blc", prod, projs))


gm = jax.jit(lambda: jax.grad(loss_merged)(merged))
print(f"bwd merged:       {timeit(gm)*1e3:8.2f} ms", flush=True)

# second-order (the eikonal shape): grad wrt x of sum, then grad wrt tables
def eik_two(p):
    g = jax.grad(lambda xx: jnp.sum(cp_encode(xx, p, spec)))(x)
    return jnp.sum(g * g)


g2 = jax.jit(lambda: jax.grad(eik_two)(params))
print(f"2nd-order twohot: {timeit(g2)*1e3:8.2f} ms", flush=True)


def eik_merged(tables):
    def f(xx):
        rank = spec.rank
        prod = 1.0
        for a in range(3):
            pos = xx[:, a:a + 1] * scales[None, :]
            i0 = jnp.clip(jnp.floor(pos), 0, Rm2[None, :]).astype(jnp.int32)
            fr = pos - i0
            rows = jnp.take(tables[a], i0 + offs_j[None, :], axis=0)
            feat = rows[..., :rank] * (1 - fr)[..., None] \
                + rows[..., rank:] * fr[..., None]
            prod = prod * feat
        projs = jnp.stack(params["proj"])
        return jnp.sum(jnp.einsum("blr,lrc->blc", prod, projs))
    g = jax.grad(f)(x)
    return jnp.sum(g * g)


g3 = jax.jit(lambda: jax.grad(eik_merged)(merged))
print(f"2nd-order merged: {timeit(g3)*1e3:8.2f} ms", flush=True)
