"""Round-5 perf attribution: compaction (top_k) vs searchsorted, geometry bwd.

PERF_R4 named the next walls after coarse_march: the [N, M*S] -> K first-K
selection (bitonic top_k) and the ~45 ms CP geometry fwd+bwd.  This measures,
at the real CP-step shapes on the chip:

  * march coarse vs dense (regression check)
  * the top_k compaction standalone (both levels)
  * a searchsorted-over-cumsum first-K selection at the same shapes
  * CP geometry fwd and fwd+bwd at N*K sample scale

Run (single-tenant TPU):  timeout 2400 python -u tools/profile_r5.py
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

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.train.trainer import Trainer
from envidr_tpu.train.schedules import resolve

print(f"devices: {jax.devices()}", flush=True)


def timeit(fn, iters=10, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    s = jax.tree.leaves(r)[0]
    _ = float(jnp.sum(s))  # forced materialization (CLAUDE.md: tunnel
    # under-reports with block_until_ready alone)
    return (time.perf_counter() - t0) / iters


opt = load_options("configs/synth_spheres_cp.ini", path="data/synth_spheres",
                   workspace="/tmp/profile_r5")
cfg = network_config(opt)
trainer = Trainer(opt, cfg)
ds = NeRFDataset(opt.path, "train", scale=opt.scale)
sched = resolve(opt, 1, 0)
trainer._sched = sched
K = trainer.sample_budget(sched)
trainer.update_extra_state()
state = trainer.state
params = state["params"]
bitfield = state["grid"].bitfield
aabb = jnp.asarray([-cfg.bound] * 3 + [cfg.bound] * 3)
N = sched.num_rays
print(f"N={N} K={K} max_steps={sched.max_steps} "
      f"early_stop={sched.early_stop_steps}", flush=True)

rng = np.random.default_rng(0)
o = jnp.asarray(np.tile([[0.0, 0.0, -2.0]], (N, 1)), jnp.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)

from envidr_tpu.geometry.rays import near_far_from_aabb
from envidr_tpu.ops.marching import march_rays

nears, fars = near_far_from_aabb(o, d, aabb, opt.min_near)

for cm in (False, True):
    march = jax.jit(lambda cm=cm: march_rays(
        o, d, nears, fars, bitfield, bound=cfg.bound, grid_size=128,
        dt_gamma=opt.dt_gamma, max_steps=sched.max_steps, num_samples=K,
        early_stop_steps=sched.early_stop_steps, coarse_march=cm))
    print(f"march coarse={cm}:  {timeit(march)*1e3:8.1f} ms", flush=True)

# ---- compaction standalone at the coarse-path shapes ----------------------
# coarse: [N, Tc=64] -> M=16, fine: [N, M*S=128] -> K
Tc, M, S = 64, 16, 8
MS = M * S
key = jax.random.PRNGKey(2)
selc = jax.random.uniform(key, (N, Tc)) < 0.3
self_ = jax.random.uniform(key, (N, MS)) < 0.5
vals = jax.random.uniform(key, (N, MS))


def topk_select(sel, Kout):
    T = sel.shape[1]
    j = jnp.arange(T, dtype=jnp.int32)[None, :]
    keys = jnp.where(sel, T - j, 0)
    top_keys, top_idx = jax.lax.top_k(keys, Kout)
    return top_idx, top_keys > 0


def searchsorted_select(sel, Kout):
    order = jnp.cumsum(sel.astype(jnp.int32), axis=-1)       # [N, T]
    tgt = jnp.arange(1, Kout + 1, dtype=jnp.int32)
    idx = jax.vmap(lambda o_: jnp.searchsorted(o_, tgt, side="left"))(order)
    ok = idx < sel.shape[1]
    return jnp.where(ok, idx, 0), ok & (order[:, -1][:, None] >= tgt[None, :])


def onehot_select(sel, Kout):
    # rank-matmul: out[n,k] = sum_t (rank[n,t]==k & sel) * t  -> MXU
    T = sel.shape[1]
    rank = jnp.cumsum(sel.astype(jnp.int32), axis=-1) - 1
    oh = (sel[:, :, None]
          & (rank[:, :, None] == jnp.arange(Kout)[None, None, :]))
    tvals = jnp.arange(T, dtype=jnp.float32)[None, :]
    idx = jnp.einsum("nt,ntk->nk", tvals, oh.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    ok = jnp.sum(oh, axis=1) > 0
    return idx.astype(jnp.int32), ok


for name, fn in (("top_k", topk_select), ("searchsorted", searchsorted_select),
                 ("onehot_mm", onehot_select)):
    both = jax.jit(lambda fn=fn: (fn(selc, M)[0], fn(self_, K)[0]))
    print(f"select {name:>12}: {timeit(both)*1e3:8.2f} ms "
          f"(coarse [N,{Tc}]->{M} + fine [N,{MS}]->{K})", flush=True)

# correctness cross-check on the fine shapes
i1, m1 = jax.jit(lambda: topk_select(self_, K))()
i2, m2 = jax.jit(lambda: searchsorted_select(self_, K))()
assert bool(jnp.all(jnp.where(m1, i1, -1) == jnp.where(m2, i2, -1))), \
    "searchsorted selection disagrees with top_k"
print("searchsorted == top_k on fine shapes: OK", flush=True)

# ---- geometry cost at sample scale ---------------------------------------
from envidr_tpu.models.network import forward_geometry

xs = jax.random.uniform(jax.random.PRNGKey(1), (N * K, 3), minval=-1, maxval=1)
enc = jax.jit(lambda: forward_geometry(params, cfg, xs, None, None)["sdf"])
print(f"geometry fwd (N*K={N*K}):  {timeit(enc)*1e3:8.1f} ms", flush=True)


def gloss(p):
    return jnp.sum(forward_geometry(p, cfg, xs, None, None)["sdf"])


gbwd = jax.jit(lambda: jax.grad(gloss)(params))
print(f"geometry fwd+bwd:          {timeit(gbwd)*1e3:8.1f} ms", flush=True)


# with autodiff normals + eikonal (second-order through the encoder): the
# shape the real step runs
from envidr_tpu.models.network import geometry_with_normals


def gloss2(p):
    geo, normals, g = geometry_with_normals(p, cfg, xs, None, None)
    l = jnp.sum(geo["sdf"])
    if g is not None:
        l = l + jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
    return l


try:
    gbwd2 = jax.jit(lambda: jax.grad(gloss2)(params))
    print(f"geometry+normals fwd+bwd:  {timeit(gbwd2)*1e3:8.1f} ms", flush=True)
except Exception as e:
    print(f"geometry+normals probe skipped: {e}", flush=True)
