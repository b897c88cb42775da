"""CP (MXU two-hot matmul) encoder vs hash encoder on the chip.

Workload matches the train-step bench attribution: B=262144 sample points,
16 levels.  Measures forward and grad(tables, x) wall time for:
  * hash rolled_tiled (autodiff backward — the current scene default)
  * cp rank 32 / 64 (all passes are dense contractions; no scatter anywhere)

Run (single-tenant TPU):  timeout 1800 python -u tools/bench_cp.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from envidr_tpu.ops.cp import CPSpec, cp_encode, init_cp_params
from envidr_tpu.ops.hashgrid import HashGridSpec, hash_encode, init_hash_params

B = 262_144
print(f"devices: {jax.devices()}", flush=True)


def timeit(fn, *args, iters=5, warmup=2):
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


x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))

# ---- hash (rolled_tiled, autodiff bwd) ----
hspec = HashGridSpec(num_levels=16, level_dim=2, base_resolution=16,
                     log2_hashmap_size=19, desired_resolution=2048,
                     interpolation="smoothstep", indexing="rolled_tiled",
                     custom_grad=False)
hemb = init_hash_params(jax.random.PRNGKey(0), hspec)["embeddings"]


@jax.jit
def h_fwd(emb, x):
    return hash_encode(x, emb, hspec)


@jax.jit
def h_bwd(emb, x):
    def loss(e, xx):
        return jnp.sum(hash_encode(xx, e, hspec) ** 2)
    return jax.grad(loss, argnums=(0, 1))(emb, x)


t = timeit(h_fwd, hemb, x)
print(f"hash fwd            {t*1e3:9.2f} ms", flush=True)
t = timeit(h_bwd, hemb, x)
print(f"hash grad(emb,x)    {t*1e3:9.2f} ms", flush=True)

# ---- cp ----
for rank in (32, 64):
    cspec = CPSpec(num_levels=16, level_dim=2, rank=rank, base_resolution=16,
                   desired_resolution=2048)
    cparams = init_cp_params(jax.random.PRNGKey(0), cspec)

    @jax.jit
    def c_fwd(p, x):
        return cp_encode(x, p, cspec)

    @jax.jit
    def c_bwd(p, x):
        def loss(pp, xx):
            return jnp.sum(cp_encode(xx, pp, cspec) ** 2)
        return jax.grad(loss, argnums=(0, 1))(p, x)

    # eikonal-style second order: grad wrt params of ||d enc / d x||^2
    @jax.jit
    def c_second(p, x):
        def eik(pp):
            def f(xx):
                return jnp.sum(cp_encode(xx, pp, cspec))
            return jnp.sum(jax.grad(f)(x) ** 2)
        return jax.grad(eik)(p)

    try:
        t = timeit(c_fwd, cparams, x)
        print(f"cp[{rank}] fwd          {t*1e3:9.2f} ms", flush=True)
        t = timeit(c_bwd, cparams, x)
        print(f"cp[{rank}] grad(T,x)    {t*1e3:9.2f} ms", flush=True)
        t = timeit(c_second, cparams, x)
        print(f"cp[{rank}] eikonal 2nd  {t*1e3:9.2f} ms", flush=True)
    except Exception as e:
        print(f"cp[{rank}] FAILED: {str(e)[:200]}", flush=True)
