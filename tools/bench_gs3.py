"""Gather/scatter round 3: index-clamp overhead (PROMISE_IN_BOUNDS).

XLA guards every gather/scatter row with a bounds clamp by default.  Our hash
indices are in-bounds by construction (everything is mod table-size), so the
guard is pure overhead — if it is a meaningful fraction of the 24ns/row gather
/ 100ns/row scatter costs, this is a free constant-factor win.

Also probes: unique_indices, indices_are_sorted (lies about sortedness are
unsound -- measured only to see the ceiling), wider rows (byte-cap vs row-cap).

Run (single-tenant TPU):  timeout 900 python -u tools/bench_gs3.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

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
    _ = float(jnp.asarray(s).ravel()[0])
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
idxL = jax.random.randint(k1, (L, B), 0, S, jnp.int32)
rowsL = jax.random.normal(k2, (L, B, W), jnp.float32)
tableL = jax.random.normal(k3, (L, S, W), jnp.float32)


def report(name, t, rows_moved):
    print(f"{name:52s} {t*1e3:9.2f} ms   {rows_moved/t/1e6:8.1f} Mrows/s",
          flush=True)


# ---------------- gathers ----------------
@jax.jit
def g_take(tabs, idxL):
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(tabs, idxL)

report("gather take (anchor, clip)", timeit(g_take, tableL, idxL), L * B)


@jax.jit
def g_promise(tabs, idxL):
    return jax.vmap(lambda t, i: t.at[i].get(mode="promise_in_bounds"))(
        tabs, idxL)

report("gather promise_in_bounds", timeit(g_promise, tableL, idxL), L * B)


@jax.jit
def g_promise_unique(tabs, idxL):
    return jax.vmap(lambda t, i: t.at[i].get(
        mode="promise_in_bounds", indices_are_sorted=True))(tabs, idxL)

report("gather promise+sorted-lie (ceiling probe)",
       timeit(g_promise_unique, tableL, idxL), L * B)

# wider rows: is gather row-capped or byte-capped?
for Wbig, Lw in ((64, 4), (128, 2)):
    tab = jax.random.normal(k3, (Lw, S, Wbig), jnp.float32)
    ix = idxL[:Lw]

    @jax.jit
    def g_wide(tabs, ix):
        return jax.vmap(lambda t, i: t.at[i].get(
            mode="promise_in_bounds"))(tabs, ix)

    t = timeit(g_wide, tab, ix)
    report(f"gather promise W={Wbig} (L={Lw})", t, Lw * B)

# ---------------- scatters ----------------
@jax.jit
def s_anchor(idxL, rowsL):
    return jax.vmap(lambda i, r: jnp.zeros((S, W), jnp.float32).at[i].add(r))(
        idxL, rowsL)

report("scatter at[].add (anchor)", timeit(s_anchor, idxL, rowsL), L * B)


@jax.jit
def s_promise(idxL, rowsL):
    return jax.vmap(lambda i, r: jnp.zeros((S, W), jnp.float32).at[i].add(
        r, mode="promise_in_bounds"))(idxL, rowsL)

report("scatter promise_in_bounds", timeit(s_promise, idxL, rowsL), L * B)


@jax.jit
def s_promise_unique(idxL, rowsL):
    return jax.vmap(lambda i, r: jnp.zeros((S, W), jnp.float32).at[i].add(
        r, mode="promise_in_bounds", unique_indices=True))(idxL, rowsL)

report("scatter promise+unique-lie (ceiling probe)",
       timeit(s_promise_unique, idxL, rowsL), L * B)


@jax.jit
def s_promise_sorted(idxL, rowsL):
    return jax.vmap(lambda i, r: jnp.zeros((S, W), jnp.float32).at[i].add(
        r, mode="promise_in_bounds", indices_are_sorted=True,
        unique_indices=True))(idxL, rowsL)

report("scatter promise+sorted+unique-lie (ceiling)",
       timeit(s_promise_sorted, idxL, rowsL), L * B)
