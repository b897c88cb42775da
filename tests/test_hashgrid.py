"""Hash-grid encoder: vs independent numpy oracle, gradients, double-backward."""

import numpy as np
import jax
import jax.numpy as jnp

from envidr_tpu.ops.hashgrid import (
    HashGridSpec, hash_encode, hash_encode_from_world, init_hash_params,
)

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def numpy_hash_encode(x, emb, spec: HashGridSpec):
    """Straightforward per-sample loop oracle (mirrors hashencoder.cu:104-205)."""
    B = x.shape[0]
    out = np.zeros((B, spec.num_levels * spec.level_dim), dtype=np.float64)
    for lvl in range(spec.num_levels):
        scale = spec.scales[lvl]
        res = spec.resolutions[lvl]
        hm = spec.offsets[lvl + 1] - spec.offsets[lvl]
        table = emb[spec.offsets[lvl]:spec.offsets[lvl + 1]]
        for b in range(B):
            if np.any((x[b] < 0) | (x[b] > 1)):
                continue
            pos = x[b] * scale
            pg = np.floor(pos).astype(np.int64)
            f = pos - pg
            if spec.interpolation == "smoothstep":
                w = f * f * (3 - 2 * f)
            else:
                w = f
            acc = np.zeros(spec.level_dim)
            for corner in range(8):
                weight = 1.0
                cpos = pg.copy()
                for d in range(3):
                    if corner & (1 << d):
                        weight *= w[d]
                        cpos[d] += 1
                    else:
                        weight *= 1 - w[d]
                if res**3 <= hm:
                    idx = cpos[0] + cpos[1] * res + cpos[2] * res * res
                else:
                    idx = np.uint64(0)
                    for d in range(3):
                        idx ^= (np.uint64(cpos[d]) * PRIMES[d]) & np.uint64(0xFFFFFFFF)
                idx = int(idx) % hm
                acc += weight * table[idx]
            out[b, lvl * spec.level_dim:(lvl + 1) * spec.level_dim] = acc
    return out


def _setup(seed=0, interp="smoothstep"):
    spec = HashGridSpec(num_levels=8, level_dim=2, base_resolution=4,
                        desired_resolution=128, log2_hashmap_size=12,
                        interpolation=interp)
    key = jax.random.PRNGKey(seed)
    params = init_hash_params(key, spec, std=0.5)
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.001, 0.999, size=(64, 3)).astype(np.float32)
    x[0] = [0.0, 0.0, 0.0]
    x[1] = [1.0, 1.0, 1.0]
    x[2] = [-0.1, 0.5, 0.5]  # OOB -> zeros
    return spec, params, x


def test_forward_matches_numpy_oracle():
    for interp in ("smoothstep", "linear"):
        spec, params, x = _setup(interp=interp)
        got = np.asarray(hash_encode(jnp.asarray(x), params["embeddings"], spec))
        want = numpy_hash_encode(x, np.asarray(params["embeddings"]), spec)
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert np.all(got[2] == 0.0)  # OOB row


def test_grad_embeddings_finite_difference():
    spec, params, x = _setup()
    emb = params["embeddings"]
    x = jnp.asarray(x[3:8])

    def loss(e):
        return jnp.sum(hash_encode(x, e, spec) ** 2)

    g = jax.grad(loss)(emb)
    rng = np.random.default_rng(1)
    # probe a few entries that have nonzero grad
    idx = np.argsort(-np.abs(np.asarray(g)).sum(-1))[:5]
    eps = 1e-3
    for i in idx:
        for c in range(spec.level_dim):
            e1 = emb.at[i, c].add(eps)
            e2 = emb.at[i, c].add(-eps)
            fd = (loss(e1) - loss(e2)) / (2 * eps)
            np.testing.assert_allclose(g[i, c], fd, rtol=1e-2, atol=1e-4)


def test_grad_inputs_finite_difference():
    spec, params, x = _setup()
    pts = jnp.asarray(x[3:6])

    def loss(p):
        return jnp.sum(jnp.sin(hash_encode(p, params["embeddings"], spec)))

    g = jax.grad(loss)(pts)
    eps = 1e-4
    for i in range(pts.shape[0]):
        for d in range(3):
            p1 = pts.at[i, d].add(eps)
            p2 = pts.at[i, d].add(-eps)
            fd = (loss(p1) - loss(p2)) / (2 * eps)
            np.testing.assert_allclose(g[i, d], fd, rtol=5e-2, atol=1e-3)


def test_double_backward_eikonal_style():
    """grad-of-grad through the encoder (the eikonal-loss pattern) is finite
    and matches finite differences — replaces the reference's hand-written
    second-backward kernels (hashencoder.cu:376-434)."""
    spec, params, x = _setup()
    pts = jnp.asarray(x[3:6])

    def sdf(p, emb):
        return jnp.sum(hash_encode(p, emb, spec))

    def eikonal(emb):
        grads = jax.grad(sdf, argnums=0)(pts, emb)
        return jnp.sum((jnp.linalg.norm(grads, axis=-1) - 1.0) ** 2)

    g_emb = jax.grad(eikonal)(params["embeddings"])
    assert np.isfinite(np.asarray(g_emb)).all()
    assert np.abs(np.asarray(g_emb)).sum() > 0
    i = int(np.argmax(np.abs(np.asarray(g_emb)).sum(-1)))
    eps = 1e-3
    fd = (eikonal(params["embeddings"].at[i, 0].add(eps))
          - eikonal(params["embeddings"].at[i, 0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(g_emb[i, 0], fd, rtol=5e-2, atol=1e-3)


def test_world_coords_and_smoothstep_continuity():
    spec, params, _ = _setup()
    # crossing a cell boundary: smoothstep interp keeps C1 continuity
    t = jnp.linspace(0.45, 0.55, 201)
    pts = jnp.stack([t, jnp.full_like(t, 0.3), jnp.full_like(t, 0.7)], -1)
    y = hash_encode(pts, params["embeddings"], spec)
    dy = jnp.diff(y, axis=0)
    assert np.isfinite(np.asarray(dy)).all()
    world = hash_encode_from_world(pts * 2 - 1, params["embeddings"], spec, bound=1.0)
    np.testing.assert_allclose(world, y, atol=1e-6)


def test_rolled_tiled_dense_levels_match_hash():
    """Dense levels (res^3 <= table) are numerically identical between the
    reference-exact 'hash' indexing and the TPU 'rolled_tiled' mode."""
    import dataclasses
    spec_h = HashGridSpec(num_levels=6, level_dim=2, base_resolution=4,
                          desired_resolution=32, log2_hashmap_size=16,
                          indexing="hash")
    # all levels dense here (32^3 = 32768 < 2^16)
    spec_r = dataclasses.replace(spec_h, indexing="rolled_tiled")
    key = jax.random.PRNGKey(0)
    params = init_hash_params(key, spec_h, std=0.5)
    x = jnp.asarray(np.random.default_rng(0).uniform(0.01, 0.99, (128, 3)),
                    jnp.float32)
    out_h = hash_encode(x, params["embeddings"], spec_h)
    out_r = hash_encode(x, params["embeddings"], spec_r)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_h), atol=1e-6)


def test_rolled_tiled_gradients():
    spec = HashGridSpec(num_levels=8, level_dim=2, base_resolution=4,
                        desired_resolution=128, log2_hashmap_size=10,
                        indexing="rolled_tiled")
    params = init_hash_params(jax.random.PRNGKey(1), spec, std=0.5)
    x = jnp.asarray(np.random.default_rng(1).uniform(0.01, 0.99, (16, 3)),
                    jnp.float32)

    def loss(e, p):
        return jnp.sum(jnp.sin(hash_encode(p, e, spec)))

    ge = jax.grad(loss, argnums=0)(params["embeddings"], x)
    gx = jax.grad(loss, argnums=1)(params["embeddings"], x)
    eps = 1e-3
    i = int(np.argmax(np.abs(np.asarray(ge)).sum(-1)))
    fd = (loss(params["embeddings"].at[i, 0].add(eps), x)
          - loss(params["embeddings"].at[i, 0].add(-eps), x)) / (2 * eps)
    np.testing.assert_allclose(ge[i, 0], fd, rtol=2e-2, atol=1e-4)
    eps = 1e-4
    fd = (loss(params["embeddings"], x.at[3, 1].add(eps))
          - loss(params["embeddings"], x.at[3, 1].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(gx[3, 1], fd, rtol=5e-2, atol=1e-3)
    # double backward exists and is finite
    gg = jax.grad(lambda e: jnp.sum(jax.grad(loss, argnums=1)(e, x) ** 2))(
        params["embeddings"])
    assert np.isfinite(np.asarray(gg)).all()
