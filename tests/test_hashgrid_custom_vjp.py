"""Custom first+second-order VJP of the rolled_tiled encoder vs autodiff.

The fast path (``HashGridSpec.custom_grad``) hand-writes the backward and
double-backward (mirrors ``/root/reference/hashencoder/hashgrid.py:55-104`` +
``hashencoder.cu:258-434``); the pure-autodiff rolled path is the oracle.
"""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from envidr_tpu.ops.hashgrid import HashGridSpec, hash_encode, init_hash_params


@pytest.fixture(scope="module")
def specs():
    fast = HashGridSpec(num_levels=6, level_dim=2, base_resolution=16,
                        log2_hashmap_size=15, desired_resolution=128,
                        interpolation="smoothstep", indexing="rolled_tiled",
                        custom_grad=True)
    return fast, dataclasses.replace(fast, custom_grad=False)


@pytest.fixture(scope="module")
def data(specs):
    emb = init_hash_params(jax.random.PRNGKey(0), specs[0])["embeddings"]
    # include out-of-bounds samples: they must produce zero everywhere
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3),
                           minval=-0.05, maxval=1.05)
    return emb, x


def test_forward_parity(specs, data):
    fast, oracle = specs
    emb, x = data
    a = hash_encode(x, emb, fast)
    b = hash_encode(x, emb, oracle)
    assert jnp.max(jnp.abs(a - b)) < 1e-6


def test_first_order_parity(specs, data):
    fast, oracle = specs
    emb, x = data

    def loss(e, xx, spec):
        return jnp.sum(jnp.sin(hash_encode(xx, e, spec) * 3.0))

    gf = jax.grad(loss, argnums=(0, 1))(emb, x, fast)
    go = jax.grad(loss, argnums=(0, 1))(emb, x, oracle)
    assert jnp.max(jnp.abs(gf[0] - go[0])) < 1e-5   # d_embeddings
    assert jnp.max(jnp.abs(gf[1] - go[1])) < 1e-5   # d_inputs


def test_second_order_parity(specs, data):
    """Eikonal-style double backward: grad wrt (emb, x) of ||d enc/d x||^2."""
    fast, oracle = specs
    emb, x = data

    def eik(e, xx, spec):
        gx = jax.grad(lambda p: jnp.sum(hash_encode(p, e, spec)))(xx)
        return jnp.sum(gx ** 2)

    gf = jax.grad(eik, argnums=(0, 1))(emb, x, fast)
    go = jax.grad(eik, argnums=(0, 1))(emb, x, oracle)
    # second-order magnitudes are O(20); allow float32 accumulation slack
    assert jnp.max(jnp.abs(gf[0] - go[0])) < 2e-4
    assert jnp.max(jnp.abs(gf[1] - go[1])) < 2e-4


def test_linear_interpolation_mode(specs, data):
    fast, oracle = specs
    emb, x = data
    fast = dataclasses.replace(fast, interpolation="linear")
    oracle = dataclasses.replace(oracle, interpolation="linear")
    a = hash_encode(x, emb, fast)
    b = hash_encode(x, emb, oracle)
    assert jnp.max(jnp.abs(a - b)) < 1e-6

    def loss(e, xx, spec):
        return jnp.sum(hash_encode(xx, e, spec) ** 2)

    gf = jax.grad(loss)(emb, x, fast)
    go = jax.grad(loss)(emb, x, oracle)
    assert jnp.max(jnp.abs(gf - go)) < 1e-5
