"""CP (MXU two-hot matmul) encoder: correctness, gradients, expressiveness."""

import numpy as np
import jax
import jax.numpy as jnp

from envidr_tpu.ops.cp import CPSpec, cp_encode, init_cp_params

SPEC = CPSpec(num_levels=4, level_dim=2, rank=8, base_resolution=4,
              desired_resolution=32, compute_dtype="float32")


def _naive(x, params, spec):
    """Reference: direct 1-D linear interpolation per axis, no matmuls."""
    outs = []
    for lvl in range(spec.num_levels):
        R = spec.resolutions[lvl]
        prod = 1.0
        for a in range(spec.input_dim):
            pos = np.clip(np.asarray(x[:, a]) * spec.scales[lvl], 0, R - 1)
            i0 = np.clip(np.floor(pos).astype(int), 0, R - 2)
            f = pos - i0
            tab = np.asarray(params["axes"][lvl][a])
            prod = prod * ((1 - f)[:, None] * tab[i0] + f[:, None] * tab[i0 + 1])
        outs.append(prod @ np.asarray(params["proj"][lvl]))
    return np.concatenate(outs, axis=-1)


def test_matches_naive_interp():
    params = init_cp_params(jax.random.PRNGKey(0), SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(1), (97, 3))
    got = np.asarray(cp_encode(x, params, SPEC))
    want = _naive(x, params, SPEC)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_out_of_bounds_zero():
    params = init_cp_params(jax.random.PRNGKey(0), SPEC)
    x = jnp.asarray([[0.5, 0.5, 1.5], [-0.1, 0.2, 0.2]])
    assert np.allclose(np.asarray(cp_encode(x, params, SPEC)), 0.0)


def test_gradients_flow_both_orders():
    params = init_cp_params(jax.random.PRNGKey(0), SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(2), (33, 3), minval=0.05,
                           maxval=0.95)

    def loss(p, xx):
        return jnp.sum(cp_encode(xx, p, SPEC) ** 2)

    g = jax.grad(loss)(params, x)
    assert all(float(jnp.abs(t).sum()) > 0
               for lvl in g["axes"] for t in lvl)

    # second order through d/dx (the eikonal pattern)
    def eik(p):
        def f(xx):
            return jnp.sum(cp_encode(xx, p, SPEC))
        return jnp.sum(jax.grad(f)(x) ** 2)

    g2 = jax.grad(eik)(params)
    assert np.isfinite(float(jax.tree.reduce(
        lambda a, b: a + jnp.abs(b).sum(), g2, 0.0)))


def test_fits_a_toy_sdf():
    """Expressiveness: regress sdf(x)=|x-c|-r to low error in a few steps."""
    import optax
    spec = CPSpec(num_levels=6, level_dim=2, rank=16, base_resolution=4,
                  desired_resolution=64, compute_dtype="float32")
    params = init_cp_params(jax.random.PRNGKey(0), spec)
    head = jax.random.normal(jax.random.PRNGKey(1),
                             (spec.output_dim, 1)) * 0.1
    opt = optax.adam(3e-2)
    state = opt.init((params, head))

    def target(x):
        return jnp.linalg.norm(x - 0.5, axis=-1) - 0.3

    @jax.jit
    def step(carry, key):
        (p, h), s = carry
        x = jax.random.uniform(key, (4096, 3))

        def loss(ph):
            pp, hh = ph
            pred = cp_encode(x, pp, spec) @ hh
            return jnp.mean((pred[:, 0] - target(x)) ** 2)

        l, g = jax.value_and_grad(loss)((p, h))
        up, s = opt.update(g, s)
        return ((jax.tree.map(lambda a, b: a + b, (p, h), up)), s), l

    carry = ((params, head), state)
    key = jax.random.PRNGKey(3)
    for i in range(200):
        key, sub = jax.random.split(key)
        carry, l = step(carry, sub)
    assert float(l) < 2e-3, f"toy SDF mse {float(l)}"


def test_cp_scene_network_integration():
    """CP encoder as the geometry encoding inside the full network."""
    import dataclasses
    from envidr_tpu.models.network import (forward_geometry,
                                           init_network_params)
    from tests.test_scene_render import SCENE_CFG
    cfg = dataclasses.replace(SCENE_CFG, encoding_pos="cp", cp_rank=8)
    params = init_network_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (65, 3), minval=-0.5,
                           maxval=0.5)
    geo = forward_geometry(params, cfg, x)
    assert np.isfinite(np.asarray(geo["sdf"])).all()

    def eik(p):
        def f(xx):
            return jnp.sum(forward_geometry(p, cfg, xx)["sdf"])
        return jnp.sum(jax.grad(f)(x) ** 2)

    g = jax.grad(eik)(params)
    tot = sum(float(jnp.abs(t).sum()) for lvl in g["encoder"]["axes"]
              for t in lvl)
    assert np.isfinite(tot) and tot > 0


def test_take_matches_twohot_both_orders():
    """r5: the gather-lerp 'take' formulation (default; 17x faster on chip)
    must agree with the dense two-hot matmul to f32 precision — value, dx,
    dtable, and the eikonal second-order."""
    import dataclasses

    spec_take = dataclasses.replace(SPEC, formulation="take")
    spec_two = dataclasses.replace(SPEC, formulation="twohot")
    params = init_cp_params(jax.random.PRNGKey(0), spec_take)
    x = jax.random.uniform(jax.random.PRNGKey(1), (97, 3))

    np.testing.assert_allclose(np.asarray(cp_encode(x, params, spec_take)),
                               np.asarray(cp_encode(x, params, spec_two)),
                               rtol=0, atol=1e-6)

    def loss(p, xx, spec):
        return jnp.sum(cp_encode(xx, p, spec) ** 2)

    gt_t = jax.grad(loss)(params, x, spec_take)
    gt_2 = jax.grad(loss)(params, x, spec_two)
    for a, b in zip(jax.tree.leaves(gt_t), jax.tree.leaves(gt_2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)

    gx_t = jax.grad(loss, argnums=1)(params, x, spec_take)
    gx_2 = jax.grad(loss, argnums=1)(params, x, spec_two)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_2),
                               rtol=0, atol=1e-4)

    def eik(p, spec):
        g = jax.grad(lambda xx: jnp.sum(cp_encode(xx, p, spec)))(x)
        return jnp.sum(g * g)

    e_t = jax.grad(eik)(params, spec_take)
    e_2 = jax.grad(eik)(params, spec_two)
    for a, b in zip(jax.tree.leaves(e_t), jax.tree.leaves(e_2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-4)
