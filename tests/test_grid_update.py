"""Occupancy-grid slab updates: rotating 1/fraction coverage == full sweep."""

import numpy as np
import jax
import jax.numpy as jnp

from envidr_tpu.ops.grid import GridSpec, init_grid, update_grid


def _density_fn(x):
    # static analytic field: a centered ball of high density
    return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.5, 10.0, 0.0)


def test_slab_rotation_covers_full_grid():
    spec = GridSpec(grid_size=32, density_thresh=0.01)
    key = jax.random.PRNGKey(0)

    full = update_grid(init_grid(spec), spec, _density_fn,
                       key, decay=1.0)
    part = init_grid(spec)
    for i in range(4):
        part = update_grid(part, spec, _density_fn,
                           jax.random.fold_in(key, i), decay=1.0, fraction=4)
    # after 4 rotations every cell has been visited once; with decay=1 and a
    # static field the EMA-max equals the full sweep (up to jitter noise at
    # the ball boundary)
    agree = (np.asarray(full.bitfield) == np.asarray(part.bitfield)).mean()
    assert agree > 0.99, agree
    assert int(part.iter_density) == 4


def test_slab_decays_globally_refreshes_locally():
    """Out-of-slab trained cells must still decay every partial update (the
    pruning dynamic of the reference's occupied-biased resampling); only the
    rotating slab gets re-evaluated."""
    spec = GridSpec(grid_size=32)
    g0 = init_grid(spec)
    # slab 1 covers x in [8,16)/32 -> crosses the ball; slab 0 would miss it
    g0 = g0._replace(density=jnp.full_like(g0.density, 0.5),
                     iter_density=jnp.asarray(1, jnp.int32))
    g1 = update_grid(g0, spec, _density_fn, jax.random.PRNGKey(1),
                     decay=0.9, fraction=4)
    d0 = np.asarray(g0.density)
    d1 = np.asarray(g1.density)
    n = d0.shape[1]
    out = np.r_[0:n // 4, n // 2:n]
    # outside the slab: pure decay
    np.testing.assert_allclose(d1[:, out], d0[:, out] * 0.9, rtol=1e-6)
    # inside the slab: cells in the high-density ball were refreshed upward
    assert (d1[:, n // 4:n // 2] > 1.0).any()
