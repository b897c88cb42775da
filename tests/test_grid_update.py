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


def test_slab_only_touches_its_quarter():
    spec = GridSpec(grid_size=32)
    g0 = init_grid(spec)
    g0 = g0._replace(density=jnp.full_like(g0.density, 0.5))
    g1 = update_grid(g0, spec, _density_fn, jax.random.PRNGKey(1),
                     fraction=4)
    changed = np.asarray(g1.density != g0.density)
    n = changed.shape[1]
    assert not changed[:, n // 4:].any()          # slab 0 only
