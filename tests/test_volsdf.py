"""VolSDF error-bound sampling: sampler concentrates near the surface."""

import numpy as np
import jax
import jax.numpy as jnp

from envidr_tpu.render.volsdf import VolSDFOptions, render_volsdf, _d_star
from envidr_tpu.models.network import init_network_params
from tests.test_scene_render import SCENE_CFG, _rays


def test_d_star_properties():
    z = jnp.asarray([[0.0, 0.1, 0.2, 0.3]])
    # same-sign consecutive sdf -> positive bound; sign change -> 0
    sdf = jnp.asarray([[0.5, 0.4, -0.1, -0.2]])
    ds = _d_star(z, sdf)
    assert ds.shape == (1, 3)
    assert float(ds[0, 0]) > 0
    assert float(ds[0, 1]) == 0.0  # sign change between samples


def test_render_volsdf_end_to_end():
    params = init_network_params(jax.random.PRNGKey(0), SCENE_CFG)
    rays_o, rays_d = _rays(8)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = VolSDFOptions(num_steps=32, upsample_steps=16, n_samples_extra=8,
                         grow_iters=2, beta_iters=5, training=True)
    out = render_volsdf(params, SCENE_CFG, opts, rays_o, rays_d, 1.0, aabb,
                        key=jax.random.PRNGKey(1))
    S_final = 16 + 8 + 2
    assert out["image"].shape == (8, 3)
    assert out["sigmas"].shape == (8, S_final)
    assert np.isfinite(np.asarray(out["image"])).all()
    g = jax.grad(lambda p: jnp.mean(render_volsdf(
        p, SCENE_CFG, opts, rays_o, rays_d, 1.0, aabb,
        key=jax.random.PRNGKey(1))["image"]))(params)
    assert float(jnp.abs(g["encoder"]["embeddings"]).sum()) > 0
