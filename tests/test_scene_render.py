"""Scene renderer end-to-end: geometry SDF, gradients, loss-aux outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from envidr_tpu.models.network import NetworkConfig, init_network_params
from envidr_tpu.ops.grid import GridSpec, init_grid, update_grid
from envidr_tpu.render.scene import SceneRenderOptions, render_scene
from envidr_tpu.models.network import forward_geometry, sdf_to_sigma

# scene-mode config (toaster.ini shape, scaled down for test speed)
SCENE_CFG = NetworkConfig(
    num_levels=8, desired_resolution=256, log2_hashmap_size=15,
    num_layers=3, geo_feat_dim=12, env_feat_dim=12, hidden_dim_env=64,
    sh_degree=4, use_renv=False, learn_indir_blend=False,
    geo_feat_act="unitNorm", env_feat_act="unitNorm",
)


@pytest.fixture(scope="module")
def setup():
    params = init_network_params(jax.random.PRNGKey(0), SCENE_CFG)
    spec = GridSpec(grid_size=32, bound=1.0, density_thresh=0.01)
    grid = init_grid(spec)

    def density_fn(x):
        geo = forward_geometry(params, SCENE_CFG, x)
        return sdf_to_sigma(params, SCENE_CFG, geo["sdf"])

    grid = update_grid(grid, spec, density_fn, jax.random.PRNGKey(1))
    return params, grid, spec


def _rays(n=32, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile([[0.0, 0.0, -2.5]], (n, 1))
    tgt = rng.uniform(-0.5, 0.5, (n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_render_scene_forward_backward(setup):
    params, grid, spec = setup
    rays_o, rays_d = _rays()
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = SceneRenderOptions(
        max_steps=256, num_samples=64, training=True, perturb=True,
        with_loss_aux=True, grid_size=spec.grid_size)

    def loss_fn(p):
        out = render_scene(p, SCENE_CFG, opts, grid.bitfield, rays_o, rays_d,
                           1.0, aabb, key=jax.random.PRNGKey(2))
        return jnp.mean(out["image"] ** 2) + jnp.mean(out["sdf_gradients"] ** 2), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert out["image"].shape == (32, 3)
    assert out["depth"].shape == (32,)
    assert out["relsdf"].shape == (32, 63)
    assert out["counts"].dtype == jnp.int32
    g_emb = float(jnp.abs(grads["encoder"]["embeddings"]).sum())
    assert np.isfinite(g_emb) and g_emb > 0
    # fresh init has near-zero density -> weights small, image ~ bg
    assert float(out["weights_sum"].max()) <= 1.0 + 1e-5


def test_render_scene_geometry_only_and_jit(setup):
    params, grid, spec = setup
    rays_o, rays_d = _rays(16)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = SceneRenderOptions(
        max_steps=256, num_samples=64, geometry_only=True,
        grid_size=spec.grid_size)

    @jax.jit
    def run(p, bf, o, d):
        return render_scene(p, SCENE_CFG, opts, bf, o, d, 0.0, aabb)

    out = run(params, grid.bitfield, rays_o, rays_d)
    assert out["image"] is None
    assert out["normal_image"].shape == (16, 3)
    out2 = run(params, grid.bitfield, rays_o, rays_d)  # cached second call
    np.testing.assert_allclose(np.asarray(out["normal_image"]),
                               np.asarray(out2["normal_image"]))


def test_render_scene_empty_grid_gives_bg(setup):
    params, _, spec = setup
    grid = init_grid(GridSpec(grid_size=spec.grid_size))
    rays_o, rays_d = _rays(8)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = SceneRenderOptions(max_steps=128, num_samples=32,
                              grid_size=spec.grid_size)
    out = render_scene(params, SCENE_CFG, opts, grid.bitfield, rays_o, rays_d,
                       1.0, aabb)
    np.testing.assert_allclose(np.asarray(out["image"]), 1.0, atol=1e-6)
    assert int(out["counts"].sum()) == 0
