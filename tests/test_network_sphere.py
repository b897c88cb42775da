"""Full network init + sphere renderer: shapes, gradients, checkpoint import."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from envidr_tpu.models.network import (
    NetworkConfig, init_network_params, forward_geometry, geometry_with_normals,
    forward_color, get_color_mlp_extra_params, sdf_to_sigma,
)
from envidr_tpu.render.sphere import SphereRenderOptions, render_sphere

REF = "/root/reference"

# mirrors configs/neural_renderer.ini (env-sphere pretraining)
SPH_CFG = NetworkConfig(
    env_sph_mode=True, num_env_nets=3,  # 3 envs for test speed (ref uses 11)
    in_roughness=1, in_metallic=1, in_base_color=3,
    num_layers=3, geo_feat_dim=12, env_feat_dim=12,
    hidden_dim_env=160, roughness_act_scale=1.0,
    geo_feat_act="unitNorm", env_feat_act="unitNorm",
)


@pytest.fixture(scope="module")
def sph_params():
    return init_network_params(jax.random.PRNGKey(0), SPH_CFG)


def test_init_shapes(sph_params):
    p = sph_params
    assert p["sdf_net"][0]["w"].shape == (37, 64)       # 32 hash + 5 material
    assert p["sdf_net"][-1]["w"].shape == (64, 14)      # 1 sdf + 12 feat + 1 rough
    assert p["env_nets"][0]["w"].shape == (3, 38, 160)  # stacked envs, IDE deg4
    assert p["env_nets"][-1]["w"].shape == (3, 160, 12)
    assert p["color_net"][0]["w"].shape == (28, 64)     # 12+3+12+1
    assert p["diffuse_net"][0]["w"].shape == (24, 32)
    assert p["encoder"]["embeddings"].shape[1] == 2


def test_forward_geometry_and_normals(sph_params):
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (32, 3)),
                      jnp.float32)
    material = {"roughness": 0.3, "metallic": 0.8, "color": jnp.ones(4) * 0.5}
    geo, normals, grads = geometry_with_normals(
        sph_params, SPH_CFG, xyz, material, need_normals=True)
    assert geo["sdf"].shape == (32,)
    assert geo["geo_feat"].shape == (32, 12)
    assert geo["roughness"].shape == (32, 1)
    assert normals.shape == (32, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normals), axis=-1), 1.0, atol=1e-4)
    # geo_feat is unit-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(geo["geo_feat"]), axis=-1), 1.0, atol=1e-4)
    sig = sdf_to_sigma(sph_params, SPH_CFG, geo["sdf"])
    assert np.isfinite(np.asarray(sig)).all()


def test_env_index_selects_different_nets(sph_params):
    xyz = jnp.asarray([[0.1, 0.2, 0.9]])
    material = {"roughness": 0.2, "metallic": 0.9, "color": jnp.ones(4) * 0.7}
    geo, normals, _ = geometry_with_normals(sph_params, SPH_CFG, xyz, material)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    ne, wre, ndw, nee = get_color_mlp_extra_params(
        sph_params, SPH_CFG, normals, dirs, geo["roughness"])
    c0, _ = forward_color(sph_params, SPH_CFG, geo["geo_feat"], dirs, ne, wre,
                          ndw, env_index=0, n_env_enc=nee)
    c1, _ = forward_color(sph_params, SPH_CFG, geo["geo_feat"], dirs, ne, wre,
                          ndw, env_index=1, n_env_enc=nee)
    assert not np.allclose(np.asarray(c0), np.asarray(c1))
    assert c0.shape == (1, 3)


def test_render_sphere_end_to_end_and_grad(sph_params):
    N = 64
    rng = np.random.default_rng(1)
    # cameras at radius 4 looking at origin
    o = np.tile([[0.0, 0.0, -4.0]], (N, 1))
    targets = rng.uniform(-0.7, 0.7, (N, 3))
    d = targets - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o, rays_d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    material = {"roughness": 0.4, "metallic": 0.1, "color": jnp.ones(4) * 0.6}
    opts = SphereRenderOptions(training=True, with_surf_sdf=True, with_backsdf=True)

    def loss_fn(params):
        out = render_sphere(params, SPH_CFG, opts, rays_o, rays_d, 1.0,
                            material=material, env_index=1,
                            key=jax.random.PRNGKey(0))
        return jnp.mean(out["image"] ** 2), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(sph_params)
    assert out["image"].shape == (N, 3)
    assert out["depth"].shape == (N,)
    assert out["normal_image"].shape == (N, 3)
    assert out["diffuse_image"].shape == (N, 3)
    assert out["surf_sdfs"].shape == (N,)
    assert out["relsdf"].shape == (N, 11)
    assert np.isfinite(float(loss))
    # gradients reach the hash table, sdf net, color nets, and selected env net
    flat = jax.tree_util.tree_leaves_with_path(grads)
    total = {jax.tree_util.keystr(path): float(jnp.abs(g).sum())
             for path, g in flat}
    assert total["['encoder']['embeddings']"] > 0
    assert any(v > 0 for k, v in total.items() if "sdf_net" in k)
    assert any(v > 0 for k, v in total.items() if "env_nets" in k)
    assert any(v > 0 for k, v in total.items() if "color_net" in k)
    # rays that miss the sphere composite to pure bg
    miss = ~np.asarray(out["mask"])
    if miss.any():
        np.testing.assert_allclose(np.asarray(out["image"])[miss], 1.0, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(f"{REF}/ckpts"), reason="no reference ckpts")
def test_import_rendering_mlps_and_env_ckpt():
    from envidr_tpu.io.torch_import import (
        load_state_dict, network_params_from_state, load_env_net)
    sd = load_state_dict(f"{REF}/ckpts/rendering_mlps.pth")
    params = network_params_from_state(sd, SPH_CFG)
    assert params["color_net"][0]["w"].shape == (28, 64)
    assert params["diffuse_net"][0]["w"].shape == (24, 32)
    assert params["renv_net"][0]["w"].shape == (4, 64)
    env = load_env_net(f"{REF}/ckpts/env_ckpts/env_net_0.pth")
    assert env[0]["w"].shape == (38, 160)
    assert env[-1]["w"].shape == (160, 12)
