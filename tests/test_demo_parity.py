"""First parity milestone: reproduce the reference demo render (demo.ipynb).

The reference ships pretrained sphere-renderer MLPs (``demo/*.pth``) plus the
hash encoding of a sphere surface point (``demo/xyz_encoding.txt``); its demo
notebook is the executable spec of the neural-rendering pipeline.  The golden
fixture (``tools/gen_golden.py``) froze the notebook's outputs; here the same
scene is rendered with OUR ops (IDE encoder, MLP stack, reflect, torch import)
and must match to fp32 tolerance.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from envidr_tpu.io.torch_import import load_mlp, load_env_net
from envidr_tpu.models.mlp import apply_mlp, unit_norm
from envidr_tpu.ops.ide import ide_encode
from envidr_tpu.geometry.rays import reflect_dir
import jax

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
REF = "/root/reference"


@pytest.fixture(scope="module")
def fix():
    if not os.path.exists(os.path.join(REF, "demo")):
        pytest.skip("reference checkpoints not available")
    return np.load(os.path.join(GOLDEN, "demo_render.npz"))


def test_demo_render_parity(fix):
    sdf_net = load_mlp(f"{REF}/demo/sdf_net.pth")
    diffuse_net = load_mlp(f"{REF}/demo/diffuse_net.pth")
    specular_net = load_mlp(f"{REF}/demo/specular_net.pth")
    xyz_encoding = jnp.asarray(fix["xyz_encoding"], jnp.float32)

    rays_o = jnp.asarray(fix["rays_o"])
    rays_d = jnp.asarray(fix["rays_d"])
    mask = np.asarray(fix["mask"])
    nears = jnp.asarray(fix["nears"])

    for ci in range(2):
        m = fix[f"case{ci}_material"]
        roughness, metallic, bc = float(m[0]), float(m[1]), m[2:5]
        env_idx = int(m[5])
        env_net = load_env_net(f"{REF}/demo/envs/env_net_{env_idx}.pth")

        dirs = rays_d[mask]
        xyzs = rays_o[mask] + dirs * nears[mask]
        normals = xyzs  # unit sphere

        material_vec = jnp.asarray([roughness, metallic, *bc], jnp.float32)
        h = jnp.concatenate([xyz_encoding, material_vec])[None]
        h = apply_mlp(sdf_net, h, act=jax.nn.relu)
        geo_feat = unit_norm(h[..., 1:13])
        geo_feat = jnp.broadcast_to(geo_feat, (xyzs.shape[0], 12))
        kappa_inv = jax.nn.softplus(h[..., -1] - 1.0)[0]

        n_enc = ide_encode(normals, 0.64, deg_view=4)
        w_o = -dirs
        w_r = reflect_dir(w_o, normals)
        w_r_enc = ide_encode(w_r, kappa_inv, deg_view=4)
        n_dot_v = jnp.sum(normals * w_o, axis=-1, keepdims=True)

        diffuse_env = unit_norm(apply_mlp(env_net, n_enc, act=jax.nn.relu))
        diffuse = jax.nn.sigmoid(apply_mlp(
            diffuse_net, jnp.concatenate([geo_feat, diffuse_env], -1), act=jax.nn.relu))
        specular_env = unit_norm(apply_mlp(env_net, w_r_enc, act=jax.nn.relu))
        specular = jax.nn.sigmoid(apply_mlp(
            specular_net,
            jnp.concatenate([geo_feat, normals, specular_env, n_dot_v], -1),
            act=jax.nn.relu))

        np.testing.assert_allclose(
            float(kappa_inv), fix[f"case{ci}_kappa_inv"], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(diffuse), fix[f"case{ci}_diffuse"], atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(specular), fix[f"case{ci}_specular"], atol=5e-4)
        # tighter aggregate bound: mean abs error well below 1/255
        err = np.abs(np.asarray(specular) - fix[f"case{ci}_specular"]).mean()
        assert err < 2e-5, err
