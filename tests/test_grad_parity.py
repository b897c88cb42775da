"""Gradient parity vs the torch reference (the BASELINE's backward half).

Fixtures (``tests/golden/sphere_grads.npz``, ``volume_grads.npz``; generated
by ``tools/gen_golden.py``) freeze d(loss)/d(params) computed by TORCH
AUTOGRAD on reference-semantics compositions:

* sphere shade (``sph_ray.py:34-221``) with ``create_graph=True`` normals
  (``renderer.py:182-198``) — double backward through the freq geometry net,
  real pretrained rendering/env MLPs;
* a full volume-render step (``non_cuda_ray.py:13-182`` semantics): hash
  encoding (smoothstep, ``hashencoder.cu:140-205``) -> SDF MLP -> autograd
  normals -> straight-through Laplace beta (``network.py:39-44``) -> color
  MLP -> alpha composite -> mse + eikonal.  The volume fixture is checked
  against BOTH our reference-exact ``indexing='hash'`` path (JAX autodiff)
  and the production ``rolled_tiled`` path (hand-written 1st+2nd-order
  custom_vjp) — dense levels make the two numerically identical.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _allclose(ours, ref, name, rtol=5e-4, rel_to_max=1e-5):
    """``rel_to_max`` is the atol as a fraction of the tensor's max |grad|.

    The sphere fixture needs 3e-3: measured against a float64 oracle, torch's
    OWN fp32 gradients deviate by 1.3e-3 rel-to-max through the 3-layer
    double-backward chain (ours deviate by 6.5e-4 — closer), so anything
    tighter tests fp32 summation order, not correctness."""
    ours = np.asarray(ours)
    ref = np.asarray(ref)
    atol = 1e-6 + rel_to_max * np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol,
                               err_msg=f"gradient mismatch: {name}")


# ---------------------------------------------------------------------------
# sphere shade gradients
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sphere_fix():
    return np.load(os.path.join(GOLD, "sphere_grads.npz"))


def test_sphere_shade_grad_parity(sphere_fix):
    from tests.test_sphere_golden import CFG, _params_from_fixture
    from envidr_tpu.render.sphere import SphereRenderOptions, render_sphere

    fix = sphere_fix
    params = _params_from_fixture(fix)
    opts = SphereRenderOptions(num_step=12, step_size=0.002, radius=0.95,
                               need_normals=True, training=True)
    rays_o = jnp.asarray(fix["rays_o"])
    rays_d = jnp.asarray(fix["rays_d"])
    m = fix["material"]
    material = {"roughness": float(m[0]), "metallic": float(m[1]),
                "color": jnp.asarray(m[2:5])}
    w_fix = jnp.asarray(fix["w_fix"])

    def loss_fn(p):
        out = render_sphere(p, CFG, opts, rays_o, rays_d, 1.0,
                            material=material, env_index=0)
        eik = jnp.mean(
            (jnp.linalg.norm(out["sdf_gradients"], axis=-1) - 1.0) ** 2)
        return jnp.sum(out["image"] * w_fix) + 0.05 * eik

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(fix["loss"]), rtol=1e-4)

    TOL = dict(rtol=0.0, rel_to_max=3e-3)
    for i in range(3):
        _allclose(grads["sdf_net"][i]["w"].T, fix[f"grad.sdf_net.{i}.w"],
                  f"sdf_net.{i}.w", **TOL)
        _allclose(grads["sdf_net"][i]["b"], fix[f"grad.sdf_net.{i}.b"],
                  f"sdf_net.{i}.b", **TOL)
    for name, ours in (("diffuse_net", grads["diffuse_net"]),
                       ("color_net", grads["color_net"])):
        for i, layer in enumerate(ours):
            _allclose(layer["w"].T, fix[f"grad.{name}.{i}.w"],
                      f"{name}.{i}.w", **TOL)
            _allclose(layer["b"], fix[f"grad.{name}.{i}.b"],
                      f"{name}.{i}.b", **TOL)
    # env bank is stacked [2, ...]; case uses env 0 — env 1 must get zero grad
    for i, layer in enumerate(grads["env_nets"]):
        _allclose(layer["w"][0].T, fix[f"grad.env_net.{i}.w"],
                  f"env_net.{i}.w", **TOL)
        _allclose(layer["b"][0], fix[f"grad.env_net.{i}.b"],
                  f"env_net.{i}.b", **TOL)
        assert np.abs(np.asarray(layer["w"][1])).max() == 0.0


# ---------------------------------------------------------------------------
# volume render step gradients (hash encoder double backward)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def volume_fix():
    return np.load(os.path.join(GOLD, "volume_grads.npz"))


def _volume_loss_fn(fix, spec):
    from envidr_tpu.ops.hashgrid import hash_encode

    rays_o = jnp.asarray(fix["rays_o"])
    rays_d = jnp.asarray(fix["rays_d"])
    z_vals = jnp.asarray(fix["z_vals"])
    target = jnp.asarray(fix["target"])
    N, K = z_vals.shape
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    xyz = jnp.clip(xyz, -0.8, 0.8)
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)

    def mlp(p, name, n, h):
        for l in range(n):
            h = h @ p[f"{name}.{l}.w"].T + p[f"{name}.{l}.b"]
            if l != n - 1:
                h = jax.nn.relu(h)
        return h

    def geometry(p, x):
        feats = hash_encode((x + 1.0) / 2.0, p["embeddings"], spec)
        h = mlp(p, "mlp1", 2, jnp.concatenate([feats, x], -1))
        return h[..., 0], h[..., 1:9]

    def loss_fn(p):
        sdf, geo_feat = geometry(p, xyz)
        raw_grad = jax.grad(
            lambda x: jnp.sum(geometry(p, x)[0]))(xyz)
        normals = raw_grad / jnp.maximum(
            jnp.linalg.norm(raw_grad, axis=-1, keepdims=True), 1e-10)
        # straight-through beta clamp (network.py:39-44)
        beta = p["beta"]
        beta_eff = beta + (jnp.clip(jax.lax.stop_gradient(beta), 1e-4, 1.0)
                           - jax.lax.stop_gradient(beta))
        sigmas = (1.0 / beta_eff) * (
            0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta_eff))
        rgbs = jax.nn.sigmoid(
            mlp(p, "mlp2", 2, jnp.concatenate([geo_feat, normals, dirs], -1)))
        deltas = z_vals[..., 1:] - z_vals[..., :-1]
        deltas = jnp.concatenate(
            [deltas, jnp.full_like(deltas[..., :1], 0.07)], -1)
        alphas = 1.0 - jnp.exp(-deltas * sigmas)
        shifted = jnp.concatenate(
            [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-15], -1)
        weights = alphas * jnp.cumprod(shifted, -1)[..., :-1]
        wsum = jnp.sum(weights, -1, keepdims=True)
        image = jnp.sum(weights[..., None] * rgbs, -2) + (1.0 - wsum)
        eik = jnp.mean((jnp.linalg.norm(raw_grad, axis=-1) - 1.0) ** 2)
        return jnp.mean((image - target) ** 2) + 0.01 * eik

    return loss_fn


def _volume_params(fix):
    p = {"embeddings": jnp.asarray(fix["embeddings"]),
         "beta": jnp.asarray(fix["beta"])}
    for name in ("mlp1", "mlp2"):
        for l in range(2):
            p[f"{name}.{l}.w"] = jnp.asarray(fix[f"{name}.{l}.w"])
            p[f"{name}.{l}.b"] = jnp.asarray(fix[f"{name}.{l}.b"])
    return p


@pytest.mark.parametrize("indexing", ["hash", "rolled_tiled"])
def test_volume_step_grad_parity(volume_fix, indexing):
    from envidr_tpu.ops.hashgrid import HashGridSpec

    fix = volume_fix
    L, C, base, desired, log2_hm = (int(v) for v in fix["spec"])
    spec = HashGridSpec(
        num_levels=L, level_dim=C, base_resolution=base,
        desired_resolution=desired, log2_hashmap_size=log2_hm,
        interpolation="smoothstep", indexing=indexing,
        custom_grad=(indexing == "rolled_tiled"))
    params = _volume_params(fix)
    loss_fn = _volume_loss_fn(fix, spec)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(fix["loss"]), rtol=1e-5)

    _allclose(grads["embeddings"], fix["grad_embeddings"],
              f"embeddings[{indexing}]", rtol=1e-3)
    _allclose(grads["beta"], fix["grad_beta"], "beta")
    for name in ("mlp1", "mlp2"):
        for l in range(2):
            _allclose(grads[f"{name}.{l}.w"], fix[f"grad.{name}.{l}.w"],
                      f"{name}.{l}.w")
            _allclose(grads[f"{name}.{l}.b"], fix[f"grad.{name}.{l}.b"],
                      f"{name}.{l}.b")
