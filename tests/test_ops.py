"""Density transforms, compositing, ray/geometry helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from envidr_tpu.ops.density import (
    trunc_exp, laplace_density, laplace_beta, neus_alpha,
)
from envidr_tpu.ops.compositing import (
    alphas_from_sigmas, weights_from_alphas, composite_rays,
)
from envidr_tpu.geometry.rays import (
    full_image_rays, sphere_intersections, near_far_from_aabb, reflect_dir,
    pose_spherical, nerf_matrix_to_ngp, linear_to_srgb, srgb_to_linear,
)


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.asarray([-20.0, 0.0, 3.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)), rtol=1e-6)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    # grads use exp(clip(x, -15, 15))
    np.testing.assert_allclose(
        g, np.exp(np.clip(np.asarray(x), -15, 15)), rtol=1e-6)


def test_laplace_density_formula():
    sdf = jnp.asarray([-0.5, -0.01, 0.0, 0.01, 0.5])
    beta = 0.1
    got = laplace_density(sdf, beta)
    want = (1 / beta) * (0.5 + 0.5 * np.sign(sdf) * np.expm1(-np.abs(sdf) / beta))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # sdf<0 (inside) -> high density; sdf>0 -> low
    assert got[0] > got[-1]


def test_laplace_beta_straight_through():
    params = {"beta": jnp.asarray(0.00001)}
    b = laplace_beta(params, beta_min=0.0005, beta_max=1.0)
    np.testing.assert_allclose(b, 0.0005, rtol=1e-6)
    # gradient flows as identity (straight-through)
    g = jax.grad(lambda p: laplace_beta(p, 0.0005, 1.0) * 3.0)(params)
    np.testing.assert_allclose(g["beta"], 3.0, rtol=1e-6)


def test_neus_alpha_range_and_surface_peak():
    sdf = jnp.linspace(0.5, -0.5, 64)
    a = neus_alpha(sdf, jnp.asarray(0.3), dists=jnp.full_like(sdf, 0.01))
    assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0


def test_weights_match_naive_loop():
    rng = np.random.default_rng(0)
    sigmas = jnp.asarray(rng.uniform(0, 50, (4, 16)), jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.001, 0.01, (4, 16)), jnp.float32)
    alphas = alphas_from_sigmas(sigmas, deltas)
    w = np.asarray(weights_from_alphas(alphas))
    a = np.asarray(alphas)
    want = np.zeros_like(a)
    for n in range(a.shape[0]):
        T = 1.0
        for s in range(a.shape[1]):
            want[n, s] = a[n, s] * T
            T *= 1 - a[n, s] + 1e-15
    np.testing.assert_allclose(w, want, rtol=1e-5, atol=1e-7)


def test_composite_rays_outputs():
    rng = np.random.default_rng(1)
    N, S = 8, 12
    sigmas = jnp.asarray(rng.uniform(0, 100, (N, S)), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (N, S, 3)), jnp.float32)
    deltas = jnp.full((N, S), 0.002, jnp.float32)
    z = jnp.cumsum(deltas, -1)
    ws, depth, img, w = composite_rays(sigmas, rgbs, deltas, z)
    assert ws.shape == (N,) and img.shape == (N, 3)
    assert float(ws.max()) <= 1.0 + 1e-5
    np.testing.assert_allclose(np.asarray(w).sum(-1), np.asarray(ws), rtol=1e-6)


def test_rays_unit_norm_and_count():
    pose = nerf_matrix_to_ngp(pose_spherical(45.0, -30.0, 4.0))
    rays_o, rays_d = full_image_rays(
        jnp.asarray(pose)[None], (700.0, 700.0, 40.0, 40.0), 80, 80)
    assert rays_d.shape == (1, 6400, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays_o[0, 0]), pose[:3, 3], atol=1e-6)


def test_sphere_intersections_analytic():
    o = jnp.asarray([[0.0, 0.0, -4.0], [0.0, 3.0, -4.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far, mask = sphere_intersections(o, d, 1.0)
    assert bool(mask[0]) and not bool(mask[1])
    np.testing.assert_allclose(near[0, 0], 3.0, atol=1e-5)
    np.testing.assert_allclose(far[0, 0], 5.0, atol=1e-5)


def test_near_far_from_aabb():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    o = jnp.asarray([[0.0, 0.0, -4.0], [0.0, 3.0, -4.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    np.testing.assert_allclose(near[0], 3.0, atol=1e-5)
    np.testing.assert_allclose(far[0], 5.0, atol=1e-5)
    assert float(near[1]) == 1e10  # miss


def test_reflect_and_srgb_roundtrip():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[1.0, 0.0, 1.0]]) / np.sqrt(2)
    r = reflect_dir(v, n)
    np.testing.assert_allclose(np.asarray(r), [[-1 / np.sqrt(2), 0, 1 / np.sqrt(2)]],
                               atol=1e-6)
    x = jnp.linspace(0.0, 1.0, 32)
    np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)


def test_aux_losses():
    from envidr_tpu.train.losses import mape_loss, huber_loss, eff_distortion_loss
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32)
    assert float(mape_loss(a, a)) == 0.0
    assert float(huber_loss(a, a)) == 0.0
    assert float(huber_loss(a, b)) > 0
    w = jnp.asarray(rng.uniform(0, 0.2, (4, 16)), jnp.float32)
    z = jnp.cumsum(jnp.full((4, 16), 0.05), -1)
    iv = jnp.full((4, 16), 0.05)
    # concentrated weights -> lower distortion than spread weights
    w_conc = jnp.zeros((4, 16)).at[:, 8].set(w.sum(-1))
    l_spread = float(eff_distortion_loss(w, z, iv))
    l_conc = float(eff_distortion_loss(w_conc, z, iv))
    assert l_conc < l_spread


def test_patch_and_center_crop_rays():
    from envidr_tpu.geometry.rays import patch_rays, center_crop_rays
    pose = jnp.eye(4)[None]
    intr = (100.0, 100.0, 32.0, 32.0)
    out = patch_rays(jax.random.PRNGKey(0), pose, intr, 64, 64, 256, 8)
    assert out["rays_o"].shape == (1, 256, 3)
    inds = np.asarray(out["inds"][0]).reshape(-1, 64)
    # each patch's pixels span an 8x8 block
    rows = inds // 64
    assert (rows.max(1) - rows.min(1) == 7).all()
    out2 = center_crop_rays(jax.random.PRNGKey(1), pose, intr, 64, 64, 256, 0.5)
    assert out2["rays_d"].shape == (1, 256, 3)
    ic = np.asarray(out2["inds"][0][: int(256 * 0.6)])
    assert (ic // 64 >= 16).all() and (ic // 64 < 48).all()


def test_compute_visibility_shadow_geometry():
    """Shadow-map reprojection (lighting_util.py:433-480): a wall at z=0.5
    in light space occludes points behind it, points in front stay lit."""
    import numpy as np
    import jax.numpy as jnp
    from envidr_tpu.geometry.lighting import compute_visibility

    # light camera at origin looking +z (w2c = identity); depth map: a wall
    # at depth 0.5 covering the left half of the light image, 2.0 elsewhere
    Hl = Wl = 33
    light_depth = np.full((Hl, Wl), 2.0, np.float32)
    light_depth[:, : Wl // 2] = 0.5
    light_K = np.array([[16.0, 0, 16.0], [0, 16.0, 16.0], [0, 0, 1]],
                       np.float32)

    # main camera co-located with the light (simplest exact reprojection):
    # each pixel's depth places the point either before or behind the wall
    cam_K = light_K.copy()
    P = 8
    uv = np.stack([np.array([4.0] * 4 + [28.0] * 4),      # left | right half
                   np.full(P, 16.0)], -1).astype(np.float32)
    cam_depth = np.array([0.3, 0.3, 1.0, 1.0, 0.3, 1.0, 1.9, 1.9],
                         np.float32)
    vis = compute_visibility(
        jnp.asarray(cam_depth), jnp.asarray(light_depth), jnp.asarray(uv),
        jnp.asarray(cam_K), jnp.asarray(light_K),
        jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3),
        depth_thres=0.05, soft_vis=False)
    vis = np.asarray(vis)
    # left-half points at depth 0.3 are in FRONT of the 0.5 wall -> lit;
    # left-half points at depth 1.0 are BEHIND it -> shadowed
    assert vis[0] == 1.0 and vis[1] == 1.0
    assert vis[2] == 0.0 and vis[3] == 0.0
    # right half: wall at 2.0, all test depths in front -> lit
    assert vis[4:].min() == 1.0

    # soft ramp: halfway past the bias gives ~0.5 visibility
    vis_soft = compute_visibility(
        jnp.asarray(np.array([0.575], np.float32)),  # 0.5 + thres + 0.5*thres
        jnp.asarray(light_depth),
        jnp.asarray(np.array([[4.0, 16.0]], np.float32)),
        jnp.asarray(cam_K), jnp.asarray(light_K),
        jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3),
        depth_thres=0.05, soft_vis=True)
    assert 0.4 < float(vis_soft[0]) < 0.6
