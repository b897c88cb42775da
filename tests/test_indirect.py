"""Three-pass interreflection render: shapes, masking, gradient flow."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from envidr_tpu.models.network import init_network_params
from envidr_tpu.ops.grid import GridSpec, init_grid, update_grid
from envidr_tpu.render.indirect import IndirectOptions, render_scene_indirect
from envidr_tpu.render.scene import SceneRenderOptions, render_scene
from tests.test_scene_render import SCENE_CFG, _rays


def test_indirect_three_pass():
    cfg = dataclasses.replace(SCENE_CFG, use_renv=True)
    params = init_network_params(jax.random.PRNGKey(0), cfg)
    spec = GridSpec(grid_size=32)
    grid = init_grid(spec)
    grid = grid._replace(bitfield=jnp.ones_like(grid.bitfield))
    rays_o, rays_d = _rays(16)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = SceneRenderOptions(max_steps=128, num_samples=32, training=True,
                              grid_size=spec.grid_size)
    iopts = IndirectOptions(indir_max_steps=128, indir_early_stop_steps=16,
                            indir_num_samples=16, grad_rays=True)

    def loss(p):
        out = render_scene_indirect(p, cfg, opts, iopts, grid.bitfield,
                                    rays_o, rays_d, 1.0, aabb,
                                    key=jax.random.PRNGKey(1))
        return jnp.mean(out["image"] ** 2), out

    (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
    assert out["image"].shape == (16, 3)
    assert out["r_images"].shape == (16, 4)
    assert out["ref_mask"].dtype == bool
    assert np.isfinite(float(l))
    assert float(jnp.abs(g["encoder"]["embeddings"]).sum()) > 0
    # masked-off rays carry zero reflection image
    rm = np.asarray(out["ref_mask"])
    ri = np.asarray(out["r_images"])
    assert np.all(ri[~rm] == 0.0)


def test_renv_gradients_flow_when_branch_active():
    """With roughness below the threshold and full reflection visibility the
    renv branch must carry STRICT gradient into renv_net (renderer.py:484-503).
    Drives pass 3 directly with a synthetic r_images (vis=1) so the branch
    cannot be masked off by a random-init geometry."""
    cfg = dataclasses.replace(SCENE_CFG, use_renv=True,
                              indir_roughness_thresh=1e9)
    params = init_network_params(jax.random.PRNGKey(0), cfg)
    spec = GridSpec(grid_size=32)
    grid = init_grid(spec)
    bitfield = jnp.ones_like(grid.bitfield)
    rays_o, rays_d = _rays(16)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = SceneRenderOptions(max_steps=128, num_samples=32, training=True,
                              grid_size=spec.grid_size, use_bg_net=False)
    r_images = jnp.concatenate(
        [jax.random.uniform(jax.random.PRNGKey(7), (16, 3)),
         jnp.ones((16, 1))], axis=-1)

    def loss(p):
        out = render_scene(p, cfg, opts, bitfield, rays_o, rays_d, 1.0,
                           aabb, key=jax.random.PRNGKey(1), r_images=r_images)
        return jnp.mean(out["image"] ** 2)

    g = jax.grad(loss)(params)
    g_renv = float(jnp.abs(g["renv_net"][0]["w"]).sum())
    assert g_renv > 0.0, "renv branch active but no gradient reached renv_net"


def test_roughness_init_opens_indir_gate_at_scene_scale():
    """Round-5 root cause (tools/probe_renv.py): the renv branch is gated by
    roughness < indir_roughness_thresh, and the head initializes at
    act_scale * softplus(roughness_bias).  The reference's SCENE-side
    default act_scale=0.2 (options.py:246) starts the head INSIDE the gate
    (0.063 < 0.1); the PRETRAIN value 1.0 starts it permanently outside
    (0.31), silencing renv_net's gradient for an entire run.  Pin both."""
    from envidr_tpu.config import load_options, network_config
    from envidr_tpu.models.network import forward_geometry

    opt = load_options("configs/scenes/shiny3_indir.ini")
    assert opt.roughness_act_scale == 0.2      # the r5 fix itself
    cfg = network_config(opt)
    xyz = jnp.asarray(
        np.random.default_rng(0).uniform(-0.8, 0.8, (256, 3)), jnp.float32)

    for scale, opens in ((0.2, True), (1.0, False)):
        c = dataclasses.replace(cfg, roughness_act_scale=scale)
        params = init_network_params(jax.random.PRNGKey(0), c)
        rough = forward_geometry(params, c, xyz, None)["roughness"]
        frac_inside = float(
            jnp.mean((rough[..., 0] < c.indir_roughness_thresh)))
        if opens:
            assert frac_inside > 0.9, frac_inside
        else:
            assert frac_inside < 0.1, frac_inside


def test_indirect_grads_finite_with_background_rays():
    """Round-5 regression (the shiny3 freeze): rays that march ZERO samples
    composite an exactly-zero normal image; the old hard-max normalization
    (n_img / max(|n_img|, eps)) has a 0/0 backward there, and the indirect
    pass — alone among consumers — differentiates through normal_image (via
    ref_d), so every step NaN'd and apply_if_finite froze the whole run
    (notfinite_count == total_notfinite in the arm's opt_state).  With the
    smooth _safe_normalize the full indirect gradient must be finite."""
    cfg = dataclasses.replace(SCENE_CFG, use_renv=True)
    params = init_network_params(jax.random.PRNGKey(0), cfg)
    spec = GridSpec(grid_size=32)
    grid = init_grid(spec)
    # occupancy only in the x>0 half: rays aimed at x<0 march no samples
    occ = np.zeros(np.asarray(grid.bitfield).shape, bool)
    occ_3d = occ.reshape(spec.cascades, 32, 32, 32)
    occ_3d[:, 20:28, 12:20, 12:20] = True
    bitfield = jnp.asarray(occ_3d.reshape(occ.shape))
    o = np.tile([[0.0, 0.0, -2.5]], (16, 1)).astype(np.float32)
    tgt = np.concatenate([
        np.tile([[0.5, 0.0, 0.0]], (8, 1)),      # hit the occupied block
        np.tile([[-0.7, -0.7, 0.0]], (8, 1)),    # miss everything
    ]).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = SceneRenderOptions(max_steps=128, num_samples=32, training=True,
                              grid_size=spec.grid_size)
    iopts = IndirectOptions(indir_max_steps=128, indir_early_stop_steps=16,
                            indir_num_samples=16, grad_rays=False)

    def loss(p):
        out = render_scene_indirect(p, cfg, opts, iopts, bitfield,
                                    rays_o, rays_d, 1.0, aabb,
                                    key=jax.random.PRNGKey(1))
        return jnp.mean(out["image"] ** 2) + jnp.sum(out["normal_image"]), out

    (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
    ws = np.asarray(out["weights_sum"])
    assert np.any(ws == 0.0), "fixture must contain true background rays"
    assert np.isfinite(float(l))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert np.all(np.isfinite(np.asarray(leaf))), \
            f"non-finite grad at {jax.tree_util.keystr(path)}"
