"""Uniform/importance-sampled render path + sample_pdf."""

import numpy as np
import jax
import jax.numpy as jnp

from envidr_tpu.render.uniform import UniformRenderOptions, render_uniform, sample_pdf
from tests.test_scene_render import SCENE_CFG
from envidr_tpu.models.network import init_network_params


def test_sample_pdf_concentrates_on_heavy_bins():
    N, T, S = 4, 8, 512
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T + 1), (N, T + 1))
    w = jnp.zeros((N, T)).at[:, 3].set(100.0)  # all mass in bin 3
    z = sample_pdf(jax.random.PRNGKey(0), bins, w, S)
    frac_in_bin = ((z >= 3 / 8) & (z <= 4 / 8)).mean()
    assert float(frac_in_bin) > 0.95
    # deterministic mode is sorted and in range
    zd = sample_pdf(jax.random.PRNGKey(0), bins, w, S, det=True)
    assert float(zd.min()) >= 0.0 and float(zd.max()) <= 1.0


def test_render_uniform_forward_and_upsample():
    params = init_network_params(jax.random.PRNGKey(0), SCENE_CFG)
    N = 16
    rng = np.random.default_rng(0)
    o = np.tile([[0.0, 0.0, -2.5]], (N, 1))
    tgt = rng.uniform(-0.4, 0.4, (N, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    opts = UniformRenderOptions(num_steps=32, upsample_steps=16, perturb=True,
                                training=True)
    out = render_uniform(params, SCENE_CFG, opts, jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32), 1.0, aabb,
                         key=jax.random.PRNGKey(1))
    assert out["image"].shape == (N, 3)
    assert out["sigmas"].shape == (N, 48)
    assert np.isfinite(np.asarray(out["image"])).all()
    g = jax.grad(lambda p: jnp.mean(render_uniform(
        p, SCENE_CFG, opts, jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32), 1.0, aabb,
        key=jax.random.PRNGKey(1))["image"]))(params)
    assert float(jnp.abs(g["encoder"]["embeddings"]).sum()) > 0
