"""cauchy/entropy regularization under NeuS (round-5 regression).

The reference crashes on cauchy+NeuS (NeuSDensity has no get_beta,
/root/reference/nerf/network.py:46-67 vs utils.py:762) and so did we
(beta=None reached laplace_density) — caught live when the shiny3
anti-billboard arm switched cauchy on at its start epoch.  The NeuS
analogue uses the logistic CDF with the learned sharpness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envidr_tpu.config import load_options
from envidr_tpu.train.losses import compute_losses
from envidr_tpu.train.schedules import resolve


def _flags_and_weights(**over):
    opt = load_options("", use_sdf=True, use_neus_sdf=True,
                       cauchy_loss_weight=0.1, cauchy_loss_start_iter=0,
                       entropy_loss_weight=0.01, **over)
    sched = resolve(opt, 10, 600)
    return sched.flags, {k: jnp.asarray(v) for k, v in sched.weights.items()}


def _outputs(n=8, k=16):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        "weights_sum": jnp.ones((n,), jnp.float32),
        "sdfs": jnp.asarray(rng.uniform(-0.2, 0.2, (n, k)), jnp.float32),
        "sdf_weights": jnp.asarray(rng.uniform(0, 1, (n, k - 1)), jnp.float32),
        "point_mask": jnp.ones((n, k - 1), bool),
    }


def test_cauchy_neus_uses_logistic_sharpness():
    flags, w = _flags_and_weights()
    assert flags.use_cauchy_loss and flags.use_entropy_loss
    out = _outputs()
    gt = jnp.zeros((8, 3))

    def loss(inv_s):
        total, terms = compute_losses(out, gt, flags, w, beta=None,
                                      neus_inv_s=inv_s)
        return total, terms

    (t1, terms), g = jax.value_and_grad(loss, has_aux=True)(jnp.asarray(64.0))
    assert np.isfinite(float(t1)) and np.isfinite(float(g))
    assert "cauchy" in terms and np.isfinite(float(terms["cauchy"]))
    # the default (detached-sharpness) path must NOT leak gradient into s
    assert float(g) == 0.0
    # sharper s pushes densities toward 0/1 -> cauchy term shrinks
    _, terms_sharp = loss(jnp.asarray(512.0))
    assert float(terms_sharp["cauchy"]) < float(terms["cauchy"])

    # undetached variant propagates gradient to the sharpness
    flags_u, w_u = _flags_and_weights(cauchy_undetach_beta=True)
    def loss_u(inv_s):
        total, _ = compute_losses(out, gt, flags_u, w_u, beta=None,
                                  neus_inv_s=inv_s)
        return total
    gu = jax.grad(loss_u)(jnp.asarray(64.0))
    assert float(jnp.abs(gu)) > 0.0


def test_cauchy_without_any_sharpness_raises():
    flags, w = _flags_and_weights()
    with pytest.raises(ValueError, match="density sharpness"):
        compute_losses(_outputs(), jnp.zeros((8, 3)), flags, w, beta=None)
