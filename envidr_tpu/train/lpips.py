"""LPIPS (AlexNet) in JAX — the reference's second quality metric.

The reference instantiates ``lpips.LPIPS(net='alex')``
(``/root/reference/nerf/utils.py:314-348``).  This module reimplements the
full LPIPS pipeline natively in JAX (scaling layer -> AlexNet trunk -> unit
channel normalization -> squared diff -> non-negative 1x1 linear heads ->
spatial mean -> stage sum), with two weight sources:

* :func:`load_torch_weights` — host-side torch ``.pth`` import for the
  torchvision AlexNet trunk (``features.*``) and the lpips package's linear
  heads (``lin*.model.1.weight``), when the user supplies them (this image
  has no pretrained weights and zero egress);
* :func:`init_random_weights` — a DETERMINISTIC randomly-initialized trunk
  with uniform linear heads.  Zhang et al. (CVPR'18, Table 5) show untrained
  AlexNet features with unit normalization already track perceptual
  similarity far better than pixel metrics; results from this fallback are
  labeled ``alex_untrained`` so they are never confused with true LPIPS.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# (out_ch, in_ch, kernel, stride, pad, maxpool_before)
_ALEX = [
    (64, 3, 11, 4, 2, False),
    (192, 64, 5, 1, 2, True),
    (384, 192, 3, 1, 1, True),
    (256, 384, 3, 1, 1, False),
    (256, 256, 3, 1, 1, False),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_random_weights(seed: int = 0) -> Dict:
    """Deterministic kaiming-init trunk + uniform (1/C) linear heads."""
    rng = np.random.default_rng(seed)
    params = {}
    for i, (co, ci, k, _, _, _) in enumerate(_ALEX):
        fan_in = ci * k * k
        std = float(np.sqrt(2.0 / fan_in))
        params[f"conv{i}"] = {
            "w": rng.normal(0.0, std, (co, ci, k, k)).astype(np.float32),
            "b": np.zeros((co,), np.float32),
        }
        params[f"lin{i}"] = {"w": np.full((co,), 1.0 / co, np.float32)}
    return params


def load_torch_weights(trunk_path: str, lin_path: Optional[str] = None) -> Dict:
    """Load torchvision-format AlexNet (``features.N.*``) and lpips linear
    heads (``linN.model.1.weight``); one combined or two separate files."""
    from envidr_tpu.io.torch_import import load_state_dict

    sd = dict(load_state_dict(trunk_path))
    if lin_path:
        sd.update(load_state_dict(lin_path))
    conv_idx = [0, 3, 6, 8, 10]  # torchvision alexnet.features layer indices
    params = {}
    for i, li in enumerate(conv_idx):
        co = _ALEX[i][0]
        params[f"conv{i}"] = {
            "w": np.asarray(sd[f"features.{li}.weight"], np.float32),
            "b": np.asarray(sd[f"features.{li}.bias"], np.float32),
        }
        lk = f"lin{i}.model.1.weight"
        if lk in sd:
            params[f"lin{i}"] = {
                "w": np.asarray(sd[lk], np.float32).reshape(co)}
        else:
            params[f"lin{i}"] = {"w": np.full((co,), 1.0 / co, np.float32)}
    return params


def _features(params, x):
    """x: [N, 3, H, W] in [-1, 1] -> list of 5 stage features."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    h = (x - jnp.asarray(_SHIFT)[None, :, None, None]) \
        / jnp.asarray(_SCALE)[None, :, None, None]
    feats = []
    for i, (_, _, k, stride, pad, pool) in enumerate(_ALEX):
        if pool:
            h = lax.reduce_window(
                h, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
        w = jnp.asarray(params[f"conv{i}"]["w"])
        b = jnp.asarray(params[f"conv{i}"]["b"])
        h = lax.conv_general_dilated(
            h, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        h = jax.nn.relu(h + b[None, :, None, None])
        feats.append(h)
    return feats


def _distance(params, x0, x1):
    import jax.numpy as jnp

    f0 = _features(params, x0)
    f1 = _features(params, x1)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.maximum(
            jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.maximum(
            jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        w = jnp.asarray(params[f"lin{i}"]["w"])      # non-negative heads
        total = total + jnp.mean(
            jnp.sum(jnp.abs(w)[None, :, None, None] * d, axis=1), axis=(1, 2))
    return total


class LPIPSJax:
    """Callable LPIPS distance on [H, W, 3] images in [0, 1]."""

    def __init__(self, weights_path: Optional[str] = None,
                 lin_path: Optional[str] = None, seed: int = 0):
        import jax

        if weights_path and os.path.exists(weights_path):
            self.params = load_torch_weights(weights_path, lin_path)
            self.kind = "alex"
        else:
            self.params = init_random_weights(seed)
            self.kind = "alex_untrained"
        self._dist = jax.jit(_distance)

    def __call__(self, img0, img1) -> float:
        import jax.numpy as jnp

        def to_nchw(im):
            a = jnp.asarray(np.asarray(im, np.float32))
            return jnp.transpose(a, (2, 0, 1))[None] * 2.0 - 1.0

        return float(self._dist(self.params, to_nchw(img0), to_nchw(img1))[0])
