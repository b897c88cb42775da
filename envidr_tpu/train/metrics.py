"""Quality meters: PSNR (always) and LPIPS (torch-gated).

Mirrors ``PSNRMeter``/``LPIPSMeter`` (``/root/reference/nerf/utils.py:278-348``).
"""

from __future__ import annotations

import numpy as np


class PSNRMeter:
    def __init__(self):
        self.clear()

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, preds, truths):
        preds = np.asarray(preds, np.float64)
        truths = np.asarray(truths, np.float64)
        mse = np.mean((preds - truths) ** 2)
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        self.V += psnr
        self.N += 1
        return psnr

    def measure(self):
        return self.V / max(self.N, 1)

    def report(self):
        return f"PSNR = {self.measure():.6f}"


class SSIMMeter:
    """Gaussian-windowed SSIM, pure numpy (no torchvision/skimage available
    in this environment; LPIPS stays package-gated)."""

    def __init__(self, sigma: float = 1.5, win: int = 11):
        self.V, self.N = 0.0, 0
        r = np.arange(win) - win // 2
        k = np.exp(-(r**2) / (2 * sigma**2))
        self.kernel = (k / k.sum()).astype(np.float64)

    def clear(self):
        self.V, self.N = 0.0, 0

    def _blur(self, img):
        # separable gaussian, reflect padding, per channel
        from numpy.lib.stride_tricks import sliding_window_view
        pad = len(self.kernel) // 2
        out = img
        for axis in (0, 1):
            out = np.pad(out, [(pad, pad) if a == axis else (0, 0)
                               for a in range(out.ndim)], mode="reflect")
            win = sliding_window_view(out, len(self.kernel), axis=axis)
            out = np.tensordot(win, self.kernel, axes=([-1], [0]))
        return out

    def update(self, preds, truths):
        x = np.asarray(preds, np.float64)
        y = np.asarray(truths, np.float64)
        c1, c2 = 0.01**2, 0.03**2
        mx, my = self._blur(x), self._blur(y)
        sxx = self._blur(x * x) - mx * mx
        syy = self._blur(y * y) - my * my
        sxy = self._blur(x * y) - mx * my
        ssim = ((2 * mx * my + c1) * (2 * sxy + c2)
                / ((mx * mx + my * my + c1) * (sxx + syy + c2)))
        v = float(ssim.mean())
        self.V += v
        self.N += 1
        return v

    def measure(self):
        return self.V / max(self.N, 1)


class LPIPSMeter:
    """AlexNet LPIPS (utils.py:314-348).

    Weight resolution order: (1) the ``lpips`` torch package if installed
    (exact reference parity); (2) our native JAX pipeline
    (``envidr_tpu.train.lpips``) with torch-imported AlexNet+lin weights
    from ``$ENVIDR_LPIPS_WEIGHTS`` (or ``assets/lpips_alex.pth``) when the
    user supplies them; (3) the same JAX pipeline with a DETERMINISTIC
    untrained trunk — kind ``alex_untrained`` — so eval always produces a
    perceptual number, clearly labeled when it is not true LPIPS."""

    def __init__(self, net: str = "alex"):
        import os

        self.V, self.N = 0.0, 0
        self.fn = None
        self.kind = None
        try:
            import lpips
            import torch  # noqa: F401
            self.fn = lpips.LPIPS(net=net)
            self.kind = net
        except Exception:
            from envidr_tpu.train.lpips import LPIPSJax
            wpath = os.environ.get("ENVIDR_LPIPS_WEIGHTS", "")
            if not wpath:
                cand = os.path.join(os.path.dirname(__file__), "..", "..",
                                    "assets", "lpips_alex.pth")
                wpath = cand if os.path.exists(cand) else ""
            self._jax = LPIPSJax(weights_path=wpath or None)
            self.kind = self._jax.kind

    def clear(self):
        self.V, self.N = 0.0, 0

    @property
    def available(self):
        return True

    def update(self, preds, truths):
        if self.fn is not None:
            import torch
            p = torch.from_numpy(
                np.asarray(preds, np.float32)).permute(2, 0, 1)[None]
            t = torch.from_numpy(
                np.asarray(truths, np.float32)).permute(2, 0, 1)[None]
            with torch.no_grad():
                v = float(self.fn(p * 2 - 1, t * 2 - 1))
        else:
            v = self._jax(preds, truths)
        self.V += v
        self.N += 1
        return v

    def measure(self):
        return self.V / max(self.N, 1)
