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


class LPIPSMeter:
    """AlexNet LPIPS on host torch; inert if the lpips package is absent."""

    def __init__(self, net: str = "alex"):
        self.V, self.N = 0.0, 0
        try:
            import lpips
            import torch  # noqa: F401
            self.fn = lpips.LPIPS(net=net)
        except Exception:
            self.fn = None

    @property
    def available(self):
        return self.fn is not None

    def update(self, preds, truths):
        if self.fn is None:
            return None
        import torch
        p = torch.from_numpy(np.asarray(preds, np.float32)).permute(2, 0, 1)[None]
        t = torch.from_numpy(np.asarray(truths, np.float32)).permute(2, 0, 1)[None]
        with torch.no_grad():
            v = float(self.fn(p * 2 - 1, t * 2 - 1))
        self.V += v
        self.N += 1
        return v

    def measure(self):
        return self.V / max(self.N, 1)
