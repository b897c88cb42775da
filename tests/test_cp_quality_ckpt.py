"""The committed CP quality checkpoint really renders the scene.

``assets/neus_cp_long_best.ckpt`` is the ep-60 result of the round-2
`neus_cp_long` run (val PSNR 31.09 dB on the TPU, docs/QUALITY_R2.md) —
the quality evidence for the MXU-native CP encoder.  This test reloads it
through the public Trainer API and renders a downscaled val view on CPU,
asserting the image actually matches GT (instead of trusting the logged
number).  Reference analogue: resuming `--ckpt best` for test renders
(/root/reference/nerf/utils.py:1537-1572).

Trust note: the checkpoint is a pickle produced BY THIS REPO's own training
run and loaded via ``Trainer.load_checkpoint`` (pickle.load).  Pickle is only
safe for self-produced artifacts — do not point this loader at checkpoints
from untrusted sources.
"""

import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "assets", "neus_cp_long_best.ckpt")
DATA = os.path.join(ROOT, "data", "synth_spheres")


def test_cp_ckpt_renders_val_view(tmp_path):
    # shared with bench.py; also validates the probe image is the canonical
    # 400px the checkpoint was trained against (clear error otherwise)
    from envidr_tpu.data.fixtures import ensure_synth_spheres
    ensure_synth_spheres(DATA)
    from envidr_tpu.config import load_options, network_config
    from envidr_tpu.data.nerf_dataset import NeRFDataset
    from envidr_tpu.train.trainer import Trainer

    # small chunks: the CP two-hot is a dense [chunk*K, R] operand that CPU
    # XLA materializes (TPU fuses it); default eval shapes OOM the host
    opt = load_options(os.path.join(ROOT, "configs", "synth_spheres_cp.ini"),
                       path=DATA, workspace=str(tmp_path),
                       eval_ray_chunk=512, eval_samples_budget=128)
    cfg = network_config(opt)
    trainer = Trainer(opt, cfg, workspace=str(tmp_path))
    assert trainer.load_checkpoint(CKPT)

    ds = NeRFDataset(DATA, "val", scale=opt.scale, downscale=4)
    res = trainer.render_image(ds.poses[0], ds.intrinsics, ds.H, ds.W,
                               use_ema=False)
    pred = np.asarray(res["image"], np.float32)

    gt = np.asarray(ds.images[0], np.float32) / 255.0
    gt = gt.reshape(ds.H, ds.W, -1)
    rgb, alpha = gt[..., :3], gt[..., 3:4]
    gt = rgb * alpha + (1.0 - alpha)  # white bg, as trained

    mse = float(np.mean((pred - gt) ** 2))
    psnr = -10.0 * np.log10(mse)
    # full-res val PSNR is 31.1 dB; the strided-subsample comparison with a
    # reduced sample budget loses a few dB — anything above 22 dB means a
    # real reconstruction (fog-equilibrium renders sit at ~13 dB).
    assert psnr > 22.0, f"ckpt render PSNR {psnr:.2f} dB"
    # and the occupancy grid in the ckpt is the pruned (converged) one
    occ = float(np.asarray(trainer.state["grid"].bitfield).mean())
    assert 0.0 < occ < 0.5
