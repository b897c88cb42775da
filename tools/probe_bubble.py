"""SDF transect along the central contact-view ray: is the mirror real?

Round-5 diagnostic for the phantom-bubble geometry (docs/QUALITY_R5.md):
prints the trained SDF along the central pixel ray of val view 2 of
synth_shiny3 against the analytic mirror interval.  A healthy
reconstruction is sdf>0 outside [2.1, 2.6]-ish and sdf<0 inside the
mirror; the bubble pathology is sdf<0 around t~1.83-1.95 with sdf>0
inside the true mirror.
Usage: ENVIDR_DEVICE=cpu python tools/probe_bubble.py --ckpt <path>
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from envidr_tpu.config import load_options, network_config
from envidr_tpu.data.nerf_dataset import NeRFDataset
from envidr_tpu.geometry.rays import full_image_rays
from envidr_tpu.models.network import forward_geometry

ap = argparse.ArgumentParser()
ap.add_argument("--config", default="configs/scenes/shiny3_indir.ini")
ap.add_argument("--ckpt", required=True)
ap.add_argument("--view", type=int, default=2)
a = ap.parse_args()

opt = load_options(a.config, workspace="/tmp/probe_bubble")
cfg = network_config(opt)
payload = pickle.load(open(a.ckpt, "rb"))
params = jax.tree.map(jnp.asarray, payload.get("ema", payload["params"]))
print("ckpt epoch", payload.get("epoch"))

ds = NeRFDataset(opt.path, "val", scale=opt.scale)
H, W = ds.H, ds.W
ro, rd = full_image_rays(jnp.asarray(ds.poses[a.view])[None],
                         ds.intrinsics, H, W)
ray_o = np.asarray(ro[0]).reshape(H, W, 3)[H // 2, W // 2]
ray_d = np.asarray(rd[0]).reshape(H, W, 3)[H // 2, W // 2]
ts = np.linspace(1.2, 2.6, 57, dtype=np.float32)
pts = jnp.asarray(ray_o[None] + ts[:, None] * ray_d[None])
sdf = np.asarray(forward_geometry(params, cfg, pts, None)["sdf"])
# analytic mirror in the NGP model frame: world (0,0,-0.05)r0.32 -> permuted
c = np.array([0.0, -0.05 * opt.scale, 0.0])
r = 0.32 * opt.scale
neg = []
for t, s in zip(ts, sdf):
    p = ray_o + t * ray_d
    dm = np.linalg.norm(p - c) - r
    mark = " <0" if s < 0 else ""
    if s < 0:
        neg.append((round(float(t), 3), round(float(dm), 3)))
    print(f"t={t:.3f} sdf={s:+.4f} d_mirror={dm:+.3f}{mark}")
print("negative-sdf intervals (t, d_mirror):", neg)
bubble = any(dm > 0.05 for _, dm in neg)
mirror_ok = any(dm < -0.02 for _, dm in neg)
print(f"VERDICT: bubble={'YES' if bubble else 'no'} "
      f"true-mirror-present={'YES' if mirror_ok else 'NO'}")
