"""Env-sphere dataset loader (pre-rendered; see tools/gen_env_dataset.py).

Reimplements ``EnvDataset`` (``/root/reference/nerf/sph_loader.py:78-354``)
over the offline-rendered set: annotated poses, per-frame env index and
material, optional mirror-sphere r_images for renv training.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from envidr_tpu.geometry.rays import nerf_matrix_to_ngp


class EnvSphereDataset:
    def __init__(self, root: str, split: str = "train", *, scale: float = 0.8,
                 offset=(0, 0, 0), with_renv: bool = False):
        self.root = root
        self.split = split
        with open(os.path.join(root, f"transforms_{split}.json")) as f:
            meta = json.load(f)
        self.env_images_names = meta.get("env_images_names", [])
        name_to_idx = {n: i for i, n in enumerate(self.env_images_names)}

        import imageio.v2 as imageio

        poses, images, env_idx, rough, metal, color, r_images = \
            [], [], [], [], [], [], []
        for fr in meta["frames"]:
            img = imageio.imread(os.path.join(root, fr["file_path"]))
            images.append(img)
            poses.append(nerf_matrix_to_ngp(
                np.array(fr["transform_matrix"], np.float32),
                scale=scale, offset=offset))
            env_idx.append(name_to_idx.get(fr.get("env_image_name", ""), 0))
            rough.append(fr.get("roughness", 0.3))
            metal.append(fr.get("metallic", 0.0))
            color.append(fr.get("color", [0.8, 0.8, 0.8, 1.0]))
            if with_renv and "renv_file_path" in fr:
                r_images.append(imageio.imread(
                    os.path.join(root, fr["renv_file_path"])))
        self.images = np.stack(images)                       # [B, H, W, C] uint8
        self.poses = np.stack(poses)
        B, H, W, C = self.images.shape
        self.H, self.W, self.C = H, W, C
        self._env_idx = np.asarray(env_idx, np.int32)
        self._rough = np.asarray(rough, np.float32)
        self._metal = np.asarray(metal, np.float32)
        self._color = np.asarray(color, np.float32)
        self._r_images = np.stack(r_images) if r_images else None

        camera_angle_x = meta["camera_angle_x"]
        focal = W / (2 * np.tan(camera_angle_x / 2))
        self.intrinsics = (focal, focal, W / 2, H / 2)
        self._dev = {}

    def __len__(self):
        return self.images.shape[0]

    def _cache(self, name, builder):
        if name not in self._dev:
            # time the host->device upload: through the single-tenant tunnel a
            # 1200-image preload is a visible chunk of epoch 1 (weak #7 in the
            # round-2 review — make the overhead attributable, not mysterious)
            import time
            t0 = time.perf_counter()
            v = builder()
            try:
                import jax
                jax.block_until_ready(v)
            except Exception:
                pass
            dt = time.perf_counter() - t0
            if dt > 2.0:
                nbytes = getattr(v, "nbytes", 0)
                print(f"[env_dataset] device upload '{name}': "
                      f"{nbytes / 1e6:.0f} MB in {dt:.1f}s")
            self._dev[name] = v
        return self._dev[name]

    @property
    def device_images(self):
        B = len(self)
        return self._cache("img", lambda: jnp.asarray(
            self.images.reshape(B, self.H * self.W, self.C)))

    @property
    def device_poses(self):
        return self._cache("poses", lambda: jnp.asarray(self.poses))

    @property
    def env_indices(self):
        return self._cache("env", lambda: jnp.asarray(self._env_idx))

    @property
    def materials(self):
        """Indexable view: materials[i] -> dict of HOST numpy scalars.  They
        become traced jit args — host-side indexing avoids queueing thousands
        of tiny device slice ops per epoch (the single-tenant tunnel stalls
        under deep async queues of small transfers)."""
        r, m, c = self._rough, self._metal, self._color

        class _View:
            def __getitem__(_, i):
                return {"roughness": r[i], "metallic": m[i], "color": c[i]}
        return _View()

    @property
    def host_env_indices(self):
        return self._env_idx

    @property
    def device_r_images(self) -> Optional[jnp.ndarray]:
        if self._r_images is None:
            return None
        B = len(self)
        return self._cache("rimg", lambda: jnp.asarray(
            self._r_images.reshape(B, self.H * self.W, -1)))

    def epoch_order(self, rng: np.random.Generator, shuffle: bool = True):
        idx = np.arange(len(self))
        if shuffle:
            rng.shuffle(idx)
        return idx
