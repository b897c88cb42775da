"""NeRF-synthetic / colmap-style dataset (``transforms_*.json``).

Reimplements ``NeRFDataset`` (``/root/reference/nerf/provider.py:135-387``):
same pose convention (``nerf_matrix_to_ngp``), intrinsics resolution, and
alpha-channel handling.  TPU-first differences:

  * Images preload to device as one uint8 array [B, H*W, C]; per-step pixel
    gathers happen *inside* the jitted train step (no host round trip per
    batch — the reference gathers on GPU in ``train_step``, utils.py:564-585).
  * Ray sampling is device-side (:func:`envidr_tpu.geometry.rays.sampled_rays`).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np

import jax.numpy as jnp

from envidr_tpu.geometry.rays import nerf_matrix_to_ngp


def _load_image(path: str) -> np.ndarray:
    try:
        import imageio.v2 as imageio
        img = imageio.imread(path)
    except ImportError:
        from PIL import Image
        img = np.asarray(Image.open(path))
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img


class NeRFDataset:
    """Loads a split into host numpy; ``.device_images`` promotes to device."""

    def __init__(self, root: str, split: str = "train", *, scale: float = 0.33,
                 offset=(0, 0, 0), downscale: int = 1, test_skip: int = 1,
                 process_shard: bool = False):
        self.root = root
        self.split = split
        tpath = os.path.join(root, f"transforms_{split}.json")
        if not os.path.exists(tpath):
            tpath = os.path.join(root, "transforms.json")
        with open(tpath) as f:
            meta = json.load(f)

        frames = meta["frames"]
        if split != "train" and test_skip > 1:
            frames = frames[::test_skip]
        if process_shard:
            # Multi-host data sharding (SURVEY §2.5): each host loads only its
            # 1/P of the training images (reference DDP semantics — every rank
            # draws its ray batch from its own image subset, utils.py:1352).
            import jax
            frames = frames[jax.process_index()::max(jax.process_count(), 1)]

        poses, images = [], []
        for frame in frames:
            fpath = os.path.join(root, frame["file_path"])
            if not os.path.splitext(fpath)[1]:
                fpath += ".png"
            img = _load_image(fpath)
            if downscale > 1:
                img = img[::downscale, ::downscale]
            images.append(img)
            poses.append(nerf_matrix_to_ngp(
                np.array(frame["transform_matrix"], np.float32),
                scale=scale, offset=offset))
        self.images = np.stack(images)                       # [B, H, W, C] uint8
        self.poses = np.stack(poses)                         # [B, 4, 4]
        B, H, W, C = self.images.shape
        self.H, self.W, self.C = H, W, C

        # intrinsics (provider.py:240-268)
        if "fl_x" in meta or "fl_y" in meta:
            fl_x = meta.get("fl_x", meta.get("fl_y")) / downscale
            fl_y = meta.get("fl_y", meta.get("fl_x")) / downscale
        elif "camera_angle_x" in meta or "camera_angle_y" in meta:
            if "camera_angle_x" in meta:
                fl_x = W / (2 * np.tan(meta["camera_angle_x"] / 2))
            else:
                fl_x = None
            if "camera_angle_y" in meta:
                fl_y = H / (2 * np.tan(meta["camera_angle_y"] / 2))
            else:
                fl_y = fl_x
            fl_x = fl_x if fl_x is not None else fl_y
        else:
            raise ValueError("no focal length in transforms json")
        cx = meta.get("cx", W / 2) / downscale
        cy = meta.get("cy", H / 2) / downscale
        self.intrinsics = (float(fl_x), float(fl_y), float(cx), float(cy))

        self._device_images: Optional[jnp.ndarray] = None
        self._device_poses: Optional[jnp.ndarray] = None

    def __len__(self):
        return self.images.shape[0]

    @property
    def device_images(self) -> jnp.ndarray:
        if self._device_images is None:
            B = self.images.shape[0]
            self._device_images = jnp.asarray(
                self.images.reshape(B, self.H * self.W, self.C))
        return self._device_images

    @property
    def device_poses(self) -> jnp.ndarray:
        if self._device_poses is None:
            self._device_poses = jnp.asarray(self.poses)
        return self._device_poses

    def epoch_order(self, rng: np.random.Generator, shuffle: bool = True):
        idx = np.arange(len(self))
        if shuffle:
            rng.shuffle(idx)
        return idx
