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


def _quat_from_matrix(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # w ~ 0: pick the dominant diagonal axis
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(0.0, 1.0 + R[i, i] - R[j, j] - R[k, k])) * 2
        q = np.zeros(4)
        q[1 + i] = s / 4
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
        return q
    return np.array([w, x, y, z])


def _quat_to_matrix(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    d = float(np.dot(q0, q1))
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        return (1 - t) * q0 + t * q1
    th = np.arccos(np.clip(d, -1, 1))
    return (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)


def interpolate_test_poses(pose0: np.ndarray, pose1: np.ndarray,
                           n_test: int) -> np.ndarray:
    """Slerp a smooth camera path between two poses (provider.py:209-225)."""
    q0 = _quat_from_matrix(pose0[:3, :3])
    q1 = _quat_from_matrix(pose1[:3, :3])
    out = []
    for i in range(n_test + 1):
        ratio = np.sin(((i / n_test) - 0.5) * np.pi) * 0.5 + 0.5
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = _quat_to_matrix(_slerp(q0, q1, ratio))
        pose[:3, 3] = (1 - ratio) * pose0[:3, 3] + ratio * pose1[:3, 3]
        out.append(pose)
    return np.stack(out)


def rand_poses(rng: np.random.Generator, size: int, radius: float = 1.0,
               theta_range=(np.pi / 3, 2 * np.pi / 3),
               phi_range=(0.0, 2 * np.pi)) -> np.ndarray:
    """Random orbit-camera poses (provider.py:96-133; CLIP-mode sampling)."""
    thetas = rng.uniform(*theta_range, size)
    phis = rng.uniform(*phi_range, size)
    centers = np.stack([
        radius * np.sin(thetas) * np.sin(phis),
        radius * np.cos(thetas),
        radius * np.sin(thetas) * np.cos(phis),
    ], axis=-1)

    def normalize(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    forward = -normalize(centers)
    up = np.broadcast_to(np.array([0.0, -1.0, 0.0]), forward.shape)
    right = normalize(np.cross(forward, up))
    up = normalize(np.cross(right, forward))
    poses = np.broadcast_to(np.eye(4, dtype=np.float32),
                            (size, 4, 4)).copy()
    poses[:, :3, :3] = np.stack([right, up, forward], axis=-1)
    poses[:, :3, 3] = centers
    return poses


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
                 process_shard: bool = False, n_test: int = 10,
                 fp16_preload: bool = False):
        self.root = root
        self.split = split
        self.fp16_preload = fp16_preload
        tpath = os.path.join(root, f"transforms_{split}.json")
        self.mode = "blender"
        if not os.path.exists(tpath):
            # single transforms.json = colmap-style capture (provider.py:160)
            tpath = os.path.join(root, "transforms.json")
            self.mode = "colmap"
        with open(tpath) as f:
            meta = json.load(f)

        frames = meta["frames"]
        if split != "train" and test_skip > 1:
            frames = frames[::test_skip]
        if self.mode == "colmap" and split == "test":
            # no held-out test images: slerp a path between two random poses
            # (provider.py:209-225)
            rng = np.random.default_rng(0)
            f0, f1 = rng.choice(frames, 2, replace=False)
            p0 = nerf_matrix_to_ngp(
                np.array(f0["transform_matrix"], np.float32),
                scale=scale, offset=offset)
            p1 = nerf_matrix_to_ngp(
                np.array(f1["transform_matrix"], np.float32),
                scale=scale, offset=offset)
            self.poses = interpolate_test_poses(p0, p1, n_test)
            self.images = None
            ppath = os.path.join(root, frames[0]["file_path"])
            if not os.path.splitext(ppath)[1]:
                ppath += ".png"
            probe = _load_image(ppath)
            if downscale > 1:
                probe = probe[::downscale, ::downscale]
            self.H, self.W = probe.shape[:2]
            self.C = probe.shape[2] if probe.ndim == 3 else 3
            self._finish_intrinsics(meta, downscale)
            self._device_images = None
            self._device_poses = None
            return
        if self.mode == "colmap":
            # manual split: first frame is the validation view (provider.py:230)
            frames = (frames[1:] if split == "train"
                      else frames[:1] if split == "val" else frames)
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
        self._finish_intrinsics(meta, downscale)

        self._device_images: Optional[jnp.ndarray] = None
        self._device_poses: Optional[jnp.ndarray] = None

    def _finish_intrinsics(self, meta, downscale):
        H, W = self.H, self.W
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
        # meta cx/cy are full-res and need scaling; the W/2 fallback is in
        # ALREADY-downscaled pixels (self.W comes from the subsampled probe)
        cx = meta["cx"] / downscale if "cx" in meta else W / 2
        cy = meta["cy"] / downscale if "cy" in meta else H / 2
        self.intrinsics = (float(fl_x), float(fl_y), float(cx), float(cy))

    def __len__(self):
        return self.poses.shape[0]

    @property
    def device_images(self) -> Optional[jnp.ndarray]:
        if self._device_images is None and self.images is not None:
            B = self.images.shape[0]
            flat = self.images.reshape(B, self.H * self.W, self.C)
            if self.fp16_preload:
                # provider.py:289-299's fp16 GPU preload: halves HBM at the
                # cost of pre-normalizing (the step skips its /255)
                self._device_images = jnp.asarray(flat, jnp.float16) / 255.0
            else:
                self._device_images = jnp.asarray(flat)
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
