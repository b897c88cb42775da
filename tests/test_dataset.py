"""NeRFDataset extras: colmap split/slerp path, fp16 preload, rand_poses."""

import json
import os

import numpy as np

from envidr_tpu.data.nerf_dataset import (NeRFDataset, interpolate_test_poses,
                                          rand_poses)


def _write_colmap_set(root, n=4, H=16, W=16):
    import imageio.v2 as imageio
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        fn = f"im_{i}.png"
        imageio.imwrite(os.path.join(root, fn),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        pose = np.eye(4)
        pose[:3, 3] = [np.cos(i), np.sin(i), 1.5]
        frames.append({"file_path": fn, "transform_matrix": pose.tolist()})
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump({"fl_x": 20.0, "cx": W / 2, "cy": H / 2,
                   "frames": frames}, f)


def test_colmap_mode_split_and_slerp(tmp_path):
    root = str(tmp_path)
    _write_colmap_set(root)
    train = NeRFDataset(root, "train", scale=0.5)
    val = NeRFDataset(root, "val", scale=0.5)
    test = NeRFDataset(root, "test", scale=0.5, n_test=6)
    assert train.mode == "colmap"
    assert len(train) == 3 and len(val) == 1       # first frame held out
    assert len(test) == 7 and test.images is None  # interpolated path
    dets = np.linalg.det(test.poses[:, :3, :3])
    assert np.allclose(np.abs(dets), 1.0, atol=1e-4)
    assert test.H == 16 and test.intrinsics[0] == 20.0


def test_fp16_preload(tmp_path):
    root = str(tmp_path)
    _write_colmap_set(root)
    ds = NeRFDataset(root, "train", scale=0.5, fp16_preload=True)
    di = ds.device_images
    assert di.dtype.name == "float16"
    assert float(di.max()) <= 1.0


def test_rand_poses_orbit():
    p = rand_poses(np.random.default_rng(1), 8, radius=2.0)
    assert p.shape == (8, 4, 4)
    # camera centers on the sphere, mirrored (det -1) frames like provider.py
    assert np.allclose(np.linalg.norm(p[:, :3, 3], axis=-1), 2.0, atol=1e-5)
    assert np.allclose(np.linalg.det(p[:, :3, :3]), -1.0, atol=1e-4)


def test_slerp_endpoints():
    p0 = np.eye(4, dtype=np.float32)
    th = 0.8
    p1 = np.eye(4, dtype=np.float32)
    p1[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    p1[:3, 3] = [1, 2, 3]
    path = interpolate_test_poses(p0, p1, 8)
    np.testing.assert_allclose(path[0], p0, atol=1e-5)
    np.testing.assert_allclose(path[-1], p1, atol=1e-5)


def test_downscale_principal_point(tmp_path):
    """cx/cy fallback is in already-downscaled pixels (round-2 bugfix: the
    W/2 default was divided by downscale twice, shifting renders a full
    quadrant at --downscale 4)."""
    root = str(tmp_path)
    _write_colmap_set(root)
    ds = NeRFDataset(root, "train", scale=0.5, downscale=2)
    fl, _, cx, cy = ds.intrinsics
    assert ds.H == 8 and ds.W == 8
    assert fl == 10.0 and cx == 4.0 and cy == 4.0

    # and when the json has NO explicit cx/cy (blender-style), same answer
    with open(os.path.join(root, "transforms.json")) as f:
        meta = json.load(f)
    del meta["cx"], meta["cy"]
    with open(os.path.join(root, "transforms.json"), "w") as f:
        json.dump(meta, f)
    ds = NeRFDataset(root, "train", scale=0.5, downscale=2)
    _, _, cx, cy = ds.intrinsics
    assert cx == 4.0 and cy == 4.0
