"""EnvSphereDataset loader over the generated PBR dataset."""

import os

import numpy as np
import pytest

from envidr_tpu.data.env_dataset import EnvSphereDataset

ROOT = "data/env_sphere_synth"


@pytest.mark.skipif(not os.path.exists(os.path.join(ROOT, "transforms_val.json")),
                    reason="env dataset not generated")
def test_env_dataset_loads():
    import json
    with open(os.path.join(ROOT, "transforms_val.json")) as f:
        n_expected = len(json.load(f)["frames"])
    ds = EnvSphereDataset(ROOT, "val", scale=0.8)
    assert len(ds) == n_expected
    assert ds.C == 4  # rgba
    assert ds.images.dtype == np.uint8
    m = ds.materials[0]
    assert 0.0 <= float(m["roughness"]) <= 1.0
    assert m["color"].shape == (4,)
    assert int(ds.env_indices[3]) in range(11)
    # poses look at the origin from radius ~3.2 (4.0 * scale 0.8)
    d = np.linalg.norm(ds.poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(d, 3.2, atol=1e-4)
    assert ds.device_images.shape == (n_expected, ds.H * ds.W, 4)
