"""HDRI ingestion: Radiance RGBE parsing, resizing, bank building.

Covers the ``prepare_hdri.sh`` role (``/root/reference/prepare_hdri.sh``) —
fixtures are written by us in both flat and RLE RGBE encodings, then parsed
back and compared against the float source within RGBE quantization error.
"""
import os

import numpy as np
import pytest

from envidr_tpu.data.hdri import (
    build_env_bank_from_dir, load_envmap, read_radiance_hdr, resize_latlong)


def _write_hdr_flat(path, img):
    """Minimal flat (non-RLE) RGBE writer for fixtures."""
    H, W, _ = img.shape
    m = np.max(img, axis=-1)
    exp = np.where(m > 1e-32, np.floor(np.log2(np.maximum(m, 1e-32))) + 1, 0)
    scale = np.where(m > 1e-32, np.ldexp(1.0, (-exp + 8).astype(int)), 0.0)
    mant = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    e = np.where(m > 1e-32, exp + 128, 0).astype(np.uint8)
    rgbe = np.concatenate([mant, e[..., None]], -1)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        f.write(rgbe.tobytes())


def _write_hdr_rle(path, img):
    """Adaptive-RLE RGBE writer (the format real tools emit)."""
    H, W, _ = img.shape
    m = np.max(img, axis=-1)
    exp = np.where(m > 1e-32, np.floor(np.log2(np.maximum(m, 1e-32))) + 1, 0)
    scale = np.where(m > 1e-32, np.ldexp(1.0, (-exp + 8).astype(int)), 0.0)
    mant = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    e = np.where(m > 1e-32, exp + 128, 0).astype(np.uint8)
    rgbe = np.concatenate([mant, e[..., None]], -1)
    out = bytearray(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
    out += f"-Y {H} +X {W}\n".encode()
    for y in range(H):
        out += bytes([2, 2, W >> 8, W & 0xFF])
        for ch in range(4):
            row = rgbe[y, :, ch]
            x = 0
            while x < W:
                # find a run
                run = 1
                while x + run < W and run < 127 and row[x + run] == row[x]:
                    run += 1
                if run >= 4:
                    out += bytes([128 + run, row[x]])
                    x += run
                else:
                    # literal span until next long run
                    start = x
                    while x < W and x - start < 128:
                        r2 = 1
                        while x + r2 < W and r2 < 4 and row[x + r2] == row[x]:
                            r2 += 1
                        if r2 >= 4:
                            break
                        x += 1
                    out += bytes([x - start]) + row[start:x].tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


@pytest.fixture
def env_img():
    rng = np.random.default_rng(3)
    img = rng.uniform(0.02, 1.0, (16, 32, 3)).astype(np.float32)
    img[3:5, 10:14] *= 40.0   # an HDR highlight
    return img


@pytest.mark.parametrize("writer", [_write_hdr_flat, _write_hdr_rle])
def test_rgbe_roundtrip(tmp_path, env_img, writer):
    path = os.path.join(tmp_path, "e.hdr")
    writer(path, env_img)
    back = read_radiance_hdr(path)
    assert back.shape == env_img.shape
    # RGBE shares one exponent across channels: quantization error is
    # relative to the per-pixel MAX channel (~1/256 of it)
    ref = np.max(env_img, axis=-1, keepdims=True)
    rel = np.abs(back - env_img) / (ref + 1e-6)
    assert np.max(rel) < 1.5 / 128.0


def test_resize_latlong(env_img):
    down = resize_latlong(env_img, 8, 16)
    assert down.shape == (8, 16, 3)
    # exact box filter preserves mean energy
    assert np.allclose(down.mean(), env_img.mean(), rtol=1e-5)
    up = resize_latlong(env_img, 24, 48)
    assert up.shape == (24, 48, 3)
    assert np.all(np.isfinite(up))


def test_build_env_bank(tmp_path, env_img):
    _write_hdr_rle(os.path.join(tmp_path, "a.hdr"), env_img)
    np.save(os.path.join(tmp_path, "b.npy"), env_img * 0.5)
    bank = build_env_bank_from_dir(str(tmp_path), H=8, W=16)
    assert bank.shape == (2, 8, 16, 3)
    assert bank.dtype == np.float32
    assert np.all(np.isfinite(bank))


def test_load_envmap_rejects_unknown(tmp_path):
    p = os.path.join(tmp_path, "x.tif")
    open(p, "wb").close()
    with pytest.raises(ValueError):
        load_envmap(p)
