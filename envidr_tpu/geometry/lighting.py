"""Spherical-coordinate & environment-map utilities.

Reimplements the used surface of ``nerf/render_func/lighting_util.py``
(cart2sph/sph2cart :61/:169, gen_light_xyz :396-431, uniform_sample_sph :21,
gen_render_path :233).  numpy host-side (data prep / application code).
"""

from __future__ import annotations

import numpy as np


def cart2sph(xyz: np.ndarray):
    """[..., 3] -> (r, lat, lng); lat in [-pi/2, pi/2] from equator."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.arcsin(np.clip(z / np.maximum(r, 1e-12), -1, 1))
    lng = np.arctan2(y, x)
    return r, lat, lng


def sph2cart(r, lat, lng):
    z = r * np.sin(lat)
    x = r * np.cos(lat) * np.cos(lng)
    y = r * np.cos(lat) * np.sin(lng)
    return np.stack([x, y, z], axis=-1)


def uniform_sample_sph(n: int, r: float = 1.0, seed: int = 0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return v * r


def gen_light_xyz(envmap_h: int, envmap_w: int, envmap_radius: float = 1.0):
    """Lat-long pixel directions + solid angles (lighting_util.py:396-431).

    Returns (xyz [H, W, 3], areas [H, W]).
    """
    lat_step_size = np.pi / (envmap_h + 2)
    lng_step_size = 2 * np.pi / envmap_w
    lats = np.linspace(
        np.pi / 2 - lat_step_size, -np.pi / 2 + lat_step_size, envmap_h)
    lngs = np.linspace(np.pi, -np.pi + lng_step_size, envmap_w)
    lngs, lats = np.meshgrid(lngs, lats)
    xyz = sph2cart(envmap_radius, lats, lngs)
    sin_colat = np.sin(np.pi / 2 - lats)
    areas = 4 * np.pi * sin_colat / np.sum(sin_colat)
    return xyz, areas


def dir_to_latlong_uv(dirs: np.ndarray):
    """Unit dirs -> (u, v) in [0,1]^2 of the lat-long map from gen_light_xyz."""
    _, lat, lng = cart2sph(dirs)
    v = 0.5 - lat / np.pi          # top = +pi/2
    u = 0.5 - lng / (2 * np.pi)    # lngs run pi -> -pi left to right
    return u % 1.0, np.clip(v, 0.0, 1.0)


def gen_render_path(c2ws: np.ndarray, n_out: int):
    """Interpolated camera path through key poses (lighting_util.py:233)."""
    n_in = len(c2ws)
    ts_in = np.linspace(0, 1, n_in)
    ts_out = np.linspace(0, 1, n_out)
    out = []
    for t in ts_out:
        i = min(int(t * (n_in - 1)), n_in - 2)
        a = (t - ts_in[i]) / (ts_in[i + 1] - ts_in[i] + 1e-12)
        m = (1 - a) * c2ws[i] + a * c2ws[i + 1]
        # re-orthonormalize rotation
        u, _, vt = np.linalg.svd(m[:3, :3])
        m[:3, :3] = u @ vt
        out.append(m)
    return np.stack(out)


def _grid_sample_border(img, u, v):
    """Bilinear sample of ``img [H, W]`` at normalized coords u, v in [-1, 1]
    (align_corners=True, border padding) — the jnp analogue of the
    ``F.grid_sample`` call in the reference's visibility reprojection."""
    import jax.numpy as jnp

    H, W = img.shape
    x = (u + 1.0) * 0.5 * (W - 1)
    y = (v + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = x - x0
    fy = y - y0

    def at(yy, xx):
        return img[yy, xx]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def compute_visibility(cam_depth, light_depth, uv, cam_K, light_K,
                       camrotc2w, cam_pos, lightrotw2c, light_pos,
                       depth_thres: float = 0.01, soft_vis: bool = True,
                       dot_bias: bool = False, normals=None):
    """Shadow-map visibility by light-view depth reprojection
    (``/root/reference/nerf/render_func/lighting_util.py:433-480``).

    Unbatched jnp formulation: lift camera-view depths to world, project
    into the light camera, compare against the light's rendered depth map
    (bilinear, border-padded), and return per-pixel visibility in [0, 1]
    (hard test or a soft ramp over ``depth_thres``; ``dot_bias`` scales the
    bias by the normal-to-light grazing angle to fight shadow acne).

    cam_depth [P], light_depth [Hl, Wl], uv [P, 2] pixel coords,
    cam_K/light_K [3, 3], camrotc2w [3, 3], cam_pos [3],
    lightrotw2c [3, 3], light_pos [3].
    """
    import jax.numpy as jnp

    f_x, f_y = cam_K[0, 0], cam_K[1, 1]
    c_x, c_y = cam_K[0, 2], cam_K[1, 2]
    f_x_l, f_y_l = light_K[0, 0], light_K[1, 1]
    c_x_l, c_y_l = light_K[0, 2], light_K[1, 2]

    u, v = uv[..., 0], uv[..., 1]
    cam_depth_c = jnp.stack([
        (u - c_x) / f_x * cam_depth, (v - c_y) / f_y * cam_depth, cam_depth,
    ], -1)                                                     # [P, 3]
    cam_depth_w = cam_depth_c @ camrotc2w.T + cam_pos          # world points
    light_dir = cam_depth_w - light_pos
    light_cam = light_dir @ lightrotw2c.T                      # light view
    depth_reproj = light_cam[..., 2]
    uv_reproj = light_cam[..., :2] / depth_reproj[..., None]
    ur = uv_reproj[..., 0] * f_x_l / c_x_l                     # -> [-1, 1]
    vr = uv_reproj[..., 1] * f_y_l / c_y_l
    sample_depth = _grid_sample_border(jnp.asarray(light_depth), ur, vr)

    thres = jnp.asarray(depth_thres, jnp.float32)
    if dot_bias:
        ld = light_dir / jnp.maximum(
            jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-10)
        nn = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-10)
        cos = jnp.clip(jnp.sum(-ld * nn, -1), 0.0)
        thres = jnp.maximum(depth_thres * (1.0 - cos), 0.5 * depth_thres)

    diff = depth_reproj - sample_depth
    if not soft_vis:
        return (~(diff > thres)).astype(jnp.float32)
    if not dot_bias:
        return 1.0 - jnp.clip(diff - thres, 0.0, depth_thres) / depth_thres
    dd = jnp.maximum(diff - thres, 0.0)
    return 1.0 - jnp.minimum(dd, depth_thres) / depth_thres
