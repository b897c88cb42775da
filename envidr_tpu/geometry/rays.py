"""Camera poses, ray generation, and analytic geometry helpers.

Reimplements the reference's pose conventions and ray utilities:
  * ``nerf_matrix_to_ngp``            (``/root/reference/nerf/provider.py:32-40``)
  * ``pose_spherical`` and friends    (``/root/reference/nerf/sph_loader.py:67-76``,
                                       ``/root/reference/nerf/utils.py`` trans/rot lambdas)
  * ``get_rays``                      (``/root/reference/nerf/utils.py:110-209``)
  * ``get_sphere_intersections``      (``/root/reference/nerf/render_func/sph_ray.py:19-32``)
  * ``reflect_dir``                   (``/root/reference/nerf/renderer.py:20-39``)
  * ``near_far_from_aabb``            (``/root/reference/raymarching/src/raymarching.cu:92-145``)

All functions are pure jnp (camera math is tiny; XLA fuses it into the ray
pipeline).  Random sampling takes explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# pose conventions (host-side numpy: these run in data loaders, not on TPU)
# ---------------------------------------------------------------------------

def trans_t(t):
    return np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]], dtype=np.float64)


def rot_phi(phi):
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float64)


def rot_theta(th):
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float64)


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Blender-style spherical camera pose (``sph_loader.py:67-76``)."""
    c2w = trans_t(radius)
    c2w = rot_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = rot_theta(theta_deg / 180.0 * np.pi) @ c2w
    c2w = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float64) @ c2w
    return c2w


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 1.0, offset=(0, 0, 0)) -> np.ndarray:
    """NeRF (OpenGL) c2w -> NGP convention: axis permute + flip + scale/offset."""
    return np.array(
        [
            [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
            [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
            [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )


# ---------------------------------------------------------------------------
# ray generation (jnp — runs jitted on device)
# ---------------------------------------------------------------------------

def full_image_rays(poses: jnp.ndarray, intrinsics, H: int, W: int):
    """Rays for every pixel. poses: [B, 4, 4] c2w. Returns rays_o/rays_d [B, H*W, 3]."""
    fx, fy, cx, cy = intrinsics
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    i = i.reshape(-1) + 0.5   # pixel x
    j = j.reshape(-1) + 0.5   # pixel y
    return _rays_from_pixels(poses, i[None], j[None], fx, fy, cx, cy)


def sampled_rays(key, poses: jnp.ndarray, intrinsics, H: int, W: int, N: int):
    """N random pixel rays per image (``utils.py:155-159``).

    Returns dict with rays_o, rays_d [B, N, 3] and flat pixel indices inds [B, N].
    """
    fx, fy, cx, cy = intrinsics
    B = poses.shape[0]
    inds = jax.random.randint(key, (N,), 0, H * W)
    inds = jnp.broadcast_to(inds[None], (B, N))
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    rays_o, rays_d = _rays_from_pixels(poses, i, j, fx, fy, cx, cy)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def error_map_rays(key, poses, intrinsics, H: int, W: int, N: int, error_map):
    """Importance-sample N rays from a [B, 128*128] error map (``utils.py:174-186``)."""
    fx, fy, cx, cy = intrinsics
    B = poses.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    logits = jnp.log(jnp.clip(error_map, 1e-12))
    inds_coarse = jax.random.categorical(k1, logits[:, None, :], axis=-1, shape=(B, N))
    inds_x, inds_y = inds_coarse // 128, inds_coarse % 128
    sx, sy = H / 128.0, W / 128.0
    fx_r = jax.random.uniform(k2, (B, N))
    fy_r = jax.random.uniform(k3, (B, N))
    ix = jnp.clip((inds_x * sx + fx_r * sx).astype(jnp.int32), 0, H - 1)
    iy = jnp.clip((inds_y * sy + fy_r * sy).astype(jnp.int32), 0, W - 1)
    inds = ix * W + iy
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    rays_o, rays_d = _rays_from_pixels(poses, i, j, fx, fy, cx, cy)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds, "inds_coarse": inds_coarse}


def _rays_from_pixels(poses, i, j, fx, fy, cx, cy):
    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = jnp.stack([xs, ys, zs], axis=-1)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    rays_d = directions @ jnp.swapaxes(poses[:, :3, :3], -1, -2)
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    return rays_o, rays_d


# ---------------------------------------------------------------------------
# analytic intersections & reflection
# ---------------------------------------------------------------------------

def reflect_dir(w_o: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """u = 2 (n.v) n - v; w_o points from surface to camera (``renderer.py:20-39``)."""
    return 2.0 * jnp.sum(w_o * normals, axis=-1, keepdims=True) * normals - w_o


def sphere_intersections(rays_o: jnp.ndarray, rays_d: jnp.ndarray, r: float = 1.0):
    """Ray-sphere hit. Returns (near[N,1], far[N,1], mask[N]) (``sph_ray.py:19-32``)."""
    ray_cam_dot = jnp.sum(rays_d * rays_o, axis=-1, keepdims=True)
    nabla = ray_cam_dot**2 - (
        jnp.sum(rays_o * rays_o, axis=-1, keepdims=True) - r**2)
    nabla_sqrt = jnp.sqrt(jnp.clip(nabla, 0.0))
    near = -ray_cam_dot - nabla_sqrt
    far = -ray_cam_dot + nabla_sqrt
    mask = (nabla >= -1e-4)[..., 0]
    return near, far, mask


def near_far_from_aabb(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, aabb: jnp.ndarray, min_near: float = 0.2
):
    """Slab test vs [xmin ymin zmin xmax ymax zmax] (``raymarching.cu:92-145``).

    Returns (near[N], far[N]); rays that miss get near = far = 1e10 wiped to
    a degenerate interval exactly like the CUDA kernel.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-15, rays_d,
                            jnp.where(rays_d >= 0, 1e-15, -1e-15))
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = far < near
    near = jnp.where(miss, 1e10, jnp.maximum(near, min_near))
    far = jnp.where(miss, 1e10, jnp.maximum(far, near))
    return near, far


def sph_from_ray(rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float):
    """(theta, phi)/pi coords of the far bg-sphere hit (``raymarching.cu:163-198``)."""
    _, far, _ = sphere_intersections(rays_o, rays_d, radius)
    p = rays_o + far * rays_d
    theta = jnp.arctan2(p[..., 1:2], jnp.sqrt(p[..., 0:1] ** 2 + p[..., 2:3] ** 2)) / jnp.pi
    phi = jnp.arctan2(p[..., 0:1], p[..., 2:3]) / jnp.pi
    return jnp.concatenate([theta, phi], axis=-1)


def linear_to_srgb(x):
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * x ** (1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    return jnp.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def patch_rays(key, poses, intrinsics, H: int, W: int, N: int, patch_size: int):
    """Patch-based ray sampling for patch losses (``utils.py:136-153``)."""
    fx, fy, cx, cy = intrinsics
    B = poses.shape[0]
    num_patch = N // (patch_size**2)
    k1, k2 = jax.random.split(key)
    ix = jax.random.randint(k1, (num_patch,), 0, H - patch_size)
    iy = jax.random.randint(k2, (num_patch,), 0, W - patch_size)
    pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size),
                          indexing="ij")
    offs = jnp.stack([pi.ravel(), pj.ravel()], -1)                  # [p^2, 2]
    inds2 = jnp.stack([ix, iy], -1)[:, None, :] + offs[None]        # [np, p^2, 2]
    inds = (inds2[..., 0] * W + inds2[..., 1]).reshape(-1)
    inds = jnp.broadcast_to(inds[None], (B, inds.shape[0]))
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    rays_o, rays_d = _rays_from_pixels(poses, i, j, fx, fy, cx, cy)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def center_crop_rays(key, poses, intrinsics, H: int, W: int, N: int,
                     center_crop: float, crop_ratio: float = 0.6):
    """Center-weighted sampling (``utils.py:160-173``): crop_ratio of the rays
    from the central crop window, the rest uniform."""
    fx, fy, cx, cy = intrinsics
    B = poses.shape[0]
    pad = (1.0 - center_crop) / 2.0
    H_pad, W_pad = int(H * pad), int(W * pad)
    H_crop, W_crop = H - 2 * H_pad, W - 2 * W_pad
    N_crop = int(N * crop_ratio)
    k1, k2, k3 = jax.random.split(key, 3)
    ic = jax.random.randint(k1, (N_crop,), 0, H_crop) + H_pad
    jc = jax.random.randint(k2, (N_crop,), 0, W_crop) + W_pad
    inds_crop = ic * W + jc
    inds_bg = jax.random.randint(k3, (N - N_crop,), 0, H * W)
    inds = jnp.concatenate([inds_crop, inds_bg])
    inds = jnp.broadcast_to(inds[None], (B, N))
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    rays_o, rays_d = _rays_from_pixels(poses, i, j, fx, fy, cx, cy)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}
