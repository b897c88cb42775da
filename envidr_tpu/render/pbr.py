"""Analytic PBR sphere renderer — ground-truth generator for env-sphere
pretraining.

Replaces the reference's Open3D/Filament offscreen renderer
(``/root/reference/nerf/sph_loader.py:214-301``), which is unavailable here
(and per SURVEY.md §7.3 does not belong on a TPU host anyway).  Implements
Filament's split-sum IBL shading model in numpy/jnp:

  * irradiance map (cosine convolution) for the diffuse lobe,
  * roughness mip chain of GGX-ish prefiltered radiance for specular,
  * Karis/Lazarov analytic environment-BRDF fit for the Fresnel/geometry term.

Environments are procedural HDRIs (sky gradient + random area lights) — the
zero-egress environment cannot fetch the 11 Filament HDRIs, so the env-sphere
pipeline trains against these (same distribution machinery: random pose in
theta [0,360] phi [-90,90], random env of N, random material, sph_loader.py
:250-293).
"""

from __future__ import annotations

import numpy as np

from envidr_tpu.geometry.lighting import gen_light_xyz


# ---------------------------------------------------------------------------
# procedural HDRIs
# ---------------------------------------------------------------------------

def procedural_envmap(seed: int, H: int = 64, W: int = 128) -> np.ndarray:
    """A random plausible outdoor/indoor HDRI [H, W, 3] (linear radiance)."""
    rng = np.random.default_rng(seed * 7919 + 13)
    xyz, _ = gen_light_xyz(H, W, 1.0)
    up = xyz[..., 2]

    sky_top = rng.uniform(0.3, 1.2, 3) * rng.uniform(0.5, 1.5)
    sky_hor = rng.uniform(0.2, 0.9, 3)
    ground = rng.uniform(0.05, 0.4, 3)
    t = np.clip(up, 0, 1)[..., None]
    env = (1 - t) * sky_hor + t * sky_top
    env = np.where(up[..., None] < 0,
                   ground + (sky_hor - ground) * np.clip(1 + up, 0, 1)[..., None] ** 2,
                   env)

    n_lights = rng.integers(1, 4)
    for _ in range(n_lights):
        d = rng.normal(size=3)
        d[2] = abs(d[2]) * rng.choice([1.0, 1.0, -0.3])
        d /= np.linalg.norm(d)
        sharp = rng.uniform(30, 400)
        intensity = rng.uniform(3.0, 25.0)
        color = rng.uniform(0.6, 1.0, 3) * intensity
        cos = np.clip(xyz @ d, 0, 1)
        env = env + color * np.exp(sharp * (cos - 1.0))[..., None]

    # a few colored bounce blobs below the horizon
    for _ in range(rng.integers(0, 3)):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        cos = np.clip(xyz @ d, 0, 1)
        env = env + rng.uniform(0.1, 0.6, 3) * np.exp(40 * (cos - 1.0))[..., None]
    return env.astype(np.float32)


def make_env_bank(n: int = 11, H: int = 64, W: int = 128) -> np.ndarray:
    return np.stack([procedural_envmap(i, H, W) for i in range(n)])


# ---------------------------------------------------------------------------
# split-sum IBL precomputation
# ---------------------------------------------------------------------------

ROUGHNESS_MIPS = np.array([0.03, 0.1, 0.2, 0.35, 0.55, 0.8, 1.0])


class PrefilteredEnv:
    """Irradiance map + roughness mip chain for one envmap."""

    def __init__(self, env: np.ndarray):
        H, W, _ = env.shape
        dirs, areas = gen_light_xyz(H, W, 1.0)
        d = dirs.reshape(-1, 3)
        a = areas.reshape(-1, 1)
        L = env.reshape(-1, 3) * a / (4 * np.pi)   # pre-weighted radiance

        # cosine-convolved irradiance (per output pixel of the same grid):
        # I(n) = sum_p env_p * max(n.d_p, 0) * dOmega_p  (L is env*dOmega/4pi)
        cos = np.clip(d @ d.T, 0, 1)
        self.irradiance = (cos @ L) * (4.0 * np.pi)  # [P, 3]

        # prefiltered specular per roughness (Phong-lobe approx of GGX)
        mips = []
        for r in ROUGHNESS_MIPS:
            alpha = max(r * r, 1e-3)
            power = 2.0 / alpha**2
            w = np.power(cos, min(power, 5000.0))
            w_sum = w @ a
            mips.append((w @ L) / np.maximum(w @ (a / (4 * np.pi)), 1e-9))
        self.spec_mips = np.stack(mips)             # [R, P, 3]
        self.dirs = d                               # [P, 3]
        self.H, self.W = H, W

    def _lookup(self, table, dirs):
        """Nearest-pixel lookup with bilinear-ish smoothing via top-1."""
        from envidr_tpu.geometry.lighting import dir_to_latlong_uv
        u, v = dir_to_latlong_uv(dirs)
        x = np.clip((u * self.W).astype(int), 0, self.W - 1)
        y = np.clip((v * self.H).astype(int), 0, self.H - 1)
        return table.reshape(self.H, self.W, 3)[y, x]

    def irradiance_at(self, n):
        return self._lookup(self.irradiance, n)

    def specular_at(self, r_dir, roughness):
        idx = np.interp(roughness, ROUGHNESS_MIPS, np.arange(len(ROUGHNESS_MIPS)))
        lo, hi = int(np.floor(idx)), int(np.ceil(idx))
        t = idx - lo
        return ((1 - t) * self._lookup(self.spec_mips[lo], r_dir)
                + t * self._lookup(self.spec_mips[hi], r_dir))


def env_brdf_approx(n_dot_v, roughness):
    """Lazarov's analytic env-BRDF fit: returns (scale, bias) for F0."""
    c0 = np.array([-1.0, -0.0275, -0.572, 0.022])
    c1 = np.array([1.0, 0.0425, 1.04, -0.04])
    r = np.stack([np.full_like(n_dot_v, roughness)] * 1, -1)[..., 0]
    rr = np.stack([r, r, r, r], -1) * c0 + c1
    a004 = np.minimum(rr[..., 0] * rr[..., 0], np.exp2(-9.28 * n_dot_v)) \
        * rr[..., 0] + rr[..., 1]
    scale = a004 * -1.04 + rr[..., 2]
    bias = a004 * 1.04 + rr[..., 3]
    return scale, bias


# ---------------------------------------------------------------------------
# sphere render
# ---------------------------------------------------------------------------

def render_pbr_sphere(
    pre: PrefilteredEnv,
    c2w: np.ndarray,               # [4, 4] NGP-convention camera
    intrinsics,                    # (fx, fy, cx, cy)
    H: int, W: int,
    *,
    radius: float = 0.95,
    roughness: float = 0.3,
    metallic: float = 0.0,
    base_color=(0.8, 0.8, 0.8),
    reflectance: float = 0.5,
    bg=None,                       # None -> env-map background; or [3]
    with_alpha: bool = True,
) -> np.ndarray:
    fx, fy, cx, cy = intrinsics
    j, i = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
    dirs = np.stack([(i - cx) / fx, (j - cy) / fy, np.ones_like(i)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs @ c2w[:3, :3].T
    o = c2w[:3, 3]

    b = np.sum(dirs * o, -1)
    c = np.dot(o, o) - radius**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    hit &= t > 0
    p = o + dirs * t[..., None]
    n = p / radius
    v = -dirs
    n_dot_v = np.clip(np.sum(n * v, -1), 1e-4, 1.0)
    r_dir = 2 * n_dot_v[..., None] * n - v

    albedo = np.asarray(base_color, np.float32)[:3]
    f0 = 0.16 * reflectance**2 * (1 - metallic) + albedo * metallic

    irr = pre.irradiance_at(n.reshape(-1, 3)).reshape(H, W, 3)
    diffuse = albedo * (1 - metallic) * irr / np.pi

    spec_L = pre.specular_at(r_dir.reshape(-1, 3), roughness).reshape(H, W, 3)
    scale, bias = env_brdf_approx(n_dot_v, roughness)
    specular = spec_L * (f0 * scale[..., None] + bias[..., None])

    rgb = diffuse + specular
    if bg is None:
        bg_rgb = pre._lookup(pre.spec_mips[0], dirs.reshape(-1, 3)).reshape(H, W, 3)
    else:
        bg_rgb = np.broadcast_to(np.asarray(bg, np.float32), (H, W, 3))
    out = np.where(hit[..., None], rgb, bg_rgb)
    if with_alpha:
        out = np.concatenate([out, hit[..., None].astype(np.float32)], -1)
    return out.astype(np.float32)
