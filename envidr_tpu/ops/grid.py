"""Multi-cascade occupancy grid: state, EMA updates, frustum marking.

TPU-native replacement for the reference's density-grid machinery
(``/root/reference/nerf/renderer.py:105-361`` + the morton/packbits CUDA
kernels ``raymarching/src/raymarching.cu:214-289``).

Design departures (SURVEY.md §7):
  * Row-major cell indexing instead of Morton — Morton order only buys cache
    locality for CUDA's scattered per-thread walks; XLA's dense gathers don't
    care.  (``morton3d`` is still provided for checkpoint interop.)
  * No packed bitfield — a bool grid is 2 MB/cascade; HBM doesn't need the 8x
    squeeze and bool gathers skip the bit-unpack ALU work.
  * The update is a *full* jittered re-sweep every time (the reference's
    random/occupied subsampling, renderer.py:308-336, is a GPU cost dodge; a
    128^3 sweep is ~2M cheap MLP queries — nothing on a TPU), with the same
    EMA-max decay semantics.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class OccupancyGrid(NamedTuple):
    """Device state (a pytree — carry it through the train loop)."""

    density: jnp.ndarray      # [CAS, H^3] float32; -1 marks untrained cells
    bitfield: jnp.ndarray     # [CAS, H^3] bool (occupied)
    mean_density: jnp.ndarray  # scalar f32
    iter_density: jnp.ndarray  # scalar i32


@dataclasses.dataclass(frozen=True)
class GridSpec:
    grid_size: int = 128
    bound: float = 1.0
    density_thresh: float = 0.01
    density_scale: float = 1.0

    @property
    def cascades(self) -> int:
        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))


def init_grid(spec: GridSpec) -> OccupancyGrid:
    n = spec.grid_size**3
    return OccupancyGrid(
        density=jnp.zeros((spec.cascades, n), jnp.float32),
        bitfield=jnp.zeros((spec.cascades, n), bool),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def cell_index(coords: jnp.ndarray, H: int) -> jnp.ndarray:
    """Row-major flat index of integer cell coords [..., 3]."""
    return (coords[..., 0] * H + coords[..., 1]) * H + coords[..., 2]


def all_cell_coords(H: int) -> jnp.ndarray:
    """[H^3, 3] int32 grid coordinates in row-major order."""
    r = jnp.arange(H, dtype=jnp.int32)
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)


def cascade_world_coords(coords: jnp.ndarray, cas: int, spec: GridSpec,
                         key=None) -> jnp.ndarray:
    """Cell coords -> world positions for cascade `cas`, with optional jitter
    (renderer.py:292-301)."""
    H = spec.grid_size
    xyzs = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0
    bound = min(2.0**cas, spec.bound)
    half = bound / H
    xyzs = xyzs * (bound - half)
    if key is not None:
        xyzs = xyzs + (jax.random.uniform(key, xyzs.shape) * 2.0 - 1.0) * half
    return xyzs


def update_grid(
    grid: OccupancyGrid,
    spec: GridSpec,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    *,
    decay: float = 0.95,
    chunk: int = 2**17,
    fraction: int = 1,
) -> OccupancyGrid:
    """Jittered sweep + EMA-max + re-threshold (renderer.py:265-358).

    density_fn: [M, 3] world xyz -> [M] sigma (already density_scale'd or not —
    we apply spec.density_scale here, mirroring renderer.py:304).

    ``fraction > 1`` re-evaluates only a 1/fraction contiguous slab of cells
    per call (rotating with ``grid.iter_density``) while the decay still
    applies to EVERY trained cell — the TPU replacement for the reference's
    post-warmup random+occupied subsampling (renderer.py:308-336).  The
    occupied-biased half of the reference's sampling exists precisely so that
    stale high-density cells keep decaying between refreshes; global decay +
    rotating refresh reproduces that pruning dynamic (measured: slab-local
    decay stalled occupancy pruning for ~10 epochs) without the scatter that
    random-cell updates would need.  A 128^3 full sweep is ~33M hash-gather
    rows ≈ 0.8 s on a v5e chip (the gather IS the cost; the MLP is trivial);
    the slab form is 1/fraction of that, all dense slice ops."""
    H = spec.grid_size
    coords = all_cell_coords(H)
    n = coords.shape[0]
    n_slab = n // fraction
    slab_i = (grid.iter_density % fraction) * n_slab if fraction > 1 else 0
    if fraction > 1:
        coords = jax.lax.dynamic_slice_in_dim(coords, slab_i, n_slab, 0)
    new_density = []
    for cas in range(spec.cascades):
        key, sub = jax.random.split(key)
        sigmas = []
        for start in range(0, n_slab, chunk):
            sub2 = jax.random.fold_in(sub, start)
            c = jax.lax.dynamic_slice_in_dim(
                coords, start, min(chunk, n_slab - start), 0)
            xyzs = cascade_world_coords(c, cas, spec, sub2)
            sigmas.append(density_fn(xyzs) * spec.density_scale)
        new_density.append(jnp.concatenate(sigmas))
    tmp = jnp.stack(new_density)                           # [CAS, n_slab]

    if fraction == 1:
        old = grid.density
        valid = (old >= 0) & (tmp >= 0)
        density = jnp.where(valid, jnp.maximum(old * decay, tmp), old)
    else:
        # decay every trained cell, refresh the slab (see docstring)
        decayed = jnp.where(grid.density >= 0, grid.density * decay,
                            grid.density)
        old = jax.lax.dynamic_slice_in_dim(decayed, slab_i, n_slab, 1)
        valid = (old >= 0) & (tmp >= 0)
        new_slab = jnp.where(valid, jnp.maximum(old, tmp), old)
        density = jax.lax.dynamic_update_slice_in_dim(decayed, new_slab,
                                                      slab_i, 1)
    mean_density = jnp.mean(jnp.clip(density, 0.0))
    thresh = jnp.minimum(mean_density, spec.density_thresh)
    bitfield = density > thresh
    return OccupancyGrid(density, bitfield,
                         mean_density, grid.iter_density + 1)


def mark_untrained(
    grid: OccupancyGrid, spec: GridSpec, poses: jnp.ndarray, intrinsics,
    *, chunk: int = 2**17,
) -> OccupancyGrid:
    """Mark cells seen by no training camera as -1 (renderer.py:200-263).

    poses: [B, 4, 4] c2w; intrinsics: (fx, fy, cx, cy).

    The coverage test is the reference's own axis-aligned FOV inequality
    (|x_cam| < cx/fx * z_cam + 2*half_grid, renderer.py:249-251) — the
    reference does NOT project cell corners to the image plane.  Parity is
    oracle-tested in tests/test_marching.py::test_mark_untrained_matches_reference_oracle.
    """
    H = spec.grid_size
    fx, fy, cx, cy = intrinsics
    coords = all_cell_coords(H)
    n = coords.shape[0]
    density_rows = []
    for cas in range(spec.cascades):
        bound = min(2.0**cas, spec.bound)
        half = bound / H
        covered_parts = []
        for start in range(0, n, chunk):
            c = coords[start:start + chunk]
            world = (2.0 * c.astype(jnp.float32) / (H - 1) - 1.0) * (bound - half)
            # world2cam: poses is c2w -> subtract translation, multiply by R
            cam = (world[None, :, :] - poses[:, None, :3, 3]) @ poses[:, :3, :3]
            mask_z = cam[..., 2] > 0
            mask_x = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
            mask_y = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
            covered_parts.append((mask_z & mask_x & mask_y).any(axis=0))
        covered = jnp.concatenate(covered_parts)
        density_rows.append(jnp.where(covered, grid.density[cas], -1.0))
    return grid._replace(density=jnp.stack(density_rows))


def mean_step_count(counts: jnp.ndarray, prev_mean, momentum: float = 0.9):
    """Running mean of marched samples/ray -> drives the static K budget
    (replaces the 16-slot step_counter, renderer.py:116-119, :354-357)."""
    return prev_mean * momentum + (1.0 - momentum) * jnp.mean(counts.astype(jnp.float32))


# --- checkpoint-interop helpers (reference stores grids in Morton order) ----

def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """[.., 3] int -> Morton code (raymarching.cu:56-66, :214-228)."""
    return (_part1by2(coords[..., 0])
            | (_part1by2(coords[..., 1]) << 1)
            | (_part1by2(coords[..., 2]) << 2)).astype(jnp.int32)


def _compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & 0x9249249
    x = (x | (x >> 2)) & 0x30C30C3
    x = (x | (x >> 4)) & 0x300F00F
    x = (x | (x >> 8)) & 0x30000FF
    x = (x | (x >> 16)) & 0x3FF
    return x


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """Morton code -> [.., 3] coords (raymarching.cu:240-260)."""
    return jnp.stack([
        _compact1by2(codes), _compact1by2(codes >> 1), _compact1by2(codes >> 2)
    ], axis=-1).astype(jnp.int32)


def packbits(density: jnp.ndarray, thresh) -> jnp.ndarray:
    """[CAS, H^3] density -> uint8 bitfield [CAS*H^3//8] (raymarching.cu:268-289).

    Only needed to emit reference-compatible checkpoints.
    """
    occ = (density.reshape(-1, 8) > thresh).astype(jnp.uint8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))
    return (occ * weights).sum(-1).astype(jnp.uint8)
