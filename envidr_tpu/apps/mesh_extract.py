"""Mesh extraction: chunked SDF grid query + marching tetrahedra + OBJ export.

Replaces the reference's ``extract_fields``/``extract_geometry``/``save_mesh``
(``/root/reference/nerf/utils.py:245-275, 898-928``), which depend on
PyMCubes + trimesh.  Marching *tetrahedra* needs no 256-entry case tables:
each grid cell splits into 6 tets; a tet with a sign change yields 1-2
triangles with vertices linearly interpolated to the zero crossing.  Fully
vectorized in numpy.
"""

from __future__ import annotations

import numpy as np

# cube corner offsets (binary order)
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
# 6-tet decomposition of the cube (corner indices)
_TETS = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
                  [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]])
# for each of the 16 sign patterns: edges (pairs of tet-vertex ids) forming
# the 1-2 triangles; -1 padded.  Tet edges: (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
_CASES = {
    0b0001: [[0, 1, 2]],
    0b0010: [[0, 4, 3]],
    0b0100: [[1, 3, 5]],
    0b1000: [[2, 5, 4]],
    0b0011: [[1, 2, 4], [1, 4, 3]],
    0b0101: [[0, 3, 5], [0, 5, 2]],
    0b1001: [[0, 1, 5], [0, 5, 4]],
    0b0110: [[0, 4, 5], [0, 5, 1]],
    0b1010: [[0, 2, 5], [0, 5, 3]],
    0b1100: [[1, 3, 4], [1, 4, 2]],
    0b0111: [[2, 5, 4]],
    0b1011: [[1, 3, 5]],
    0b1101: [[0, 4, 3]],
    0b1110: [[0, 1, 2]],
}


def marching_tets(field: np.ndarray, iso: float = 0.0,
                  use_native: bool = True):
    """field: [R, R, R] scalar; returns (verts [V,3] in voxel coords, faces [F,3]).

    Triangles are oriented so normals point toward decreasing field (outward
    for an SDF where inside < 0 ... the reference runs marching cubes on -sdf,
    utils.py:907-910; pass -sdf here for the same orientation).

    Uses the C++ core (envidr_tpu/native/mtets.cpp) when buildable; the numpy
    path below is the reference implementation and fallback.
    """
    if use_native:
        from envidr_tpu.native import marching_tets_native
        res = marching_tets_native(np.asarray(field, np.float32) - iso, 0.0)
        if res is not None:
            return res
    R = field.shape[0]
    g = np.stack(np.meshgrid(np.arange(R - 1), np.arange(R - 1),
                             np.arange(R - 1), indexing="ij"), -1).reshape(-1, 3)
    corner_pos = g[:, None, :] + _CORNERS[None]                     # [C, 8, 3]
    corner_val = field[corner_pos[..., 0], corner_pos[..., 1],
                       corner_pos[..., 2]] - iso                    # [C, 8]

    verts_list, faces_list = [], []
    n_verts = 0
    for tet in _TETS:
        v = corner_val[:, tet]                                      # [C, 4]
        p = corner_pos[:, tet].astype(np.float64)                   # [C, 4, 3]
        inside = (v < 0).astype(np.int32)
        code = inside[:, 0] | (inside[:, 1] << 1) | (inside[:, 2] << 2) \
            | (inside[:, 3] << 3)
        for pattern, tris in _CASES.items():
            m = code == pattern
            if not m.any():
                continue
            vm, pm = v[m], p[m]
            # interpolated zero-crossing position on each of the 6 tet edges
            a = vm[:, _TET_EDGES[:, 0]]
            b = vm[:, _TET_EDGES[:, 1]]
            t = a / np.where(np.abs(a - b) < 1e-12, 1e-12, a - b)
            t = np.clip(t, 0.0, 1.0)[..., None]
            pa = pm[:, _TET_EDGES[:, 0]]
            pb = pm[:, _TET_EDGES[:, 1]]
            epos = pa + t * (pb - pa)                               # [M, 6, 3]
            for tri in tris:
                tv = epos[:, tri]                                   # [M, 3, 3]
                M = tv.shape[0]
                verts_list.append(tv.reshape(-1, 3))
                faces_list.append(
                    n_verts + np.arange(M * 3).reshape(M, 3))
                n_verts += M * 3
    if not verts_list:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_list)
    faces = np.concatenate(faces_list)
    # weld duplicate vertices
    keys, inv = np.unique(np.round(verts * 1024).astype(np.int64),
                          axis=0, return_inverse=True)
    remap = np.full(len(keys), -1, np.int64)
    out_verts = np.zeros((len(keys), 3))
    out_verts[inv] = verts
    faces = inv[faces]
    # drop degenerate faces
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    return out_verts, faces[ok]


def extract_fields(query_fn, resolution: int = 256, bound: float = 1.0,
                   chunk: int = 2**17) -> np.ndarray:
    """Chunked scalar-field evaluation on a dense grid (utils.py:245-260)."""
    import jax.numpy as jnp

    xs = np.linspace(-bound, bound, resolution, dtype=np.float32)
    pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    out = np.empty(pts.shape[0], np.float32)
    for s in range(0, pts.shape[0], chunk):
        out[s:s + chunk] = np.asarray(query_fn(jnp.asarray(pts[s:s + chunk])))
    return out.reshape(resolution, resolution, resolution)


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")


def save_mesh(trainer, path: str, resolution: int = 256):
    """Marching tets on -sdf at iso 0 (utils.py:898-928)."""
    from envidr_tpu.models.network import forward_geometry

    params = trainer.state["ema"]
    cfg = trainer.cfg

    def query(pts):
        geo = forward_geometry(params, cfg, pts)
        return geo["sdf"] if cfg.use_sdf else geo["sigma"]

    field = extract_fields(query, resolution, cfg.bound)
    sign = -1.0 if cfg.use_sdf else 1.0
    iso = 0.0 if cfg.use_sdf else 10.0
    verts, faces = marching_tets(sign * field, iso=-iso if cfg.use_sdf else iso)
    # voxel coords -> world
    verts = verts / (resolution - 1) * 2 * cfg.bound - cfg.bound
    write_obj(path, verts, faces)
    print(f"[mesh] {path}: {len(verts)} verts, {len(faces)} faces")
    return verts, faces
