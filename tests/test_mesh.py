"""Marching-tetrahedra mesh extraction on an analytic SDF."""

import numpy as np

from envidr_tpu.apps.mesh_extract import marching_tets, write_obj


def test_sphere_mesh():
    R = 48
    xs = np.linspace(-1, 1, R)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.6
    verts, faces = marching_tets(-sdf)  # reference meshes -sdf (utils.py:907)
    assert len(verts) > 500 and len(faces) > 1000
    world = verts / (R - 1) * 2 - 1
    r = np.linalg.norm(world, axis=-1)
    # all vertices near the 0.6-radius isosurface
    assert abs(r.mean() - 0.6) < 0.02
    assert np.abs(r - 0.6).max() < 0.08
    # every face references valid vertices
    assert faces.max() < len(verts)
    # watertight-ish: each edge shared by exactly 2 faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_obj_export(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2]])
    p = str(tmp_path / "m.obj")
    write_obj(p, verts, faces)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("v ") and lines[-1] == "f 1 2 3"


def test_native_matches_numpy():
    from envidr_tpu.native import marching_tets_native
    R = 24
    xs = np.linspace(-1, 1, R)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    field = -(np.linalg.norm(g, axis=-1) - 0.55).astype(np.float32)
    nat = marching_tets_native(field)
    if nat is None:
        import pytest
        pytest.skip("no native toolchain")
    ref = marching_tets(field, use_native=False)
    nv, nf = nat
    rv, rf = ref
    assert nv.shape == rv.shape and nf.shape == rf.shape
    # same welded vertex set (order may differ)
    kn = set(map(tuple, np.round(nv * 1024).astype(np.int64)))
    kr = set(map(tuple, np.round(rv * 1024).astype(np.int64)))
    assert kn == kr
