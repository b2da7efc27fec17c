"""Marching tetrahedra correctness on an analytic sphere."""

import numpy as np
import pytest
from scipy.spatial import Delaunay

from ed3dgs_tpu.mesh.marching_tets import marching_tetrahedra


def sphere_setup(n=2500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.2, 1.2, (n, 3))
    tri = Delaunay(pts)
    sdf = 1.0 - np.linalg.norm(pts, axis=1)  # inside sphere radius 1 => > 0
    return pts, tri.simplices, sdf


def test_sphere_surface():
    pts, tets, sdf = sphere_setup()
    edge_verts, faces = marching_tetrahedra(pts, tets, sdf)
    assert len(edge_verts) > 100
    assert len(faces) > 100
    # crossing edges really cross the isosurface
    s0, s1 = sdf[edge_verts[:, 0]], sdf[edge_verts[:, 1]]
    assert np.all((s0 > 0) != (s1 > 0))

    # linear-interpolated surface vertices lie near radius 1
    p0, p1 = pts[edge_verts[:, 0]], pts[edge_verts[:, 1]]
    t = s0 / (s0 - s1)
    v = p0 + t[:, None] * (p1 - p0)
    r = np.linalg.norm(v, axis=1)
    assert np.abs(r - 1.0).max() < 0.15
    assert np.abs(r - 1.0).mean() < 0.03

    # closed surface: every mesh edge is shared by exactly two faces
    mesh_edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    mesh_edges = np.sort(mesh_edges, axis=1)
    _, counts = np.unique(mesh_edges, axis=0, return_counts=True)
    assert np.all(counts == 2), np.bincount(counts)

    # consistent outward orientation: face normals point away from the origin
    fv = v[faces]  # [F, 3, 3]
    nrm = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    center = fv.mean(axis=1)
    dots = np.sum(nrm * center, axis=1)
    frac_out = (dots > 0).mean()
    assert frac_out > 0.99 or frac_out < 0.01, frac_out  # consistent either way


def test_empty_cases():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    tets = np.array([[0, 1, 2, 3]])
    ev, f = marching_tetrahedra(pts, tets, np.full(4, 1.0))
    assert len(ev) == 0 and len(f) == 0
    ev, f = marching_tetrahedra(pts, tets, np.full(4, -1.0))
    assert len(ev) == 0 and len(f) == 0
    ev, f = marching_tetrahedra(pts, tets, np.array([1.0, -1, -1, -1]))
    assert len(ev) == 3 and len(f) == 1
