"""Closest-point-on-mesh correctness on analytic shapes."""

import numpy as np

from ed3dgs_tpu.mesh.mesh_eval import (closest_points_on_mesh,
                                       evaluate_mesh_against_pointcloud,
                                       face_normals)


def icosphere(subdiv=2):
    t = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        new_faces = []
        cache = {}
        verts = list(map(tuple, verts))

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = (np.array(verts[i]) + np.array(verts[j])) / 2
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(tuple(m))
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.array(new_faces)
        verts = np.array(verts)
    return np.asarray(verts, float), faces


def test_closest_point_sphere():
    verts, faces = icosphere(2)
    rng = np.random.default_rng(0)
    d_dir = rng.normal(size=(200, 3))
    d_dir /= np.linalg.norm(d_dir, axis=1, keepdims=True)
    radii = rng.uniform(0.5, 1.5, (200, 1))
    pts = d_dir * radii
    d, f, q = closest_points_on_mesh(pts, verts, faces)
    want = np.abs(radii[:, 0] - 1.0)
    # icosphere slightly inside the unit sphere; tolerance for facet error
    assert np.abs(d - want).max() < 0.03
    # closest points lie on the mesh (radius ~1)
    assert np.abs(np.linalg.norm(q, axis=1) - 1.0).max() < 0.03


def test_evaluate_mesh_metrics():
    verts, faces = icosphere(2)
    rng = np.random.default_rng(1)
    n = rng.normal(size=(300, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    pts = n * 1.0
    dist, sim = evaluate_mesh_against_pointcloud(verts, faces, pts,
                                                 gt_normals=n, scale_mm=1000.0)
    assert dist < 15.0   # mm: facet deviation of a subdiv-2 icosphere
    assert sim > 0.97


def test_face_normals_unit():
    verts, faces = icosphere(1)
    n = face_normals(verts, faces)
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
