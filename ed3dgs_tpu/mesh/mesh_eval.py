"""Mesh-vs-point-cloud evaluation.

Reference parity: evaluate_pointcloud_mesh.py:107-168 — for every GT point,
the closest point on the mesh (distance, mm-scaled by the caller) and the
cosine similarity between the GT point normal and the face normal at the
closest point. The reference uses point_cloud_utils' closest_points_on_mesh;
here it is an exact vectorized closest-point-on-triangle computation on
device (blocked over points x faces).
"""

from __future__ import annotations

import numpy as np


def _closest_point_on_triangles(p, a, b, c):
    """Closest point on each triangle (a,b,c) for each query p.

    p: [P, 3]; a/b/c: [F, 3]. Returns (points [P, F, 3]) lazily per block —
    callers block over F. Implementation: Ericson's real-time collision
    detection region test, vectorized."""
    ab = b - a
    ac = c - a
    ap = p[:, None, :] - a[None, :, :]

    d1 = np.einsum("fk,pfk->pf", ab, ap)
    d2 = np.einsum("fk,pfk->pf", ac, ap)
    bp = p[:, None, :] - b[None, :, :]
    d3 = np.einsum("fk,pfk->pf", ab, bp)
    d4 = np.einsum("fk,pfk->pf", ac, bp)
    cp = p[:, None, :] - c[None, :, :]
    d5 = np.einsum("fk,pfk->pf", ab, cp)
    d6 = np.einsum("fk,pfk->pf", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_vc = (d1 - d3) * (d1 - d3 - d4 + d2) + 1e-30
    v_ab = np.clip(d1 / np.where(np.abs(d1 - d3) > 1e-30, d1 - d3, 1e-30), 0, 1)
    w_ac = np.clip(d2 / np.where(np.abs(d2 - d6) > 1e-30, d2 - d6, 1e-30), 0, 1)
    w_bc = np.clip((d4 - d3) / np.where(
        np.abs((d4 - d3) + (d5 - d6)) > 1e-30, (d4 - d3) + (d5 - d6), 1e-30), 0, 1)

    denom = va + vb + vc
    v = vb / np.where(np.abs(denom) > 1e-30, denom, 1e-30)
    w = vc / np.where(np.abs(denom) > 1e-30, denom, 1e-30)

    # region selection
    inside = (va >= 0) & (vb >= 0) & (vc >= 0)
    reg_a = (d1 <= 0) & (d2 <= 0)
    reg_b = (d3 >= 0) & (d4 <= d3)
    reg_c = (d6 >= 0) & (d5 <= d6)
    reg_ab = (~reg_a) & (~reg_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    reg_ac = (~reg_a) & (~reg_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    reg_bc = (~reg_b) & (~reg_c) & (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    A = a[None]
    q = A + v[..., None] * ab[None] + w[..., None] * ac[None]  # inside default
    q = np.where(reg_bc[..., None], b[None] + w_bc[..., None] * (c - b)[None], q)
    q = np.where(reg_ac[..., None], A + w_ac[..., None] * ac[None], q)
    q = np.where(reg_ab[..., None], A + v_ab[..., None] * ab[None], q)
    q = np.where(reg_c[..., None], c[None] * np.ones_like(q), q)
    q = np.where(reg_b[..., None], b[None] * np.ones_like(q), q)
    q = np.where(reg_a[..., None], A * np.ones_like(q), q)
    return q


def closest_points_on_mesh(points: np.ndarray, vertices: np.ndarray,
                           faces: np.ndarray, point_block: int = 512,
                           face_block: int = 4096):
    """(distances [P], closest_face [P], closest_point [P,3])."""
    P = len(points)
    best_d = np.full(P, np.inf, np.float32)
    best_f = np.zeros(P, np.int64)
    best_q = np.zeros((P, 3), np.float32)
    tri = vertices[faces]  # [F, 3, 3]
    for ps in range(0, P, point_block):
        p = points[ps:ps + point_block].astype(np.float64)
        bd = np.full(len(p), np.inf)
        bf = np.zeros(len(p), np.int64)
        bq = np.zeros((len(p), 3))
        for fs in range(0, len(faces), face_block):
            t = tri[fs:fs + face_block].astype(np.float64)
            q = _closest_point_on_triangles(p, t[:, 0], t[:, 1], t[:, 2])
            d = np.linalg.norm(p[:, None, :] - q, axis=2)
            am = d.argmin(axis=1)
            dm = d[np.arange(len(p)), am]
            upd = dm < bd
            bd = np.where(upd, dm, bd)
            bf = np.where(upd, am + fs, bf)
            bq = np.where(upd[:, None], q[np.arange(len(p)), am], bq)
        best_d[ps:ps + point_block] = bd
        best_f[ps:ps + point_block] = bf
        best_q[ps:ps + point_block] = bq
    return best_d, best_f, best_q


def face_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    tri = vertices[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    return n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)


def evaluate_mesh_against_pointcloud(vertices, faces, gt_points,
                                     gt_normals=None, scale_mm=1000.0):
    """Mean closest distance (scaled, e.g. to mm) + mean |normal cosine|
    (reference evaluate_pointcloud_mesh.py:118-135)."""
    d, f, _q = closest_points_on_mesh(gt_points, vertices, faces)
    mean_dist = float(np.mean(d) * scale_mm)
    normal_sim = None
    if gt_normals is not None and len(faces):
        fn = face_normals(vertices, faces)[f]
        gn = gt_normals / np.maximum(
            np.linalg.norm(gt_normals, axis=1, keepdims=True), 1e-12)
        normal_sim = float(np.mean(np.abs(np.sum(fn * gn, axis=1))))
    return mean_dist, normal_sim
