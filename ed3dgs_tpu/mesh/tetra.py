"""Tetrahedra point generation + Delaunay (host side).

Reference parity: utils/mesh_extraction_utils.py:10-63 (statistical outlier
removal, per-Gaussian box corners at 3x the 3D-filtered scale, plus centers)
and tetra_triangulation's CGAL Delaunay (src/triangulation.cpp:28-69) —
replaced by scipy.spatial.Delaunay, which is equally exact and already
incremental for these point counts; mesh extraction is offline tooling, not
the TPU hot path.
"""

from __future__ import annotations

import numpy as np

from ..core.quaternion import quat_to_rotmat
from ..ops.knn import knn

# unit box corner signs (trimesh.creation.box scaled by 2 => corners at +-1)
_BOX = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                dtype=np.float32)


def statistical_outlier_mask(points: np.ndarray, nb_neighbors: int = 20,
                             std_ratio: float = 1.0) -> np.ndarray:
    """Open3D remove_statistical_outlier semantics: keep points whose mean
    distance to their k neighbors is below mean + std_ratio * std."""
    import jax.numpy as jnp
    d2, _ = knn(jnp.asarray(points, jnp.float32), k=nb_neighbors)
    mean_d = np.asarray(jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)), axis=1))
    mu, sigma = mean_d.mean(), mean_d.std()
    return mean_d <= mu + std_ratio * sigma


def get_tetra_points(xyz: np.ndarray, rotations_raw: np.ndarray,
                     scales_filtered: np.ndarray):
    """Per-Gaussian box corners at 3x scale (rotated) + centers.

    Returns (points [M,3], point_scales [M,1]) like the reference
    (mesh_extraction_utils.py:10-63)."""
    import jax.numpy as jnp

    keep = statistical_outlier_mask(xyz)
    xyz = xyz[keep]
    rot = rotations_raw[keep]
    scale = scales_filtered[keep] * 3.0

    q = rot / np.maximum(np.linalg.norm(rot, axis=1, keepdims=True), 1e-12)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # scale first, then rotate: c = R @ (box * scale)
    corners = np.einsum("nij,nkj->nki", R, _BOX[None] * scale[:, None, :])
    corners = corners + xyz[:, None, :]
    points = np.concatenate([corners.reshape(-1, 3), xyz], axis=0)
    smax = scale.max(axis=1, keepdims=True)
    point_scales = np.concatenate(
        [np.repeat(smax, 8, axis=0), smax], axis=0)
    return points.astype(np.float32), point_scales.astype(np.float32)


def delaunay_tets(points: np.ndarray) -> np.ndarray:
    """Delaunay tetrahedralization -> [T, 4] int32 (cpp.triangulate parity)."""
    from scipy.spatial import Delaunay
    return Delaunay(points).simplices.astype(np.int32)
