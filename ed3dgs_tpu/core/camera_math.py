"""Camera matrix construction and depth->normal geometry.

Matrix conventions: we keep *math* convention everywhere — `world_view` maps
world points to camera space as p_cam = W2V[:3,:3] @ p + W2V[:3,3], and
`full_proj = proj @ world_view` maps to clip space. (The reference stores these
transposed for its CUDA column-major indexing, reference scene/cameras.py:84-92;
we do not carry that quirk.)

Sources of semantics: reference utils/graphics_utils.py:106-236 (matrices) and
:240-267 (RaDe-GS depth->normal via finite differences of unprojected points).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

NEAR_PLANE = 0.2  # reference cuda_rasterizer/auxiliary.h:21
FAR_PLANE = 100.0


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray, translate=(0.0, 0.0, 0.0), scale: float = 1.0) -> np.ndarray:
    """World->view 4x4 (math convention). `R` is the cam->world rotation as
    stored by COLMAP-derived loaders (reference getWorld2View2,
    utils/graphics_utils.py:106): the view matrix uses R^T.
    With translate/scale, the camera center is remapped like the reference's
    nerf-normalization path.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    c2w[:3, 3] = (c2w[:3, 3] + np.asarray(translate)) * scale
    return np.linalg.inv(c2w).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """GL-style perspective with the reference's depth mapping
    (utils/graphics_utils.py:119-141, incl. the (zfar+znear)/(zfar-znear) row)."""
    return projection_matrix_cv(znear, zfar, fovx, fovy, 0.0, 0.0)


def projection_matrix_cv(znear: float, zfar: float, fovx: float, fovy: float,
                         cx: float = 0.0, cy: float = 0.0) -> np.ndarray:
    """Principal-point-shifted perspective (Technicolor path,
    utils/graphics_utils.py:180-229). cx, cy in [-0.5, 0.5] image-ratio units."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    dx = (2.0 * tan_half_fovx * znear) * cx
    dy = (2.0 * tan_half_fovy * znear) * cy
    left += dx
    right += dx
    top += dy
    bottom += dy
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P.astype(np.float32)


def ndc_to_pixel(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1,1] -> continuous pixel coordinate (auxiliary.h:57-60)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def camera_rays_z(width: int, height: int, focal_x: float, focal_y: float) -> jnp.ndarray:
    """Per-pixel |ray| length factor `ln` converting distance-along-ray to
    z-depth, as used in renderCUDA (forward.cu:590-591): pixel grid offset by
    image center over focal, ln = sqrt(u^2+v^2+1). Returns [H, W]."""
    xs = (jnp.arange(width, dtype=jnp.float32) - width / 2.0) / focal_x
    ys = (jnp.arange(height, dtype=jnp.float32) - height / 2.0) / focal_y
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.sqrt(u * u + v * v + 1.0)


def depths_to_points(depth: jnp.ndarray, width: int, height: int,
                     focal_x: float, focal_y: float) -> jnp.ndarray:
    """Unproject a z-depth map to camera-space points [3, H, W]
    (reference depths_double_to_points, utils/graphics_utils.py:240-254:
    pixel centers at +0.5, K^-1 with principal point at W/2, H/2)."""
    grid_x = (jnp.arange(width, dtype=jnp.float32) + 0.5 - width / 2.0) / focal_x
    grid_y = (jnp.arange(height, dtype=jnp.float32) + 0.5 - height / 2.0) / focal_y
    u, v = jnp.meshgrid(grid_x, grid_y, indexing="xy")
    rays = jnp.stack([u, v, jnp.ones_like(u)], axis=0)  # [3, H, W]
    return depth.reshape(1, height, width) * rays


def points_to_normal(points: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference cross-product normals [3, H, W]; border rows/cols zero
    (reference point_double_to_normal, utils/graphics_utils.py:256-263)."""
    dx = points[:, 2:, 1:-1] - points[:, :-2, 1:-1]
    dy = points[:, 1:-1, 2:] - points[:, 1:-1, :-2]
    n = jnp.cross(dx, dy, axisa=0, axisb=0, axisc=0)
    # safe normalize with the double-where pattern: at degenerate (flat /
    # background) pixels the cross product is exactly 0 and sqrt's backward
    # is NaN there; 0 * NaN would poison every upstream gradient
    d2 = jnp.sum(n * n, axis=0, keepdims=True)
    ok = d2 > 1e-24
    n = jnp.where(ok, n / jnp.sqrt(jnp.where(ok, d2, 1.0)), 0.0)
    return jnp.pad(n, ((0, 0), (1, 1), (1, 1)))


def depth_to_normal(depth: jnp.ndarray, width: int, height: int,
                    focal_x: float, focal_y: float) -> jnp.ndarray:
    """Depth map [H, W] -> camera-space normal map [3, H, W]."""
    return points_to_normal(depths_to_points(depth, width, height, focal_x, focal_y))
