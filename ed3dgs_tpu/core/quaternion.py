"""Quaternion / rotation / covariance helpers.

Conventions follow the reference (quaternion stored as (w, x, y, z); rotation
matrix as in reference utils/general_utils.py:81 `build_rotation`): the world
covariance of a Gaussian with log-free scales s and unit quaternion q is
Sigma = R diag(s)^2 R^T  (reference forward.cu:270-304 computeCov3D).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions [..., 4]."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w,x,y,z) [..., 4] -> rotation matrix [..., 3, 3].

    Matches reference build_rotation (utils/general_utils.py:81-103) given a
    normalized quaternion; the rasterizer path assumes normalization happened
    upstream (rotation_activation), like forward.cu:279.
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
            2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
            2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """World covariance Sigma = R S^2 R^T as the packed upper triangle.

    Args:
      scales: [..., 3] activated (positive) scales.
      quats: [..., 4] unit quaternions (w,x,y,z).

    Returns:
      [..., 6] packed (xx, xy, xz, yy, yz, zz), matching the reference layout
      (forward.cu:297-303).
    """
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # columns scaled: M = R @ diag(s)
    sigma = M @ jnp.swapaxes(M, -1, -2)
    return pack_sym3(sigma)


def pack_sym3(m: jnp.ndarray) -> jnp.ndarray:
    """Symmetric [..., 3, 3] -> packed [..., 6] (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [m[..., 0, 0], m[..., 0, 1], m[..., 0, 2], m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]],
        axis=-1,
    )


def unpack_sym3(p: jnp.ndarray) -> jnp.ndarray:
    """Packed [..., 6] -> symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (p[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
