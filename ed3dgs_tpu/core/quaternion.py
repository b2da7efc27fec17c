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


def quat_rotmat_entries(q: jnp.ndarray):
    """Unit quaternion (w,x,y,z) [..., 4] -> the 9 rotation-matrix entries as
    separate [...] arrays (r00..r22, row-major). Avoids materializing
    [N, 3, 3]: on TPU a batched 3x3 array tiles to (4, 128) with ~170x
    physical padding, so every op on it is memory-bound at ~200 MB per
    100k gaussians (profiled: the [N,3,3] covariance matmuls + their slices
    cost ~6 ms/step; the scalar form fuses into one elementwise kernel)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
            2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
            2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y))


def build_covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """World covariance Sigma = R S^2 R^T as the packed upper triangle.

    Args:
      scales: [..., 3] activated (positive) scales.
      quats: [..., 4] unit quaternions (w,x,y,z).

    Returns:
      [..., 6] packed (xx, xy, xz, yy, yz, zz), matching the reference layout
      (forward.cu:297-303). Computed entrywise (no [N,3,3] intermediates,
      see quat_rotmat_entries): Sigma_ik = sum_j s_j^2 R_ij R_kj.
    """
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = quat_rotmat_entries(quats)
    a = scales[..., 0] * scales[..., 0]
    b = scales[..., 1] * scales[..., 1]
    c = scales[..., 2] * scales[..., 2]
    return jnp.stack([
        a * r00 * r00 + b * r01 * r01 + c * r02 * r02,
        a * r00 * r10 + b * r01 * r11 + c * r02 * r12,
        a * r00 * r20 + b * r01 * r21 + c * r02 * r22,
        a * r10 * r10 + b * r11 * r11 + c * r12 * r12,
        a * r10 * r20 + b * r11 * r21 + c * r12 * r22,
        a * r20 * r20 + b * r21 * r21 + c * r22 * r22,
    ], axis=-1)


def sym3_congruence(Rm: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """R S R^T for a single [3, 3] matrix and packed symmetric [N, 6] S,
    entrywise (the einsum form materializes [N,3,3] — see
    quat_rotmat_entries for why that is slow on TPU)."""
    xx, xy, xz, yy, yz, zz = (p[..., i] for i in range(6))

    def mv(a):  # S @ R[a, :]: three [...] arrays
        r0, r1, r2 = Rm[a, 0], Rm[a, 1], Rm[a, 2]
        return (xx * r0 + xy * r1 + xz * r2,
                xy * r0 + yy * r1 + yz * r2,
                xz * r0 + yz * r1 + zz * r2)

    def dot(a, m):
        return Rm[a, 0] * m[0] + Rm[a, 1] * m[1] + Rm[a, 2] * m[2]

    m0, m1, m2 = mv(0), mv(1), mv(2)
    return jnp.stack([dot(0, m0), dot(0, m1), dot(0, m2),
                      dot(1, m1), dot(1, m2), dot(2, m2)], axis=-1)


def sym3_matvec(p: jnp.ndarray, vx, vy, vz):
    """Packed symmetric [N, 6] @ per-row vector -> three [N] arrays."""
    xx, xy, xz, yy, yz, zz = (p[..., i] for i in range(6))
    return (xx * vx + xy * vy + xz * vz,
            xy * vx + yy * vy + yz * vz,
            xz * vx + yz * vy + zz * vz)


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
