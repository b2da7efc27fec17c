"""Closed-form symmetric 3x3 eigen-analysis, vectorized for the TPU VPU.

The reference rasterizer (forward.cu:135-155) eigen-decomposes each Gaussian's
world covariance per splat with an iterative GLM routine to (a) decide whether
the covariance is well conditioned and (b) build its (pseudo-)inverse for the
RaDe-GS plane/normal geometry. On TPU we use the trigonometric closed form
(Eberly) which is branch-free and vectorizes over the Gaussian axis — no
iteration, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def sym3_eigenvalues(p: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of packed symmetric 3x3 matrices, descending order.

    Args:
      p: [..., 6] packed (xx, xy, xz, yy, yz, zz).

    Returns:
      [..., 3] eigenvalues with [..., 0] >= [..., 1] >= [..., 2].
    """
    a00, a01, a02, a11, a12, a22 = (p[..., i] for i in range(6))
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    pm = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_pm = jnp.maximum(pm, 1e-30)
    b00, b11, b22 = (a00 - q) / safe_pm, (a11 - q) / safe_pm, (a22 - q) / safe_pm
    b01, b02, b12 = a01 / safe_pm, a02 / safe_pm, a12 / safe_pm
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * pm * jnp.cos(phi)
    e3 = q + 2.0 * pm * jnp.cos(phi + _TWO_PI_3)
    e2 = 3.0 * q - e1 - e3
    # Diagonal (pm ~ 0) degenerate case: all eigenvalues = q is already what the
    # formula yields, so no special-casing is required beyond safe_pm.
    return jnp.stack([e1, e2, e3], axis=-1)


def sym3_eigenvector(p: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """A unit eigenvector of packed symmetric matrices for eigenvalue lam.

    Uses the largest cross product of rows of (A - lam I); robust when lam is a
    simple eigenvalue (the only case the reference's ill-conditioned fallback
    needs: a near-flat Gaussian has one near-zero eigenvalue well separated
    from the others).

    Args:
      p: [..., 6] packed symmetric matrices.
      lam: [...] eigenvalue per matrix.

    Returns:
      [..., 3] unit eigenvectors.
    """
    a00, a01, a02, a11, a12, a22 = (p[..., i] for i in range(6))
    r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best12 = (n12 >= n01) & (n12 >= n02)
    best02 = (n02 >= n01) & ~best12
    v = jnp.where(best12[..., None], c12, jnp.where(best02[..., None], c02, c01))
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, 1e-30)


def sym3_inverse(p: jnp.ndarray, det_eps: float = 0.0) -> jnp.ndarray:
    """Adjugate inverse of packed symmetric matrices -> packed [..., 6]."""
    a00, a01, a02, a11, a12, a22 = (p[..., i] for i in range(6))
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > det_eps, det, jnp.where(det >= 0, 1e-30, -1e-30))
    return jnp.stack([c00, c01, c02, c11, c12, c22], axis=-1) * inv_det[..., None]


def sym3_pseudo_inverse_min(p: jnp.ndarray, min_eig_threshold: float = 1e-8):
    """Reference-compatible (pseudo-)inverse of a world covariance.

    Well-conditioned (min eigenvalue > threshold): true inverse — computed via
    the smooth adjugate form so autodiff gives the exact, stable gradient (the
    reference hand-derives the same thing in backward.cu:145-488).
    Ill-conditioned: outer product of the min-eigenvalue eigenvector, exactly
    like forward.cu:151-155; gradients are stopped through this degenerate
    branch (the trig eigen-solver has non-finite derivatives at repeated
    eigenvalues, e.g. isotropic Gaussians, and near-flat splats sit at a
    measure-zero configuration anyway).

    Returns:
      (packed_inverse [..., 6], well_conditioned mask [...]).
    """
    p_ng = jax.lax.stop_gradient(p)
    eigs = sym3_eigenvalues(p_ng)
    min_eig = eigs[..., 2]
    well = min_eig > min_eig_threshold
    # Safe-input pattern: the unselected branch must not produce inf/NaN in
    # forward *or* backward, else `where` still propagates NaN cotangents.
    identity6 = jnp.array([1.0, 0.0, 0.0, 1.0, 0.0, 1.0], dtype=p.dtype)
    p_safe = jnp.where(well[..., None], p, identity6)
    inv = sym3_inverse(p_safe)
    v = sym3_eigenvector(p_ng, min_eig)
    outer = jnp.stack(
        [
            v[..., 0] * v[..., 0], v[..., 0] * v[..., 1], v[..., 0] * v[..., 2],
            v[..., 1] * v[..., 1], v[..., 1] * v[..., 2], v[..., 2] * v[..., 2],
        ],
        axis=-1,
    )
    return jnp.where(well[..., None], inv, outer), well
