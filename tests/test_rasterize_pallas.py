"""Pallas kernel parity: interpret mode (CPU, exact) + real-TPU (marked)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from ed3dgs_tpu.ops.rasterize_ref import rasterize_reference


def scene(n=100, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(1.5, 4, n)], 1).astype(np.float32)
    scales = np.exp(rng.normal(-2.5, 0.5, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    tongue = (rng.uniform(0, 1, n) > 0.7).astype(np.float32)
    return means, scales, q, opac, rgb, tongue


def project(cam, means, scales, quats, opac, rgb):
    n = means.shape[0]
    return project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.zeros((n, 16, 3)),
        viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.campos), width=cam.width, height=cam.height,
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        focal_x=cam.focal_x, focal_y=cam.focal_y,
        kernel_size=0.1, sh_degree=0, colors_precomp=jnp.asarray(rgb),
    )


def _parity(interpret, atol):
    # Tolerances are loose-ish by design: the pallas kernels evaluate the
    # Gaussian exponent as dx*(c0e*dx + c1e*dy) + c2e*dy*dy (an e-folded
    # reassociation of the reference's -0.5*(c0*dx^2+c2*dy^2) - c1*dx*dy),
    # so the passes mask (power2 <= 0) can flip for splats exactly on a
    # pixel boundary vs the xla/reference backends. Forward and backward
    # kernels use the identical expression, so gradients stay mutually
    # consistent; do NOT tighten this into an exact-match assertion.
    w = h = 48
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 1), (0, -1, 0), fov, fov, w, h).matrices()
    means, scales, quats, opac, rgb, tongue = scene()
    proj = project(cam, means, scales, quats, opac, rgb)
    bg = jnp.array([0.1, 0.2, 0.3])
    ref = rasterize_reference(proj, jnp.asarray(tongue), bg, width=w, height=h,
                              focal_x=cam.focal_x, focal_y=cam.focal_y)
    cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                       pair_capacity=1 << 12, chunk=32, backend="pallas",
                       interpret=interpret)
    pal = rasterize(proj, jnp.asarray(tongue), bg, cfg)
    for name in ref._fields:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(pal, name))
        if not interpret and name in ("median_depth", "median_coord"):
            # median channels SELECT a discrete splat at the T=0.5 crossing;
            # compiled-vs-oracle fp noise can flip the selection for pixels
            # exactly at the threshold (measured: ~1% of pixels, value jump
            # ~0.3% — identical before and after the chunk-grid kernel
            # rework). Allow a small flipped fraction instead of atol there.
            bad = np.abs(b - a) > atol
            assert bad.mean() < 0.03, (name, bad.mean())
            continue
        np.testing.assert_allclose(b, a, atol=atol, err_msg=name)


def test_pallas_interpret_matches_oracle():
    _parity(interpret=True, atol=1e-5)


@pytest.mark.tpu
def test_pallas_tpu_matches_oracle():
    _parity(interpret=False, atol=1e-2)


def _grad_parity(interpret, maxrel):
    w = h = 48
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 1), (0, -1, 0), fov, fov, w, h).matrices()
    means, scales, quats, opac, rgb, tongue = scene(80, seed=11)
    rng = np.random.default_rng(1)
    target = rng.uniform(0, 1, (3, h, w)).astype(np.float32)
    bg = jnp.array([0.2, 0.1, 0.4])

    def loss(backend, means_, opac_, rgb_, scales_, quats_):
        p = project_gaussians(
            means_, scales_, quats_, opac_, jnp.zeros((80, 16, 3)),
            viewmatrix=jnp.asarray(cam.world_view),
            projmatrix=jnp.asarray(cam.full_proj),
            campos=jnp.asarray(cam.campos), width=w, height=h,
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            focal_x=cam.focal_x, focal_y=cam.focal_y,
            kernel_size=0.1, sh_degree=0, colors_precomp=rgb_)
        cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x,
                           focal_y=cam.focal_y, pair_capacity=1 << 12,
                           chunk=32, backend=backend, interpret=interpret,
                           max_per_tile=256)
        out = rasterize(p, jnp.asarray(tongue), bg, cfg)
        return (jnp.mean(jnp.abs(out.color - target))
                + 0.2 * jnp.mean(out.expected_depth)
                + 0.1 * jnp.mean(out.normal ** 2)
                + 0.1 * jnp.mean(out.median_depth)
                + 0.05 * jnp.mean(out.expected_coord)
                + 0.02 * jnp.mean(out.alpha) + 0.02 * jnp.mean(out.tongue))

    args = (jnp.asarray(means), jnp.asarray(opac), jnp.asarray(rgb),
            jnp.asarray(scales), jnp.asarray(quats))
    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(*args)
    for gr, gp in zip(g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        assert np.all(np.isfinite(gp))
        scale_ = np.abs(gr).max() + 1e-10
        assert np.abs(gp - gr).max() / scale_ < maxrel


def test_pallas_backward_matches_oracle_interpret():
    """Hand-written pallas backward vs oracle autodiff (exact semantics)."""
    _grad_parity(interpret=True, maxrel=1e-5)


@pytest.mark.tpu
def test_pallas_backward_matches_oracle_tpu():
    _grad_parity(interpret=False, maxrel=5e-2)


def test_pallas_gradient_path():
    """custom_vjp backward produces finite grads through the full pipeline."""
    w = h = 32
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 1), (0, -1, 0), fov, fov, w, h).matrices()
    means, scales, quats, opac, rgb, tongue = scene(32, seed=3)
    bg = jnp.zeros(3)
    cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                       pair_capacity=1 << 10, chunk=32, backend="pallas",
                       interpret=True, max_per_tile=128)

    def loss(means_):
        p = project(cam, means_, scales, quats, opac, rgb)
        out = rasterize(p, jnp.asarray(tongue), bg, cfg)
        return jnp.sum(out.color ** 2) + jnp.sum(out.expected_depth)

    g = jax.grad(loss)(jnp.asarray(means))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
