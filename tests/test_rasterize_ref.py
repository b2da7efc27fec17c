"""Behavioral tests of the oracle rasterizer on analytically-checkable scenes."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize_ref import rasterize_reference


def make_cam(w=64, h=64, eye=(0, 0, 0), target=(0, 0, 1)):
    fov = math.radians(60.0)
    return look_at_camera(eye, target, (0, -1, 0), fov, fov, w, h).matrices()


def project(cam, means, scales, quats, opac, rgb, kernel_size=0.0):
    n = means.shape[0]
    shs = jnp.zeros((n, 16, 3))
    return project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), shs,
        viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.campos), width=cam.width, height=cam.height,
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        focal_x=cam.focal_x, focal_y=cam.focal_y,
        kernel_size=kernel_size, sh_degree=0,
        colors_precomp=jnp.asarray(rgb),
    )


def render(cam, proj, n, bg=(0.0, 0.0, 0.0)):
    return rasterize_reference(
        proj, jnp.zeros(n), jnp.asarray(bg, dtype=jnp.float32),
        width=cam.width, height=cam.height,
        focal_x=cam.focal_x, focal_y=cam.focal_y,
    )


def test_single_gaussian_center():
    cam = make_cam()
    z = 2.0
    means = np.array([[0.0, 0.0, z]])
    scales = np.full((1, 3), 0.1)
    quats = np.array([[1.0, 0, 0, 0]])
    opac = np.array([0.9])
    rgb = np.array([[0.2, 0.6, 0.8]])
    proj = project(cam, means, scales, quats, opac, rgb)
    assert bool(proj.valid[0])
    # center projects to image center: ndc 0 -> (S-1)/2
    assert np.allclose(np.asarray(proj.mean2d[0]), [(64 - 1) / 2] * 2, atol=1e-3)
    assert float(proj.depth[0]) == z

    out = render(cam, proj, 1, bg=(1.0, 0.0, 0.0))
    img = np.asarray(out.color)
    cx = 31  # pixel closest to center
    # analytic alpha: sigma_px = f*s/z, d = (0.5, 0.5) px off the center
    sigma2 = (cam.focal_x * 0.1 / z) ** 2
    a_want = 0.9 * math.exp(-0.5 * (0.5 ** 2 + 0.5 ** 2) / sigma2)
    a = np.asarray(out.alpha)[0, cx, cx]
    assert abs(a - a_want) < 5e-3
    expect = a * np.array([0.2, 0.6, 0.8]) + (1 - a) * np.array([1.0, 0, 0])
    assert np.allclose(img[:, cx, cx], expect, atol=1e-5)
    # far corner: pure background
    assert np.allclose(img[:, 0, 0], [1.0, 0, 0], atol=1e-4)
    # depth at center ~ z (flat view => median == expected)
    d = np.asarray(out.expected_depth)[0, cx, cx]
    md = np.asarray(out.median_depth)[0, cx, cx]
    assert abs(d - z) < 0.05
    assert abs(md - z) < 0.05
    # expected coordinate ~ view-space point (0,0,z)
    c = np.asarray(out.expected_coord)[:, cx, cx]
    assert np.allclose(c, [0, 0, z], atol=0.05)
    # normal: an isotropic gaussian seen head-on -> normal ~ -z (towards camera)
    nrm = np.asarray(out.normal)[:, cx, cx]
    assert nrm[2] < -0.9


def test_two_gaussians_depth_order():
    cam = make_cam()
    means = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 3.0]])
    scales = np.full((2, 3), 0.15)
    quats = np.tile([[1.0, 0, 0, 0]], (2, 1))
    opac = np.array([0.6, 0.9])
    rgb = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    proj = project(cam, means, scales, quats, opac, rgb)
    out = render(cam, proj, 2)
    cx = 31
    a_front = 0.6
    # front red blended first: C = 0.6*red + 0.4*0.9*green (approx at center)
    px = np.asarray(out.color)[:, cx, cx]
    assert abs(px[0] - a_front) < 2e-2
    assert abs(px[1] - (1 - a_front) * 0.9) < 2e-2
    # median depth = front gaussian (first crossing of T=0.5)
    md = np.asarray(out.median_depth)[0, cx, cx]
    assert abs(md - 2.0) < 0.05


def test_behind_camera_culled():
    cam = make_cam()
    means = np.array([[0.0, 0.0, -2.0]])
    proj = project(cam, means, np.full((1, 3), 0.1), np.array([[1.0, 0, 0, 0]]),
                   np.array([0.9]), np.array([[1.0, 1, 1]]))
    assert not bool(proj.valid[0])
    assert int(proj.radius[0]) == 0


def test_opacity_compensation_kernel_size():
    cam = make_cam()
    means = np.array([[0.0, 0.0, 2.0]])
    scales = np.full((1, 3), 0.01)  # small -> low-pass dominates
    quats = np.array([[1.0, 0, 0, 0]])
    opac = np.array([0.9])
    rgb = np.array([[1.0, 1, 1]])
    p0 = project(cam, means, scales, quats, opac, rgb, kernel_size=0.0)
    p1 = project(cam, means, scales, quats, opac, rgb, kernel_size=0.3)
    # mip-splatting: enlarged footprint but compensated opacity
    assert float(p1.opacity[0]) < float(p0.opacity[0])
    assert int(p1.radius[0]) >= int(p0.radius[0])


def test_gradients_finite():
    cam = make_cam(w=32, h=32)
    means = jnp.array([[0.05, -0.03, 2.0], [0.1, 0.1, 2.5]])
    scales = jnp.full((2, 3), 0.12)
    quats = jnp.tile(jnp.array([[1.0, 0.02, 0, 0]]), (2, 1))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jnp.array([0.7, 0.8])
    rgb = jnp.array([[0.9, 0.1, 0.2], [0.1, 0.8, 0.3]])

    def loss(means, scales, quats, opac, rgb):
        p = project(cam, means, scales, quats, opac, rgb)
        out = render(cam, p, 2)
        return (jnp.sum(out.color ** 2) + jnp.sum(out.expected_depth)
                + jnp.sum(out.normal) + jnp.sum(out.median_depth)
                + jnp.sum(out.expected_coord) + jnp.sum(out.alpha))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, scales, quats, opac, rgb)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # gradient w.r.t. opacity of a visible gaussian must be nonzero
    assert np.abs(np.asarray(grads[3])).max() > 1e-4


def test_finite_difference_gradcheck():
    """Numerical gradient check of the full project+rasterize pipeline."""
    cam = make_cam(w=16, h=16)
    means0 = np.array([[0.02, 0.01, 2.0]], dtype=np.float64)

    def loss_np(mx):
        means = jnp.asarray(np.array([[mx, 0.01, 2.0]]), dtype=jnp.float32)
        p = project(cam, means, np.full((1, 3), 0.2), np.array([[1.0, 0, 0, 0]]),
                    np.array([0.8]), np.array([[0.9, 0.4, 0.1]]))
        out = render(cam, p, 1)
        return float(jnp.sum(out.color ** 2))

    def loss_grad(mx):
        def f(means):
            p = project(cam, means, np.full((1, 3), 0.2), np.array([[1.0, 0, 0, 0]]),
                        np.array([0.8]), np.array([[0.9, 0.4, 0.1]]))
            out = render(cam, p, 1)
            return jnp.sum(out.color ** 2)
        g = jax.grad(f)(jnp.asarray(np.array([[mx, 0.01, 2.0]]), dtype=jnp.float32))
        return float(g[0, 0])

    eps = 1e-3
    fd = (loss_np(0.02 + eps) - loss_np(0.02 - eps)) / (2 * eps)
    an = loss_grad(0.02)
    assert abs(fd - an) < 2e-2 * max(1.0, abs(fd))
