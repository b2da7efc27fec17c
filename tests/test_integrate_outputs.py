"""color_integrated / point_sdf of integrate_points vs a direct numpy oracle
of the reference semantics (integrateCUDA pass 1, forward.cu:1196-1290 blend
+ :1527-1535 output assembly)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.common import TILE
from ed3dgs_tpu.ops.integrate import integrate_points, project_points

W = H = 64


def build_scene(n=200, seed=3):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                      rng.uniform(1.6, 2.8, n)], 1).astype(np.float32)
    scales = np.exp(rng.normal(-3.2, 0.4, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    cols = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    fov = math.radians(55.0)
    m = look_at_camera((0.1, -0.05, 0), (0, 0, 2.2), (0, -1, 0), fov, fov,
                       W, H).matrices()
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(opac), jnp.zeros((n, 16, 3)),
        viewmatrix=jnp.asarray(m.world_view),
        projmatrix=jnp.asarray(m.full_proj), campos=jnp.asarray(m.campos),
        width=W, height=H, tan_fovx=m.tan_fovx, tan_fovy=m.tan_fovy,
        focal_x=m.focal_x, focal_y=m.focal_y, kernel_size=0.0, sh_degree=0,
        colors_precomp=jnp.asarray(cols), compute_invraycov=True)
    return proj, m, means


def oracle(proj, point_xy, point_depth, bg):
    """Reference integrate pass-1 per point: 5-corner recurrence over the
    point's tile list in depth order; returns (color_integrated, point_sdf)."""
    depth = np.asarray(proj.depth)
    valid = np.asarray(proj.valid)
    rect_min = np.asarray(proj.rect_min)
    rect_max = np.asarray(proj.rect_max)
    xy = np.asarray(proj.mean2d)
    con = np.asarray(proj.conic)
    op = np.asarray(proj.opacity)
    ts = np.asarray(proj.ts)
    rp = np.asarray(proj.ray_plane)
    rgb = np.asarray(proj.rgb)
    order = np.argsort(np.where(valid, depth, np.inf), kind="stable")

    off = [(0.0, 0.0), (-0.5, -0.5), (0.5, -0.5), (-0.5, 0.5), (0.5, 0.5)]
    colors, sdfs = [], []
    for p in range(point_xy.shape[0]):
        px, py = point_xy[p]
        tx = min(max(int(px) // TILE, 0), W // TILE - 1)
        ty = min(max(int(py) // TILE, 0), H // TILE - 1)
        pixf = (np.floor(px) + 0.5, np.floor(py) + 0.5)
        T = 1.0
        cT = [1.0] * 5
        C = np.zeros(3)
        mid_ts, mid_rp, mid_xy = 0.0, np.zeros(2), np.zeros(2)
        for g in order:
            if not valid[g]:
                continue
            if not (rect_min[g, 0] <= tx < rect_max[g, 0]
                    and rect_min[g, 1] <= ty < rect_max[g, 1]):
                continue
            for k in range(5):
                dx = xy[g, 0] - pixf[0] - off[k][0]
                dy = xy[g, 1] - pixf[1] - off[k][1]
                power = (-0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy)
                         - con[g, 1] * dx * dy)
                if power > 0.0:
                    continue
                alpha = min(0.99, op[g] * math.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_T = cT[k] * (1 - alpha)
                if test_T < 1e-4:
                    continue
                if k == 0:
                    C += rgb[g] * alpha * T
                    if T > 0.5:
                        mid_ts, mid_rp, mid_xy = ts[g], rp[g], xy[g]
                    T = test_T
                cT[k] = test_T
        colors.append(C + T * bg)
        d = mid_xy - point_xy[p]
        sdfs.append(mid_ts + mid_rp[0] * d[0] + mid_rp[1] * d[1]
                    - point_depth[p])
    return np.array(colors), np.array(sdfs)


def test_color_and_sdf_match_oracle():
    proj, m, means = build_scene()
    rng = np.random.default_rng(7)
    # query points near gaussian centers (in-frustum, on-screen)
    queries = (means[rng.choice(len(means), 24, replace=False)]
               + rng.normal(0, 0.02, (24, 3))).astype(np.float32)
    bg = np.array([0.3, 0.5, 0.7], np.float32)
    out = integrate_points(
        proj, jnp.asarray(queries), viewmatrix=jnp.asarray(m.world_view),
        width=W, height=H, focal_x=m.focal_x, focal_y=m.focal_y,
        pair_capacity=1 << 14, max_per_tile=512, point_chunk=32,
        bg=jnp.asarray(bg))
    pxy, pd, pvalid = (np.asarray(x) for x in project_points(
        jnp.asarray(queries), viewmatrix=jnp.asarray(m.world_view),
        width=W, height=H, focal_x=m.focal_x, focal_y=m.focal_y))
    oc, osdf = oracle(proj, pxy, pd, bg)
    keep = pvalid
    assert keep.sum() >= 16
    np.testing.assert_allclose(np.asarray(out.color_integrated)[keep],
                               oc[keep], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.point_sdf)[keep],
                               osdf[keep], atol=2e-5)
    # invalid points report zeros (reference leaves the buffers untouched)
    if (~keep).any():
        assert np.all(np.asarray(out.color_integrated)[~keep] == 0.0)
        assert np.all(np.asarray(out.point_sdf)[~keep] == 0.0)


def test_sdf_sign_semantics():
    """Points behind the visible surface get positive sdf (median depth >
    point depth means the point is in FRONT of the median surface along the
    ray: sdf = median - point). A point pushed toward the camera must have a
    larger sdf than the same point pushed away."""
    proj, m, means = build_scene(n=300, seed=5)
    center = means.mean(0)
    near = center + np.array([0, 0, -0.4], np.float32)   # toward camera
    far = center + np.array([0, 0, 0.4], np.float32)
    out = integrate_points(
        proj, jnp.asarray(np.stack([near, far])),
        viewmatrix=jnp.asarray(m.world_view), width=W, height=H,
        focal_x=m.focal_x, focal_y=m.focal_y, pair_capacity=1 << 14,
        max_per_tile=512, point_chunk=32)
    sdf = np.asarray(out.point_sdf)
    assert np.asarray(out.point_valid).all()
    assert sdf[0] > sdf[1]
