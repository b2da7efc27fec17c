"""Mesh extraction: integrate op + full tetrahedra pipeline on a dense ball."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.config.params import DeformHiddenConfig
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.mesh.extract import extract_mesh_at_timestep
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.models.deformation import init_deform_params
from ed3dgs_tpu.ops.integrate import integrate_points


CENTER = np.array([0.0, 0.0, 2.2])
R_BALL = 0.25


def make_ball(n=400, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r = R_BALL * rng.uniform(0, 1, (n, 1)) ** (1 / 3)
    pts = (CENTER + d * r).astype(np.float32)
    cols = np.full((n, 3), 0.6, np.float32)
    return pts, cols


def make_views(k=4, w=96, h=96):
    fov = math.radians(55.0)
    views = []
    for i in range(k):
        a = 2 * np.pi * i / k
        eye = CENTER + np.array([1.6 * np.sin(a), 0.2, -1.6 * np.cos(a)])
        views.append(look_at_camera(eye, CENTER, (0, -1, 0), fov, fov, w, h))
    return views


def test_integrate_alpha_inside_vs_outside():
    pts, cols = make_ball()
    params, aux = gm.create_from_points(pts, cols, capacity=512)
    params = params._replace(
        opacity=jnp.where(aux.alive[:, None], 3.0, -10.0),  # sigmoid(3)=0.95
        scaling=jnp.where(aux.alive[:, None], np.log(0.05), -10.0))
    view = make_views(1)[0]
    m = view.matrices()
    rot_act = gm.get_rotation(params)
    proj = project_gaussians(
        params.xyz, jnp.exp(params.scaling), rot_act,
        jax.nn.sigmoid(params.opacity)[:, 0], gm.get_features(params),
        viewmatrix=jnp.asarray(m.world_view), projmatrix=jnp.asarray(m.full_proj),
        campos=jnp.asarray(m.campos), width=96, height=96,
        tan_fovx=m.tan_fovx, tan_fovy=m.tan_fovy,
        focal_x=m.focal_x, focal_y=m.focal_y, kernel_size=0.0, sh_degree=3,
        mask=aux.alive, compute_invraycov=True)
    queries = np.array([
        CENTER,                         # deep inside
        CENTER + [0, 0, -R_BALL * 2],   # in front of the ball (towards camera 0)
        CENTER + [1.0, 0, 0],           # far outside
    ], np.float32)
    out = integrate_points(proj, jnp.asarray(queries),
                           viewmatrix=jnp.asarray(m.world_view),
                           width=96, height=96, focal_x=m.focal_x,
                           focal_y=m.focal_y, pair_capacity=1 << 14,
                           max_per_tile=512)
    a = np.asarray(out.alpha_integrated)
    assert np.all(np.asarray(out.point_valid)[:2])
    assert a[0] > 0.6      # ray to the center passes through much of the ball
    # the point closest to the camera has accumulated much less opacity
    # (only splats in front of it count at their clamped depth)
    assert a[0] > a[1]


@pytest.mark.slow
def test_full_mesh_extraction_ball():
    pts, cols = make_ball(500)
    params, aux = gm.create_from_points(pts, cols, capacity=600)
    params = params._replace(
        opacity=jnp.where(aux.alive[:, None], 3.0, -10.0),
        scaling=jnp.where(aux.alive[:, None], np.log(0.05), -10.0))
    hidden = DeformHiddenConfig(no_coarse_deform=True, no_fine_deform=True,
                                net_width=16)
    dparams = init_deform_params(jax.random.PRNGKey(0), hidden)
    views = make_views(4)
    m = views[0].matrices()
    verts, faces = extract_mesh_at_timestep(
        params, aux, dparams, hidden, views,
        timestep=0.0, width=96, height=96, focal_x=m.focal_x, focal_y=m.focal_y,
        n_binary_steps=4, pair_capacity=1 << 15, max_per_tile=512)
    assert len(verts) > 50 and len(faces) > 50
    d = np.linalg.norm(verts - CENTER, axis=1)
    # surface within a loose shell around the ball radius
    assert np.median(d) < R_BALL * 2.5
    assert d.max() < 1.0
