"""Tests: KNN, ply I/O, Gaussian cloud lifecycle, end-to-end render()."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.config.params import DeformHiddenConfig
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.data import ply as plyio
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.models.deformation import init_deform_params
from ed3dgs_tpu.ops.knn import knn, mean_sqdist_3nn
from ed3dgs_tpu.render import (RenderSettings, raster_config_from_camera,
                               render, settings_from_camera)


def test_knn_vs_scipy():
    from scipy.spatial import cKDTree
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(pts), k=3, block_size=128)
    tree = cKDTree(pts)
    dist, tidx = tree.query(pts, k=4)  # includes self
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1),
                               np.sort(dist[:, 1:] ** 2, axis=1), rtol=1e-3, atol=1e-5)


def test_mean_sqdist_3nn_masked():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    mask = jnp.asarray(np.arange(64) < 40)
    d = mean_sqdist_3nn(jnp.asarray(pts), mask=mask, block_size=32)
    d_ref = mean_sqdist_3nn(jnp.asarray(pts[:40]), block_size=32)
    np.testing.assert_allclose(np.asarray(d[:40]), np.asarray(d_ref), rtol=1e-4, atol=1e-6)
    assert np.all(np.asarray(d[40:]) == 0)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    plyio.store_point_cloud(p, pts, cols)
    pts2, cols2, _ = plyio.fetch_point_cloud(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)


def test_gaussian_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=64)
    assert int(gm.num_alive(aux)) == 50
    path = str(tmp_path / "ckpt" / "point_cloud.ply")
    gm.save_ply(path, params, aux)
    params2, aux2 = gm.load_ply(path, capacity=64)
    for a, b in zip(params, params2):
        np.testing.assert_allclose(np.asarray(a)[:50], np.asarray(b)[:50],
                                   atol=1e-6, err_msg=str(a.shape))
    assert int(gm.num_alive(aux2)) == 50


def test_create_from_points_semantics():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    cols = np.full((30, 3), 0.5, np.float32)
    cols[5] = [1.0, 0.0, 0.0]  # tongue point
    params, aux = gm.create_from_points(pts, cols, capacity=40,
                                        tongue_mask_loss_enabled=True)
    assert float(jax.nn.sigmoid(params.opacity[0, 0])) == pytest.approx(0.1, rel=1e-5)
    assert np.asarray(aux.tongue_class)[5, 0] == 1.0
    assert np.asarray(aux.tongue_class).sum() == 1.0
    assert np.all(np.asarray(params.scaling[:30]) <= 1.0)
    # dead slots are dead
    assert not np.any(np.asarray(aux.alive[30:]))


def _setup_scene(n=60, cap=80, w=48, h=48):
    rng = np.random.default_rng(5)
    pts = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                    rng.uniform(1.8, 2.6, n)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=cap)
    hidden = DeformHiddenConfig()
    dparams = init_deform_params(jax.random.PRNGKey(0), hidden)
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 1), (0, -1, 0), fov, fov, w, h).matrices()
    return params, aux, dparams, hidden, cam


def test_render_end_to_end():
    params, aux, dparams, hidden, cam = _setup_scene()
    cfg = raster_config_from_camera(cam, backend="xla", pair_capacity=1 << 13,
                                    max_per_tile=256)
    settings = settings_from_camera(cam, time=0.3, cam_no=1)
    out = render(params, aux, dparams, hidden, settings, cfg,
                 jnp.zeros(3), iteration=2000, kernel_size=0.1)
    assert set(out.keys()) >= {
        "render", "mask", "expected_coord", "median_coord", "expected_depth",
        "median_depth", "viewspace_points", "visibility_filter", "radii",
        "normal", "sh_coefs_final", "extras", "deformed_gaussian_positions",
        "tongue_mask"}
    img = np.asarray(out["render"])
    assert img.shape == (3, 48, 48)
    assert np.isfinite(img).all()
    assert np.asarray(out["mask"]).max() > 0.1  # something rendered
    # dead slots never visible
    assert not np.any(np.asarray(out["visibility_filter"])[60:])


def test_render_3d_filter_and_tongue_paths():
    params, aux, dparams, hidden, cam = _setup_scene()
    aux = aux._replace(
        filter_3d=jnp.full_like(aux.filter_3d, 0.01),
        tongue_class=aux.tongue_class.at[:10, 0].set(1.0),
    )
    cfg = raster_config_from_camera(cam, backend="xla", pair_capacity=1 << 13,
                                    max_per_tile=256)
    settings = settings_from_camera(cam, time=0.0)
    full = render(params, aux, dparams, hidden, settings, cfg, jnp.zeros(3),
                  iteration=0, disable_filter3d=False)
    tng = render(params, aux, dparams, hidden, settings, cfg, jnp.zeros(3),
                 iteration=0, disable_filter3d=False, tongue_filter="only")
    no_tng = render(params, aux, dparams, hidden, settings, cfg, jnp.zeros(3),
                    iteration=0, disable_filter3d=False, tongue_filter="without")
    v_full = np.asarray(full["visibility_filter"]).sum()
    v_t = np.asarray(tng["visibility_filter"]).sum()
    v_nt = np.asarray(no_tng["visibility_filter"]).sum()
    assert v_t + v_nt == v_full
    assert v_t <= 10
    # tongue channel of the full render integrates the tongue class
    assert np.asarray(full["tongue_mask"]).max() > 0.05


def test_render_gradient_through_everything():
    params, aux, dparams, hidden, cam = _setup_scene(n=30, cap=32)
    cfg = raster_config_from_camera(cam, backend="xla", pair_capacity=1 << 12,
                                    max_per_tile=128)
    settings = settings_from_camera(cam, time=0.5, cam_no=0)
    target = jnp.zeros((3, 48, 48))

    def loss(params_, dparams_, offset):
        out = render(params_, aux, dparams_, hidden, settings, cfg, jnp.zeros(3),
                     iteration=5000, mean2d_offset=offset)
        return jnp.mean(jnp.abs(out["render"] - target))

    offset = jnp.zeros((32, 2))
    g_p, g_d, g_o = jax.grad(loss, argnums=(0, 1, 2))(params, dparams, offset)
    for leaf in jax.tree_util.tree_leaves((g_p, g_d)):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert np.abs(np.asarray(g_p.xyz)).max() > 0
    assert np.abs(np.asarray(g_d["weight"])).max() > 0
    assert np.abs(np.asarray(g_p.embedding)).max() > 0
    # screen-space mean gradients flow to the zero offset hook
    assert np.abs(np.asarray(g_o)).max() > 0


def test_compute_3d_filter():
    params, aux, dparams, hidden, cam = _setup_scene()
    f = gm.compute_3d_filter(
        params.xyz, aux.alive,
        jnp.asarray(cam.world_view)[None],
        jnp.array([cam.focal_x]), jnp.array([cam.focal_y]),
        jnp.array([float(cam.width)]), jnp.array([float(cam.height)]))
    fv = np.asarray(f)[np.asarray(aux.alive)]
    # filter scale ~ depth/focal * sqrt(0.2); depths ~ 2, focal ~ 41.5
    want = 2.2 / cam.focal_x * math.sqrt(0.2)
    assert np.all(fv > 0) and np.all(fv < 2 * want)
