"""PCD file I/O + COLMAP point-cloud supervision loss
(reference train.py:273-295, utils/train_utils.py:66-89)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ed3dgs_tpu.data.pcd import load_pointcloud_any, read_pcd, write_pcd
from ed3dgs_tpu.train.losses import colmap_pcd_loss


@pytest.mark.parametrize("binary", [True, False])
def test_pcd_roundtrip(tmp_path, binary):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(137, 3)).astype(np.float32)
    nrm = rng.normal(size=(137, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    write_pcd(path, pts, nrm, binary=binary)
    pts2, nrm2 = read_pcd(path)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    np.testing.assert_allclose(nrm2, nrm, rtol=1e-6)


def test_pcd_without_normals(tmp_path):
    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    path = str(tmp_path / "p.pcd")
    write_pcd(path, pts)
    pts2, nrm2 = read_pcd(path)
    np.testing.assert_allclose(pts2, pts)
    assert nrm2 is None
    # dispatcher handles .pcd
    pts3, _ = load_pointcloud_any(path)
    np.testing.assert_allclose(pts3, pts)


def test_colmap_pcd_loss_matches_bruteforce():
    rng = np.random.default_rng(1)
    C, P = 96, 500
    g = rng.normal(size=(C, 3)).astype(np.float32)
    p = rng.normal(size=(P, 3)).astype(np.float32)
    alive = np.ones(C, bool)
    alive[40:] = False  # dead capacity slots must not attract points
    got = float(colmap_pcd_loss(jnp.asarray(p), jnp.asarray(g),
                                jnp.asarray(alive), chunk=100))
    # brute force in mm (reference scales both sides by 1000, train_utils.py:81-82)
    d2 = ((p[:, None, :] * 1000 - g[None, :40, :] * 1000) ** 2).sum(-1)
    want = d2.min(axis=1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_colmap_pcd_loss_gradient_finite():
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    alive = jnp.ones(64, bool)
    grad = jax.grad(lambda gg: colmap_pcd_loss(p, gg, alive, chunk=50))(g)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0  # pulls gaussians toward the cloud


def test_trainer_gating_smoke():
    """colmap_supervision=True: step runs, pcd_loss is zero before
    deform_from_iter / when invalid, nonzero after."""
    from ed3dgs_tpu.config.params import (DeformHiddenConfig,
                                          OptimizationConfig)
    from ed3dgs_tpu.data.cameras import look_at_camera
    from ed3dgs_tpu.models import gaussians as gm
    from ed3dgs_tpu.ops.rasterize import RasterConfig
    from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                          make_train_step, update_knn_cache)

    rng = np.random.default_rng(0)
    w = h = 32
    pts = rng.normal(0, 0.3, (40, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (40, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=64)
    hidden = DeformHiddenConfig(net_width=16, defor_depth=1,
                                deform_from_iter=5)
    opt_cfg = OptimizationConfig(iterations=10)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    cam = look_at_camera([0, 0, -3.0], [0, 0, 0], [0, 1, 0], 0.8, 0.8, w, h)
    m = cam.matrices()
    rcfg = RasterConfig(width=w, height=h, focal_x=m.focal_x, focal_y=m.focal_y,
                        pair_capacity=4096, chunk=32, backend="xla",
                        max_per_tile=256)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                       colmap_supervision=True, deform_from_iter=5,
                       disable_filter3d=True, radegs_from_iter=10**6,
                       reg_coef=0.0, opacity_l1_coef=0.0)
    step = make_train_step(setup, opt_cfg, optimizer)
    knn_cache = update_knn_cache(state.params["gaussians"], aux)

    batch = {
        "gt_image": jnp.asarray(rng.random((1, 3, h, w)), jnp.float32),
        "viewmatrix": jnp.asarray(m.world_view)[None],
        "projmatrix": jnp.asarray(m.full_proj)[None],
        "campos": jnp.asarray(m.campos)[None],
        "time": jnp.zeros((1,)),
        "cam_no": jnp.zeros((1,), jnp.int32),
        "use_ssim": jnp.asarray(False),
        "pcd_points": jnp.asarray(rng.normal(0, 0.3, (500, 3)), jnp.float32),
        "pcd_valid": jnp.asarray(True),
    }
    # iteration 0 (< deform_from_iter): gated off
    _, _, m0 = step(state, aux, batch, knn_cache)
    assert float(m0["pcd_loss"]) == 0.0
    # iteration 6: active
    from ed3dgs_tpu.train.optim import TrainState
    state6 = TrainState(state.params, state.opt_state, jnp.int32(6))
    _, _, m6 = step(state6, aux, batch, knn_cache)
    assert float(m6["pcd_loss"]) > 0.0
    assert np.isfinite(float(m6["loss"]))
    # invalid cloud: gated off even when past deform_from_iter
    batch_inv = dict(batch)
    batch_inv["pcd_valid"] = jnp.asarray(False)
    _, _, mi = step(state6, aux, batch_inv, knn_cache)
    assert float(mi["pcd_loss"]) == 0.0
