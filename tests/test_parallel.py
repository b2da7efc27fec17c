"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.config.params import DeformHiddenConfig, OptimizationConfig
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.ops.rasterize import RasterConfig
from ed3dgs_tpu.parallel import make_mesh
from ed3dgs_tpu.parallel.sharded import (make_sharded_train_step, shard_batch,
                                         shard_knn_cache, shard_train_state)
from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                      make_train_step, update_knn_cache)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def build_problem(batch=4, n=96, cap=128, w=48, h=48):
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-0.7, 0.7, n), rng.uniform(-0.7, 0.7, n),
                    rng.uniform(1.9, 2.5, n)], 1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=cap)
    hidden = DeformHiddenConfig(net_width=32, defor_depth=1)
    opt_cfg = OptimizationConfig()
    fov = math.radians(60.0)
    cams = [look_at_camera((0.2 * i - 0.3, 0.1 * i, 0), (0, 0, 2.2), (0, -1, 0),
                           fov, fov, w, h).matrices() for i in range(batch)]
    rcfg = RasterConfig(width=w, height=h, focal_x=cams[0].focal_x,
                        focal_y=cams[0].focal_y, backend="xla",
                        pair_capacity=1 << 13, max_per_tile=128, chunk=32)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=batch,
                       disable_filter3d=True, radegs_from_iter=10 ** 9,
                       batch_mode="vmap")
    gts = rng.uniform(0, 1, (batch, 3, h, w)).astype(np.float32)
    batch_data = {
        "gt_image": jnp.asarray(gts),
        "viewmatrix": jnp.stack([jnp.asarray(c.world_view) for c in cams]),
        "projmatrix": jnp.stack([jnp.asarray(c.full_proj) for c in cams]),
        "campos": jnp.stack([jnp.asarray(c.campos) for c in cams]),
        "time": jnp.zeros((batch,)),
        "cam_no": jnp.zeros((batch,), jnp.int32),
        "use_ssim": jnp.asarray(False),
    }
    knn_cache = update_knn_cache(params, aux)
    return state, aux, setup, opt_cfg, optimizer, batch_data, knn_cache


def test_sharded_step_matches_single_device():
    state, aux, setup, opt_cfg, optimizer, batch, knn_cache = build_problem()
    raw_step = make_train_step(setup, opt_cfg, optimizer, jit=False)

    # single-device reference
    s1, a1, m1 = jax.jit(raw_step)(state, aux, batch, knn_cache)

    mesh = make_mesh(data=2, gauss=4)
    state_s, aux_s = shard_train_state(mesh, state, aux)
    batch_s = shard_batch(mesh, batch)
    cache_s = shard_knn_cache(mesh, knn_cache)
    sharded = make_sharded_train_step(raw_step, mesh, state, aux, batch, knn_cache)
    s2, a2, m2 = sharded(state_s, aux_s, batch_s, cache_s)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-4)
    assert float(m1["psnr"]) == pytest.approx(float(m2["psnr"]), rel=2e-3)
    x1 = np.asarray(s1.params["gaussians"].xyz)
    x2 = np.asarray(s2.params["gaussians"].xyz)
    np.testing.assert_allclose(x2, x1, atol=5e-5)
    w1 = np.asarray(s1.params["deform"]["weight"])
    w2 = np.asarray(s2.params["deform"]["weight"])
    np.testing.assert_allclose(w2, w1, atol=5e-6)
    # densification stats agree
    np.testing.assert_allclose(np.asarray(a2.denom), np.asarray(a1.denom), atol=1e-6)


def test_sharded_multiple_steps_stay_sharded():
    state, aux, setup, opt_cfg, optimizer, batch, knn_cache = build_problem()
    raw_step = make_train_step(setup, opt_cfg, optimizer, jit=False)
    mesh = make_mesh(data=4, gauss=2)
    state_s, aux_s = shard_train_state(mesh, state, aux)
    batch_s = shard_batch(mesh, batch)
    cache_s = shard_knn_cache(mesh, knn_cache)
    step = make_sharded_train_step(raw_step, mesh, state, aux, batch, knn_cache)
    for _ in range(3):
        state_s, aux_s, metrics = step(state_s, aux_s, batch_s, cache_s)
    assert np.isfinite(float(metrics["loss"]))
    shard_axes = state_s.params["gaussians"].xyz.sharding.spec
    assert tuple(shard_axes)[0] == "gauss"
