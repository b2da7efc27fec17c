"""Tongue TRAINING branch end-to-end (reference train.py:298-343).

Rounds 1-4 tested tongue *rendering* and tongue-from-red *init* only; these
tests execute the full tongue loss assembly — mask L1x5, tongue KNN graph,
the two extra masked renders — through the real trainer and the production
CLI on a synthetic NerSemble-TONGUE-layout scene (red seed blob + per-frame
segmentation masks)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def tongue_scene(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tscene"))
    generate_scene(d, n_cams=3, n_frames=3, width=48, height=48,
                   n_points=120, tongue_frac=0.25, seed=3)
    return d


def test_tongue_scene_layout(tongue_scene):
    """Segmentation masks exist, are nonzero, and the seed ply carries
    exactly-red tongue points that create_from_points classifies."""
    seg = os.path.join(tongue_scene, "segmentations", "cam00", "0000.png")
    assert os.path.exists(seg)
    from PIL import Image
    a = np.asarray(Image.open(seg), np.float32) / 255.0
    assert 0 < (a > 0.5).sum() < a.size  # real mask, not all-on/all-off

    from ed3dgs_tpu.data.ply import fetch_point_cloud
    pts, cols, _ = fetch_point_cloud(
        os.path.join(tongue_scene, "points3D_downsample.ply"))
    red = np.all(np.asarray(cols) == np.array([1.0, 0, 0]), axis=1)
    assert red.sum() == 30  # tongue_frac * n_points

    from ed3dgs_tpu.models import gaussians as gm
    params, aux = gm.create_from_points(
        pts, cols, capacity=256, tongue_mask_loss_enabled=True)
    assert int(jnp.sum(aux.tongue_class)) == 30


def test_tongue_camera_masks_load(tongue_scene):
    from ed3dgs_tpu.config.loader import load_full_config
    from ed3dgs_tpu.data.scene import Scene

    cfg = load_full_config(None, {
        "source_path": tongue_scene, "model_path": "",
        "loader": "nersemble", "tongue_mask_loss_enabled": True})
    scene = Scene(cfg.model, cfg.hidden, capacity=256, duration=3,
                  shuffle=False)
    cam = scene.train_cameras[0]
    t = cam.tongue_mask
    assert t is not None and t.shape == (1, 48, 48)
    assert 0 < (t > 0.5).sum() < t.size


@pytest.mark.slow
def test_tongue_training_losses_finite_and_decreasing(tongue_scene, tmp_path):
    """Drive make_train_step with tongue_enabled=True on real staged
    batches: all four tongue losses finite every step, the mask L1 and
    total loss decrease, and tongue_class round-trips through save_ply."""
    from ed3dgs_tpu.config.loader import load_full_config
    from ed3dgs_tpu.data.scene import Scene
    from ed3dgs_tpu.models import gaussians as gm
    from ed3dgs_tpu.ops.rasterize import RasterConfig
    from ed3dgs_tpu.tools.train import stage_batch
    from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                          make_train_step, update_knn_cache)

    cfg = load_full_config(None, {
        "source_path": tongue_scene, "model_path": str(tmp_path / "m"),
        "loader": "nersemble", "tongue_mask_loss_enabled": True,
        "min_embeddings": 4, "max_embeddings": 8, "net_width": 32})
    scene = Scene(cfg.model, cfg.hidden, capacity=256, duration=3,
                  shuffle=False)
    m0 = scene.train_cameras[0].matrices()
    rcfg = RasterConfig(width=m0.width, height=m0.height,
                        focal_x=m0.focal_x, focal_y=m0.focal_y,
                        backend="xla", pair_capacity=1 << 14, chunk=32,
                        max_per_tile=256)
    setup = TrainSetup(raster=rcfg, hidden=cfg.hidden, batch_size=2,
                       white_background=True, disable_filter3d=True,
                       tongue_enabled=True, lambda_dssim=0.0,
                       radegs_from_iter=10_000_000, reg_coef=1.0,
                       opacity_l1_coef=0.0001)
    state, optimizer = init_train_state(scene.params, cfg.hidden, cfg.opt,
                                        scene.cameras_extent)
    aux = scene.aux
    assert int(jnp.sum(aux.tongue_class)) > 0
    cache = update_knn_cache(state.params["gaussians"], aux,
                             tongue_enabled=True)
    # tongue on: the tongue graph is a distinct object with its own mask
    assert cache.t_graph is not cache.graph
    step = make_train_step(setup, cfg.opt, optimizer)

    cams = scene.train_cameras
    batches = [stage_batch([cams[i], cams[i + 1]], 3, False, True)
               for i in range(0, 4, 2)]
    hist = {k: [] for k in ("tongue_l1", "tongue_emb", "tongue_rgb",
                            "wo_tongue_rgb", "loss")}
    for i in range(40):
        state, aux, metrics = step(state, aux, batches[i % 2], cache)
        for k in hist:
            v = float(metrics[k])
            assert np.isfinite(v), (k, i, v)
            hist[k].append(v)

    first = np.mean(hist["tongue_l1"][:5])
    last = np.mean(hist["tongue_l1"][-5:])
    assert last < first, (first, last)
    assert np.mean(hist["loss"][-5:]) < np.mean(hist["loss"][:5])

    # tongue_class survives the reference ply round-trip
    ply = str(tmp_path / "pc.ply")
    gm.save_ply(ply, jax.device_get(state.params["gaussians"]), aux)
    _, aux2 = gm.load_ply(ply, capacity=256)
    assert int(jnp.sum(aux2.tongue_class)) == int(jnp.sum(aux.tongue_class))


@pytest.mark.slow
def test_tongue_cli_e2e(tongue_scene, tmp_path):
    """Production CLI with tongue_mask_loss_enabled=true: full loop incl.
    a densify event and save; saved ply keeps tongue gaussians."""
    from ed3dgs_tpu.models import gaussians as gm
    from ed3dgs_tpu.tools import train as train_tool

    model_dir = str(tmp_path / "model")
    train_tool.main([
        "-s", tongue_scene, "-m", model_dir, "--loader", "nersemble",
        "--duration", "3", "--iterations", "20", "--capacity", "256",
        "--backend", "xla", "--quiet", "--save_iterations", "20",
        "--set", "tongue_mask_loss_enabled=true", "max_number_gaussians=256",
        "pair_capacity=16384", "batch_size=2",
        "densify_from_iter=5", "densify_until_iter=18",
        "densification_interval=8",
        "radegs_regularization_from_iter=1000000", "random_until=1000000",
        "min_embeddings=4", "max_embeddings=8", "net_width=32",
        "raster_chunk=32",
    ])
    ply = os.path.join(model_dir, "point_cloud", "iteration_20",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    _, aux = gm.load_ply(ply, capacity=512)
    assert int(jnp.sum(aux.tongue_class)) > 0


def test_coord_map_branch_runs():
    """use_coord_map=True routes the regularizer through coord_normal_loss
    (trainer.py loss assembly, reference train.py:253-259): finite, nonzero
    once radegs kicks in, and differentiable."""
    import math

    from ed3dgs_tpu.config.params import (DeformHiddenConfig,
                                          OptimizationConfig)
    from ed3dgs_tpu.data.cameras import look_at_camera
    from ed3dgs_tpu.models import gaussians as gm
    from ed3dgs_tpu.ops.rasterize import RasterConfig
    from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                          make_train_step, update_knn_cache)

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-0.5, 0.5, 80), rng.uniform(-0.5, 0.5, 80),
                    rng.uniform(2.0, 2.4, 80)], 1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (80, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=128)
    hidden = DeformHiddenConfig(net_width=32, defor_depth=1,
                                min_embeddings=4, max_embeddings=8)
    opt_cfg = OptimizationConfig()
    cam = look_at_camera((0, 0, 0), (0, 0, 2.2), (0, -1, 0),
                         math.radians(60), math.radians(60), 48, 48).matrices()
    rcfg = RasterConfig(width=48, height=48, focal_x=cam.focal_x,
                        focal_y=cam.focal_y, backend="xla",
                        pair_capacity=1 << 13, max_per_tile=256, chunk=32)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                       disable_filter3d=True, use_coord_map=True,
                       radegs_from_iter=0, reg_coef=0.0,
                       lambda_depth_normal=0.05)
    step = make_train_step(setup, opt_cfg, optimizer)
    cache = update_knn_cache(state.params["gaussians"], aux)
    batch = {
        "gt_image": jnp.full((1, 3, 48, 48), 0.5),
        "viewmatrix": jnp.asarray(cam.world_view)[None],
        "projmatrix": jnp.asarray(cam.full_proj)[None],
        "campos": jnp.asarray(cam.campos)[None],
        "time": jnp.zeros((1,)), "cam_no": jnp.zeros((1,), jnp.int32),
        "use_ssim": jnp.asarray(False),
    }
    for _ in range(2):
        state, aux, metrics = step(state, aux, batch, cache)
    dn = float(metrics["depth_normal"])
    assert np.isfinite(dn) and dn != 0.0
    assert np.isfinite(float(metrics["loss"]))
    assert bool(jnp.all(jnp.isfinite(state.params["gaussians"].xyz)))
