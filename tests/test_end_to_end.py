"""Full-pipeline integration: synthetic dataset -> train CLI -> render CLI ->
metrics CLI, exercising data loaders, Scene, trainer, checkpoints and tools."""

import json
import os

import numpy as np
import pytest

from ed3dgs_tpu.data import colmap
from ed3dgs_tpu.data.synthetic import generate_scene


def test_colmap_roundtrip(tmp_path):
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([50.0, 50.0, 32.0, 24.0]))}
    q = colmap.rotmat_to_qvec(np.eye(3))
    ims = {1: colmap.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "cam00.png")}
    colmap.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    colmap.write_images_binary(str(tmp_path / "images.bin"), ims)
    c2, i2 = colmap.read_model(str(tmp_path))
    assert c2[1].model == "PINHOLE" and c2[1].width == 64
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    np.testing.assert_allclose(i2[1].tvec, ims[1].tvec)
    assert i2[1].name == "cam00.png"
    R = colmap.qvec_to_rotmat(i2[1].qvec)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_qvec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = colmap.qvec_to_rotmat(q)
        q2 = colmap.rotmat_to_qvec(R)
        R2 = colmap.qvec_to_rotmat(q2)
        np.testing.assert_allclose(R2, R, atol=1e-6)


@pytest.mark.slow
def test_train_render_metrics_pipeline(tmp_path):
    scene_dir = str(tmp_path / "scene")
    model_dir = str(tmp_path / "model")
    # scene + step-program shapes deliberately IDENTICAL to
    # test_train_cli_mesh/test_multiprocess_cpu (48x48, cap 256, pair 16384,
    # emb 4/8, net 32, batch 2): the persistent compilation cache
    # (conftest) then compiles the train step once across the CLI-shaped
    # test files instead of once per file
    generate_scene(scene_dir, n_cams=3, n_frames=3, width=48, height=48,
                   n_points=120)

    from ed3dgs_tpu.tools import metrics as metrics_tool
    from ed3dgs_tpu.tools import render as render_tool
    from ed3dgs_tpu.tools import train as train_tool

    train_tool.main([
        "-s", scene_dir, "-m", model_dir, "--loader", "dynerf",
        "--duration", "3", "--iterations", "40", "--capacity", "256",
        "--backend", "xla", "--quiet", "--save_iterations", "40",
        "--set", "max_number_gaussians=256", "pair_capacity=16384",
        "batch_size=2",
        "densify_from_iter=20", "densify_until_iter=36",
        "radegs_regularization_from_iter=1000000",
        "random_until=1000000", "min_embeddings=4", "max_embeddings=8",
        "net_width=32", "raster_chunk=32",
    ])
    ply = os.path.join(model_dir, "point_cloud", "iteration_40", "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_dir, "point_cloud", "iteration_40",
                                       "deformation.npz"))
    assert os.path.exists(os.path.join(model_dir, "cameras.json"))
    assert os.path.exists(os.path.join(model_dir, "training_time.txt"))

    render_tool.main([
        "-m", model_dir, "-s", scene_dir, "--loader", "dynerf",
        "--duration", "3", "--skip_train", "--skip_video", "--max_frames", "3",
        "--backend", "xla", "--iteration", "40",
        "--set", "max_number_gaussians=256", "pair_capacity=16384",
        "min_embeddings=4", "max_embeddings=8", "net_width=32",
        "raster_chunk=32",
    ])
    test_dir = os.path.join(model_dir, "test", "ours_40")
    assert len(os.listdir(os.path.join(test_dir, "renders"))) == 3
    assert len(os.listdir(os.path.join(test_dir, "gt"))) == 3
    assert os.path.exists(os.path.join(test_dir, "normal"))

    metrics_tool.evaluate([model_dir])
    with open(os.path.join(model_dir, "results.json")) as f:
        results = json.load(f)
    psnr = results["ours_40"]["PSNR"]
    assert psnr is not None and psnr > 12.0, results
