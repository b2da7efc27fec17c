"""HyperNeRF/Nerfies loader tests on a synthetic monocular scene."""

import os

import numpy as np
import pytest

from ed3dgs_tpu.data.synthetic import generate_hyper_scene


def test_hyper_scene_loading(tmp_path):
    root = str(tmp_path / "hyper")
    generate_hyper_scene(root, n_frames=8, width=48, height=48, n_points=80)

    from ed3dgs_tpu.data.hyper import read_hyper_scene
    info = read_hyper_scene(root)
    # no val ids -> every-4th interleave: train 0,4; test 2,6 shifted
    assert len(info.train_cameras) == 2
    assert len(info.test_cameras) == 1
    cam = info.train_cameras[0]
    assert cam.width == 48 and cam.height == 48
    img = cam.image
    assert img.shape == (3, 48, 48)
    assert info.maxtime == 4
    assert info.point_cloud is not None


@pytest.mark.slow
def test_hyper_training_short(tmp_path):
    root = str(tmp_path / "hyper")
    model_dir = str(tmp_path / "model")
    generate_hyper_scene(root, n_frames=8, width=48, height=48, n_points=80)

    from ed3dgs_tpu.tools import train as train_tool
    train_tool.main([
        "-s", root, "-m", model_dir, "--loader", "nerfies",
        "--iterations", "30", "--capacity", "128", "--backend", "xla",
        "--quiet", "--save_iterations", "30",
        "--set", "max_number_gaussians=128", "pair_capacity=8192",
        "densify_from_iter=1000000", "radegs_regularization_from_iter=1000000",
        "random_until=1000000", "min_embeddings=5", "max_embeddings=10",
        "net_width=16", "raster_chunk=32",
    ])
    assert os.path.exists(os.path.join(model_dir, "point_cloud", "iteration_30",
                                       "point_cloud.ply"))
