"""Full-optimizer checkpoint save/restore round trip through the train CLI."""

import os

import numpy as np
import pytest

from ed3dgs_tpu.data.synthetic import generate_scene


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    scene_dir = str(tmp_path / "scene")
    m1 = str(tmp_path / "m1")
    generate_scene(scene_dir, n_cams=3, n_frames=3, width=48, height=48,
                   n_points=100)
    from ed3dgs_tpu.tools import train as train_tool

    # step-program shapes identical to test_train_cli_mesh/e2e (see the
    # comment there): the persistent compilation cache dedupes the compile
    common = [
        "-s", scene_dir, "--loader", "dynerf", "--duration", "3",
        "--capacity", "256", "--backend", "xla", "--quiet",
        "--set", "max_number_gaussians=256", "pair_capacity=16384",
        "batch_size=2",
        "densify_from_iter=1000000", "radegs_regularization_from_iter=1000000",
        "random_until=1000000", "min_embeddings=4", "max_embeddings=8",
        "net_width=32", "raster_chunk=32",
    ]
    train_tool.main(["-m", m1, "--iterations", "24",
                     "--checkpoint_iterations", "12", "--save_iterations", "24"]
                    + common)
    ckpt = os.path.join(m1, "chkpnt12.npz")
    assert os.path.exists(ckpt)

    # resume from 12 -> 24 in a second run
    m2 = str(tmp_path / "m2")
    train_tool.main(["-m", m2, "--iterations", "24",
                     "--start_checkpoint", ckpt, "--save_iterations", "24"]
                    + common)
    ply = os.path.join(m2, "point_cloud", "iteration_24", "point_cloud.ply")
    assert os.path.exists(ply)

    with np.load(ckpt) as d:
        assert int(d["iteration"]) == 12
        assert "params/gaussians/xyz" in d
        assert any(k.startswith("opt_state/") for k in d.files)
