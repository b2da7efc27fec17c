"""Production train CLI on a multi-chip mesh (--mesh) matches single-chip.

This is the deliverable of SURVEY.md §2.11 / the BASELINE north star: ONE
flag turns the production trainer into a sharded pjit program (camera batch
over "data", Gaussian capacity over "gauss"), with identical training
semantics. The reference has no distributed code at all (greenfield)."""

import os

import numpy as np
import jax
import pytest

from ed3dgs_tpu.data.synthetic import generate_scene

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


COMMON = [
    "--loader", "dynerf", "--duration", "3", "--capacity", "256",
    "--backend", "xla", "--quiet",
]
COMMON_SET = [
    "max_number_gaussians=256", "pair_capacity=16384",
    "batch_size=2", "radegs_regularization_from_iter=1000000",
    "random_until=1000000", "min_embeddings=4", "max_embeddings=8",
    "net_width=32", "raster_chunk=32",
]


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    generate_scene(d, n_cams=3, n_frames=3, width=48, height=48, n_points=100)
    return d


def _train(scene_dir, model_dir, extra, extra_set=()):
    from ed3dgs_tpu.tools import train as train_tool
    return train_tool.main(
        ["-s", scene_dir, "-m", model_dir] + COMMON + extra
        + ["--set"] + COMMON_SET + list(extra_set))


def test_mesh_cli_matches_single_chip(scene_dir, tmp_path):
    """8 steps, densify off: params after mesh training == single-chip."""
    from ed3dgs_tpu.tools import train as train_tool

    args = (["--iterations", "8", "--save_iterations", "8", "--set"]
            + COMMON_SET + ["densify_from_iter=100", "densify_until_iter=0"])
    a1 = train_tool.parse_args(
        ["-s", scene_dir, "-m", str(tmp_path / "m1")] + COMMON + args)
    cfg1 = train_tool.build_config(a1)
    _, s1, aux1 = train_tool.run_training(cfg1, a1)

    a2 = train_tool.parse_args(
        ["-s", scene_dir, "-m", str(tmp_path / "m2")] + COMMON
        + ["--mesh", "data=2,gauss=4"] + args)
    cfg2 = train_tool.build_config(a2)
    _, s2, aux2 = train_tool.run_training(cfg2, a2)

    x1 = np.asarray(s1.params["gaussians"].xyz)
    x2 = np.asarray(s2.params["gaussians"].xyz)
    np.testing.assert_allclose(x2, x1, atol=2e-4)
    w1 = np.asarray(s1.params["deform"]["weight"])
    w2 = np.asarray(s2.params["deform"]["weight"])
    np.testing.assert_allclose(w2, w1, atol=2e-5)
    assert np.array_equal(np.asarray(aux1.alive), np.asarray(aux2.alive))
    # the mesh run really was sharded
    assert tuple(s2.params["gaussians"].xyz.sharding.spec)[0] == "gauss"


def test_mesh_cli_densify_and_checkpoint(scene_dir, tmp_path):
    """Full cadence on the mesh: densify event, 3D-filter refresh, KNN-cache
    rebuild, checkpoint save + ply snapshot all run sharded."""
    model_dir = str(tmp_path / "m")
    _train(scene_dir, model_dir, [
        "--iterations", "12", "--save_iterations", "12",
        "--checkpoint_iterations", "12", "--mesh", "data=2,gauss=4"],
        ["densify_from_iter=3", "densify_until_iter=11",
         "densification_interval=6"])
    assert os.path.exists(os.path.join(
        model_dir, "point_cloud", "iteration_12", "point_cloud.ply"))
    assert os.path.exists(os.path.join(model_dir, "chkpnt12.npz"))
    # resume from the sharded-run checkpoint, still on the mesh
    _train(scene_dir, model_dir, [
        "--iterations", "14", "--save_iterations", "14",
        "--mesh", "data=2,gauss=4",
        "--start_checkpoint", os.path.join(model_dir, "chkpnt12.npz")],
        ["densify_from_iter=100", "densify_until_iter=0"])
    assert os.path.exists(os.path.join(
        model_dir, "point_cloud", "iteration_14", "point_cloud.ply"))


def test_mesh_cli_strip_comms_matches_single_chip(scene_dir, tmp_path):
    """--comms strip (explicit all_to_all strip exchange in the TRAIN step)
    reproduces single-chip training: the hardware-day A/B is a flag flip."""
    from ed3dgs_tpu.tools import train as train_tool

    args = (["--iterations", "8", "--save_iterations", "8", "--set"]
            + COMMON_SET + ["densify_from_iter=100", "densify_until_iter=0"])
    a1 = train_tool.parse_args(
        ["-s", scene_dir, "-m", str(tmp_path / "m1")] + COMMON + args)
    cfg1 = train_tool.build_config(a1)
    _, s1, aux1 = train_tool.run_training(cfg1, a1)

    a2 = train_tool.parse_args(
        ["-s", scene_dir, "-m", str(tmp_path / "m2")] + COMMON
        + ["--mesh", "data=2,gauss=4", "--comms", "strip"] + args)
    cfg2 = train_tool.build_config(a2)
    _, s2, aux2 = train_tool.run_training(cfg2, a2)

    x1 = np.asarray(s1.params["gaussians"].xyz)
    x2 = np.asarray(s2.params["gaussians"].xyz)
    np.testing.assert_allclose(x2, x1, atol=2e-4)
    w1 = np.asarray(s1.params["deform"]["weight"])
    w2 = np.asarray(s2.params["deform"]["weight"])
    np.testing.assert_allclose(w2, w1, atol=2e-5)
    assert np.array_equal(np.asarray(aux1.alive), np.asarray(aux2.alive))
    assert tuple(s2.params["gaussians"].xyz.sharding.spec)[0] == "gauss"
