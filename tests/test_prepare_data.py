"""Dataset preparation tool tests (hermetic synthetic raw layouts)."""

import json
import os

import numpy as np
import pytest

from ed3dgs_tpu.data.ply import fetch_point_cloud, store_point_cloud
from ed3dgs_tpu.tools import prepare_data


def test_downsample(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 0.05, (5000, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    src, dst = str(tmp_path / "in.ply"), str(tmp_path / "out.ply")
    store_point_cloud(src, pts, cols)
    prepare_data.main(["downsample", src, dst, "--max_points", "1000"])
    pts2, _, _ = fetch_point_cloud(dst)
    assert len(pts2) <= 1000


def test_add_tongue_points(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    cols = np.full((200, 3), 0.5, np.float32)
    f = str(tmp_path / "pc.ply")
    store_point_cloud(f, pts, cols)
    prepare_data.main(["add-tongue-points", f, "--num_points", "100"])
    pts2, cols2, _ = fetch_point_cloud(f)
    assert len(pts2) == 300
    red = np.all(np.abs(cols2 - [1, 0, 0]) < 1 / 255, axis=1)
    assert red.sum() == 100
    assert os.path.exists(str(tmp_path / "pc_original.ply"))


def test_ccm_identity_and_srgb_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (8, 8, 3))
    # identity CCM (3 terms) must round-trip through decode/encode
    out = prepare_data.apply_ccm(img, np.eye(3))
    np.testing.assert_allclose(out, img, atol=1e-6)
    # 8-term CCM with identity leading block also round-trips
    ccm8 = np.zeros((3, 8))
    ccm8[:, :3] = np.eye(3)
    out8 = prepare_data.apply_ccm(img, ccm8)
    np.testing.assert_allclose(out8, img, atol=1e-6)


def test_nersemble_prep(tmp_path):
    from PIL import Image
    root = tmp_path / "raw"
    scene = "EXP-1"
    cams = ["AAA", "BBB"]
    w2c = {c: np.eye(4).tolist() for c in cams}
    (root / "calibration").mkdir(parents=True)
    with open(root / "calibration" / "camera_params.json", "w") as f:
        json.dump({"intrinsics": [[100, 0, 16], [0, 100, 16], [0, 0, 1]],
                   "world_2_cam": w2c}, f)
    rng = np.random.default_rng(3)
    for ts in ("frame_00000", "frame_00001"):
        for sub in ("images-2x", "alpha_map", "facer_segmentation_masks"):
            (root / "sequences" / scene / "timesteps" / ts / sub).mkdir(parents=True)
        for c in cams:
            img = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / "sequences" / scene / "timesteps" / ts / "images-2x" / f"cam_{c}.jpg")
            a = np.zeros((32, 32), np.uint8)
            a[8:24, 8:24] = 255
            Image.fromarray(a).save(
                root / "sequences" / scene / "timesteps" / ts / "alpha_map" / f"cam_{c}.png")
            seg = np.zeros((32, 32, 3), np.uint8)
            seg[10:14, 10:14] = prepare_data.TONGUE_COLOR
            Image.fromarray(seg).save(
                root / "sequences" / scene / "timesteps" / ts /
                "facer_segmentation_masks" / f"color_segmentation_cam_{c}.png")
    out = str(tmp_path / "out")
    prepare_data.main(["nersemble", str(root), scene, out, "--alpha_mask",
                       "--width", "32", "--height", "32"])
    assert os.path.exists(os.path.join(out, "poses_bounds.npy"))
    pb = np.load(os.path.join(out, "poses_bounds.npy"))
    assert pb.shape == (2, 17)
    img0 = np.asarray(Image.open(os.path.join(out, "images", "cam00", "0000.png")))
    assert img0.shape == (32, 32, 3)
    # alpha-composited corners are white
    assert np.all(img0[0, 0] == 255)
    seg0 = np.asarray(Image.open(os.path.join(out, "segmentations", "cam00", "0000.png")))
    assert seg0[12, 12] == 255 and seg0[0, 0] == 0
    assert os.path.exists(os.path.join(out, "alpha_masks", "cam00", "0000.png"))
