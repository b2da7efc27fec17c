"""Offline NerSemble tool tail: prepare_radegs + nersemble_utils."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def raw_capture(tmp_path):
    """Synthetic NerSemble capture: calibration + 2 timesteps x 2 cams with
    images, alpha maps and a colored pointcloud_16.pcd."""
    from PIL import Image

    root = tmp_path / "raw"
    scene = "EXP-1"
    cams = ["AAA", "BBB"]
    w2c = {}
    rng = np.random.default_rng(5)
    for i, c in enumerate(cams):
        m = np.eye(4)
        m[:3, 3] = [0.1 * i, 0.0, 2.0]
        w2c[c] = m.tolist()
    (root / "calibration").mkdir(parents=True)
    with open(root / "calibration" / "camera_params.json", "w") as f:
        json.dump({"intrinsics": [[100, 0, 16], [0, 100, 16], [0, 0, 1]],
                   "world_2_cam": w2c}, f)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (50, 3)).astype(np.uint32)
    for ts in ("frame_00000", "frame_00003"):
        base = root / "sequences" / scene / "timesteps" / ts
        for sub in ("images-2x", "alpha_map"):
            (base / sub).mkdir(parents=True)
        for c in cams:
            img = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(base / "images-2x" / f"cam_{c}.jpg")
            a = np.zeros((32, 32), np.uint8)
            a[8:24, 8:24] = 255
            Image.fromarray(a).save(base / "alpha_map" / f"cam_{c}.png")
        # colored pcd with PCL packed-float rgb
        (base / "colmap" / "pointclouds").mkdir(parents=True)
        packed = ((rgb[:, 0] << 16) | (rgb[:, 1] << 8)
                  | rgb[:, 2]).astype(np.uint32).view(np.float32)
        header = ("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z rgb\n"
                  "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
                  "WIDTH 50\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                  "POINTS 50\nDATA binary\n")
        with open(base / "colmap" / "pointclouds" / "pointcloud_16.pcd",
                  "wb") as f:
            f.write(header.encode())
            f.write(np.concatenate([pts, packed[:, None].view(np.float32)],
                                   axis=1).astype("<f4").tobytes())
    return str(root), scene, pts, rgb


def test_pcd_colors_packed_rgb(raw_capture):
    from ed3dgs_tpu.data.pcd import read_pcd_colors

    root, scene, pts, rgb = raw_capture
    path = os.path.join(root, "sequences", scene, "timesteps", "frame_00003",
                        "colmap", "pointclouds", "pointcloud_16.pcd")
    cols = read_pcd_colors(path)
    np.testing.assert_allclose(cols, rgb.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_prepare_radegs_all_roundtrip(raw_capture, tmp_path):
    from ed3dgs_tpu.data.colmap import read_model, read_points3d_binary
    from ed3dgs_tpu.tools import prepare_radegs

    root, scene, pts, rgb = raw_capture
    out = str(tmp_path / "radegs")
    prepare_radegs.main(["all", root, scene, out, "--apply_alpha_mask"])
    for ts in ("frame_00000", "frame_00003"):
        sparse = os.path.join(out, ts, "sparse", "0")
        cams, images = read_model(sparse)
        xyz, cols = read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == prepare_radegs.WIDTH
        assert len(images) == 2
        # extrinsics survive the qvec roundtrip
        from ed3dgs_tpu.data.colmap import qvec_to_rotmat
        im = next(i for i in images.values() if i.name == "cam_BBB.jpg")
        np.testing.assert_allclose(qvec_to_rotmat(im.qvec), np.eye(3),
                                   atol=1e-8)
        np.testing.assert_allclose(im.tvec, [0.1, 0.0, 2.0], atol=1e-8)
        np.testing.assert_allclose(xyz, pts, atol=1e-6)
        np.testing.assert_array_equal(cols, rgb)
        img = os.path.join(out, ts, "images", "cam_AAA.jpg")
        assert os.path.exists(img)
        # alpha compositing applied: corners white
        from PIL import Image
        arr = np.asarray(Image.open(img))
        assert arr[0, 0].min() > 240


def test_pose_bounds_and_seg_color(tmp_path, capsys):
    from PIL import Image

    from ed3dgs_tpu.tools import nersemble_utils as nu

    pb = np.zeros((2, 17))
    pb[:, :15] = np.arange(15)
    pb[:, 15], pb[:, 16] = 0.5, 7.0
    np.save(tmp_path / "poses_bounds.npy", pb)
    assert nu.main(["pose-bounds", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "Camera: 1" in out and "Far bound:    7.0" in out

    seg = np.zeros((8, 8, 3), np.uint8)
    seg[2:4, 2:4] = [30, 60, 90]
    Image.fromarray(seg).save(tmp_path / "seg.png")
    assert nu.main(["seg-color", str(tmp_path / "seg.png"), "2", "3"]) == 0
    assert "[30, 60, 90]" in capsys.readouterr().out
    assert nu.main(["seg-color", str(tmp_path / "seg.png")]) == 0
    out = capsys.readouterr().out
    assert "[0, 0, 0]: 60 px" in out


def test_copy_colmap_pcd(tmp_path):
    from ed3dgs_tpu.tools import nersemble_utils as nu

    src = tmp_path / "with"
    dst = tmp_path / "without"
    for ts in ("frame_00000", "frame_00001"):
        (src / ts / "colmap").mkdir(parents=True)
        (src / ts / "colmap" / "x.txt").write_text(ts)
        (dst / ts / "colmap").mkdir(parents=True)  # empty placeholder
    assert nu.main(["copy-colmap-pcd",
                    "--timesteps_w_colmap_path", str(src),
                    "--timesteps_wo_colmap_path", str(dst)]) == 0
    for ts in ("frame_00000", "frame_00001"):
        assert (dst / ts / "colmap" / "x.txt").read_text() == ts


def test_render_mesh_headless(tmp_path):
    from ed3dgs_tpu.data.ply import write_mesh_ply
    from ed3dgs_tpu.tools import nersemble_utils as nu

    # small ball mesh around the viewer's focal point
    rng = np.random.default_rng(2)
    v = rng.normal(size=(30, 3)).astype(np.float32) * 0.05 + [0.1, 0.1, -0.07]
    f = np.stack([np.zeros(28, np.int32), np.arange(1, 29),
                  np.arange(2, 30)], 1)
    write_mesh_ply(str(tmp_path / "recon.ply"), v, f)
    assert nu.main(["render-mesh", str(tmp_path / "recon.ply"),
                    str(tmp_path / "views"), "--width", "64",
                    "--height", "96"]) == 0
    from PIL import Image
    for name in ("central", "side", "tongue"):
        img = np.asarray(Image.open(tmp_path / "views"
                                    / f"mesh_view_{name}.png"))
        assert img.shape[0] == 96
