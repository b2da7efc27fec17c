"""mesh_video tool: per-timestep plys -> rendered frames -> video files."""

import os

import numpy as np

from ed3dgs_tpu.data.ply import store_point_cloud, write_mesh_ply
from ed3dgs_tpu.tools import mesh_video


def _cube(center, size=0.08):
    c = np.array(center, np.float32)
    s = size / 2
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)], np.float32) + c
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    return v, f


def test_mesh_video_end_to_end(tmp_path):
    root = str(tmp_path)
    focus = mesh_video.VIEWS["central"][1]     # put geometry at the focal point
    for t in range(3):
        d = os.path.join(root, f"timestep_{t}")
        os.makedirs(d)
        v, f = _cube(focus + np.array([0.01 * t, 0, 0], np.float32))
        write_mesh_ply(os.path.join(d, "recon.ply"), v, f)
        pts = focus + np.random.default_rng(t).normal(
            0, 0.03, (200, 3)).astype(np.float32)
        cols = np.random.default_rng(t).uniform(0, 1, (200, 3)).astype(np.float32)
        store_point_cloud(
            os.path.join(d, "pointcloud_distance_2_mesh_colored.ply"),
            pts, cols)

    made = mesh_video.main([root, "--width", "96", "--height", "128"])
    # 3 views x 2 ply types present (the similarity ply is absent -> skipped)
    assert len(made) == 6
    for path in made:
        base = os.path.splitext(path)[0]
        assert (os.path.exists(path) or os.path.exists(base + ".gif")), path

    # the mesh view actually renders something non-black
    pts, normals, is_normals = mesh_video._load_colored_points(
        os.path.join(root, "timestep_0", "recon.ply"))
    assert is_normals  # meshes shade; colored pointclouds must not
    eye, target, up, zoom = mesh_video.VIEWS["central"]
    img = mesh_video.render_points(pts, normals, eye, target, up, zoom,
                                   96, 128, shaded=True)
    assert img.max() > 0.05
