"""Per-timestep mesh/pointcloud sequences -> videos.

Equivalent of the reference's offline NerSemble export
`nersemble_scripts/per_timestamp_mesh_2_video.py:1-66` (pyvista off-screen
renders of recon.ply + the two eval-colored pointclouds from three fixed
camera views, 30 fps mp4). This image has no pyvista/OpenGL; the renderer
here is a dependency-free z-buffer point splatter (numpy): pointcloud plys
render their stored RGBA colors exactly like the reference's
`render_points_as_spheres`; triangle meshes are densified with per-face
surface samples and Lambert-shaded with the face normal (headlight), the
same visual contract as pyvista's default white-mesh shading.

Usage:  python -m ed3dgs_tpu.tools.mesh_video <input_folder>
where <input_folder> contains timestep_* directories as written by
tools/mesh_extract.py / tools/evaluate_mesh.py.
"""

from __future__ import annotations

import argparse
import os
import re
import tempfile

import numpy as np

from ..data.cameras import look_at_camera
from ..data.ply import read_mesh_ply, read_ply
from ..mesh.mesh_eval import face_normals
from .render import export_video, save_img

# the reference's three fixed (eye, focal_point, up) views
# (per_timestamp_mesh_2_video.py:18-28) — scene-calibration constants for
# the NerSemble head scenes; "mouth" zooms 2x
VIEWS = {
    "central": (np.array([0.20431704, 0.06167632, 0.67057732]),
                np.array([0.17365520, 0.09827889, 0.08799868]),
                np.array([-0.01393465, 0.99788905, 0.06342932]), 1.0),
    "side": (np.array([-0.44461417, 0.02220413, 0.19259187]),
             np.array([0.06150647, 0.11428958, -0.08496881]),
             np.array([-0.11043348, 0.98590030, 0.12571811]), 1.0),
    "mouth": (np.array([-0.03543708, -0.03187355, 0.62626738]),
              np.array([0.11900690, 0.05757573, 0.06964933]),
              np.array([-0.05132445, 0.98816429, 0.14455843]), 2.0),
}

PLY_FILES = (
    "recon.ply",
    "pointcloud_distance_2_mesh_colored.ply",
    "pointcloud_similarity_2_normal_colored.ply",
)


def natural_sort_key(s):
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]


def _load_colored_points(path):
    """Any ply -> (points [N,3], colors-or-normals [N,3], is_normals).

    Meshes are densified (vertices + 4 surface samples per face) and
    return per-point NORMALS (is_normals=True) for view-dependent Lambert
    shading; pointclouds return their stored RGB (is_normals=False).
    """
    data = read_ply(path)
    v = data["vertex"]
    has_faces = "face" in data and len(data["face"]) > 0
    names = v.dtype.names
    pts = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    if not has_faces:
        if "red" in names:
            scale = 255.0 if v["red"].dtype == np.uint8 else 1.0
            col = np.stack([v["red"], v["green"], v["blue"]], 1
                           ).astype(np.float32) / scale
        else:
            col = np.full_like(pts, 0.8)
        return pts, col, False
    verts, faces = read_mesh_ply(path)
    fn = face_normals(verts, faces)                       # [F, 3]
    a, b, c = (verts[faces[:, i]] for i in range(3))
    # 4 fixed barycentric samples per face + the vertices
    bary = np.array([[1, 1, 1], [4, 1, 1], [1, 4, 1], [1, 1, 4]], np.float32)
    bary /= bary.sum(1, keepdims=True)
    samples = (bary[:, None, 0:1] * a + bary[:, None, 1:2] * b
               + bary[:, None, 2:3] * c).reshape(-1, 3)
    s_norm = np.tile(fn, (4, 1))
    all_pts = np.concatenate([verts, samples], 0)
    vn = np.zeros_like(verts)
    np.add.at(vn, faces.reshape(-1), np.repeat(fn, 3, axis=0))
    vn /= np.maximum(np.linalg.norm(vn, axis=1, keepdims=True), 1e-9)
    all_n = np.concatenate([vn, s_norm], 0)
    return all_pts, all_n, True  # normals; shading happens view-dependently


def render_points(pts, colors_or_normals, eye, target, up, zoom, width=550,
                  height=802, shaded=False, point_size=2):
    """Z-buffer point splat: project, sort far-to-near, write near last.

    pyvista's default view_angle=30 deg is the FULL VERTICAL angle; zoom
    scales the half-angle tangent, and the horizontal fov follows in tan
    space from the aspect ratio (matches per_timestamp_mesh_2_video.py).
    """
    fovy = 2 * np.arctan(np.tan(np.radians(30.0) / 2.0) / zoom)
    fovx = 2 * np.arctan(np.tan(fovy / 2.0) * width / height)
    cam = look_at_camera(eye, target, up, fovx, fovy,
                         width, height).matrices()
    R = np.asarray(cam.world_view, np.float32)   # [4,4], translation in col 3
    cam_pts = pts @ R[:3, :3].T + R[:3, 3]                # [N, 3]
    z = cam_pts[:, 2]
    keep = z > 1e-4
    x = cam_pts[:, 0] / z * cam.focal_x + width / 2.0
    y = cam_pts[:, 1] / z * cam.focal_y + height / 2.0
    if shaded:
        n_cam = colors_or_normals @ np.asarray(R[:3, :3], np.float32)
        ndotl = np.clip(-n_cam[:, 2], 0, 1)
        shade = np.clip(0.15 + 0.75 * ndotl + 0.2 * ndotl ** 16, 0, 1)
        col = np.stack([shade] * 3, 1)
    else:
        col = colors_or_normals
    keep &= (x >= 0) & (x < width) & (y >= 0) & (y < height)
    x, y, z, col = x[keep], y[keep], z[keep], col[keep]
    order = np.argsort(-z)                                # far first
    xi, yi = x[order].astype(np.int32), y[order].astype(np.int32)
    img = np.zeros((height, width, 3), np.float32)
    c = col[order]
    r = point_size // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            yy = np.clip(yi + dy, 0, height - 1)
            xx = np.clip(xi + dx, 0, width - 1)
            img[yy, xx] = c
    return img.transpose(2, 0, 1)                         # [3, H, W]


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Generate videos from per-timestep mesh/pointcloud plys")
    p.add_argument("input_folder")
    p.add_argument("--width", type=int, default=550)
    p.add_argument("--height", type=int, default=802)
    p.add_argument("--fps", type=int, default=30)
    args = p.parse_args(argv)

    tdirs = sorted([d for d in os.listdir(args.input_folder)
                    if d.startswith("timestep_")], key=natural_sort_key)
    made = []
    for view_name, (eye, target, up, zoom) in VIEWS.items():
        for ply_file in PLY_FILES:
            with tempfile.TemporaryDirectory() as fdir:
                n = 0
                for d in tdirs:
                    path = os.path.join(args.input_folder, d, ply_file)
                    if not os.path.exists(path):
                        continue
                    pts, cn, is_normals = _load_colored_points(path)
                    img = render_points(pts, cn, eye, target, up, zoom,
                                        args.width, args.height,
                                        shaded=is_normals)
                    save_img(os.path.join(fdir, f"{n:05d}.png"), img)
                    n += 1
                if n == 0:
                    continue
                out = os.path.join(
                    args.input_folder,
                    f"{view_name}_{ply_file.replace('.ply', '')}_video.mp4")
                export_video(fdir, out, fps=args.fps)
                made.append(out)
                print(f"Video saved to {out}")
    return made


if __name__ == "__main__":
    main()
