"""Synthetic on-disk dataset generator (test/demo harness).

Writes a complete COLMAP-layout dynamic scene — cameras.bin/images.bin, per-
camera per-frame PNGs rendered with the oracle rasterizer from a known moving
Gaussian cloud, and points3D_downsample.ply — so the full train/render/metrics
CLI pipeline runs hermetically. This replaces the "fake backend" testing layer
the reference never had (SURVEY.md section 4).
"""

from __future__ import annotations

import math
import os

import numpy as np

from . import colmap
from .cameras import look_at_camera
from .ply import store_point_cloud


def _gt_cloud(n, rng):
    pts = np.stack([
        rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
        rng.uniform(1.9, 2.5, n)], 1).astype(np.float32)
    cols = rng.uniform(0.15, 0.95, (n, 3)).astype(np.float32)
    return pts, cols


def _render_gt(pts, cols, cam_matrices, t):
    """Oracle render of the moving cloud at time t (simple sinusoidal sway)."""
    import jax.numpy as jnp

    from ..core.projection import project_gaussians
    from ..ops.rasterize_ref import rasterize_reference

    n = pts.shape[0]
    phase = np.linspace(0, 2 * np.pi, n, dtype=np.float32)
    moved = pts.copy()
    moved[:, 0] += 0.05 * np.sin(2 * np.pi * t + phase)
    moved[:, 1] += 0.03 * np.cos(2 * np.pi * t + phase)
    proj = project_gaussians(
        jnp.asarray(moved), jnp.full((n, 3), 0.04),
        jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
        jnp.full((n,), 0.85), jnp.zeros((n, 16, 3)),
        viewmatrix=jnp.asarray(cam_matrices.world_view),
        projmatrix=jnp.asarray(cam_matrices.full_proj),
        campos=jnp.asarray(cam_matrices.campos),
        width=cam_matrices.width, height=cam_matrices.height,
        tan_fovx=cam_matrices.tan_fovx, tan_fovy=cam_matrices.tan_fovy,
        focal_x=cam_matrices.focal_x, focal_y=cam_matrices.focal_y,
        kernel_size=0.0, sh_degree=0, colors_precomp=jnp.asarray(cols))
    out = rasterize_reference(
        proj, jnp.zeros(n), jnp.ones(3),
        width=cam_matrices.width, height=cam_matrices.height,
        focal_x=cam_matrices.focal_x, focal_y=cam_matrices.focal_y)
    return np.clip(np.asarray(out.color).transpose(1, 2, 0), 0, 1)


def generate_hyper_scene(root: str, *, n_frames: int = 8, width: int = 64,
                         height: int = 64, n_points: int = 120,
                         seed: int = 0) -> str:
    """Synthetic HyperNeRF-layout monocular scene: scene/metadata/dataset
    jsons + per-image Nerfies camera jsons + rgb/2x images + init ply."""
    import json

    from PIL import Image

    rng = np.random.default_rng(seed)
    pts, cols = _gt_cloud(n_points, rng)
    fov = math.radians(55.0)
    # camera jsons store FULL-resolution intrinsics; images live in rgb/2x
    full_w, full_h = width * 2, height * 2
    focal = full_w / (2 * math.tan(fov / 2))
    fovy = 2 * math.atan(math.tan(fov / 2) * full_h / full_w)

    os.makedirs(os.path.join(root, "camera"), exist_ok=True)
    os.makedirs(os.path.join(root, "rgb", "2x"), exist_ok=True)
    ids, meta = [], {}
    for j in range(n_frames):
        cid = f"{j:06d}"
        ids.append(cid)
        meta[cid] = {"warp_id": j, "appearance_id": j, "camera_id": 0}
        angle = 0.35 * math.sin(2 * math.pi * j / n_frames)
        eye = (1.0 * math.sin(angle), 0.05 * j / n_frames, 2.2 - 1.0 * math.cos(angle))
        cam = look_at_camera(eye, (0, 0, 2.2), (0, -1, 0), fov, fovy,
                             full_w, full_h)
        # Nerfies json: orientation = world->cam rotation, position = cam center
        w2v = cam.matrices().world_view
        orientation = w2v[:3, :3]
        position = np.linalg.inv(w2v)[:3, 3]
        with open(os.path.join(root, "camera", f"{cid}.json"), "w") as f:
            json.dump({
                "orientation": orientation.tolist(),
                "position": position.tolist(),
                "focal_length": focal,
                "principal_point": [full_w / 2, full_h / 2],
                "image_size": [full_w, full_h],
                "skew": 0.0, "pixel_aspect_ratio": 1.0,
                "radial_distortion": [0, 0, 0],
                "tangential_distortion": [0, 0],
            }, f)
        small = look_at_camera(eye, (0, 0, 2.2), (0, -1, 0), fov, fovy,
                               width, height).matrices()
        img = _render_gt(pts, cols, small, j / n_frames)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "rgb", "2x", f"{cid}.png"))

    with open(os.path.join(root, "scene.json"), "w") as f:
        json.dump({"near": 0.1, "far": 10.0, "scale": 1.0,
                   "center": [0, 0, 2.2]}, f)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "dataset.json"), "w") as f:
        json.dump({"ids": ids, "val_ids": [], "train_ids": ids}, f)
    noisy = pts + rng.normal(0, 0.01, pts.shape).astype(np.float32)
    store_point_cloud(os.path.join(root, "points3D_downsample.ply"), noisy, cols)
    return root


def generate_scene(root: str, *, n_cams: int = 4, n_frames: int = 6,
                   width: int = 64, height: int = 64, n_points: int = 150,
                   seed: int = 0) -> str:
    """Create the dataset under `root`; returns the scene path."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    pts, cols = _gt_cloud(n_points, rng)

    fov = math.radians(55.0)
    focal = width / (2 * math.tan(fov / 2))
    fovy = 2 * math.atan(math.tan(fov / 2) * height / width)

    sparse = os.path.join(root, "colmap/dense/workspace/sparse")
    os.makedirs(sparse, exist_ok=True)
    cameras, images = {}, {}
    for c in range(n_cams):
        angle = (c - (n_cams - 1) / 2) * 0.25
        eye = (0.9 * math.sin(angle), 0.12 * c - 0.2, 2.2 - 0.9 * math.cos(angle))
        cam = look_at_camera(eye, (0, 0, 2.2), (0, -1, 0), fov, fovy, width, height)
        # COLMAP stores world->cam: R_wc = R.T (our Camera.R is cam->world)
        qvec = colmap.rotmat_to_qvec(cam.R.T)
        cameras[c + 1] = colmap.ColmapCamera(
            c + 1, "PINHOLE", width, height,
            np.array([focal, focal, width / 2, height / 2]))
        images[c + 1] = colmap.ColmapImage(c + 1, qvec, cam.T, c + 1,
                                           f"cam{c:02d}.png")
        img_dir = os.path.join(root, "images", f"cam{c:02d}")
        os.makedirs(img_dir, exist_ok=True)
        m = cam.matrices()
        for j in range(n_frames):
            img = _render_gt(pts, cols, m, j / n_frames)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(img_dir, "%04d.png" % j))

    colmap.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cameras)
    colmap.write_images_binary(os.path.join(sparse, "images.bin"), images)
    noisy = pts + rng.normal(0, 0.01, pts.shape).astype(np.float32)
    store_point_cloud(os.path.join(root, "points3D_downsample.ply"), noisy, cols)
    return root
