"""Tetrahedra mesh extraction orchestration (GOF-style).

Reference parity: mesh_extract_tetrahedra.py:22-186 — per timestep:
deform -> 3D-filtered scales -> tetra points -> Delaunay -> multi-view
integrated-alpha SDF (0.5 - min over views, mask-culled) -> marching
tetrahedra -> 8-step binary search along crossing edges -> distance/scale
face filter -> ply export.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..config.params import DeformHiddenConfig
from ..core.projection import project_gaussians
from ..data.ply import write_mesh_ply
from ..models import gaussians as gm
from ..models.deformation import deform_forward
from ..ops.integrate import integrate_points, sample_mask_bilinear
from .marching_tets import marching_tetrahedra
from .tetra import delaunay_tets, get_tetra_points


def deformed_gaussians(params, aux, dparams, hidden: DeformHiddenConfig,
                       timestep: float, num_down_emb: int, loaded_iter: int):
    """Deform the cloud at a timestep with eval-mode offsets and apply the
    fused 3D filter (mesh_extract_tetrahedra.py:68-86)."""
    import jax.numpy as jnp

    shs = gm.get_features(params)
    (xyz, scales_raw, rot_raw, opac_raw, shs_f), _ = deform_forward(
        dparams, hidden, params.xyz, params.scaling, params.rotation,
        params.opacity, shs, params.embedding, timestep, loaded_iter,
        cam_no=None, num_down_emb_c=num_down_emb, num_down_emb_f=num_down_emb)
    scales_f, opac_f = gm.apply_3d_filter(opac_raw, scales_raw, aux.filter_3d)
    return xyz, scales_f, rot_raw, opac_f, shs_f


def evaluate_sdf(points: np.ndarray, views, render_alpha_fn, integrate_fn):
    """0.5 - min over views of integrated alpha, with rendered-mask culling
    (evaluage_cull_alpha, mesh_extract_tetrahedra.py:38-62). Points never seen
    by a valid pixel get SDF -100 (outside)."""
    import jax.numpy as jnp

    P = points.shape[0]
    final = np.ones(P, np.float32)
    weight = np.zeros(P, np.int32)
    for view in views:
        out = integrate_fn(points, view)
        alpha = np.asarray(out.alpha_integrated)
        mask_img = render_alpha_fn(view)          # [1, H, W]
        prob = np.asarray(sample_mask_bilinear(
            jnp.asarray(mask_img), out.point_coordinate))
        valid = (prob > 0.5) & np.asarray(out.point_valid)
        final = np.where(valid, np.minimum(alpha, final), final)
        weight = np.where(valid, weight + 1, weight)
    return np.where(weight > 0, 0.5 - final, -100.0).astype(np.float32)


def extract_mesh_at_timestep(
    params, aux, dparams, hidden: DeformHiddenConfig, views,
    *,
    timestep: float,
    width: int, height: int, focal_x: float, focal_y: float,
    kernel_size: float = 0.0,
    num_down_emb: int = 30,
    loaded_iter: int = 10 ** 9,
    n_binary_steps: int = 8,
    pair_capacity: int = 1 << 20,
    max_per_tile: int = 1024,
    sh_degree: int = 3,
):
    """Full extraction for one timestep; returns (vertices, faces)."""
    import jax.numpy as jnp

    xyz, scales_f, rot_raw, opac_f, shs_f = deformed_gaussians(
        params, aux, dparams, hidden, timestep, num_down_emb, loaded_iter)
    alive = np.asarray(aux.alive)
    xyz_np = np.asarray(xyz)[alive]
    scales_np = np.asarray(scales_f)[alive]
    rot_np = np.asarray(rot_raw)[alive]

    points, point_scales = get_tetra_points(xyz_np, rot_np, scales_np)
    tets = delaunay_tets(points)

    # per-view projection closure (gaussians deformed once per timestep)
    rot_sq = jnp.sum(rot_raw * rot_raw, axis=-1, keepdims=True)
    rot_act = rot_raw / jnp.sqrt(jnp.where(rot_sq < 1e-24, 1.0, rot_sq))

    from ..ops.rasterize import RasterConfig, rasterize

    def proj_for(view):
        m = view.matrices()
        return project_gaussians(
            xyz, scales_f, rot_act, opac_f[:, 0], shs_f,
            viewmatrix=jnp.asarray(m.world_view),
            projmatrix=jnp.asarray(m.full_proj),
            campos=jnp.asarray(m.campos), width=width, height=height,
            tan_fovx=m.tan_fovx, tan_fovy=m.tan_fovy,
            focal_x=m.focal_x, focal_y=m.focal_y, kernel_size=kernel_size,
            sh_degree=sh_degree, mask=jnp.asarray(alive),
            compute_invraycov=True), m

    proj_cache = {}

    def get_proj(view):
        key = id(view)
        if key not in proj_cache:
            proj_cache[key] = proj_for(view)
        return proj_cache[key]

    def render_alpha_fn(view):
        proj, m = get_proj(view)
        cfg = RasterConfig(width=width, height=height, focal_x=m.focal_x,
                           focal_y=m.focal_y, pair_capacity=pair_capacity,
                           max_per_tile=max_per_tile, backend="xla")
        out = rasterize(proj, aux.tongue_class[:, 0], jnp.zeros(3), cfg)
        alpha = np.asarray(out.alpha)
        gt_mask = view.alpha_mask
        if gt_mask is not None:
            alpha = alpha * np.asarray(gt_mask)
        return alpha

    def integrate_fn(pts, view):
        proj, m = get_proj(view)
        return integrate_points(
            proj, jnp.asarray(pts), viewmatrix=jnp.asarray(m.world_view),
            width=width, height=height, focal_x=m.focal_x, focal_y=m.focal_y,
            pair_capacity=pair_capacity, max_per_tile=max_per_tile)

    sdf = evaluate_sdf(points, views, render_alpha_fn, integrate_fn)
    edge_verts, faces = marching_tetrahedra(points, tets, sdf)
    if len(faces) == 0:
        return np.zeros((0, 3), np.float32), faces

    left = points[edge_verts[:, 0]].copy()
    right = points[edge_verts[:, 1]].copy()
    left_sdf = sdf[edge_verts[:, 0]].copy()
    right_sdf = sdf[edge_verts[:, 1]].copy()
    left_scale = point_scales[edge_verts[:, 0], 0]
    right_scale = point_scales[edge_verts[:, 1], 0]
    distance = np.linalg.norm(left - right, axis=1)
    scale = left_scale + right_scale

    for _ in range(n_binary_steps):
        mid = (left + right) / 2.0
        mid_sdf = evaluate_sdf(mid, views, render_alpha_fn, integrate_fn)
        low = ((mid_sdf < 0) & (left_sdf < 0)) | ((mid_sdf > 0) & (left_sdf > 0))
        left_sdf = np.where(low, mid_sdf, left_sdf)
        right_sdf = np.where(low, right_sdf, mid_sdf)
        left = np.where(low[:, None], mid, left)
        right = np.where(low[:, None], right, mid)
    vertices = (left + right) / 2.0

    # distance/scale face filter (mesh_extract_tetrahedra.py:132-139)
    vert_ok = distance <= scale
    face_ok = vert_ok[faces].all(axis=1)
    faces = faces[face_ok]
    used = np.unique(faces)
    remap = np.full(len(vertices), -1, np.int64)
    remap[used] = np.arange(len(used))
    return vertices[used].astype(np.float32), remap[faces]


def export_mesh(path: str, vertices: np.ndarray, faces: np.ndarray):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_mesh_ply(path, vertices, faces)
