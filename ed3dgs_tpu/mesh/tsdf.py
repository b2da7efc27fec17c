"""TSDF fusion of rendered depth maps -> triangle mesh.

Reference parity: mesh_extract_tsdf_fusion.py:31-106, which fuses rendered
median depths into an Open3D VoxelBlockGrid. This implementation is
self-contained: a dense voxel grid (bounds from the unprojected depths),
weighted TSDF/color integration, and surface extraction by splitting voxels
into tetrahedra and reusing the marching-tetrahedra module with SDF
interpolation. For small scenes a dense grid is fine; at the reference's
default voxel_size=0.002 on real captures use the block-hashed
``mesh/tsdf_sparse.py`` (the ``mesh_extract_tsdf`` CLI default), whose
memory scales with surface area instead of bounding-box volume.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np

from .marching_tets import marching_tetrahedra

# 6-tet decomposition of a unit cube (corner indices of the 2x2x2 cell)
_CUBE_TETS = np.array([
    [0, 1, 3, 7], [0, 1, 7, 5], [0, 5, 7, 4],
    [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7],
])


class TsdfVolume(NamedTuple):
    origin: np.ndarray       # [3]
    voxel_size: float
    dims: tuple              # (nx, ny, nz)
    tsdf: np.ndarray         # [nx, ny, nz]
    weight: np.ndarray
    color: np.ndarray        # [nx, ny, nz, 3]


def create_volume(bounds_min, bounds_max, voxel_size) -> TsdfVolume:
    dims = tuple(int(np.ceil((hi - lo) / voxel_size)) + 1
                 for lo, hi in zip(bounds_min, bounds_max))
    return TsdfVolume(
        origin=np.asarray(bounds_min, np.float64), voxel_size=float(voxel_size),
        dims=dims, tsdf=np.zeros(dims, np.float32),
        weight=np.zeros(dims, np.float32),
        color=np.zeros(dims + (3,), np.float32))


def integrate(vol: TsdfVolume, depth: np.ndarray, color: np.ndarray,
              world_view: np.ndarray, focal_x: float, focal_y: float,
              depth_max: float = 8.0, trunc_mult: float = 8.0) -> TsdfVolume:
    """Fuse one (masked) z-depth map + color image into the volume."""
    nx, ny, nz = vol.dims
    h, w = depth.shape
    trunc = trunc_mult * vol.voxel_size
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    pts = vol.origin + np.stack([ii, jj, kk], -1).reshape(-1, 3) * vol.voxel_size
    cam = pts @ world_view[:3, :3].T + world_view[:3, 3]
    z = cam[:, 2]
    px = cam[:, 0] / np.maximum(z, 1e-8) * focal_x + w / 2.0
    py = cam[:, 1] / np.maximum(z, 1e-8) * focal_y + h / 2.0
    xi = np.round(px).astype(np.int64)
    yi = np.round(py).astype(np.int64)
    ok = (z > 0.01) & (z < depth_max) & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi_c, yi_c = np.clip(xi, 0, w - 1), np.clip(yi, 0, h - 1)
    d = depth[yi_c, xi_c]
    sdf = d - z
    ok &= (d > 0) & (sdf > -trunc)
    tsdf_new = np.clip(sdf / trunc, -1.0, 1.0)

    tsdf = vol.tsdf.reshape(-1)
    wgt = vol.weight.reshape(-1)
    col = vol.color.reshape(-1, 3)
    wn = np.where(ok, 1.0, 0.0).astype(np.float32)
    tot = wgt + wn
    tot_safe = np.maximum(tot, 1e-8)
    tsdf_out = (tsdf * wgt + tsdf_new * wn) / tot_safe
    c_new = color[yi_c, xi_c] if color is not None else 0.0
    col_out = (col * wgt[:, None] + (c_new * wn[:, None] if color is not None else 0.0)) / tot_safe[:, None]
    return vol._replace(
        tsdf=np.where(wn > 0, tsdf_out, tsdf).reshape(vol.dims).astype(np.float32),
        weight=tot.reshape(vol.dims).astype(np.float32),
        color=np.where(wn[:, None] > 0, col_out, col).reshape(vol.dims + (3,)).astype(np.float32))


def extract_surface(vol: TsdfVolume, min_weight: float = 1.0):
    """Zero-crossing surface of the fused TSDF -> (vertices, faces, colors)."""
    nx, ny, nz = vol.dims
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    verts = vol.origin + np.stack([ii, jj, kk], -1).reshape(-1, 3) * vol.voxel_size

    def vid(i, j, k):
        return (i * ny + j) * nz + k

    ci, cj, ck = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    ci, cj, ck = ci.reshape(-1), cj.reshape(-1), ck.reshape(-1)
    corners = np.stack([vid(ci + (c >> 2 & 1), cj + (c >> 1 & 1), ck + (c & 1))
                        for c in range(8)], axis=1)  # [cells, 8]
    tets = corners[:, _CUBE_TETS].reshape(-1, 4)

    sdf = vol.tsdf.reshape(-1).astype(np.float64)
    seen = vol.weight.reshape(-1) >= min_weight
    # unobserved voxels are "far outside" so no surface crosses them
    sdf = np.where(seen, sdf, -1.0)
    # drop tets touching unobserved space to avoid hallucinated walls
    tet_ok = seen[tets].all(axis=1)
    edge_verts, faces = marching_tetrahedra(verts, tets[tet_ok], sdf)
    if len(faces) == 0:
        return np.zeros((0, 3), np.float32), faces, np.zeros((0, 3), np.float32)
    s0, s1 = sdf[edge_verts[:, 0]], sdf[edge_verts[:, 1]]
    t = (s0 / (s0 - s1))[:, None]
    v = verts[edge_verts[:, 0]] + t * (verts[edge_verts[:, 1]] - verts[edge_verts[:, 0]])
    col = vol.color.reshape(-1, 3)
    c = col[edge_verts[:, 0]] + t * (col[edge_verts[:, 1]] - col[edge_verts[:, 0]])
    return v.astype(np.float32), faces, np.clip(c, 0, 1).astype(np.float32)


def fuse_depths(depths: List[np.ndarray], colors: List[Optional[np.ndarray]],
                world_views: List[np.ndarray], focals, *, voxel_size: float,
                depth_max: float = 8.0, bounds=None):
    """Convenience driver: auto bounds from unprojected depths, then fuse all."""
    if bounds is None:
        all_pts = []
        for depth, wv, (fx, fy) in zip(depths, world_views, focals):
            h, w = depth.shape
            ys, xs = np.nonzero(depth > 0)
            if len(ys) == 0:
                continue
            z = depth[ys, xs]
            x = (xs + 0.5 - w / 2.0) / fx * z
            y = (ys + 0.5 - h / 2.0) / fy * z
            cam = np.stack([x, y, z], 1)
            c2w = np.linalg.inv(wv)
            all_pts.append(cam @ c2w[:3, :3].T + c2w[:3, 3])
        pts = np.concatenate(all_pts, axis=0)
        lo = pts.min(axis=0) - 2 * voxel_size
        hi = pts.max(axis=0) + 2 * voxel_size
    else:
        lo, hi = bounds
    vol = create_volume(lo, hi, voxel_size)
    for depth, color, wv, (fx, fy) in zip(depths, colors, world_views, focals):
        vol = integrate(vol, depth, color, wv, fx, fy, depth_max=depth_max)
    return extract_surface(vol)
