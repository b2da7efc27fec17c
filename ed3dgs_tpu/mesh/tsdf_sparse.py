"""Sparse block-hashed TSDF fusion (reference-parity voxel block grid).

Reference parity: mesh_extract_tsdf_fusion.py:31-106 fuses rendered median
depths into an Open3D ``VoxelBlockGrid`` — a hash map of B^3 voxel blocks
allocated only in the truncation band around observed surface points, so
memory scales with surface area instead of bounding-box volume. The dense
grid in ``mesh/tsdf.py`` is exact but caps out around ~500^3 voxels; at the
reference's default ``voxel_size=0.002`` a NerSemble head (extent ~1 m)
would need 500^3 * 4 fields = multi-GB. This module is the scalable path.

Design (host-side offline tooling, numpy):

- Blocks live on a GLOBAL integer grid anchored at the world origin: voxel
  ``(i,j,k)`` sits at ``ijk * voxel_size`` and belongs to block
  ``ijk // block``. No per-volume origin/bounds are needed, so frames can
  be fused incrementally without knowing the scene extent up front.
- ``activate`` unprojects a depth map's valid pixels and allocates the
  27-neighborhood of each touched block — for ``trunc <= block_edge`` that
  neighborhood covers the whole truncation band (dilation radius grows
  automatically for larger trunc).
- ``integrate`` applies the same projective TSDF update as the dense path
  (same math, same weights) to every allocated voxel, vectorized over the
  flat ``[n_blocks * B^3]`` storage.
- ``extract_surface`` rebuilds the dense extraction *semantics* without the
  dense grid: allocated voxels become the vertex list, cell corner lookups
  go through a sorted-key searchsorted (a vectorized hash join), and cells
  with any unallocated/unobserved corner are dropped — the exact analogue
  of the dense path's "no tets touching unobserved space" rule. Vertices on
  block faces resolve to the SAME global voxel row, so meshes are welded
  across block boundaries by construction (no post-hoc vertex dedup).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .marching_tets import marching_tetrahedra
from .tsdf import _CUBE_TETS

# global voxel-coordinate encoding: 21 bits per axis, offset to allow
# negative indices. 2^20 voxels * 0.002 m ~ 2 km of scene per side.
_M = np.int64(1) << 21
_OFF = np.int64(1) << 20


def _encode(ijk: np.ndarray) -> np.ndarray:
    """[N,3] int voxel (or block) coords -> unique int64 keys."""
    ijk = ijk.astype(np.int64)
    return ((ijk[:, 0] + _OFF) * _M + (ijk[:, 1] + _OFF)) * _M + (ijk[:, 2] + _OFF)


class SparseTsdfVolume:
    """Hash-allocated B^3 voxel blocks with TSDF/weight/color payloads."""

    def __init__(self, voxel_size: float, block: int = 8):
        self.voxel_size = float(voxel_size)
        self.block = int(block)
        self._key_to_row: dict = {}
        self._block_coords = np.zeros((0, 3), np.int64)   # [nb,3]
        n = self.block ** 3
        self.tsdf = np.zeros((0, n), np.float32)
        self.weight = np.zeros((0, n), np.float32)
        self.color = np.zeros((0, n, 3), np.float32)
        # voxel offsets within a block, fixed enumeration order
        b = np.arange(self.block)
        ii, jj, kk = np.meshgrid(b, b, b, indexing="ij")
        self._offsets = np.stack([ii, jj, kk], -1).reshape(-1, 3)  # [B^3,3]

    @property
    def n_blocks(self) -> int:
        return len(self._block_coords)

    def activate(self, points: np.ndarray, trunc: float) -> None:
        """Allocate blocks covering the truncation band around world points."""
        if len(points) == 0:
            return
        bedge = self.block * self.voxel_size
        rad = max(1, int(np.ceil(trunc / bedge)))
        touched = np.unique(np.floor(points / bedge).astype(np.int64), axis=0)
        d = np.arange(-rad, rad + 1)
        di, dj, dk = np.meshgrid(d, d, d, indexing="ij")
        dil = np.stack([di, dj, dk], -1).reshape(-1, 3)
        cand = (touched[:, None, :] + dil[None, :, :]).reshape(-1, 3)
        cand = np.unique(cand, axis=0)
        keys = _encode(cand)
        fresh = np.array([k not in self._key_to_row for k in keys], bool)
        if not fresh.any():
            return
        new_coords = cand[fresh]
        base = self.n_blocks
        for i, k in enumerate(keys[fresh]):
            self._key_to_row[int(k)] = base + i
        self._block_coords = np.concatenate([self._block_coords, new_coords])
        n = self.block ** 3
        z = np.zeros((len(new_coords), n), np.float32)
        self.tsdf = np.concatenate([self.tsdf, z])
        self.weight = np.concatenate([self.weight, z])
        self.color = np.concatenate(
            [self.color, np.zeros((len(new_coords), n, 3), np.float32)])

    def voxel_coords(self) -> np.ndarray:
        """Global integer coords of every allocated voxel, [nb*B^3, 3]."""
        return (self._block_coords[:, None, :] * self.block
                + self._offsets[None, :, :]).reshape(-1, 3)

    def integrate(self, depth: np.ndarray, color: Optional[np.ndarray],
                  world_view: np.ndarray, focal_x: float, focal_y: float,
                  depth_max: float = 8.0, trunc_mult: float = 8.0) -> None:
        """Fuse one (masked) z-depth map + color image, dense-parity math."""
        trunc = trunc_mult * self.voxel_size
        h, w = depth.shape
        # allocate the band around this frame's unprojected surface points
        ys, xs = np.nonzero((depth > 0) & (depth < depth_max))
        if len(ys):
            z = depth[ys, xs]
            x = (xs + 0.5 - w / 2.0) / focal_x * z
            y = (ys + 0.5 - h / 2.0) / focal_y * z
            cam = np.stack([x, y, z], 1)
            c2w = np.linalg.inv(world_view)
            self.activate(cam @ c2w[:3, :3].T + c2w[:3, 3], trunc)
        if self.n_blocks == 0:
            return
        pts = self.voxel_coords() * self.voxel_size
        cam = pts @ world_view[:3, :3].T + world_view[:3, 3]
        z = cam[:, 2]
        px = cam[:, 0] / np.maximum(z, 1e-8) * focal_x + w / 2.0
        py = cam[:, 1] / np.maximum(z, 1e-8) * focal_y + h / 2.0
        xi = np.round(px).astype(np.int64)
        yi = np.round(py).astype(np.int64)
        ok = (z > 0.01) & (z < depth_max) & (xi >= 0) & (xi < w) \
            & (yi >= 0) & (yi < h)
        xi_c, yi_c = np.clip(xi, 0, w - 1), np.clip(yi, 0, h - 1)
        d = depth[yi_c, xi_c]
        sdf = d - z
        ok &= (d > 0) & (sdf > -trunc)
        tsdf_new = np.clip(sdf / trunc, -1.0, 1.0).astype(np.float32)

        shape = self.tsdf.shape
        tsdf = self.tsdf.reshape(-1)
        wgt = self.weight.reshape(-1)
        col = self.color.reshape(-1, 3)
        wn = ok.astype(np.float32)
        tot = wgt + wn
        tot_safe = np.maximum(tot, 1e-8)
        self.tsdf = np.where(
            wn > 0, (tsdf * wgt + tsdf_new * wn) / tot_safe, tsdf
        ).reshape(shape).astype(np.float32)
        self.weight = tot.reshape(shape)
        if color is not None:
            c_new = color[yi_c, xi_c].astype(np.float32)
            col_out = (col * wgt[:, None] + c_new * wn[:, None]) / tot_safe[:, None]
            self.color = np.where(
                wn[:, None] > 0, col_out, col
            ).reshape(shape + (3,)).astype(np.float32)

    def extract_surface(self, min_weight: float = 1.0):
        """Zero-crossing surface -> (vertices, faces, colors), welded."""
        if self.n_blocks == 0:
            e = np.zeros((0, 3), np.float32)
            return e, np.zeros((0, 3), np.int64), e
        vox = self.voxel_coords()                      # [Nv,3]
        keys = _encode(vox)
        order = np.argsort(keys)
        keys_sorted = keys[order]

        def lookup(q_keys):
            """vectorized hash join: global key -> voxel row (-1 if absent)."""
            pos = np.searchsorted(keys_sorted, q_keys)
            pos_c = np.clip(pos, 0, len(keys_sorted) - 1)
            hit = keys_sorted[pos_c] == q_keys
            return np.where(hit, order[pos_c], -1)

        # cells: one per allocated voxel; corners may live in neighbor blocks
        corner_off = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                          indexing="ij"), -1).reshape(-1, 3)
        corners = np.empty((len(vox), 8), np.int64)
        for c in range(8):
            corners[:, c] = lookup(_encode(vox + corner_off[c]))
        sdf = self.tsdf.reshape(-1).astype(np.float64)
        seen = self.weight.reshape(-1) >= min_weight
        # dense-parity rule: cells touching unobserved/unallocated space are
        # dropped, and unobserved voxels read as "far outside"
        sdf = np.where(seen, sdf, -1.0)
        cell_ok = (corners >= 0).all(1)
        cell_ok &= seen[np.clip(corners, 0, None)].all(1)
        tets = corners[cell_ok][:, _CUBE_TETS].reshape(-1, 4)
        verts = (vox * self.voxel_size).astype(np.float64)
        edge_verts, faces = marching_tetrahedra(verts, tets, sdf)
        if len(faces) == 0:
            e = np.zeros((0, 3), np.float32)
            return e, faces, e
        s0, s1 = sdf[edge_verts[:, 0]], sdf[edge_verts[:, 1]]
        t = (s0 / (s0 - s1))[:, None]
        v0, v1 = verts[edge_verts[:, 0]], verts[edge_verts[:, 1]]
        v = v0 + t * (v1 - v0)
        col = self.color.reshape(-1, 3)
        c = col[edge_verts[:, 0]] + t * (col[edge_verts[:, 1]]
                                         - col[edge_verts[:, 0]])
        return v.astype(np.float32), faces, np.clip(c, 0, 1).astype(np.float32)


def fuse_depths_sparse(depths: List[np.ndarray],
                       colors: List[Optional[np.ndarray]],
                       world_views: List[np.ndarray], focals, *,
                       voxel_size: float, depth_max: float = 8.0,
                       block: int = 8, min_weight: float = 1.0):
    """Drop-in sparse counterpart of ``tsdf.fuse_depths``."""
    vol = SparseTsdfVolume(voxel_size, block=block)
    for depth, color, wv, (fx, fy) in zip(depths, colors, world_views, focals):
        vol.integrate(np.asarray(depth), color, np.asarray(wv), fx, fy,
                      depth_max=depth_max)
    return vol.extract_surface(min_weight=min_weight)
