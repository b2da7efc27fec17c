"""Opacity integration at query 3D points (mesh-extraction support).

TPU-native equivalent of the reference integrate path
(forward.cu:1028-1543, rasterizer_impl.cu:580-851): for every query point,
blend the depth-sorted Gaussians of the point's pixel tile using the 3D
ray-space inverse covariance, producing the accumulated opacity integral
`alpha_integrated` along the point's camera ray (plus projection metadata).

Vectorized formulation: points are bucketed to pixels/tiles, each point
gathers its tile's splat list (same binning as rendering) and evaluates all
alphas at once with a masked cumulative product — no sequential per-splat
loop.

Simplifications vs the CUDA kernel (documented deviations, offline tooling):
  * the reference pre-filters tile splats by a 5-subpixel-corner visibility
    pass (forward.cu:1233-1287); we evaluate the point ray directly, with the
    same alpha/power thresholds, which differs only by splats whose central
    alpha test disagrees with all four corner tests;
  * the ill-conditioned eigen fallback for the ray covariance uses the
    pseudo-inverse (see core.projection.compute_invraycov).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.projection import ProjectedGaussians
from .binning import bin_gaussians
from .common import ALPHA_MAX, ALPHA_MIN, TILE


class IntegrateOutputs(NamedTuple):
    alpha_integrated: jnp.ndarray   # [P] accumulated alpha along the point ray
    point_coordinate: jnp.ndarray   # [P, 2] pixel coordinates
    point_depth: jnp.ndarray        # [P] camera distance
    point_valid: jnp.ndarray        # [P] in frustum and on screen


def project_points(points3d, *, viewmatrix, width, height, focal_x, focal_y):
    """preprocessPointsCUDA (forward.cu:1028-1071)."""
    V = viewmatrix.astype(jnp.float32)
    p_view = points3d @ V[:3, :3].T + V[:3, 3]
    z = p_view[:, 2]
    in_front = z > 0.2
    zs = z + 1e-7
    px = focal_x * p_view[:, 0] / zs + width / 2.0
    py = focal_y * p_view[:, 1] / zs + height / 2.0
    on_screen = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    depth = jnp.sqrt(jnp.sum(p_view * p_view, axis=-1))
    return jnp.stack([px, py], -1), depth, in_front & on_screen


def integrate_points(
    proj: ProjectedGaussians,
    points3d: jnp.ndarray,
    *,
    viewmatrix: jnp.ndarray,
    width: int,
    height: int,
    focal_x: float,
    focal_y: float,
    pair_capacity: int = 1 << 20,
    max_per_tile: int = 1024,
    point_chunk: int = 4096,
    chunk: int = 64,
) -> IntegrateOutputs:
    """proj must be built with compute_invraycov=True."""
    assert proj.invraycov is not None, "project with compute_invraycov=True"
    bins = bin_gaussians(proj, width=width, height=height,
                         pair_capacity=pair_capacity)
    grid_x, grid_y = bins.grid

    point_xy, point_depth, point_valid = project_points(
        points3d, viewmatrix=viewmatrix, width=width, height=height,
        focal_x=focal_x, focal_y=focal_y)
    pix = jnp.floor(point_xy).astype(jnp.int32)
    tile = jnp.clip(pix[:, 0] // TILE, 0, grid_x - 1) + grid_x * jnp.clip(
        pix[:, 1] // TILE, 0, grid_y - 1)

    # gather per-gaussian fields in depth-rank order once
    order = bins.order
    g_xy = proj.mean2d[order]
    g_op = proj.opacity[order]
    g_ts = proj.ts[order]
    g_rp = proj.ray_plane[order]
    g_icr = proj.invraycov[order]
    g_well = proj.well_conditioned[order]

    L = max_per_tile
    slots = bins.tile_start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    count = jnp.minimum(bins.tile_count, L)
    slots = jnp.clip(slots, 0, bins.pair_gauss.shape[0] - 1)
    tile_ranks = bins.pair_gauss[slots]          # [T, L]
    tile_mask = jnp.arange(L, dtype=jnp.int32)[None, :] < count[:, None]

    P = points3d.shape[0]
    n_chunks = -(-P // point_chunk)
    pad = n_chunks * point_chunk - P

    def chunk_fn(start):
        idx = start + jnp.arange(point_chunk)
        idx_c = jnp.minimum(idx, P - 1)
        t = tile[idx_c]
        ranks = tile_ranks[t]                    # [pc, L]
        m = tile_mask[t]
        xy = g_xy[ranks]
        op = g_op[ranks]
        ts = g_ts[ranks]
        rp = g_rp[ranks]
        icr = g_icr[ranks]
        well = g_well[ranks]
        pxy = point_xy[idx_c][:, None, :]
        pd = point_depth[idx_c][:, None]
        d = xy - pxy                              # [pc, L, 2]
        depth = ts + rp[..., 0] * d[..., 0] + rp[..., 1] * d[..., 1]
        dz = jnp.where(well, ts - jnp.minimum(pd, depth), ts)
        power = -0.5 * (
            icr[..., 0] * d[..., 0] ** 2 + icr[..., 3] * d[..., 1] ** 2
            + icr[..., 5] * dz ** 2
            + 2.0 * (icr[..., 1] * d[..., 0] * d[..., 1]
                     + icr[..., 2] * d[..., 0] * dz
                     + icr[..., 4] * d[..., 1] * dz))
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        alpha = jnp.where(~well & (pd < depth), 0.0, alpha)
        passes = m & (alpha >= ALPHA_MIN)
        a = jnp.where(passes, alpha, 0.0)
        om = 1.0 - a
        p_excl = jnp.cumprod(om, axis=1) / om
        return jnp.sum(a * p_excl, axis=1)        # [pc]

    alphas = jax.lax.map(chunk_fn,
                         jnp.arange(n_chunks, dtype=jnp.int32) * point_chunk)
    alpha_integrated = alphas.reshape(-1)[:P]
    alpha_integrated = jnp.where(point_valid, alpha_integrated, 0.0)
    return IntegrateOutputs(alpha_integrated, point_xy, point_depth, point_valid)


def sample_mask_bilinear(mask: jnp.ndarray, point_xy: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=False, zeros padding) of a [1, H, W] mask at
    pixel coordinates, matching evaluage_cull_alpha's validity test
    (mesh_extract_tetrahedra.py:46-57: normalized coords (2*px+1)/(W-1)-1 then
    torch grid_sample align_corners=False => source pixel coordinate
    ((x+1)*W-1)/2)."""
    H, W = mask.shape[-2], mask.shape[-1]
    gx = (point_xy[:, 0] * 2.0 + 1.0) / (W - 1) - 1.0
    gy = (point_xy[:, 1] * 2.0 + 1.0) / (H - 1) - 1.0
    sx = ((gx + 1.0) * W - 1.0) / 2.0
    sy = ((gy + 1.0) * H - 1.0) / 2.0
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0

    def fetch(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        return jnp.where(inb, mask.reshape(H, W)[yi_c, xi_c], 0.0)

    v = ((1 - fx) * (1 - fy) * fetch(x0, y0)
         + fx * (1 - fy) * fetch(x0 + 1, y0)
         + (1 - fx) * fy * fetch(x0, y0 + 1)
         + fx * fy * fetch(x0 + 1, y0 + 1))
    return v
