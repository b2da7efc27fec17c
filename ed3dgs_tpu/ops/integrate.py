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

Matches the reference's 5-subpixel-corner prefilter (forward.cu:1233-1287):
pass 1 walks the point's pixel tile list evaluating the 2D conic alpha at the
pixel center and the four half-pixel corners, each with its own running
transmittance that only updates while `T*(1-alpha) >= 1e-4` (the skip-clamp,
forward.cu:1256-1261); a splat is "used" if any of the 5 evaluations passes.
Pass 2 blends ONLY used splats with the 3D ray-space covariance alpha at the
point's exact position (forward.cu:1455-1487). The per-corner recurrence is
data-dependent (a skipped splat leaves T unchanged), so pass 1 is an exact
lax.scan over the tile list — fine for offline mesh tooling.

Degenerate-covariance branch: the world-covariance (pseudo-)inverse matches
the reference exactly (outer product of the min eigenvector, forward.cu:
151-155; core/sym3.py). For the *ray-space* inverse covariance the reference's
ill-conditioned branch (forward.cu:201-224) assigns to a shadowed local
`inv_cov_ray` — the value it actually writes out (forward.cu:229-235) is the
outer, uninitialized matrix, i.e. undefined behavior. This build instead
evaluates the same closed-form ray-space assembly it uses in the
well-conditioned case (with the pseudo-inverted covariance flowing through),
which is deterministic and consistent; the `well_conditioned` gating of the
blend (forward.cu:1472-1480) is reproduced bit-for-bit either way.
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
    color_integrated: jnp.ndarray   # [P, 3] blended RGB of the point's pixel
    point_coordinate: jnp.ndarray   # [P, 2] pixel coordinates
    point_depth: jnp.ndarray        # [P] camera distance
    point_sdf: jnp.ndarray          # [P] median-gaussian depth - point depth
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
    point_chunk: int = 1024,   # the [L, pc, 5] prefilter scan inputs scale with this
    chunk: int = 64,
    bg: jnp.ndarray | None = None,
) -> IntegrateOutputs:
    """proj must be built with compute_invraycov=True.

    `bg` composites into color_integrated (forward.cu:1527: C + T*bg per
    channel); defaults to black like the reference's mesh tools."""
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
    g_con = proj.conic[order]
    g_rgb = proj.rgb[order]
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)

    L = max_per_tile
    slots = bins.tile_start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    count = jnp.minimum(bins.tile_count, L)
    slots = jnp.clip(slots, 0, bins.pair_gauss.shape[0] - 1)
    tile_ranks = bins.pair_gauss[slots]          # [T, L]
    tile_mask = jnp.arange(L, dtype=jnp.int32)[None, :] < count[:, None]

    P = points3d.shape[0]
    n_chunks = -(-P // point_chunk)
    pad = n_chunks * point_chunk - P

    # pixel-center subpixel offsets of the 5-corner prefilter
    # (forward.cu:1191-1193)
    off_x = jnp.asarray([0.0, -0.5, 0.5, -0.5, 0.5], jnp.float32)
    off_y = jnp.asarray([0.0, -0.5, -0.5, 0.5, 0.5], jnp.float32)

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
        con = g_con[ranks]                       # [pc, L, 3]
        rgb = g_rgb[ranks]                       # [pc, L, 3]
        pxy = point_xy[idx_c][:, None, :]
        pd = point_depth[idx_c][:, None]

        # ---- pass 1: 5-corner pixel prefilter (forward.cu:1233-1287) ----
        # evaluated at the point's PIXEL center +- half-pixel offsets; each
        # corner keeps its own transmittance with the skip-clamp `only update
        # if T*(1-a) >= 1e-4`, which is a data-dependent recurrence -> scan.
        pixf = jnp.floor(point_xy[idx_c]) + 0.5          # [pc, 2]
        cdx = xy[..., 0:1] - (pixf[:, None, 0:1] + off_x)      # [pc, L, 5]
        cdy = xy[..., 1:2] - (pixf[:, None, 1:2] + off_y)
        cpow = (-0.5 * (con[..., 0:1] * cdx * cdx + con[..., 2:3] * cdy * cdy)
                - con[..., 1:2] * cdx * cdy)
        calpha = jnp.minimum(ALPHA_MAX, op[..., None] * jnp.exp(cpow))
        cpass = (m[..., None] & (cpow <= 0.0) & (calpha >= ALPHA_MIN))

        # the center-corner (k=0) recurrence also runs the reference's full
        # pixel blend (forward.cu:1264-1283): RGB accumulation C += rgb*a*T
        # and the median ("mid") gaussian — the LAST center-passing splat with
        # pre-update T > 0.5 — whose depth plane defines point_sdf
        # (forward.cu:1530-1535)
        def corner_step(carry, inp):
            T, C, mid_ts, mid_rp, mid_xy = carry
            a_l, p_l, rgb_l, ts_l, rp_l, xy_l = inp      # [pc,5] ... [pc,2]
            test = T * (1.0 - a_l)
            upd = p_l & (test >= 1e-4)
            upd0 = upd[:, 0]
            T0 = T[:, 0]
            C = C + jnp.where(upd0[:, None],
                              rgb_l * (a_l[:, 0] * T0)[:, None], 0.0)
            take_mid = upd0 & (T0 > 0.5)
            mid_ts = jnp.where(take_mid, ts_l, mid_ts)
            mid_rp = jnp.where(take_mid[:, None], rp_l, mid_rp)
            mid_xy = jnp.where(take_mid[:, None], xy_l, mid_xy)
            carry = (jnp.where(upd, test, T), C, mid_ts, mid_rp, mid_xy)
            return carry, jnp.any(upd, axis=-1)

        carry0 = (jnp.ones((point_chunk, 5), jnp.float32),
                  jnp.zeros((point_chunk, 3), jnp.float32),
                  jnp.zeros((point_chunk,), jnp.float32),
                  jnp.zeros((point_chunk, 2), jnp.float32),
                  jnp.zeros((point_chunk, 2), jnp.float32))
        (T5, C_rgb, mid_ts, mid_rp, mid_xy), used_l = jax.lax.scan(
            corner_step, carry0,
            (jnp.moveaxis(calpha, 1, 0), jnp.moveaxis(cpass, 1, 0),
             jnp.moveaxis(rgb, 1, 0), jnp.moveaxis(ts, 1, 0),
             jnp.moveaxis(rp, 1, 0), jnp.moveaxis(xy, 1, 0)))
        used = jnp.moveaxis(used_l, 0, 1)                # [pc, L]
        color = C_rgb + T5[:, 0:1] * bg[None, :]         # [pc, 3]
        d_mid = mid_xy - point_xy[idx_c]                 # exact point position
        sdf = (mid_ts + mid_rp[:, 0] * d_mid[:, 0]
               + mid_rp[:, 1] * d_mid[:, 1]) - point_depth[idx_c]

        # ---- pass 2: 3D ray-space blend of used splats (:1455-1487) ----
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
        passes = used & (alpha >= ALPHA_MIN)
        a = jnp.where(passes, alpha, 0.0)
        om = 1.0 - a
        p_excl = jnp.cumprod(om, axis=1) / om
        return jnp.sum(a * p_excl, axis=1), color, sdf   # [pc], [pc,3], [pc]

    alphas, colors, sdfs = jax.lax.map(
        chunk_fn, jnp.arange(n_chunks, dtype=jnp.int32) * point_chunk)
    alpha_integrated = alphas.reshape(-1)[:P]
    alpha_integrated = jnp.where(point_valid, alpha_integrated, 0.0)
    color_integrated = colors.reshape(-1, 3)[:P]
    color_integrated = jnp.where(point_valid[:, None], color_integrated, 0.0)
    # the reference writes sdf only for projected points with positive depth
    # (forward.cu:1530-1535); others keep the buffer's initial value 0
    point_sdf = sdfs.reshape(-1)[:P]
    point_sdf = jnp.where(point_valid & (point_depth > 0), point_sdf, 0.0)
    return IntegrateOutputs(alpha_integrated, color_integrated, point_xy,
                            point_depth, point_sdf, point_valid)


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
