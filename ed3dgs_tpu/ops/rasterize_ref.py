"""Reference (oracle) rasterizer: exact blending semantics, O(N * pixels).

This is the ground-truth implementation the tiled/Pallas backends are tested
against, and the gradient oracle (plain jnp -> autodiff gives exact gradients
of the blending math, replacing the reference's hand-written backward.cu).

Key idea (also used by the production backends): the reference's sequential
front-to-back loop with early stop (forward.cu:672-754) is equivalent to a
masked cumulative product along the depth-sorted Gaussian axis:

    a_i       = alpha if (in tile rect, power <= 0, alpha >= 1/255) else 0
    P_excl_i  = prod_{j<i} (1 - a_j)           (transmittance before splat i)
    include_i = a_i > 0 and P_excl_i*(1-a_i) >= 1e-4
    w_i       = a_i * P_excl_i * include_i     (blend weight)

Because P is monotone nonincreasing, `include` is exactly the reference's
done-flag semantics (first crossing of 1e-4 stops everything after it).
Median outputs select the last included splat with P_excl > 0.5, which is the
reference's `max_contributor` (forward.cu:708-744).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.projection import ProjectedGaussians
from .common import (ALPHA_MAX, ALPHA_MIN, MEDIAN_T, NORMALIZE_EPS, T_STOP,
                     TILE, RasterOutputs, safe_div)


def rasterize_reference(
    proj: ProjectedGaussians,
    tongue: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    focal_x: float,
    focal_y: float,
) -> RasterOutputs:
    """Rasterize projected Gaussians against every pixel (oracle, small scenes).

    Args:
      proj: output of core.projection.project_gaussians.
      tongue: [N] tongue-class channel values.
      bg: [3] background color.
    """
    N = proj.mean2d.shape[0]
    HW = height * width

    # Depth-sorted order, invalid pushed to the back. jax.lax.sort is stable,
    # matching the reference's stable radix sort tie-breaking by Gaussian id.
    sort_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)

    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opacity = proj.opacity[order]
    rgb = proj.rgb[order]
    view_point = proj.view_point[order]
    cam_planes = proj.camera_planes[order]
    ray_plane = proj.ray_plane[order]
    normal = proj.normal[order]
    ts = proj.ts[order]
    rect_min = proj.rect_min[order]
    rect_max = proj.rect_max[order]
    valid = proj.valid[order]
    tongue_s = tongue.reshape(-1)[order]

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    pix_x, pix_y = jnp.meshgrid(px, py, indexing="xy")
    pix = jnp.stack([pix_x.reshape(-1), pix_y.reshape(-1)], axis=-1)  # [HW, 2]

    # Tile-membership: the reference only blends a splat into pixels of tiles
    # inside its projected rect (binning), a hard cutoff we must replicate.
    tile_x = (pix[:, 0] // TILE).astype(jnp.int32)
    tile_y = (pix[:, 1] // TILE).astype(jnp.int32)
    in_rect = (
        (tile_x[:, None] >= rect_min[None, :, 0])
        & (tile_x[:, None] < rect_max[None, :, 0])
        & (tile_y[:, None] >= rect_min[None, :, 1])
        & (tile_y[:, None] < rect_max[None, :, 1])
    )  # [HW, N]

    d = mean2d[None, :, :] - pix[:, None, :]  # [HW, N, 2]
    dx, dy = d[..., 0], d[..., 1]
    power = -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy) \
        - conic[None, :, 1] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    passes = in_rect & valid[None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(passes, alpha, 0.0)

    one_minus = 1.0 - a
    p_incl = jnp.cumprod(one_minus, axis=1)
    # exclusive product by shift (matches the tiled backends bitwise)
    p_excl = jnp.concatenate(
        [jnp.ones_like(p_incl[:, :1]), p_incl[:, :-1]], axis=1)
    include = passes & (p_incl >= T_STOP)
    w = jnp.where(include, a * p_excl, 0.0)  # [HW, N]

    t_final = jnp.prod(jnp.where(include, one_minus, 1.0), axis=1)  # [HW]
    weight = jnp.sum(w, axis=1)
    any_contrib = jnp.any(include, axis=1)

    color = w @ rgb + t_final[:, None] * bg[None, :]
    tongue_out = w @ tongue_s

    # geometry channels: coord_i[ch] = view_point[ch] + cp[2ch]*dx + cp[2ch+1]*dy
    coord = view_point[None, :, :] + jnp.stack(
        [
            cam_planes[None, :, 0] * dx + cam_planes[None, :, 1] * dy,
            cam_planes[None, :, 2] * dx + cam_planes[None, :, 3] * dy,
            cam_planes[None, :, 4] * dx + cam_planes[None, :, 5] * dy,
        ],
        axis=-1,
    )  # [HW, N, 3]
    t_ray = ts[None, :] + ray_plane[None, :, 0] * dx + ray_plane[None, :, 1] * dy

    accum_coord = jnp.einsum("pn,pnc->pc", w, coord)
    accum_depth_ray = jnp.sum(w * t_ray, axis=1)
    accum_normal = w @ normal

    # median: last included splat with transmittance-before > 0.5
    median_mask = include & (p_excl > MEDIAN_T)
    idx = jnp.arange(N)
    m_idx = jnp.max(jnp.where(median_mask, idx[None, :], -1), axis=1)  # [HW]
    has_median = m_idx >= 0
    m_idx_safe = jnp.maximum(m_idx, 0)
    m_coord = jnp.take_along_axis(coord, m_idx_safe[:, None, None], axis=1)[:, 0, :]
    m_coord = jnp.where(has_median[:, None], m_coord, 0.0)
    m_t = jnp.take_along_axis(t_ray, m_idx_safe[:, None], axis=1)[:, 0]
    m_t = jnp.where(has_median, m_t, 0.0)

    # ray-length correction t -> z-depth (forward.cu:590-591, 791-801)
    u = (pix[:, 0] - width / 2.0) / focal_x
    v = (pix[:, 1] - height / 2.0) / focal_y
    ln = jnp.sqrt(u * u + v * v + 1.0)

    expected_depth = safe_div(accum_depth_ray / ln, weight, any_contrib)
    median_depth = m_t / ln
    expected_coord = safe_div(accum_coord, weight[:, None], any_contrib[:, None])
    n_sq = jnp.sum(accum_normal * accum_normal, axis=-1, keepdims=True)
    # safe-sqrt: the derivative of ||.|| blows up at exactly 0 (empty pixels)
    n_len = jnp.sqrt(jnp.where(n_sq < 1e-30, 1.0, n_sq))
    out_normal = jnp.where(
        any_contrib[:, None],
        accum_normal / jnp.maximum(n_len, NORMALIZE_EPS),
        0.0,
    )

    def img(x, c):
        return x.reshape(height, width, c).transpose(2, 0, 1)

    return RasterOutputs(
        color=img(color, 3),
        alpha=img(weight[:, None], 1),
        expected_coord=img(expected_coord, 3),
        median_coord=img(m_coord, 3),
        expected_depth=img(expected_depth[:, None], 1),
        median_depth=img(median_depth[:, None], 1),
        normal=img(out_normal, 3),
        tongue=img(tongue_out[:, None], 1),
        # the O(N*pixels) oracle blends every splat — it cannot truncate
        tile_overflow=jnp.asarray(False),
    )
