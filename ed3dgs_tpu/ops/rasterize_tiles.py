"""Tiled rasterizer, pure-XLA backend.

Same binning + blending semantics as the Pallas TPU kernel (and the oracle),
expressed as a lax.scan over fixed-size chunks of each tile's depth-sorted
splat list. Runs on every platform (the CPU-mesh test backend) and is the
shape blueprint for the Pallas kernel: [tiles, chunk, 256-pixel] blocks,
masked-cumprod blending, matmul channel accumulation.

Cost note: this backend materializes a [T, L, F] gathered payload
(L = max splats per tile, static). That is fine for tests and small scenes;
the Pallas backend streams the flat pair list instead.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.projection import ProjectedGaussians
from .binning import (PAYLOAD_SLICES, BinnedPairs, bin_gaussians, bin_rows,
                      build_gaussian_payload)
from .common import (ALPHA_MAX, ALPHA_MIN, MEDIAN_T, NORMALIZE_EPS, T_STOP,
                     TILE, RasterOutputs, safe_div)

PIX = TILE * TILE  # 256 pixels per tile


class _Carry(NamedTuple):
    transmittance: jnp.ndarray  # [T, PIX]
    color: jnp.ndarray          # [T, PIX, 3]
    tongue: jnp.ndarray         # [T, PIX]
    weight: jnp.ndarray         # [T, PIX]
    coord: jnp.ndarray          # [T, PIX, 3]
    depth_ray: jnp.ndarray      # [T, PIX]
    normal: jnp.ndarray         # [T, PIX, 3]
    m_coord: jnp.ndarray        # [T, PIX, 3]
    m_t: jnp.ndarray            # [T, PIX]
    any_contrib: jnp.ndarray    # [T, PIX] bool


def _tile_pixel_coords(grid_x: int, grid_y: int):
    """Pixel (x, y) coordinates per tile, [T, PIX, 2] float32."""
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    tx = (t % grid_x) * TILE
    ty = (t // grid_x) * TILE
    lx = jnp.arange(TILE, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(lx, lx, indexing="ij")  # row-major within tile
    px = tx[:, None].astype(jnp.float32) + ox.reshape(-1)[None, :]
    py = ty[:, None].astype(jnp.float32) + oy.reshape(-1)[None, :]
    return px, py


def blend_tiles(payload_tiles: jnp.ndarray, lmask: jnp.ndarray,
                px: jnp.ndarray, py: jnp.ndarray, chunk: int = 64):
    """Blend gathered per-tile payload.

    Args:
      payload_tiles: [T, L, F] payload rows in per-tile depth order.
      lmask: [T, L] bool validity of each slot.
      px, py: [T, PIX] pixel coordinates.
    Returns:
      final _Carry with all accumulators.
    """
    T_, L, F = payload_tiles.shape
    n_chunks = max(1, (L + chunk - 1) // chunk)
    pad_l = n_chunks * chunk - L
    if pad_l:
        payload_tiles = jnp.pad(payload_tiles, ((0, 0), (0, pad_l), (0, 0)))
        lmask = jnp.pad(lmask, ((0, 0), (0, pad_l)))
    payload_c = payload_tiles.reshape(T_, n_chunks, chunk, F).transpose(1, 0, 2, 3)
    lmask_c = lmask.reshape(T_, n_chunks, chunk).transpose(1, 0, 2)

    S = PAYLOAD_SLICES
    zero3 = jnp.zeros((T_, PIX, 3), jnp.float32)
    zero1 = jnp.zeros((T_, PIX), jnp.float32)
    init = _Carry(
        transmittance=jnp.ones((T_, PIX), jnp.float32),
        color=zero3, tongue=zero1, weight=zero1, coord=zero3,
        depth_ray=zero1, normal=zero3, m_coord=zero3, m_t=zero1,
        any_contrib=jnp.zeros((T_, PIX), bool),
    )

    def step(carry: _Carry, inp):
        pl, m = inp  # [T, C, F], [T, C]
        xy_x = pl[:, :, S["mean2d"]][..., 0]
        xy_y = pl[:, :, S["mean2d"]][..., 1]
        con = pl[:, :, S["conic"]]
        opac = pl[:, :, S["opacity"]][..., 0]
        dx = xy_x[:, :, None] - px[:, None, :]   # [T, C, PIX]
        dy = xy_y[:, :, None] - py[:, None, :]
        power = (-0.5 * (con[:, :, 0:1] * dx * dx + con[:, :, 2:3] * dy * dy)
                 - con[:, :, 1:2] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, opac[:, :, None] * jnp.exp(power))
        passes = m[:, :, None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(passes, alpha, 0.0)
        one_minus = 1.0 - a
        cp = jnp.cumprod(one_minus, axis=1)
        # exclusive product by shift — bitwise-identical to the Pallas kernel
        cp_excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]],
                                  axis=1)
        p_excl = carry.transmittance[:, None, :] * cp_excl
        p_incl = carry.transmittance[:, None, :] * cp
        include = passes & (p_incl >= T_STOP)
        w = jnp.where(include, a * p_excl, 0.0)  # [T, C, PIX]

        new_T = carry.transmittance * jnp.prod(
            jnp.where(include, one_minus, 1.0), axis=1)

        rgb = pl[:, :, S["rgb"]]
        tng = pl[:, :, S["tongue"]][..., 0]
        vp = pl[:, :, S["view_point"]]
        cpl = pl[:, :, S["camera_planes"]]
        rpl = pl[:, :, S["ray_plane"]]
        ts = pl[:, :, S["ts"]][..., 0]
        nrm = pl[:, :, S["normal"]]

        color = carry.color + jnp.einsum("tcp,tck->tpk", w, rgb)
        tongue = carry.tongue + jnp.sum(w * tng[:, :, None], axis=1)
        weight = carry.weight + jnp.sum(w, axis=1)
        normal = carry.normal + jnp.einsum("tcp,tck->tpk", w, nrm)

        coord_c = jnp.stack(
            [vp[:, :, 0:1] + cpl[:, :, 0:1] * dx + cpl[:, :, 1:2] * dy,
             vp[:, :, 1:2] + cpl[:, :, 2:3] * dx + cpl[:, :, 3:4] * dy,
             vp[:, :, 2:3] + cpl[:, :, 4:5] * dx + cpl[:, :, 5:6] * dy],
            axis=-1,
        )  # [T, C, PIX, 3]
        t_ray = ts[:, :, None] + rpl[:, :, 0:1] * dx + rpl[:, :, 1:2] * dy
        coord = carry.coord + jnp.einsum("tcp,tcpk->tpk", w, coord_c)
        depth_ray = carry.depth_ray + jnp.sum(w * t_ray, axis=1)

        med = include & (p_excl > MEDIAN_T)
        csum = jnp.cumsum(med.astype(jnp.int32), axis=1)
        total = csum[:, -1:, :]
        sel = (med & (csum == total)).astype(jnp.float32)
        has = total[:, 0, :] > 0
        m_t_new = jnp.sum(sel * t_ray, axis=1)
        m_coord_new = jnp.einsum("tcp,tcpk->tpk", sel, coord_c)
        m_t = jnp.where(has, m_t_new, carry.m_t)
        m_coord = jnp.where(has[..., None], m_coord_new, carry.m_coord)
        any_contrib = carry.any_contrib | jnp.any(include, axis=1)

        return _Carry(new_T, color, tongue, weight, coord, depth_ray,
                      normal, m_coord, m_t, any_contrib), None

    final, _ = jax.lax.scan(step, init, (payload_c, lmask_c))
    return final


def gather_tile_lists(bins: BinnedPairs, payload_sorted: jnp.ndarray,
                      max_per_tile: int):
    """[T, L] slot -> payload rows + mask, from the flat sorted pair list."""
    T_ = bins.tile_start.shape[0]
    L = max_per_tile
    K = bins.pair_gauss.shape[0]
    slots = bins.tile_start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    lmask = (jnp.arange(L, dtype=jnp.int32)[None, :] < jnp.minimum(bins.tile_count, L)[:, None])
    slots = jnp.clip(slots, 0, K - 1)
    ranks = bins.pair_gauss[slots]  # [T, L] gaussian ranks
    return payload_sorted[ranks], lmask


def rasterize_tiles(
    proj: ProjectedGaussians,
    tongue: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    focal_x: float,
    focal_y: float,
    pair_capacity: int = 1 << 20,
    max_per_tile: int = 1024,
    chunk: int = 64,
) -> RasterOutputs:
    """Full tiled forward pass (XLA backend)."""
    bins = bin_gaussians(proj, width=width, height=height, pair_capacity=pair_capacity)
    grid_x, grid_y = bins.grid
    payload = build_gaussian_payload(proj, tongue)
    payload_sorted = payload[bins.order]
    tiles_payload, lmask = gather_tile_lists(bins, payload_sorted, max_per_tile)
    px, py = _tile_pixel_coords(grid_x, grid_y)
    out = blend_tiles(tiles_payload, lmask, px, py, chunk=chunk)
    res = finalize_outputs(out, bg, width=width, height=height,
                           focal_x=focal_x, focal_y=focal_y, grid=(grid_x, grid_y))
    return res._replace(tile_overflow=jnp.max(bins.tile_count) > max_per_tile)


def rasterize_rows_tiles(
    payload: jnp.ndarray,        # [N, F>=26] splat rows (strip-local mean2d)
    depth, valid, rect_min, rect_max, tiles_touched,
    bg: jnp.ndarray,
    *,
    grid_x: int, grid_y: int,
    width: int, height: int,
    focal_x: float, focal_y: float,
    half_w=None, half_h=None,
    pair_capacity: int, max_per_tile: int = 1024, chunk: int = 64,
) -> RasterOutputs:
    """XLA tiled forward over bare splat rows and an explicit grid.

    Entry point for the tile-sharded distributed path: rects/mean2d are in
    strip-local coordinates, half_w/half_h give the ray origin of the full
    image so ray directions stay global.
    """
    bins = bin_rows(depth, valid, tiles_touched, rect_min, rect_max,
                    grid_x=grid_x, grid_y=grid_y, pair_capacity=pair_capacity)
    payload_sorted = payload[bins.order]
    tiles_payload, lmask = gather_tile_lists(bins, payload_sorted, max_per_tile)
    px, py = _tile_pixel_coords(grid_x, grid_y)
    out = blend_tiles(tiles_payload, lmask, px, py, chunk=chunk)
    res = finalize_outputs(out, bg, width=width, height=height,
                           focal_x=focal_x, focal_y=focal_y,
                           grid=(grid_x, grid_y), half_w=half_w, half_h=half_h)
    return res._replace(tile_overflow=jnp.max(bins.tile_count) > max_per_tile)


def finalize_outputs(carry: _Carry, bg: jnp.ndarray, *, width: int, height: int,
                     focal_x: float, focal_y: float, grid,
                     half_w=None, half_h=None) -> RasterOutputs:
    """Assemble [C, H, W] images from per-tile accumulators (forward.cu:757-821)."""
    grid_x, grid_y = grid
    half_w = width / 2.0 if half_w is None else half_w
    half_h = height / 2.0 if half_h is None else half_h

    def to_img(x, c):
        # [T, PIX(, c)] -> [gy, gx, 16, 16, c] -> [H_pad, W_pad, c] -> crop
        x = x.reshape(grid_y, grid_x, TILE, TILE, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, c)
        return x[:height, :width].transpose(2, 0, 1)

    u = (jnp.arange(width, dtype=jnp.float32) - half_w) / focal_x
    v = (jnp.arange(height, dtype=jnp.float32) - half_h) / focal_y
    ln = jnp.sqrt(u[None, :] ** 2 + v[:, None] ** 2 + 1.0)  # [H, W]

    color = to_img(carry.color, 3) + to_img(carry.transmittance[..., None], 1) * bg[:, None, None]
    weight = to_img(carry.weight[..., None], 1)
    any_c = to_img(carry.any_contrib[..., None].astype(jnp.float32), 1) > 0.5

    accum_depth = to_img(carry.depth_ray[..., None], 1) / ln[None]
    expected_depth = safe_div(accum_depth, weight, any_c)
    median_depth = to_img(carry.m_t[..., None], 1) / ln[None]
    expected_coord = safe_div(to_img(carry.coord, 3), weight, any_c)
    m_coord = to_img(carry.m_coord, 3)
    nrm = to_img(carry.normal, 3)
    n_sq = jnp.sum(nrm * nrm, axis=0, keepdims=True)
    n_len = jnp.sqrt(jnp.where(n_sq < 1e-30, 1.0, n_sq))
    out_normal = jnp.where(any_c, nrm / jnp.maximum(n_len, NORMALIZE_EPS), 0.0)
    m_coord = jnp.where(any_c, m_coord, 0.0)
    median_depth = jnp.where(any_c, median_depth, 0.0)

    return RasterOutputs(
        color=color,
        alpha=weight,
        expected_coord=expected_coord,
        median_coord=m_coord,
        expected_depth=expected_depth,
        median_depth=median_depth,
        normal=out_normal,
        tongue=to_img(carry.tongue[..., None], 1),
    )
