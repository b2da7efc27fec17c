"""Public differentiable rasterizer API.

`rasterize(proj, tongue, bg, cfg)` -> RasterOutputs, differentiable w.r.t.
every float field of `proj` and `tongue`. Three backends with identical
semantics (tested against each other):

  * "reference" — O(N*pixels) oracle, tiny scenes/tests only.
  * "xla"       — tiled, pure XLA, runs everywhere.
  * "pallas"    — tiled Pallas TPU kernel forward; backward is currently the
                  autodiff of the XLA backend via custom_vjp (exact, since the
                  two forwards agree), until the dedicated backward kernel
                  lands.
  * "auto"      — pallas on TPU, xla otherwise.

This module replaces the reference's torch.autograd.Function wrapper
(diff_gaussian_rasterization/__init__.py:46-174).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.projection import ProjectedGaussians
from .binning import PAYLOAD_PAD, bin_gaussians, build_gaussian_payload, tile_grid
from .common import RasterOutputs, TILE
from . import rasterize_pallas as rp
from .rasterize_ref import rasterize_reference
from .rasterize_tiles import rasterize_tiles


@dataclass(frozen=True)
class RasterConfig:
    width: int
    height: int
    focal_x: float
    focal_y: float
    pair_capacity: int = 1 << 20
    max_per_tile: int = 1024     # xla backend only
    chunk: int = 128
    backend: str = "auto"
    interpret: bool = False      # pallas interpreter mode (debug)


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def _unpack_pallas(packed: jnp.ndarray, bg: jnp.ndarray, cfg: RasterConfig,
                   grid) -> RasterOutputs:
    grid_x, grid_y = grid

    def to_img(x, c):
        x = x.reshape(grid_y, grid_x, TILE, TILE, c)
        x = x.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, c)
        return x[: cfg.height, : cfg.width].transpose(2, 0, 1)

    ch = {k: to_img(packed[:, :, s], s.stop - s.start)
          for k, s in rp.OUT_CHANNELS.items()}
    color = ch["color"] + ch["t_final"] * bg[:, None, None]
    return RasterOutputs(
        color=color,
        alpha=ch["weight"],
        expected_coord=ch["coord"],
        median_coord=ch["mcoord"],
        expected_depth=ch["depth"],
        median_depth=ch["mdepth"],
        normal=ch["normal"],
        tongue=ch["tongue"],
    )


# ---- the pallas tile pass as a custom-vjp unit --------------------------
# Differentiable in the pair payload only; binning indices and the gather are
# plain jnp upstream (the gather's transpose gives the deterministic
# per-gaussian scatter-add that replaces the reference's atomics).

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _packed_tiles(pair_payload, tile_start, tile_count, pair_tile, meta):
    return _packed_tiles_impl(pair_payload, tile_start, tile_count, meta)


def _packed_tiles_impl(pair_payload, tile_start, tile_count, meta):
    (num_tiles, grid_x, width, height, focal_x, focal_y, chunk, interpret) = meta
    return rp.rasterize_pallas_forward(
        pair_payload, tile_start, tile_count,
        num_tiles=num_tiles, grid_x=grid_x, width=width, height=height,
        focal_x=focal_x, focal_y=focal_y, chunk=chunk, interpret=interpret)


def _packed_tiles_fwd(pair_payload, tile_start, tile_count, pair_tile, meta):
    packed = _packed_tiles_impl(pair_payload, tile_start, tile_count, meta)
    return packed, (pair_payload, tile_start, tile_count, pair_tile, packed)


def _packed_tiles_bwd(meta, res, cot):
    (num_tiles, grid_x, width, height, focal_x, focal_y, chunk, interpret) = meta
    pair_payload, tile_start, tile_count, pair_tile, packed = res
    dpay, clive = rp.rasterize_pallas_backward(
        pair_payload, tile_start, tile_count, packed, cot,
        num_tiles=num_tiles, grid_x=grid_x, width=width, height=height,
        focal_x=focal_x, focal_y=focal_y, chunk=chunk, interpret=interpret)
    # The kernel writes only each tile's live chunks; every other row
    # (saturation-dead chunks, sentinel padding) is uninitialized memory with
    # an exactly-zero true gradient — mask it here (fuses into one cheap
    # elementwise pass; the barrier stops XLA from simplifying it away).
    K = dpay.shape[0]
    row = jax.lax.optimization_barrier(jnp.arange(K, dtype=jnp.int32))
    ts_pad = jnp.concatenate([tile_start, jnp.full((1,), 1 << 30, jnp.int32)])
    cl_pad = jnp.concatenate([clive[:num_tiles, 0],
                              jnp.zeros((1,), jnp.int32)])
    pt = jnp.minimum(pair_tile, num_tiles)       # sentinel -> the dead row
    live = (row >= ts_pad[pt]) & (row - ts_pad[pt] < cl_pad[pt] * chunk)
    dpay = jnp.where(live[:, None], dpay, 0.0)
    return dpay, None, None, None


_packed_tiles.defvjp(_packed_tiles_fwd, _packed_tiles_bwd)


def _pallas_forward(proj: ProjectedGaussians, tongue, bg, cfg: RasterConfig) -> RasterOutputs:
    bins = bin_gaussians(proj, width=cfg.width, height=cfg.height,
                         pair_capacity=cfg.pair_capacity)
    payload = build_gaussian_payload(proj, tongue)
    payload_sorted = payload[bins.order]
    pair_payload = payload_sorted[bins.pair_gauss]         # [K, F] pair order
    pair_payload = jnp.pad(pair_payload, ((0, cfg.chunk), (0, 0)))
    grid_x, grid_y = bins.grid
    num_tiles = grid_x * grid_y
    pair_tile = jnp.pad(bins.pair_tile, (0, cfg.chunk),
                        constant_values=num_tiles)
    meta = (num_tiles, grid_x, cfg.width, cfg.height,
            cfg.focal_x, cfg.focal_y, cfg.chunk, cfg.interpret)
    packed = _packed_tiles(pair_payload, bins.tile_start, bins.tile_count,
                           pair_tile, meta)
    return _unpack_pallas(packed, bg, cfg, bins.grid)


def _xla_forward(proj, tongue, bg, cfg: RasterConfig) -> RasterOutputs:
    return rasterize_tiles(
        proj, tongue, bg, width=cfg.width, height=cfg.height,
        focal_x=cfg.focal_x, focal_y=cfg.focal_y,
        pair_capacity=cfg.pair_capacity, max_per_tile=cfg.max_per_tile,
        chunk=min(cfg.chunk, 64),
    )


def rasterize(proj: ProjectedGaussians, tongue: jnp.ndarray, bg: jnp.ndarray,
              cfg: RasterConfig) -> RasterOutputs:
    backend = _resolve_backend(cfg.backend)
    if backend == "reference":
        return rasterize_reference(proj, tongue, bg, width=cfg.width,
                                   height=cfg.height, focal_x=cfg.focal_x,
                                   focal_y=cfg.focal_y)
    if backend == "xla":
        return _xla_forward(proj, tongue, bg, cfg)
    if backend == "pallas":
        return _pallas_forward(proj, tongue, bg, cfg)
    raise ValueError(f"unknown rasterizer backend: {backend}")
