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


def _pallas_forward(proj: ProjectedGaussians, tongue, bg, cfg: RasterConfig) -> RasterOutputs:
    bins = bin_gaussians(proj, width=cfg.width, height=cfg.height,
                         pair_capacity=cfg.pair_capacity)
    payload = build_gaussian_payload(proj, tongue)
    # one fused gather: pair slot -> original gaussian index -> payload row
    pair_payload = payload[bins.order[bins.pair_gauss]]    # [K, F] pair order
    pair_payload = jnp.pad(pair_payload, ((0, cfg.chunk), (0, 0)))
    grid_x, grid_y = bins.grid
    packed = rp.rasterize_pallas_forward(
        pair_payload, bins.tile_start, bins.tile_count,
        num_tiles=grid_x * grid_y, grid_x=grid_x,
        width=cfg.width, height=cfg.height,
        focal_x=cfg.focal_x, focal_y=cfg.focal_y,
        chunk=cfg.chunk, interpret=cfg.interpret,
    )
    return _unpack_pallas(packed, bg, cfg, bins.grid)


def _xla_forward(proj, tongue, bg, cfg: RasterConfig) -> RasterOutputs:
    return rasterize_tiles(
        proj, tongue, bg, width=cfg.width, height=cfg.height,
        focal_x=cfg.focal_x, focal_y=cfg.focal_y,
        pair_capacity=cfg.pair_capacity, max_per_tile=cfg.max_per_tile,
        chunk=min(cfg.chunk, 64),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rasterize_pallas_diff(proj, tongue, bg, cfg):
    return _pallas_forward(proj, tongue, bg, cfg)


def _rasterize_pallas_fwd(proj, tongue, bg, cfg):
    out = _pallas_forward(proj, tongue, bg, cfg)
    return out, (proj, tongue, bg)


def _rasterize_pallas_bwd(cfg, res, g):
    proj, tongue, bg = res
    _, vjp = jax.vjp(lambda p, t, b: _xla_forward(p, t, b, cfg), proj, tongue, bg)
    return vjp(g)


_rasterize_pallas_diff.defvjp(_rasterize_pallas_fwd, _rasterize_pallas_bwd)


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
        return _rasterize_pallas_diff(proj, tongue, bg, cfg)
    raise ValueError(f"unknown rasterizer backend: {backend}")
