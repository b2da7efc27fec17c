"""Public differentiable rasterizer API.

`rasterize(proj, tongue, bg, cfg)` -> RasterOutputs, differentiable w.r.t.
every float field of `proj` and `tongue`. Three backends with identical
semantics (tested against each other):

  * "reference" — O(N*pixels) oracle, tiny scenes/tests only.
  * "xla"       — tiled, pure XLA, runs everywhere.
  * "pallas"    — tiled Pallas TPU kernels, dedicated forward AND backward
                  (rasterize_pallas.py: 2-pass checkpointed backward with
                  deterministic segment-sum gradient accumulation), wired
                  through custom_vjp; grads match the oracle's autodiff in
                  tests/test_rasterize_pallas.py.
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
from . import relayout
from .binning import (PAYLOAD_PAD, bin_gaussians, bin_rows,
                      build_gaussian_payload, tile_grid)
from .common import RasterOutputs, TILE
from . import rasterize_pallas as rp
from .rasterize_ref import rasterize_reference
from .rasterize_tiles import rasterize_rows_tiles, rasterize_tiles
from .segment_sum import SS_CHUNK, segment_sum_rows


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
    # ONE relayout: [gy, GXP, C, PIX] -> channel-major [C, H, W] via the
    # dedicated pallas kernel pair (ops/relayout.py). The kernel emits
    # channels on the sublane dim and PIX on the lane dim, so both the kernel
    # write and this shuffle move dense 128-lane rows (a [T, PIX, C] layout
    # physically pads C -> 128 lanes in HBM: ~5x traffic, profiled ~3.5
    # ms/frame; the jnp.transpose equivalent lowers to XLA's ~58 GB/s 5-D
    # copy, ~2.9 ms/step both directions — see docs/performance.md).
    # Slicing channels afterwards cuts the LEADING dim (free).
    img = relayout.unpack_image(packed, cfg.interpret
                                or jax.default_backend() == "cpu")
    img = img[:, : cfg.height, : cfg.width]
    ch = {k: img[s] for k, s in rp.OUT_CHANNELS.items()}
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


# ---- pair expansion + pallas tile pass as ONE custom-vjp unit -----------
# Forward: a 26-lane row gather (gather cost scales with logical width:
# [2M,32] 2.8ms vs [2M,128] 8.0ms on v5e), ONE pad to the kernel's
# [K+chunk, 128] shape, then the tile kernel. Differentiable in the pair
# payload only; binning indices are plain jnp upstream.
#
# Backward: the backward kernel writes only each tile's LIVE chunks (pass A
# records the saturation point); every other row — saturation-dead chunks,
# capacity slack, sentinel padding — is uninitialized memory whose true
# gradient is exactly zero. XLA would need (a) a full-array select to zero
# those rows and (b) a row scatter-add (~14ns/row; [1M,26] ~ 14ms) to
# accumulate per-gaussian gradients. Instead: un-permute the cotangent rows
# to pre-sort order (where each gaussian's pairs are contiguous) with a
# permute-gather whose index vector REDIRECTS dead rows to a zeroed slack
# row — the liveness mask rides the sort's value column for free, deleting
# the 537 MB masking select (profiled 1.64 ms/step) — then reduce with the
# deterministic CSR segment-sum kernel. Fusing expansion and tile pass into
# one vjp unit is what lets the liveness information (a kernel output) reach
# the permute; as separate units only the cotangent could flow between them.

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _expand_raster(payload_sorted, pair_gauss, perm, seg_starts, seg_ends,
                   tile_start, tile_count, meta, half_wh):
    pair_payload = _expand_impl(payload_sorted, pair_gauss, meta)
    return _tiles_impl(pair_payload, tile_start, tile_count, half_wh, meta)


def _expand_impl(payload_sorted, pair_gauss, meta):
    chunk = meta[0]
    rows = payload_sorted[pair_gauss]
    return jnp.pad(rows, ((0, chunk), (0, PAYLOAD_PAD - rows.shape[1])))


def _tiles_impl(pair_payload, tile_start, tile_count, half_wh, meta):
    (chunk, _, num_tiles, grid_x, width, height, focal_x, focal_y,
     interpret) = meta
    return rp.rasterize_pallas_forward(
        pair_payload, tile_start, tile_count,
        num_tiles=num_tiles, grid_x=grid_x, width=width, height=height,
        focal_x=focal_x, focal_y=focal_y, chunk=chunk, interpret=interpret,
        half_wh=half_wh)


def _expand_raster_fwd(payload_sorted, pair_gauss, perm, seg_starts, seg_ends,
                       tile_start, tile_count, meta, half_wh):
    pair_payload = _expand_impl(payload_sorted, pair_gauss, meta)
    packed = _tiles_impl(pair_payload, tile_start, tile_count, half_wh, meta)
    return packed, (pair_payload, perm, seg_starts, seg_ends, tile_start,
                    tile_count, half_wh, packed)


def _expand_raster_bwd(meta, res, cot):
    (chunk, F, num_tiles, grid_x, width, height, focal_x, focal_y,
     interpret) = meta
    (pair_payload, perm, seg_starts, seg_ends, tile_start, tile_count,
     half_wh, packed) = res
    dpay, clive = rp.rasterize_pallas_backward(
        pair_payload, tile_start, tile_count, packed, cot,
        num_tiles=num_tiles, grid_x=grid_x, width=width, height=height,
        focal_x=focal_x, focal_y=focal_y, chunk=chunk, interpret=interpret,
        half_wh=half_wh)
    K = perm.shape[0]
    # zero ONE chunk of slack rows (rows K..K+chunk of the kernel output);
    # they are the redirect target for every dead row below
    dpay = jax.lax.dynamic_update_slice(
        dpay, jnp.zeros((chunk, dpay.shape[1]), dpay.dtype), (K, 0))
    # per-row live limit, boxcar-style (scatter +limit at each tile's first
    # row, -limit at the next tile's first row, cumsum) — NO K-element
    # gathers, which cost ~9ns/element on TPU
    row = jnp.arange(K, dtype=jnp.int32)
    limit = tile_start + clive[:num_tiles, 0] * chunk      # [T]
    nxt = jnp.concatenate([tile_start[1:],
                           jnp.full((1,), 1 << 30, jnp.int32)])
    lim_row = jnp.zeros((K,), jnp.int32).at[
        jnp.concatenate([tile_start, jnp.minimum(nxt, K)])].add(
        jnp.concatenate([limit, -limit]), mode="drop")
    live = row < jnp.cumsum(lim_row)
    # inverse permutation by a second sort (~1.1ms; a 1M-element scatter
    # costs ~4.6ns/element for the same result). Dead rows' value column is
    # one of the zeroed slack rows, so the permute-gather masks as it moves;
    # the target is spread over all `chunk` slack rows — a single repeated
    # target row serializes the gather engine (measured 4.8 -> 14 ms).
    src = jnp.where(live, row, K + row % chunk)
    _, inv = jax.lax.sort((perm, src), num_keys=1, is_stable=False)
    # append SS_CHUNK slack rows (also pointing at zero row K) so the
    # segment-sum kernel's chunked DMA can over-read past the last segment
    # end without a separate full-array row-pad pass. The barrier stops XLA
    # from commuting layout changes through the gather (narrow column-major
    # permute-gathers lower to per-channel loops, 45-85ms).
    inv_ext = jnp.concatenate([inv, jnp.full((SS_CHUNK,), K, jnp.int32)])
    g_pre = jax.lax.optimization_barrier(dpay)[inv_ext]   # pre-sort order
    d_payload = segment_sum_rows(g_pre, seg_starts, seg_ends, pad_rows=False,
                                 interpret=jax.default_backend() == "cpu")
    return (d_payload[:, :F], None, None, None, None, None, None, None)


_expand_raster.defvjp(_expand_raster_fwd, _expand_raster_bwd)


@jax.custom_vjp
def _permute_rows(x, order):
    """x[order] for a PERMUTATION `order`, with the backward as the inverse
    permutation gather instead of autodiff's scatter-add (a [100k, 26]
    scatter-add measured 1.19 ms/step; the inverse-sort + staged row gather
    is ~0.3 ms). Correct only when `order` is a bijection over rows — the
    depth sort's argsort always is."""
    return x[order]


def _permute_rows_fwd(x, order):
    return x[order], order


def _permute_rows_bwd(order, ct):
    # order[j] = source row of output j  =>  dx[i] = ct[inv[i]]
    n = order.shape[0]
    _, inv = jax.lax.sort(
        (order, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=False)
    return ct[inv], None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _pallas_forward(proj: ProjectedGaussians, tongue, bg, cfg: RasterConfig) -> RasterOutputs:
    # gather unpadded rows (lane-pad after, so transposes stay 26 wide);
    # _expand_pairs carries the custom segment-sum backward
    payload = build_gaussian_payload(proj, tongue, pad=False)
    grid_x, grid_y = tile_grid(cfg.width, cfg.height)
    return _pallas_forward_rows(
        payload, proj.depth, proj.valid, proj.rect_min, proj.rect_max,
        proj.tiles_touched, bg, cfg, grid_x=grid_x, grid_y=grid_y)


def _pallas_forward_rows(payload, depth, valid, rect_min, rect_max,
                         tiles_touched, bg, cfg: RasterConfig, *,
                         grid_x: int, grid_y: int,
                         half_w=None, half_h=None) -> RasterOutputs:
    bins = bin_rows(depth, valid, tiles_touched, rect_min, rect_max,
                    grid_x=grid_x, grid_y=grid_y,
                    pair_capacity=cfg.pair_capacity)
    payload_sorted = _permute_rows(payload, bins.order)
    num_tiles = grid_x * grid_y
    meta = (cfg.chunk, payload.shape[-1], num_tiles, grid_x, cfg.width,
            cfg.height, cfg.focal_x, cfg.focal_y, cfg.interpret)
    hw = cfg.width / 2.0 if half_w is None else half_w
    hh = cfg.height / 2.0 if half_h is None else half_h
    half_wh = jnp.stack([jnp.asarray(hw, jnp.float32),
                         jnp.asarray(hh, jnp.float32)])
    packed = _expand_raster(
        payload_sorted, bins.pair_gauss, bins.pair_perm, bins.seg_starts,
        bins.seg_ends, bins.tile_start, bins.tile_count, meta, half_wh)
    out = _unpack_pallas(packed, bg, cfg, bins.grid)
    # the kernel caps each tile at chunk*512 pairs (fixed per-tile VMEM
    # budget); surface truncation instead of rendering silently wrong
    return out._replace(tile_overflow=jnp.max(bins.tile_count) > cfg.chunk * 512)


def rasterize_rows(payload, depth, valid, rect_min, rect_max, tiles_touched,
                   bg, cfg: RasterConfig, *, grid_x: int, grid_y: int,
                   half_w=None, half_h=None) -> RasterOutputs:
    """Backend-dispatched rasterization over bare splat rows + explicit grid.

    The tile-sharded distributed path (parallel/tile_sharded.py) calls this
    per image strip after the payload exchange; mean2d / rects are
    strip-local and half_w/half_h carry the full image's ray origin.
    """
    backend = _resolve_backend(cfg.backend)
    if backend == "pallas":
        return _pallas_forward_rows(
            payload, depth, valid, rect_min, rect_max, tiles_touched, bg, cfg,
            grid_x=grid_x, grid_y=grid_y, half_w=half_w, half_h=half_h)
    if backend == "xla":
        return rasterize_rows_tiles(
            payload, depth, valid, rect_min, rect_max, tiles_touched, bg,
            grid_x=grid_x, grid_y=grid_y, width=cfg.width, height=cfg.height,
            focal_x=cfg.focal_x, focal_y=cfg.focal_y, half_w=half_w,
            half_h=half_h, pair_capacity=cfg.pair_capacity,
            max_per_tile=cfg.max_per_tile, chunk=min(cfg.chunk, 64))
    raise ValueError(f"rasterize_rows: unsupported backend {backend}")


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
