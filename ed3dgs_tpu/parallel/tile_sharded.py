"""Tile-sharded distributed rasterization with explicit payload exchange.

The SPMD analogue of the reference's duplicateWithKeys + sort feeding every
tile (rasterizer_impl.cu:253-432), distributed: the image's tile rows are
partitioned into horizontal strips, one per chip along the mesh's "gauss"
axis, and each chip blends only its own strip.

Pipeline (inside one shard_map over the gauss axis):

  1. every chip holds a shard of the projected Gaussians (deformation +
     projection are embarrassingly parallel along the Gaussian axis);
  2. for each destination strip d, the chip packs the payload rows of its
     local splats whose tile rect intersects strip d into a fixed-capacity
     send buffer (static shapes: XLA cannot do ragged exchange; capacity
     overflow is reported, not silently wrong — see `send_overflow`);
  3. ONE `lax.all_to_all` over ICI swaps the [g, cap, F] buffers — this is
     the "ragged all-to-all of the culled projected payload" from SURVEY
     §2.11, with the raggedness absorbed by the per-destination capacity;
  4. each chip re-bins the received splats into its strip's tiles
     (depth-sorting the merged set restores global front-to-back order) and
     runs the standard tile rasterizer on strip-local coordinates;
  5. outputs are image strips, sharded along H; the caller crops the
     tile-padded bottom strip.

Compared to the GSPMD default (all-gather the full projected payload and
blend the whole image on every chip), per-chip blend work drops by ~g and
the exchange moves only the splats each strip actually needs.

Differentiable end-to-end: the pack-scatter transposes to a gather, the
all_to_all to the reverse all_to_all, and the strip rasterizer carries the
same custom_vjp kernels as the single-chip path.
"""

from __future__ import annotations

import functools
from dataclasses import replace as dc_replace

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.projection import ProjectedGaussians
from ..ops.binning import PAYLOAD_SLICES, build_gaussian_payload, tile_grid
from ..ops.common import TILE, RasterOutputs
from ..ops.rasterize import RasterConfig, rasterize_rows


def strip_rows_for(cfg: RasterConfig, num_strips: int) -> int:
    """Tile rows per strip (the image's tile grid split along y)."""
    _, grid_y = tile_grid(cfg.width, cfg.height)
    return -(-grid_y // num_strips)


def _pack_for_strips(rows, depth, valid, ry0, ry1, g: int, strip_rows: int,
                     cap: int):
    """[Nl, F] rows -> [g, cap, F] send buffers + per-dest true counts [g].

    Compaction reuses the tile-binning machinery (ops.binning.bin_rows) with
    the DESTINATION STRIP as the "tile" axis: one stable sort of the
    (row, strip) pair list replaces the previous per-destination argsort of
    the full shard (O(g * N log N) — a wall at pod scale; this is
    O(P log P) with P <= 2N typical since most rows touch one strip).
    Pairs are generated in depth order, so each destination's range holds
    its SHALLOWEST rows first and capacity overflow drops the deepest —
    the same contract as BinnedPairs.num_pairs. Per-dest demand past the
    global pair budget folds into the reported counts so the caller's
    overflow contract (re-render with a larger capacity) still fires.
    """
    from ..ops.binning import bin_rows

    n = rows.shape[0]
    d0 = jnp.clip(ry0 // strip_rows, 0, g)
    d1 = jnp.clip(-(-ry1 // strip_rows), 0, g)      # ceil(ry1 / strip_rows)
    nd = jnp.where(valid, jnp.maximum(d1 - d0, 0), 0).astype(jnp.int32)
    zeros = jnp.zeros_like(d0)
    K = max(2 * n, g * 64)
    bins = bin_rows(depth, valid & (nd > 0), nd,
                    jnp.stack([zeros, d0], 1), jnp.stack([zeros + 1, d1], 1),
                    grid_x=1, grid_y=g, pair_capacity=K)
    slots = bins.tile_start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    in_range = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                < jnp.minimum(bins.tile_count, cap)[:, None])
    ranks = bins.pair_gauss[jnp.clip(slots, 0, K - 1)]        # [g, cap]
    rows_sorted = rows[bins.order]
    bufs = jnp.where(in_range[:, :, None], rows_sorted[ranks], 0.0)
    # true per-dest demand; if the global pair budget itself truncated,
    # surface that too (any value > cap triggers the caller's re-render)
    counts = jnp.maximum(
        bins.tile_count,
        jnp.where(bins.num_pairs > K, bins.num_pairs, 0))
    return bufs, counts


def _strip_raster(payload, depth, valid, rect_min, rect_max, bg, *,
                  cfg: RasterConfig, axis: str, g: int, grid_x: int,
                  strip_rows: int, cap: int):
    """Per-chip body: pack -> all_to_all -> strip-local re-bin + blend."""
    F = payload.shape[1]
    my = jax.lax.axis_index(axis)

    rows = jnp.concatenate(
        [payload, depth[:, None], rect_min.astype(jnp.float32),
         rect_max.astype(jnp.float32)], axis=1)            # [Nl, F+5]
    send, counts = _pack_for_strips(
        rows, depth, valid, rect_min[:, 1], rect_max[:, 1], g, strip_rows,
        cap)
    # worst per-(src,dst) demand, replicated, for overflow reporting
    overflow = jax.lax.pmax(jnp.max(counts), axis)

    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    recv = recv.reshape(g * cap, F + 5)

    r_payload = recv[:, :F]
    r_depth = recv[:, F]
    r_rmin = recv[:, F + 1:F + 3].astype(jnp.int32)
    r_rmax = recv[:, F + 3:F + 5].astype(jnp.int32)

    # strip-local rects; packed rows that were never written (zeros) get
    # rect area 0 and drop out of binning
    y0t = my * strip_rows
    lmin_y = jnp.clip(r_rmin[:, 1] - y0t, 0, strip_rows)
    lmax_y = jnp.clip(r_rmax[:, 1] - y0t, 0, strip_rows)
    rw = r_rmax[:, 0] - r_rmin[:, 0]
    tiles = rw * (lmax_y - lmin_y)
    lvalid = tiles > 0
    lrect_min = jnp.stack([r_rmin[:, 0], lmin_y], 1)
    lrect_max = jnp.stack([r_rmax[:, 0], lmax_y], 1)

    # shift mean2d to strip-local pixels; ray directions keep the full
    # image's origin via half_w/half_h
    y0p = (y0t * TILE).astype(jnp.float32)
    ycol = PAYLOAD_SLICES["mean2d"].start + 1
    shift = jnp.zeros((F,), jnp.float32).at[ycol].set(1.0)
    r_payload = r_payload - (shift * y0p)[None, :]

    strip_cfg = dc_replace(cfg, height=strip_rows * TILE)
    out = rasterize_rows(
        r_payload, r_depth, lvalid, lrect_min, lrect_max, tiles, bg,
        strip_cfg, grid_x=grid_x, grid_y=strip_rows,
        half_w=cfg.width / 2.0, half_h=cfg.height / 2.0 - y0p)
    # per-tile truncation flag: scalar per strip -> replicated any()
    tile_ovf = jax.lax.pmax(out.tile_overflow.astype(jnp.int32), axis)
    return out._replace(tile_overflow=None), overflow, tile_ovf


def tile_sharded_rasterize(
    proj: ProjectedGaussians,
    tongue: jnp.ndarray,
    bg: jnp.ndarray,
    cfg: RasterConfig,
    mesh: Mesh,
    *,
    axis: str = "gauss",
    send_capacity: int | None = None,
):
    """Distributed rasterize(): Gaussian-sharded in, tile(strip)-sharded blend.

    Returns (RasterOutputs, overflow): outputs match the single-device
    `rasterize` (same [C, H, W] logical arrays, physically sharded along H);
    `overflow` is the max per-(src, dst) splat demand — if it exceeds
    `send_capacity`, deepest splats were dropped and the caller should re-run
    with a larger capacity (the same contract as BinnedPairs.num_pairs).
    """
    g = mesh.shape[axis]
    grid_x, _ = tile_grid(cfg.width, cfg.height)
    strip_rows = strip_rows_for(cfg, g)
    n = proj.depth.shape[0]
    if send_capacity is None:
        send_capacity = max(64, -(-2 * n // g))
    payload = build_gaussian_payload(proj, tongue, pad=False)
    valid = proj.valid & (proj.tiles_touched > 0)
    rect_min, rect_max, depth = proj.rect_min, proj.rect_max, proj.depth
    if n % g:  # pad the gaussian axis with dead rows to a shardable size
        p = ((0, g - n % g),)
        payload = jnp.pad(payload, p + ((0, 0),))
        valid = jnp.pad(valid, p)
        depth = jnp.pad(depth, p)
        rect_min = jnp.pad(rect_min, p + ((0, 0),))
        rect_max = jnp.pad(rect_max, p + ((0, 0),))

    out_strip = jax.tree.map(
        lambda _: P(None, axis, None),
        RasterOutputs(*([0] * (len(RasterOutputs._fields) - 1)), None))
    fn = jax.shard_map(
        functools.partial(_strip_raster, cfg=cfg, axis=axis, g=g,
                          grid_x=grid_x, strip_rows=strip_rows,
                          cap=send_capacity),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(out_strip, P(), P()),
        check_vma=False,
    )
    out, overflow, tile_ovf = fn(payload, depth, valid, rect_min, rect_max, bg)
    # crop the tile padding of the bottom strip(s)
    out = jax.tree.map(lambda x: x[:, :cfg.height, :], out)
    return out._replace(tile_overflow=tile_ovf > 0), overflow


def batched_strip_rasterize(
    payload_b: jnp.ndarray,      # [B, N, F] per-camera payload rows (pad=False)
    depth_b: jnp.ndarray,        # [B, N]
    valid_b: jnp.ndarray,        # [B, N]
    rect_min_b: jnp.ndarray,     # [B, N, 2]
    rect_max_b: jnp.ndarray,     # [B, N, 2]
    bg: jnp.ndarray,
    cfg: RasterConfig,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
    send_capacity: int | None = None,
):
    """Strip-exchange rasterization for a CAMERA BATCH on a 2-D mesh.

    The per-camera strip exchange (tile_sharded_rasterize) could not ride
    the batched GSPMD train step because vmap does not compose with the
    all_to_all inside shard_map over the "data"-sharded batch axis
    (docs/performance.md "Why the train step keeps the GSPMD all-gather").
    This is the pre-built workaround for the hardware-day A/B
    (docs/hardware_day.md §3): ONE shard_map over BOTH mesh axes whose body
    runs `lax.map` over the LOCAL camera shard — the exchange serializes
    over local cameras (B_local is small: 1-2 in production) instead of
    serializing the batch axis itself, and each camera's exchange is the
    same single all_to_all over the gauss groups as the serving path.

    CPU-mesh parity-tested only (tests/test_tile_sharded.py); never
    perf-measured — that measurement is hardware-day task 3. Reference
    analogue: duplicateWithKeys feeding every tile, rasterizer_impl.cu:253-432.

    Returns (RasterOutputs [B, C, H, W], overflow) with the same overflow
    contract as tile_sharded_rasterize.
    """
    g = mesh.shape[gauss_axis]
    grid_x, _ = tile_grid(cfg.width, cfg.height)
    strip_rows = strip_rows_for(cfg, g)
    n = payload_b.shape[1]
    assert n % g == 0, "pad the gaussian axis to a multiple of the mesh"
    assert payload_b.shape[0] % mesh.shape[data_axis] == 0
    if send_capacity is None:
        send_capacity = max(64, -(-2 * n // g))

    def body(payload, depth, valid, rmin, rmax, bg_):
        def one(args):
            p, d, v, r0, r1 = args
            return _strip_raster(
                p, d, v, r0, r1, bg_, cfg=cfg, axis=gauss_axis, g=g,
                grid_x=grid_x, strip_rows=strip_rows, cap=send_capacity)
        out, ovf, tovf = jax.lax.map(one, (payload, depth, valid, rmin, rmax))
        # replicate the scalars over "data" too (out_specs P())
        return (out, jax.lax.pmax(jnp.max(ovf), data_axis),
                jax.lax.pmax(jnp.max(tovf), data_axis))

    out_strip = jax.tree.map(
        lambda _: P(data_axis, None, gauss_axis, None),
        RasterOutputs(*([0] * (len(RasterOutputs._fields) - 1)), None))
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(data_axis, gauss_axis), P(data_axis, gauss_axis),
                  P(data_axis, gauss_axis), P(data_axis, gauss_axis),
                  P(data_axis, gauss_axis), P()),
        out_specs=(out_strip, P(), P()),
        check_vma=False,
    )
    out, overflow, tile_ovf = fn(payload_b, depth_b, valid_b, rect_min_b,
                                 rect_max_b, bg)
    out = jax.tree.map(lambda x: x[:, :, :cfg.height, :], out)
    return out._replace(tile_overflow=tile_ovf > 0), overflow
