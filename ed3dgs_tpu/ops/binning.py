"""Tile binning: (Gaussian, tile) pair expansion + sort, shared by backends.

TPU-native replacement for the reference's CUB scan + duplicateWithKeys +
radix-sort pipeline (rasterizer_impl.cu:253-432), with static shapes:

 1. depth-sort the Gaussians once (stable, invalid-to-back);
 2. exclusive-scan tiles_touched over the sorted order;
 3. *invert* the pair mapping: for each pair slot p in a fixed-capacity buffer,
    find its Gaussian with searchsorted(offsets, p) and its k-th tile from the
    rect row-major enumeration — no [N, max_tiles] blowup, no scatter;
 4. one stable int32 sort by tile id. Pairs are generated in depth order, so
    stability gives per-tile depth order — the reference needed a packed
    (tile, depth) 64-bit radix key for the same result;
 5. per-tile [start, end) ranges via searchsorted (identifyTileRanges).

Capacity overflow (more real pairs than `pair_capacity`) drops the deepest
pairs of the deepest Gaussians and reports the true count so callers can log
or re-bin; the reference reallocates instead (static shapes forbid that here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.projection import ProjectedGaussians
from .common import TILE


class BinnedPairs(NamedTuple):
    order: jnp.ndarray        # [N] int32 gaussian index by depth rank
    pair_gauss: jnp.ndarray   # [K] int32: sorted-order gaussian *rank* per pair
    pair_tile: jnp.ndarray    # [K] int32 tile id per pair (T = sentinel/padding)
    pair_perm: jnp.ndarray    # [K] int32: pre-sort slot of each sorted pair
    seg_starts: jnp.ndarray   # [N] int32: gaussian-rank CSR over pre-sort slots
    seg_ends: jnp.ndarray     # [N] int32 (clamped to K; empty for 0-tile rows)
    tile_start: jnp.ndarray   # [T] int32 start offset into the pair list
    tile_count: jnp.ndarray   # [T] int32 number of pairs per tile
    num_pairs: jnp.ndarray    # [] int32 true number of pairs (may exceed K)
    grid: tuple               # (grid_x, grid_y) static


def tile_grid(width: int, height: int) -> tuple:
    return ((width + TILE - 1) // TILE, (height + TILE - 1) // TILE)


# Fused pair-slot scan kernel (ops/binning_scan.py) control: None disables
# (pure-XLA scans), False uses the compiled kernel, True runs it in pallas
# interpret mode. "auto" resolves per backend at TRACE time via
# jax.default_backend(); under explicit device placement pass fused_scan=
# to bin_rows instead (a jitted caller that flips the module global after
# its first trace keeps the cached trace — same contract as
# RasterConfig.backend, which is also resolved at trace time).
FUSED_SCAN = "auto"


def _fused_scan_mode(override="global"):
    mode = FUSED_SCAN if override == "global" else override
    if mode != "auto":
        return mode
    return False if jax.default_backend() in ("tpu", "axon") else None


def bin_gaussians(proj: ProjectedGaussians, *, width: int, height: int,
                  pair_capacity: int) -> BinnedPairs:
    """Build the depth-ordered per-tile pair list.

    Args:
      proj: projected gaussians (N of them).
      pair_capacity: static pair-buffer size K.
    """
    grid_x, grid_y = tile_grid(width, height)
    return bin_rows(proj.depth, proj.valid, proj.tiles_touched,
                    proj.rect_min, proj.rect_max,
                    grid_x=grid_x, grid_y=grid_y, pair_capacity=pair_capacity)


def bin_rows(depth, valid, tiles_touched, rect_min, rect_max, *,
             grid_x: int, grid_y: int, pair_capacity: int,
             fused_scan="global") -> BinnedPairs:
    """bin_gaussians over bare per-splat arrays and an explicit tile grid.

    The tile-sharded distributed path (parallel/tile_sharded.py) calls this
    with strip-local rects and a strip-sized grid; the rect fields must
    already be clamped to [0, grid) and consistent with tiles_touched.
    """
    num_tiles = grid_x * grid_y
    N = depth.shape[0]
    K = pair_capacity
    # bit budget of the packed per-slot rect word below
    assert grid_x <= 511 and grid_y < 2048, "image too large for rect packing"

    sort_key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)

    # ONE [N,5] row gather for tiles_touched + rects: a bare 1-D
    # tiles_touched[order] is an element gather (~9ns/elem, 0.66 ms at 100k);
    # row gathers from a small source run at ~1.4ns/row
    stacked = jnp.concatenate(
        [tiles_touched.astype(jnp.int32)[:, None],
         rect_min.astype(jnp.int32), rect_max.astype(jnp.int32)], axis=1)
    stacked_sorted = stacked[order]              # [N, 5]
    tiles_sorted = stacked_sorted[:, 0]
    offsets = jnp.cumsum(tiles_sorted)          # inclusive scan, [N]
    total = offsets[-1]
    excl = offsets - tiles_sorted               # exclusive scan

    # Expanding per-gaussian data to pair slots must avoid K-element gathers:
    # TPU element-gathers cost ~9ns/element (profiled: a single [2M] int32
    # gather is ~18ms, dwarfing the tile kernel itself). Everything below is
    # scatters of O(N) elements + O(K) scans, which run at VPU/HBM speed.

    gidx = jnp.arange(N, dtype=jnp.int32)
    pos = jnp.where(tiles_sorted > 0, excl, K)   # zero-tile gaussians dropped
    pos_end = jnp.where(tiles_sorted > 0, offsets, K)
    p = jnp.arange(K, dtype=jnp.int32)

    rmin = stacked_sorted[:, 1:3]                # [N, 2] (from the one gather)
    rmax = stacked_sorted[:, 3:5]
    rw_g = jnp.maximum(rmax[:, 0] - rmin[:, 0], 1)

    # stable sort by tile id with ranks riding along, as ONE packed int32 key
    # (tile << rank_bits | rank): pairs are generated in depth order and the
    # sort is stable in the packed low bits too, so per-tile depth order is
    # preserved — the reference needed a 64-bit (tile, depth) radix key
    # (rasterizer_impl.cu:70-111) for the same result. Single-operand sort is
    # ~2x cheaper than carrying a value lane.
    rank_bits = max(17, (N - 1).bit_length())
    single_key = num_tiles + 1 <= (1 << (31 - rank_bits))
    seg_bits = num_tiles.bit_length()   # tiles/gaussian <= num_tiles < 2^b
    fused = _fused_scan_mode(fused_scan)
    if (single_key and fused is not None and K % 128 == 0
            and rank_bits + max(seg_bits, 9) <= 31):
        # Delta-encoded fused path: segments are CONTIGUOUS over [0, total),
        # so every per-slot constant reconstructs from a cumsum of per-
        # boundary deltas — one N-add scatter for the packed
        # (rank << b | seg_start mod 2^b) word (v is monotone in the slot
        # order, so the previous boundary value falls out of a cummax — no
        # gather), and the existing 2N-add rect boxcar. The two cumsums +
        # rect decode + key pack then run in ONE sequential Pallas pass
        # (ops/binning_scan.py) instead of XLA's per-scan reduce-window +
        # fix-up round trips (~1 ms per [1M] scan) and the two cummax-fill
        # scatter-max passes (~0.85 ms each).
        from .binning_scan import fused_bin_scans
        valid_t = tiles_sorted > 0
        mask_b = (1 << seg_bits) - 1

        def prev_of(packed):
            """Previous valid row's packed word (high bits = gidx, monotone:
            the previous boundary value falls out of a cummax — no gather)."""
            pv = jax.lax.cummax(jnp.where(valid_t, packed, -1))
            return jnp.concatenate(
                [jnp.full((1,), -1, jnp.int32), pv[:-1]])

        v = (gidx << seg_bits) | (pos & mask_b)
        dv_vals = v - jnp.maximum(prev_of(v), 0)
        # two separate [K] element scatters, deliberately: combining them
        # into one [N, 2] row scatter was measured ~3x SLOWER (3.9 vs 1.3
        # ms/step at N=100k — narrow row scatters run at ~39 ns/row on v5e)
        dv = jnp.zeros((K,), jnp.int32).at[pos].add(dv_vals, mode="drop")

        # rect word in 20-bit (tile_base << 9 | rect_w) form: the decode only
        # needs the rect's first tile id and its width, so this stream also
        # delta-encodes into one N-add scatter (vs the 2N-add +/- boxcar)
        base_g = rmin[:, 1] * grid_x + rmin[:, 0]
        pk20 = (base_g << 9) | rw_g
        pb = prev_of((gidx << seg_bits) | base_g)
        pw = prev_of((gidx << 9) | rw_g)
        prev_pk = jnp.where(pb >= 0, (pb & mask_b) << 9, 0) | jnp.where(
            pw >= 0, pw & 0x1FF, 0)
        dpk = jnp.zeros((K,), jnp.int32).at[pos].add(pk20 - prev_pk,
                                                     mode="drop")
        packed_key = fused_bin_scans(
            dv, dpk, total, grid_x=grid_x, num_tiles=num_tiles,
            rank_bits=rank_bits, b=seg_bits, interpret=fused)
        key_sorted, perm = jax.lax.sort((packed_key, p), num_keys=1,
                                        is_stable=True)
        tile_sorted = key_sorted >> rank_bits
        rank_sorted = key_sorted & ((1 << rank_bits) - 1)
    else:
        # cummax-fill path: scatter each gaussian's rank / first slot at its
        # first pair slot, then cumulative max fills the gaps (valid because
        # ranks and start positions are strictly increasing)
        starts = jnp.full((K,), -1, jnp.int32).at[pos].max(gidx, mode="drop")
        sstart = jnp.zeros((K,), jnp.int32).at[pos].max(pos, mode="drop")
        rank_c = jnp.maximum(jax.lax.cummax(starts), 0)
        seg_start = jax.lax.cummax(sstart)
        k = p - seg_start
        # pair slot -> tile rect, as a boxcar reconstruction: the rect fields
        # pack into one non-negative int32 (rmin_x | rmin_y<<11 | rect_w<<22);
        # +packed is scattered at each gaussian's first slot and -packed one
        # past its last, so an inclusive cumsum telescopes to exactly the
        # owning gaussian's packed word at every slot (int32 adds are exact).
        packed_g = rmin[:, 0] | (rmin[:, 1] << 11) | (rw_g << 22)
        pk_deltas = jnp.zeros((K,), jnp.int32).at[
            jnp.concatenate([pos, pos_end])].add(
            jnp.concatenate([packed_g, -packed_g]), mode="drop")
        pk = jnp.cumsum(pk_deltas)
        rw = jnp.maximum((pk >> 22) & 0x1FF, 1)
        ti = (pk & 0x7FF) + k % rw
        tj = ((pk >> 11) & 0x7FF) + k // rw
        tile_id = jnp.where(p < total, tj * grid_x + ti,
                            num_tiles).astype(jnp.int32)
        if single_key:
            packed_key = (tile_id << rank_bits) | rank_c
            key_sorted, perm = jax.lax.sort((packed_key, p), num_keys=1,
                                            is_stable=True)
            tile_sorted = key_sorted >> rank_bits
            rank_sorted = key_sorted & ((1 << rank_bits) - 1)
        else:  # huge scenes: fall back to the multi-operand sort
            tile_sorted, rank_sorted, perm = jax.lax.sort(
                (tile_id, rank_c, p), num_keys=1, is_stable=True)

    # per-tile ranges (identifyTileRanges equivalent): binary search with
    # num_tiles+1 needles instead of a K-element scatter-add (~18ms -> ~0)
    bounds = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = bounds[:num_tiles]
    tile_count = bounds[1:] - bounds[:-1]

    return BinnedPairs(
        order=order,
        pair_gauss=rank_sorted,
        pair_tile=tile_sorted,
        pair_perm=perm,
        # CSR over pre-sort slots per gaussian rank: zero-tile rows collapse
        # to empty [excl, excl) segments, keeping the bounds monotone (the
        # segment-sum kernel requires it); min() clamps capacity overflow.
        seg_starts=jnp.minimum(excl, K),
        seg_ends=jnp.minimum(offsets, K),
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=total,
        grid=(grid_x, grid_y),
    )


# Payload layout for the flat [K, F] per-pair feature matrix consumed by the
# tiled backends. Kept in one gather so both the XLA and Pallas paths agree.
PAYLOAD_FIELDS = (
    ("mean2d", 2), ("conic", 3), ("opacity", 1), ("rgb", 3), ("tongue", 1),
    ("view_point", 3), ("camera_planes", 6), ("ray_plane", 2), ("ts", 1),
    ("normal", 3),
)
PAYLOAD_DIM = sum(d for _, d in PAYLOAD_FIELDS)  # 25
# Feature dim padded to a full 128-lane row: Mosaic requires HBM slices to be
# lane-aligned, and XLA's tiled HBM layout pads the minor dim to 128 anyway, so
# the padding is physically free. TODO(perf): pack 4 pairs per row to use the
# pad lanes for real data and cut DMA bytes 4x.
PAYLOAD_PAD = 128
ONES_COL = PAYLOAD_DIM  # constant-1 column: sum(w) falls out of the w@payload matmul


def payload_slices():
    out, off = {}, 0
    for name, d in PAYLOAD_FIELDS:
        out[name] = slice(off, off + d)
        off += d
    return out


PAYLOAD_SLICES = payload_slices()


def build_gaussian_payload(proj: ProjectedGaussians, tongue: jnp.ndarray,
                           pad: bool = True) -> jnp.ndarray:
    """Per-gaussian feature rows [N, PAYLOAD_PAD] in original gaussian order.

    With pad=False, returns the unpadded [N, PAYLOAD_DIM+1] rows: the pallas
    path pads AFTER the pair gather so the gather's transpose (the
    per-gaussian gradient scatter-add) runs at 26 lanes, not 128 — ~5x less
    scatter work in the backward pass.
    """
    cols = [
        proj.mean2d,
        proj.conic,
        proj.opacity[:, None],
        proj.rgb,
        tongue.reshape(-1, 1),
        proj.view_point,
        proj.camera_planes,
        proj.ray_plane,
        proj.ts[:, None],
        proj.normal,
    ]
    cols.append(jnp.ones_like(proj.ts[:, None]))  # ONES_COL
    payload = jnp.concatenate(cols, axis=-1).astype(jnp.float32)
    if pad and payload.shape[-1] < PAYLOAD_PAD:
        payload = jnp.pad(
            payload, ((0, 0), (0, PAYLOAD_PAD - payload.shape[-1])))
    return payload
