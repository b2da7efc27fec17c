"""Fused pair-slot scan kernel for tile binning.

bin_rows (ops/binning.py) reconstructs three per-slot quantities over the
[K]-sized pair buffer from O(N) scatters:

  rank_c    = max(cummax(starts_scattered), 0)    (owning gaussian rank)
  seg_start = cummax(sstart_scattered)            (owner's first slot)
  pk        = cumsum(pk_deltas)                   (owner's packed tile rect)

and then decodes the (tile x, tile y) enumeration and packs the sort key
`tile_id << rank_bits | rank`. XLA lowers each [1M] scan to a
reduce-window + a fix-up fusion (~1.0-1.2 ms apiece on v5e, ~3.3 ms total,
plus the decode) because they are chained memory-bound passes over HBM.

This kernel runs all three scans + decode + key pack in ONE sequential pass
(grid of [R,128] blocks, running carries in SMEM): each block does the
lane-dim log-scan, a tiny sublane scan of the row totals, and the carry
combine — ~0.2 ms for the same result. Replaces nothing semantically: the
fallback XLA formulation stays in ops/binning.py for CPU.

TPU analogue of the scan part of the reference's CUB pipeline
(rasterizer_impl.cu:355, duplicateWithKeys rasterizer_impl.cu:70-111).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _lane_masks(shape):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    masks, k = [], 1
    while k < shape[1]:
        masks.append(lane >= k)
        k *= 2
    return masks


def _row_masks(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    masks, k = [], 1
    while k < shape[0]:
        masks.append(row >= k)
        k *= 2
    return masks


def _scan_flat(x, op, identity, lane_masks, row_masks):
    """Inclusive scan of [R, 128] in flat row-major order; returns
    (scanned, total) where total is the block-inclusive last element."""
    k = 1
    for m in lane_masks:
        x = op(x, jnp.where(m, pltpu.roll(x, k, axis=1), identity))
        k *= 2
    tot = x[:, 127:128]                       # [R, 1] per-row inclusive
    k = 1
    for m in row_masks:
        tot = op(tot, jnp.where(m, pltpu.roll(tot, k, axis=0), identity))
        k *= 2
    # exclusive row prefix
    excl = jnp.where(_row_masks_first(x.shape), pltpu.roll(tot, 1, axis=0),
                     identity)
    x = op(x, excl)
    return x, tot[x.shape[0] - 1, 0]


def _row_masks_first(shape):
    return jax.lax.broadcasted_iota(jnp.int32, (shape[0], 1), 0) >= 1


def _kernel(params_ref, dv_ref, dpk_ref, key_ref, carry,
            *, R: int, grid_x: int, num_tiles: int, rank_bits: int, b: int):
    g = pl.program_id(0)
    total = params_ref[0]

    @pl.when(g == 0)
    def _():
        carry[0] = 0            # v cumsum carry
        carry[1] = 0            # pk cumsum carry

    lm = _lane_masks((R, 128))
    rm = _row_masks((R, 1))

    v, v_tot = _scan_flat(dv_ref[...], jnp.add, 0, lm, rm)
    pk, pk_tot = _scan_flat(dpk_ref[...], jnp.add, 0, lm, rm)
    v = v + carry[0]
    pk = pk + carry[1]
    carry[0] = carry[0] + v_tot
    carry[1] = carry[1] + pk_tot

    # global flat slot index p
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    p = (g * R + row) * 128 + lane

    # v = (rank << b) | (seg_start mod 2^b); tiles-per-gaussian < 2^b, so the
    # within-rect enumeration k reconstructs mod 2^b exactly
    rank = v >> b
    k_enum = (p - v) & ((1 << b) - 1)

    # decode the packed rect word (tile_base << 9 | rect_w) and the
    # within-rect row-major enumeration. k/rw are tiny, so the f32 divide is
    # exact up to the rounding guard — Mosaic has no vector integer divide.
    rw = jnp.maximum(pk & 0x1FF, 1)
    q = jnp.floor(k_enum.astype(jnp.float32) *
                  (1.0 / rw.astype(jnp.float32))).astype(jnp.int32)
    # guard f32 rounding at exact multiples: q*rw must satisfy
    # q*rw <= k < (q+1)*rw
    q = jnp.where(q * rw > k_enum, q - 1, q)
    q = jnp.where((q + 1) * rw <= k_enum, q + 1, q)
    r = k_enum - q * rw
    tile_id = jnp.where(p < total, (pk >> 9) + q * grid_x + r, num_tiles)
    key_ref[...] = (tile_id << rank_bits) | rank


def fused_bin_scans(dv, dpk, total, *, grid_x: int, num_tiles: int,
                    rank_bits: int, b: int, interpret: bool = False):
    """dv/dpk: [K] i32 delta streams (scatter-adds at segment starts; see
    bin_rows). Their cumsums give, per pair slot, the packed
    (rank << b | seg_start mod 2^b) word and the packed tile-rect word.
    Returns the packed sort key [K] i32."""
    K = dv.shape[0]
    assert K % 128 == 0
    rows = K // 128
    R = rows
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            R = cand
            break
    grid = rows // R
    params = jnp.asarray([total], jnp.int32)

    kernel = functools.partial(_kernel, R=R, grid_x=grid_x,
                               num_tiles=num_tiles, rank_bits=rank_bits, b=b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec((R, 128), lambda g, *_: (g, 0))] * 2,
        out_specs=pl.BlockSpec((R, 128), lambda g, *_: (g, 0)),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        interpret=interpret,
    )(params, dv.reshape(rows, 128), dpk.reshape(rows, 128))
    return out.reshape(K)
