"""Pallas relayout kernels: packed tile output <-> channel-major image.

The tile kernels emit a channel-major [gy, GXP, OUT_PAD, PIX] tensor (PIX =
256 lanes per 16x16 tile, GXP = grid_x rounded up to 8 so 8 adjacent tiles
form exactly one 128-lane group). Reassembling that into the [C, H, W] image
the losses consume is a pure relayout; XLA lowers the equivalent
reshape+transpose to a 5-D copy measured at ~58 GB/s (~2.9 ms/step both
directions at 802x550x24 — see docs/performance.md). These kernels move the
same bytes through VMEM with the 16-lane shuffle done on registers, with
128-lane-aligned HBM traffic on both sides.

Within one (tile-row, 8-tile group) block the shuffle is
    out[c, y, 16*t + x] = in[t, c, 16*y + x]      t in [0,8), x,y in [0,16)
i.e. a swap of the lane-group dims (y <-> t) — 128 static 16-lane register
slices, no DMA, no MXU.

The reference reassembles per-pixel output inside renderCUDA itself
(forward.cu:757-822, one thread per pixel); a TPU kernel must instead blend
whole tiles in vector registers and reassemble afterwards — this module is
that reassembly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .common import TILE

PIX = TILE * TILE
GROUP = 128 // TILE          # tiles per 128-lane output group


def pad_grid_x(grid_x: int) -> int:
    """Tile columns rounded up so each tile row is whole 128-lane groups."""
    return pl.cdiv(grid_x, GROUP) * GROUP


def _unpack_kernel(in_ref, out_ref):
    """[1, GROUP, C, PIX] -> [C, TILE, GROUP*TILE].

    Assembled one image ROW at a time: each y writes a full 128-lane
    [C, 1, 128] value (one aligned vector store) built by concatenating the
    8 tiles' 16-lane strips — 16 aligned stores per block instead of 128
    sub-vreg masked merges (the per-(t, y) formulation measured 1.2 ms/frame
    at 802x550; lane-extracts are cheap, partial-lane stores are not)."""
    for y in range(TILE):
        row = jnp.concatenate(
            [in_ref[0, t, :, y * TILE:(y + 1) * TILE] for t in range(GROUP)],
            axis=1)                                   # [C, 128]
        out_ref[:, y, :] = row


def _pack_kernel(in_ref, out_ref):
    """[C, TILE, GROUP*TILE] -> [1, GROUP, C, PIX] (exact inverse)."""
    for t in range(GROUP):
        for y in range(TILE):
            out_ref[0, t, :, y * TILE:(y + 1) * TILE] = \
                in_ref[:, y, t * TILE:(t + 1) * TILE]


def _unpack_impl(packed, interpret):
    gy, gxp, C, _ = packed.shape
    ng = gxp // GROUP
    return pl.pallas_call(
        _unpack_kernel,
        grid=(gy, ng),
        in_specs=[pl.BlockSpec((1, GROUP, C, PIX),
                               lambda ty, g: (ty, g, 0, 0))],
        out_specs=pl.BlockSpec((C, TILE, GROUP * TILE),
                               lambda ty, g: (0, ty, g)),
        out_shape=jax.ShapeDtypeStruct((C, gy * TILE, gxp * TILE),
                                       jnp.float32),
        interpret=interpret,
    )(packed)


def _pack_impl(img, gy, gxp, C, interpret):
    ng = gxp // GROUP
    return pl.pallas_call(
        _pack_kernel,
        grid=(gy, ng),
        in_specs=[pl.BlockSpec((C, TILE, GROUP * TILE),
                               lambda ty, g: (0, ty, g))],
        out_specs=pl.BlockSpec((1, GROUP, C, PIX),
                               lambda ty, g: (ty, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((gy, gxp, C, PIX), jnp.float32),
        interpret=interpret,
    )(img)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def unpack_image(packed: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[gy, GXP, C, PIX] tile-packed -> [C, gy*16, GXP*16] image.

    Padded tile columns (grid_x..GXP) pass through whatever the (unwritten)
    kernel output holds there; callers must slice to [:, :H, :W] before any
    arithmetic. Differentiable; the cotangent path runs the inverse kernel.
    """
    return _unpack_impl(packed, interpret)


def _unpack_fwd(packed, interpret):
    return _unpack_impl(packed, interpret), packed.shape


def _unpack_bwd(interpret, shape, cot):
    gy, gxp, C, _ = shape
    return (_pack_impl(cot, gy, gxp, C, interpret),)


unpack_image.defvjp(_unpack_fwd, _unpack_bwd)
