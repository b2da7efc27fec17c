"""Pallas TPU rasterizer kernels.

TPU-native replacement of the reference renderCUDA forward tile kernel
(forward.cu:550-822). One grid step per 16x16 tile; the tile's depth-sorted
splat list (contiguous rows of the flat pair-payload matrix, produced by
ops.binning) is streamed from HBM in fixed-size chunks via manual DMA.

Blending per chunk, on [CHUNK, 256]-shaped VPU registers:
  * alpha from conic/opacity, pass-mask, masked cumulative product of
    (1 - alpha) via a log2(CHUNK)-step roll-scan (no sequential loop),
  * `include` early-stop semantics identical to the oracle (see
    ops.rasterize_ref docstring),
and channel accumulation as three MXU matmuls per chunk:
      acc_w  += w^T  @ payload       (w  = blend weights)
      acc_wx += (w*dx)^T @ payload   (for the d-dependent plane terms)
      acc_wy += (w*dy)^T @ payload
where payload carries a constant-1 column so Sum(w) falls out of acc_w.
Median (T=0.5 crossing) channels use the same trick with a one-hot `sel`
mask. All finalization (forward.cu:757-821) happens in-kernel; the output is
a packed [tiles, 256, 32] channel tensor reassembled outside.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import ONES_COL, PAYLOAD_PAD, PAYLOAD_SLICES
from .common import ALPHA_MAX, ALPHA_MIN, MEDIAN_T, NORMALIZE_EPS, T_STOP, TILE

PIX = TILE * TILE

# Output channel packing (columns of the [tiles, PIX, OUT_PAD] kernel output).
OUT_CHANNELS = {
    "color": slice(0, 3),
    "weight": slice(3, 4),
    "t_final": slice(4, 5),
    "coord": slice(5, 8),
    "mcoord": slice(8, 11),
    "depth": slice(11, 12),
    "mdepth": slice(12, 13),
    "tongue": slice(13, 14),
    "normal": slice(14, 17),
}
OUT_DIM = 17
OUT_PAD = 32


def _scan_sublane(x, op, identity, inclusive=True):
    """Inclusive scan along axis 0 of [C, P] via log2(C) masked rolls."""
    C = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    k = 1
    while k < C:
        shifted = pltpu.roll(x, k, axis=0)
        shifted = jnp.where(row >= k, shifted, identity)
        x = op(x, shifted)
        k *= 2
    return x


def _cumprod_sublane(x):
    return _scan_sublane(x, jnp.multiply, 1.0)


def _cumsum_sublane(x):
    return _scan_sublane(x, jnp.add, 0.0)


def _forward_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref, params_ref,
    # tensor inputs
    payload_hbm,
    # outputs
    out_ref,
    # scratch
    buf, sem, acc_w, acc_wx, acc_wy, med, state,
    *, chunk: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]

    focal_x = params_ref[0]
    focal_y = params_ref[1]
    half_w = params_ref[2]
    half_h = params_ref[3]
    grid_x = params_ref[4].astype(jnp.int32)

    # init accumulators
    acc_w[:] = jnp.zeros_like(acc_w)
    acc_wx[:] = jnp.zeros_like(acc_wx)
    acc_wy[:] = jnp.zeros_like(acc_wy)
    med[:] = jnp.zeros_like(med)
    state[:] = jnp.zeros_like(state)
    state[0, :] = jnp.ones((PIX,), jnp.float32)  # transmittance carry

    # pixel coordinates of this tile, [PIX, 1] (pixel axis on sublanes)
    tx = ((t % grid_x) * TILE).astype(jnp.float32)
    ty = ((t // grid_x) * TILE).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    pxf_col = tx + (lane % TILE).astype(jnp.float32)   # [PIX, 1]
    pyf_col = ty + (lane // TILE).astype(jnp.float32)
    # row layout for the [C, PIX] compute
    pxf = pxf_col.reshape(1, PIX)
    pyf = pyf_col.reshape(1, PIX)

    n_chunks = pl.cdiv(count, chunk)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (chunk, PIX), 0)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(start + c * chunk, chunk)],
            buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        # double buffering: next chunk's DMA in flight while we blend this one
        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()
        get_dma(slot, c).wait()

        t_carry = state[0, :].reshape(1, PIX)
        # skip blending entirely once every pixel saturated
        @pl.when(jnp.max(t_carry) >= T_STOP)
        def _():
            block = buf[slot]  # [C, F]
            S = PAYLOAD_SLICES
            xy_x = block[:, S["mean2d"].start:S["mean2d"].start + 1]
            xy_y = block[:, S["mean2d"].start + 1:S["mean2d"].start + 2]
            c0 = block[:, S["conic"].start:S["conic"].start + 1]
            c1 = block[:, S["conic"].start + 1:S["conic"].start + 2]
            c2 = block[:, S["conic"].start + 2:S["conic"].start + 3]
            op = block[:, S["opacity"]]

            dx = xy_x - pxf            # [C, PIX]
            dy = xy_y - pyf
            power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            inrow = (c * chunk + rowid) < count
            passes = inrow & (power <= 0.0) & (alpha >= ALPHA_MIN)
            a = jnp.where(passes, alpha, 0.0)
            om = 1.0 - a

            cum_raw = _cumprod_sublane(om)               # inclusive
            p_incl = t_carry * cum_raw
            p_excl = p_incl / om
            include = passes & (p_incl >= T_STOP)
            w = jnp.where(include, a * p_excl, 0.0)

            om_eff = jnp.where(include, om, 1.0)
            cum_eff = _cumprod_sublane(om_eff)
            state[0, :] = (t_carry * cum_eff[chunk - 1:chunk, :]).reshape(PIX)

            dims = (((0,), (0,)), ((), ()))
            mm = functools.partial(
                jax.lax.dot_general, dimension_numbers=dims,
                preferred_element_type=jnp.float32)
            acc_w[:] = acc_w[:] + mm(w, block)
            acc_wx[:] = acc_wx[:] + mm(w * dx, block)
            acc_wy[:] = acc_wy[:] + mm(w * dy, block)

            # median selection: last include with transmittance-before > 0.5
            mmask = include & (p_excl > MEDIAN_T)
            msum = _cumsum_sublane(mmask.astype(jnp.float32))
            total = msum[chunk - 1:chunk, :]
            sel = jnp.where(mmask & (msum == total), 1.0, 0.0)
            has = (total > 0.0).reshape(1, PIX)
            m_w = mm(sel, block)
            m_wx = mm(sel * dx, block)
            m_wy = mm(sel * dy, block)
            vp, cp, rp = S["view_point"], S["camera_planes"], S["ray_plane"]
            ts_s = S["ts"]
            mc0 = (m_w[:, vp.start] + m_wx[:, cp.start] + m_wy[:, cp.start + 1])
            mc1 = (m_w[:, vp.start + 1] + m_wx[:, cp.start + 2] + m_wy[:, cp.start + 3])
            mc2 = (m_w[:, vp.start + 2] + m_wx[:, cp.start + 4] + m_wy[:, cp.start + 5])
            mt = (m_w[:, ts_s.start] + m_wx[:, rp.start] + m_wy[:, rp.start + 1])
            hasv = has.reshape(PIX)
            med[0, :] = jnp.where(hasv, mt, med[0, :])
            med[1, :] = jnp.where(hasv, mc0, med[1, :])
            med[2, :] = jnp.where(hasv, mc1, med[2, :])
            med[3, :] = jnp.where(hasv, mc2, med[3, :])
            any_inc = jnp.max(jnp.where(include, 1.0, 0.0), axis=0)
            state[1, :] = jnp.maximum(state[1, :], any_inc)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    # ---- finalize (forward.cu:757-821) ----
    S = PAYLOAD_SLICES
    aw = acc_w[:]    # [PIX, F]
    awx = acc_wx[:]
    awy = acc_wy[:]
    weight = aw[:, ONES_COL:ONES_COL + 1]                   # [PIX, 1]
    any_c = state[1, :].reshape(PIX, 1) > 0.0
    inv_w = jnp.where(any_c, 1.0 / jnp.where(any_c, weight, 1.0), 0.0)

    u = (pxf_col - half_w) / focal_x
    v = (pyf_col - half_h) / focal_y
    ln = jnp.sqrt(u * u + v * v + 1.0)                      # [PIX, 1]

    color = aw[:, S["rgb"]]
    tongue = aw[:, S["tongue"]]
    vp, cp, rp = S["view_point"], S["camera_planes"], S["ray_plane"]
    coord0 = aw[:, vp.start:vp.start + 1] + awx[:, cp.start:cp.start + 1] + awy[:, cp.start + 1:cp.start + 2]
    coord1 = aw[:, vp.start + 1:vp.start + 2] + awx[:, cp.start + 2:cp.start + 3] + awy[:, cp.start + 3:cp.start + 4]
    coord2 = aw[:, vp.start + 2:vp.start + 3] + awx[:, cp.start + 4:cp.start + 5] + awy[:, cp.start + 5:cp.start + 6]
    depth_ray = (aw[:, S["ts"]] + awx[:, rp.start:rp.start + 1] + awy[:, rp.start + 1:rp.start + 2])
    nrm = aw[:, S["normal"]]

    exp_depth = (depth_ray / ln) * inv_w
    exp_coord = jnp.concatenate([coord0, coord1, coord2], axis=1) * inv_w
    n_sq = jnp.sum(nrm * nrm, axis=1, keepdims=True)
    n_len = jnp.sqrt(jnp.where(n_sq < 1e-30, 1.0, n_sq))
    out_normal = jnp.where(any_c, nrm / jnp.maximum(n_len, NORMALIZE_EPS), 0.0)
    m_t = med[0, :].reshape(PIX, 1)
    m_coord = jnp.stack([med[1, :], med[2, :], med[3, :]], axis=1)
    mdepth = jnp.where(any_c, m_t / ln, 0.0)
    m_coord = jnp.where(any_c, m_coord, 0.0)

    packed = jnp.concatenate(
        [color, weight, state[0, :].reshape(PIX, 1), exp_coord, m_coord,
         exp_depth, mdepth, tongue, out_normal],
        axis=1,
    )  # [PIX, OUT_DIM]
    packed = jnp.pad(packed, ((0, 0), (0, OUT_PAD - OUT_DIM)))
    out_ref[0] = packed


def rasterize_pallas_forward(
    pair_payload: jnp.ndarray,   # [K + chunk, PAYLOAD_PAD] rows in pair order
    tile_start: jnp.ndarray,     # [T]
    tile_count: jnp.ndarray,     # [T]
    *,
    num_tiles: int,
    grid_x: int,
    width: int,
    height: int,
    focal_x: float,
    focal_y: float,
    chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the forward kernel; returns packed [T, PIX, OUT_PAD] channels."""
    params = jnp.array(
        [focal_x, focal_y, width / 2.0, height / 2.0, float(grid_x), 0.0],
        dtype=jnp.float32,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, PIX, OUT_PAD), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, PAYLOAD_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((PIX, PAYLOAD_PAD), jnp.float32),
            pltpu.VMEM((PIX, PAYLOAD_PAD), jnp.float32),
            pltpu.VMEM((PIX, PAYLOAD_PAD), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, OUT_PAD), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(tile_start, tile_count, params, pair_payload)
