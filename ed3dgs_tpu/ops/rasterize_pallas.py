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
a packed [tiles, 24, 256] channel-major tensor reassembled outside.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import relayout
from .binning import ONES_COL, PAYLOAD_PAD, PAYLOAD_SLICES
from .common import ALPHA_MAX, ALPHA_MIN, MEDIAN_T, NORMALIZE_EPS, T_STOP, TILE

PIX = TILE * TILE

# Output channel packing: ROWS of the [tiles, OUT_PAD, PIX] kernel output.
# Channel-major with PIX=256 on the lane dim: a [T, PIX, 18]-ish layout would
# physically pad its minor dim 18 -> 128 lanes in HBM (~5x padding traffic on
# every kernel write and on the unpack transpose); [T, 24, 256] is dense.
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
    "normal_len": slice(17, 18),   # backward residual (reference normal_length)
}
OUT_DIM = 18
OUT_PAD = 24


LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _make_scan_masks(shape):
    """Loop-invariant row>=k masks for the log-step roll scans. Built ONCE
    per kernel invocation (outside the chunk loop): Mosaic does not hoist
    the iota+compare out of fori_loop bodies, and each scan re-deriving them
    costs log2(C) extra full-array ops per chunk."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    masks = []
    k = 1
    while k < shape[0]:
        masks.append(row >= k)
        k *= 2
    return masks


def _roll_rows(x, k: int):
    """roll(x, k, axis=0). Mosaic's tpu.dynamic_rotate only supports 32-bit
    element types; sub-32-bit dtypes fall back to an equivalent static
    concat-of-slices (kept for the record of the measured-dead bf16 blend
    experiment — see docs/performance.md)."""
    if x.dtype == jnp.float32 or x.dtype == jnp.int32:
        return pltpu.roll(x, k, axis=0)
    return jnp.concatenate([x[-k:], x[:-k]], axis=0)


def _scan_sublane(x, op, identity, masks):
    """Inclusive scan along axis 0 of [C, P] via log2(C) masked rolls."""
    k = 1
    for m in masks:
        shifted = _roll_rows(x, k)
        x = op(x, jnp.where(m, shifted, identity))
        k *= 2
    return x


def _cumprod_sublane(x, masks):
    return _scan_sublane(x, jnp.multiply, 1.0, masks)


def _cumsum_sublane(x, masks):
    return _scan_sublane(x, jnp.add, 0.0, masks)


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
    # cap kept identical to the backward kernel's checkpoint capacity
    count = jnp.minimum(tile_count_ref[t], chunk * 512)

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
    masks = _make_scan_masks((chunk, PIX))
    mask1 = masks[0]

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(start + c * chunk, chunk)],
            buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(c, tmax):
        slot = jax.lax.rem(c, 2)
        # double buffering: next chunk's DMA in flight while we blend this one
        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()
        get_dma(slot, c).wait()

        # skip blending once every pixel saturated (front-to-back early out,
        # forward.cu:668-671); the DMA stream continues so the grid pipeline
        # stays regular — measured faster than a while_loop early exit
        @pl.when(tmax >= T_STOP)
        def _():
            compute(c, slot)
        return jnp.max(state[0, :])

    def compute(c, slot):
        t_carry = state[0, :].reshape(1, PIX)
        block = buf[slot]  # [C, F]
        S = PAYLOAD_SLICES
        xy_x = block[:, S["mean2d"].start:S["mean2d"].start + 1]
        xy_y = block[:, S["mean2d"].start + 1:S["mean2d"].start + 2]
        # fold the -0.5 of the quadratic AND exp->exp2 rescale into the [C,1]
        # conic columns (cheap narrow ops) so the [C,PIX] power chain is 7 ops
        # instead of 9 and the exp costs no extra log2(e) multiply
        c0e = block[:, S["conic"].start:S["conic"].start + 1] * (-0.5 * LOG2E)
        c1e = block[:, S["conic"].start + 1:S["conic"].start + 2] * (-LOG2E)
        c2e = block[:, S["conic"].start + 2:S["conic"].start + 3] * (-0.5 * LOG2E)
        op = block[:, S["opacity"]]

        dx = xy_x - pxf            # [C, PIX]
        dy = xy_y - pyf
        power2 = dx * (c0e * dx + c1e * dy) + c2e * dy * dy  # power * log2(e)
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp2(power2))
        # [chunk, 1] column compare (1 vreg) instead of a full [chunk, PIX]
        # rowid compare; the broadcast rides the & below
        inrow = rowid[:, :1] < (count - c * chunk)
        passes = inrow & (power2 <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(passes, alpha, 0.0)
        om = 1.0 - a

        cum_raw = _cumprod_sublane(om, masks)        # inclusive
        p_incl = t_carry * cum_raw
        # exclusive product by shifting the inclusive one (a divide by om
        # costs ~2x; t_carry broadcast fills row 0)
        p_excl = jnp.where(mask1, _roll_rows(p_incl, 1), t_carry)
        include = passes & (p_incl >= T_STOP)
        w = jnp.where(include, a * p_excl, 0.0)

        # chunk-final transmittance = p_incl at the LAST include (p_incl is
        # non-increasing since om <= 1), i.e. the masked min — cheaper than
        # re-multiplying an effective-om product
        new_t = jnp.min(jnp.where(include, p_incl, t_carry), axis=0)
        state[0, :] = new_t

        # accumulate channel-major [F, PIX] (same MXU cost as [PIX, F]; keeps
        # the finalize + output write in the dense lane layout)
        dims = (((0,), (0,)), ((), ()))
        mm = functools.partial(
            jax.lax.dot_general, dimension_numbers=dims,
            preferred_element_type=jnp.float32)
        acc_w[:] = acc_w[:] + mm(block, w)
        acc_wx[:] = acc_wx[:] + mm(block, w * dx)
        acc_wy[:] = acc_wy[:] + mm(block, w * dy)

        # median selection: last include with transmittance-before > 0.5,
        # found by a max-index reduction instead of a masked scan. Once every
        # pixel has crossed T=0.5 (typically within the first chunk or two)
        # the whole block — including the mmask/midx bookkeeping, not just
        # the matmuls — is skipped: p_excl <= t_carry, so no crossing can
        # occur once max(t_carry) <= 0.5 (saves ~10% of the chunk VPU ops)
        @pl.when(jnp.max(t_carry) > MEDIAN_T)
        def _():
            mmask = include & (p_excl > MEDIAN_T)
            midx = jnp.max(jnp.where(mmask, rowid, -1), axis=0)  # [PIX]
            sel = jnp.where((rowid == midx[None, :]) & mmask, 1.0, 0.0)
            hasv = midx >= 0
            m_w = mm(block, sel)              # [F, PIX]
            m_wx = mm(block, sel * dx)
            m_wy = mm(block, sel * dy)
            vp, cp, rp = S["view_point"], S["camera_planes"], S["ray_plane"]
            ts_s = S["ts"]
            mc0 = (m_w[vp.start] + m_wx[cp.start] + m_wy[cp.start + 1])
            mc1 = (m_w[vp.start + 1] + m_wx[cp.start + 2] + m_wy[cp.start + 3])
            mc2 = (m_w[vp.start + 2] + m_wx[cp.start + 4] + m_wy[cp.start + 5])
            mt = (m_w[ts_s.start] + m_wx[rp.start] + m_wy[rp.start + 1])
            med[0, :] = jnp.where(hasv, mt, med[0, :])
            med[1, :] = jnp.where(hasv, mc0, med[1, :])
            med[2, :] = jnp.where(hasv, mc1, med[2, :])
            med[3, :] = jnp.where(hasv, mc2, med[3, :])

    jax.lax.fori_loop(0, n_chunks, body, jnp.float32(1.0))

    # ---- finalize (forward.cu:757-821), all in [rows, PIX] layout ----
    S = PAYLOAD_SLICES
    aw = acc_w[:]    # [F, PIX]
    awx = acc_wx[:]
    awy = acc_wy[:]
    # every include contributes w >= ALPHA_MIN * T_STOP (positive in f32),
    # so weight > 0 is exactly "any contributor" — no per-chunk tracking
    weight = aw[ONES_COL:ONES_COL + 1, :]                   # [1, PIX]
    any_c = weight > 0.0
    inv_w = jnp.where(any_c, 1.0 / jnp.where(any_c, weight, 1.0), 0.0)

    u = (pxf - half_w) / focal_x                            # [1, PIX]
    v = (pyf - half_h) / focal_y
    ln = jnp.sqrt(u * u + v * v + 1.0)                      # [1, PIX]

    color = aw[S["rgb"], :]                                 # [3, PIX]
    tongue = aw[S["tongue"], :]
    vp, cp, rp = S["view_point"], S["camera_planes"], S["ray_plane"]
    coord0 = aw[vp.start:vp.start + 1, :] + awx[cp.start:cp.start + 1, :] + awy[cp.start + 1:cp.start + 2, :]
    coord1 = aw[vp.start + 1:vp.start + 2, :] + awx[cp.start + 2:cp.start + 3, :] + awy[cp.start + 3:cp.start + 4, :]
    coord2 = aw[vp.start + 2:vp.start + 3, :] + awx[cp.start + 4:cp.start + 5, :] + awy[cp.start + 5:cp.start + 6, :]
    depth_ray = (aw[S["ts"], :] + awx[rp.start:rp.start + 1, :] + awy[rp.start + 1:rp.start + 2, :])
    nrm = aw[S["normal"], :]                                # [3, PIX]

    exp_depth = (depth_ray / ln) * inv_w
    exp_coord = jnp.concatenate([coord0, coord1, coord2], axis=0) * inv_w
    n_sq = jnp.sum(nrm * nrm, axis=0, keepdims=True)
    n_len = jnp.sqrt(jnp.where(n_sq < 1e-30, 1.0, n_sq))
    out_normal = jnp.where(any_c, nrm / jnp.maximum(n_len, NORMALIZE_EPS), 0.0)
    m_t = med[0:1, :]
    m_coord = med[1:4, :]
    mdepth = jnp.where(any_c, m_t / ln, 0.0)
    m_coord = jnp.where(any_c, m_coord, 0.0)

    packed = jnp.concatenate(
        [color, weight, state[0:1, :], exp_coord, m_coord,
         exp_depth, mdepth, tongue, out_normal, n_len],
        axis=0,
    )  # [OUT_DIM, PIX]
    packed = jnp.pad(packed, ((0, OUT_PAD - OUT_DIM), (0, 0)))
    out_ref[0, 0] = packed


def _kernel_params(focal_x, focal_y, width, height, grid_x, half_wh):
    """[6] f32 scalar-prefetch vector; half_wh may be traced (shard_map)."""
    if half_wh is None:
        half_wh = jnp.array([width / 2.0, height / 2.0], jnp.float32)
    head = jnp.array([focal_x, focal_y], jnp.float32)
    tail = jnp.array([float(grid_x), 0.0], jnp.float32)
    return jnp.concatenate([head, half_wh.astype(jnp.float32), tail])


def _backward_kernel(
    # scalar prefetch
    tile_start_ref, tile_count_ref, params_ref,
    # tensor inputs
    payload_hbm, packed_ref, cot_ref,
    # outputs
    dpay_hbm, clive_ref,
    # scratch
    buf, sem, obuf, osem, tchk, state,
    *, chunk: int, max_chunks: int,
):
    """Gradient of the tile forward pass w.r.t. the pair payload.

    Two passes over the tile's chunks (the TPU analogue of the reference
    backward.cu:631-1016 back-to-front re-traversal):
      pass A (front-to-back, cheap): recompute transmittance checkpoints at
        chunk boundaries;
      pass B (back-to-front): recompute alphas/weights per chunk, assemble the
        per-pair payload gradient rows with the same three-matmul structure as
        the forward, chain the alpha gradient with a suffix-sum carry, and
        write the rows (each pair belongs to exactly one tile, so writes are
        race-free — deterministic, unlike the reference's atomics).
    """
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = jnp.minimum(tile_count_ref[t], chunk * max_chunks)

    focal_x = params_ref[0]
    focal_y = params_ref[1]
    half_w = params_ref[2]
    half_h = params_ref[3]
    grid_x = params_ref[4].astype(jnp.int32)

    tx = ((t % grid_x) * TILE).astype(jnp.float32)
    ty = ((t // grid_x) * TILE).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    pxf_col = tx + (lane % TILE).astype(jnp.float32)
    pyf_col = ty + (lane // TILE).astype(jnp.float32)
    pxf = pxf_col.reshape(1, PIX)
    pyf = pyf_col.reshape(1, PIX)
    u_pix = (pxf_col - half_w) / focal_x
    v_pix = (pyf_col - half_h) / focal_y
    ln = jnp.sqrt(u_pix * u_pix + v_pix * v_pix + 1.0).reshape(PIX)  # [PIX]

    S = PAYLOAD_SLICES
    OC = OUT_CHANNELS
    n_chunks = pl.cdiv(count, chunk)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (chunk, PIX), 0)
    masks = _make_scan_masks((chunk, PIX))
    mask1 = masks[0]

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(start + c * chunk, chunk)],
            buf.at[slot], sem.at[slot])

    def alphas_of(block, c):
        # same e-folded conic diet as the forward kernel (see _forward_kernel)
        xy_x = block[:, S["mean2d"].start:S["mean2d"].start + 1]
        xy_y = block[:, S["mean2d"].start + 1:S["mean2d"].start + 2]
        c0e = block[:, S["conic"].start:S["conic"].start + 1] * (-0.5 * LOG2E)
        c1e = block[:, S["conic"].start + 1:S["conic"].start + 2] * (-LOG2E)
        c2e = block[:, S["conic"].start + 2:S["conic"].start + 3] * (-0.5 * LOG2E)
        op = block[:, S["opacity"]]
        dx = xy_x - pxf
        dy = xy_y - pyf
        power2 = dx * (c0e * dx + c1e * dy) + c2e * dy * dy
        e2 = jnp.exp2(power2)
        alpha_raw = op * e2
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        # [chunk, 1] column compare (1 vreg) instead of a full [chunk, PIX]
        # rowid compare; the broadcast rides the & below
        inrow = rowid[:, :1] < (count - c * chunk)
        passes = inrow & (power2 <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(passes, alpha, 0.0)
        return dx, dy, e2, alpha_raw, alpha, passes, a, (c0e, c1e, c2e)

    # ---- pass A: transmittance checkpoints --------------------------------
    # Early-stops at the same saturation point as the forward while_loop; the
    # stop index is this tile's live-chunk count (chunks past it have
    # include == false everywhere, hence exactly zero payload gradient — the
    # caller zeroes those rows, so pass B never touches them).
    tchk[0] = jnp.ones((PIX,), jnp.float32)

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond_a(carry):
        c, tmax = carry
        return jnp.logical_and(c < n_chunks, tmax >= T_STOP)

    def body_a(carry):
        c, _ = carry
        slot = jax.lax.rem(c, 2)
        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(c + 1, 2), c + 1).start()
        get_dma(slot, c).wait()
        block = buf[slot]
        _dx, _dy, _e2, _ar, _al, passes, a, _con = alphas_of(block, c)
        om = 1.0 - a
        t_carry = tchk[c].reshape(1, PIX)
        cum_raw = _cumprod_sublane(om, masks)
        p_incl = t_carry * cum_raw
        include = passes & (p_incl >= T_STOP)
        # masked-min form of the chunk-final transmittance (see forward)
        new_t = jnp.min(jnp.where(include, p_incl, t_carry), axis=0)
        tchk[c + 1] = new_t
        return c + 1, jnp.max(new_t)

    c_live, _ = jax.lax.while_loop(
        cond_a, body_a, (jnp.int32(0), jnp.float32(1.0)))
    # live-chunk count out: 8 consecutive tiles share one (8,128) VMEM block
    # (Mosaic's minimum output tile); each writes its own sublane row
    clive_ref[pl.ds(jax.lax.rem(t, 8), 1), :] = jnp.full(
        (1, 128), c_live, jnp.int32)
    @pl.when(c_live < n_chunks)
    def _():
        get_dma(jax.lax.rem(c_live, 2), c_live).wait()

    # ---- un-finalize the output cotangents (all [rows, PIX]) --------------
    pk = packed_ref[0, 0]    # [OUT_PAD, PIX]
    ct = cot_ref[0, 0]
    W = pk[OC["weight"], :]                           # [1, PIX]
    anyc = W > 0.0
    safe_W = jnp.where(anyc, W, 1.0)
    t_fin = pk[OC["t_final"], :]
    cot_W = ct[OC["weight"], :]
    cot_T = ct[OC["t_final"], :]

    cot_rgb = ct[OC["color"], :]                      # [3, PIX]
    cot_tng = ct[OC["tongue"], :]

    ec = pk[OC["coord"], :]                           # already divided
    cot_ec = ct[OC["coord"], :]
    cot_Ac = jnp.where(anyc, cot_ec / safe_W, 0.0)
    cot_W = cot_W - jnp.where(anyc, jnp.sum(cot_ec * ec, axis=0, keepdims=True) / safe_W, 0.0)

    ln_row = ln.reshape(1, PIX)
    ed = pk[OC["depth"], :]
    cot_ed = ct[OC["depth"], :]
    cot_Ad = jnp.where(anyc, cot_ed / (ln_row * safe_W), 0.0)
    cot_W = cot_W - jnp.where(anyc, cot_ed * ed / safe_W, 0.0)

    cot_mt = jnp.where(anyc, ct[OC["mdepth"], :] / ln_row, 0.0)
    cot_mc = jnp.where(anyc, ct[OC["mcoord"], :], 0.0)

    nrm = pk[OC["normal"], :]
    nlen = pk[OC["normal_len"], :]
    cot_nrm = ct[OC["normal"], :]
    inv_len = jnp.where(anyc, 1.0 / jnp.maximum(nlen, NORMALIZE_EPS), 0.0)
    ndot = jnp.sum(nrm * cot_nrm, axis=0, keepdims=True)
    degen = nlen * nlen < 1e-30
    cot_An = jnp.where(
        degen,
        cot_nrm * jnp.where(anyc, 1.0 / NORMALIZE_EPS, 0.0),
        (cot_nrm - nrm * ndot) * inv_len)

    # cotangent matrices for the three-matmul structure, stored transposed
    # [F, PIX]: G = B@M1 + dx*(B@M2) + dy*(B@M3) contracting F, and
    # dB += w@M1^T + (w dx)@M2^T + (w dy)@M3^T contracting PIX. Built by pure
    # concatenation along the payload row layout (Mosaic has no scatter):
    # [0:2 mean2d][2:5 conic][5 opacity][6:9 rgb][9 tongue][10:13 vp]
    # [13:19 cp][19:21 rp][21 ts][22:25 normal][25 ones][pad]
    F = PAYLOAD_PAD
    z1 = jnp.zeros((1, PIX), jnp.float32)

    def build_m(rgb3, tng1, vp3, cp6, rp2, ts1, n3, ones1):
        return jnp.concatenate(
            [jnp.zeros((6, PIX), jnp.float32), rgb3, tng1, vp3, cp6, rp2,
             ts1, n3, ones1, jnp.zeros((F - 26, PIX), jnp.float32)], axis=0)

    zero3 = jnp.zeros((3, PIX), jnp.float32)
    zero6 = jnp.zeros((6, PIX), jnp.float32)
    zero2 = jnp.zeros((2, PIX), jnp.float32)
    ac0 = cot_Ac[0:1, :]
    ac1 = cot_Ac[1:2, :]
    ac2 = cot_Ac[2:3, :]
    ad1 = cot_Ad
    M1 = build_m(cot_rgb, cot_tng, cot_Ac, zero6, zero2, ad1,
                 cot_An, cot_W)
    cp_x = jnp.concatenate([ac0, z1, ac1, z1, ac2, z1], axis=0)
    cp_y = jnp.concatenate([z1, ac0, z1, ac1, z1, ac2], axis=0)
    M2 = build_m(zero3, z1, zero3, cp_x, jnp.concatenate([ad1, z1], 0), z1,
                 zero3, z1)
    M3 = build_m(zero3, z1, zero3, cp_y, jnp.concatenate([z1, ad1], 0), z1,
                 zero3, z1)
    # median cotangent matrices (routed to the selected splat only)
    mc0 = cot_mc[0:1, :]
    mc1 = cot_mc[1:2, :]
    mc2 = cot_mc[2:3, :]
    mt1 = cot_mt
    N1 = build_m(zero3, z1, cot_mc, zero6, zero2, mt1, zero3, z1)
    N2 = build_m(zero3, z1, zero3,
                 jnp.concatenate([mc0, z1, mc1, z1, mc2, z1], 0),
                 jnp.concatenate([mt1, z1], 0), z1, zero3, z1)
    N3 = build_m(zero3, z1, zero3,
                 jnp.concatenate([z1, mc0, z1, mc1, z1, mc2], 0),
                 jnp.concatenate([z1, mt1], 0), z1, zero3, z1)

    dims = (((1,), (0,)), ((), ()))  # contract feature axis: [C,F]x[F,PIX]->[C,PIX]

    state[0, :] = jnp.zeros((PIX,), jnp.float32)      # suffix carry S
    state[1, :] = jnp.zeros((PIX,), jnp.float32)      # med_done flag

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            obuf.at[slot], dpay_hbm.at[pl.ds(start + c * chunk, chunk)],
            osem.at[slot])

    @pl.when(c_live > 0)
    def _():
        get_dma(jax.lax.rem(c_live - 1, 2), c_live - 1).start()

    def body_b(i, _):
        c = c_live - 1 - i
        slot = jax.lax.rem(c, 2)
        @pl.when(c >= 1)
        def _():
            get_dma(jax.lax.rem(c - 1, 2), c - 1).start()
        get_dma(slot, c).wait()
        block = buf[slot]
        dx, dy, e2, alpha_raw, alpha, passes, a, (c0e, c1e, c2e) = alphas_of(block, c)
        om = 1.0 - a
        t_carry = tchk[c].reshape(1, PIX)
        cum_raw = _cumprod_sublane(om, masks)
        p_incl = t_carry * cum_raw
        p_excl = jnp.where(mask1, pltpu.roll(p_incl, 1, axis=0), t_carry)
        include = passes & (p_incl >= T_STOP)
        w = jnp.where(include, a * p_excl, 0.0)

        mm = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)
        G1 = mm(block, M1)     # [C, PIX]
        G2 = mm(block, M2)
        G3 = mm(block, M3)
        G = G1 + dx * G2 + dy * G3

        # median selection for this chunk (route once, from the back)
        mmask = include & (p_excl > MEDIAN_T)
        midx = jnp.max(jnp.where(mmask, rowid, -1), axis=0)   # [PIX]
        sel_raw = jnp.where((rowid == midx[None, :]) & mmask, 1.0, 0.0)
        not_done = (state[1, :] == 0.0).reshape(1, PIX)
        sel = sel_raw * not_done
        state[1, :] = jnp.maximum(state[1, :],
                                  (midx >= 0).astype(jnp.float32))

        H1 = mm(block, N1)
        H2 = mm(block, N2)
        H3 = mm(block, N3)
        Gm = H1 + dx * H2 + dy * H3

        # alpha gradient: da = inc * (P_excl*G - S_after/(1-a) - cotT*Tfin/(1-a))
        u = w * G
        pref = _cumsum_sublane(u, masks)
        total_u = pref[chunk - 1:chunk, :]
        s_after = state[0, :].reshape(1, PIX) + (total_u - pref)
        tfin_term = (cot_T * t_fin).reshape(1, PIX)
        da = jnp.where(include,
                       p_excl * G - (s_after + tfin_term) / om, 0.0)
        state[0, :] = (state[0, :].reshape(1, PIX) + total_u).reshape(PIX)

        notcl = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
        dpow = da * alpha * notcl   # dL/d(natural-log power)
        dop_pp = da * e2 * notcl
        # accumulate per-pair rows: dB = w@M1^T + (w dx)@M2^T + (w dy)@M3^T
        def acc(Wmat, M):  # [C,PIX] x [F,PIX] -> [C,F]
            return jax.lax.dot_general(Wmat, M, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        dB = acc(w, M1) + acc(w * dx, M2) + acc(w * dy, M3)
        dB = dB + acc(sel, N1) + acc(sel * dx, N2) + acc(sel * dy, N3)

        # -c0 = 2*ln2*c0e, -c1 = ln2*c1e (e-folded conic): fold the ln2 into
        # one dpow rescale, the 2x into [C,1] columns
        dpl = dpow * LN2
        c0e2 = c0e * 2.0
        c2e2 = c2e * 2.0
        ddx = dpl * (c0e2 * dx + c1e * dy) + w * G2 + sel * (H2)
        ddy = dpl * (c2e2 * dy + c1e * dx) + w * G3 + sel * (H3)
        dxy_x = jnp.sum(ddx, axis=1, keepdims=True)   # [C,1]
        dxy_y = jnp.sum(ddy, axis=1, keepdims=True)
        dc0 = jnp.sum(-0.5 * dx * dx * dpow, axis=1, keepdims=True)
        dc1 = jnp.sum(-dx * dy * dpow, axis=1, keepdims=True)
        dc2 = jnp.sum(-0.5 * dy * dy * dpow, axis=1, keepdims=True)
        dop = jnp.sum(dop_pp, axis=1, keepdims=True)

        # columns 0..5 are exactly [mean2d(2), conic(3), opacity(1)]
        head = jnp.concatenate([dxy_x, dxy_y, dc0, dc1, dc2, dop], axis=1)
        dB = dB + jnp.concatenate(
            [head, jnp.zeros((chunk, F - 6), jnp.float32)], axis=1)

        # double-buffered write-back: before refilling this obuf slot, drain
        # the write issued two iterations ago on it (same semaphore + size, so
        # the reconstructed descriptor waits on the right transfer)
        @pl.when(i >= 2)
        def _():
            out_dma(slot, c + 2).wait()
        obuf[slot] = dB
        out_dma(slot, c).start()
        return 0

    jax.lax.fori_loop(0, c_live, body_b, 0)
    # drain the last (up to two) in-flight writes
    @pl.when(c_live > 0)
    def _():
        out_dma(0, 0).wait()
    @pl.when(c_live > 1)
    def _():
        out_dma(1, 1).wait()


def rasterize_pallas_backward(
    pair_payload, tile_start, tile_count, packed, cot_packed,
    *, num_tiles, grid_x, width, height, focal_x, focal_y,
    chunk: int = 128, max_chunks: int = 512, interpret: bool = False,
    half_wh=None,
):
    """Returns (d pair_payload [K+chunk, PAYLOAD_PAD], live_chunks [T, 1]).

    Rows of chunks past a tile's live count are NOT written (their gradient is
    exactly zero); the caller must mask them out with live_chunks.
    """
    params = _kernel_params(focal_x, focal_y, width, height, grid_x, half_wh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, OUT_PAD, PIX),
                         lambda t, *_: (t // grid_x, t % grid_x, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, OUT_PAD, PIX),
                         lambda t, *_: (t // grid_x, t % grid_x, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, 128), lambda t, *_: (t // 8, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, PAYLOAD_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, chunk, PAYLOAD_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((max_chunks + 1, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_backward_kernel, chunk=chunk, max_chunks=max_chunks),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(pair_payload.shape, jnp.float32),
            jax.ShapeDtypeStruct((pl.cdiv(num_tiles, 8) * 8, 128), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(tile_start, tile_count, params, pair_payload, packed, cot_packed)


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
    half_wh=None,
) -> jnp.ndarray:
    """Run the forward kernel; returns packed [T, OUT_PAD, PIX] channels.

    half_wh ([2] f32 array) overrides the ray-direction origin
    (u = (px - half_w)/focal): the tile-sharded path rasterizes an image
    strip whose local pixel (0, 0) is not the full image's corner; the value
    may be traced (it depends on lax.axis_index under shard_map).
    """
    params = _kernel_params(focal_x, focal_y, width, height, grid_x, half_wh)
    grid_y = num_tiles // grid_x
    gxp = relayout.pad_grid_x(grid_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, OUT_PAD, PIX),
            lambda t, *_: (t // grid_x, t % grid_x, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, PAYLOAD_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((PAYLOAD_PAD, PIX), jnp.float32),
            pltpu.VMEM((PAYLOAD_PAD, PIX), jnp.float32),
            pltpu.VMEM((PAYLOAD_PAD, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, chunk=chunk),
        grid_spec=grid_spec,
        # tile columns padded to whole 8-tile groups: the relayout kernel
        # (ops/relayout.py) then reads 128-lane-aligned groups; columns
        # grid_x..gxp are never written and sliced away after the unpack
        out_shape=jax.ShapeDtypeStruct((grid_y, gxp, OUT_PAD, PIX),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(tile_start, tile_count, params, pair_payload)
