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
    "normal_len": slice(17, 18),   # backward residual (reference normal_length)
}
OUT_DIM = 18
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
        # exclusive product by shift (a divide by om costs ~2x the 3 cheap ops)
        cum_excl = jnp.where(rowid >= 1, pltpu.roll(cum_raw, 1, axis=0), 1.0)
        p_incl = t_carry * cum_raw
        p_excl = t_carry * cum_excl
        include = passes & (p_incl >= T_STOP)
        w = jnp.where(include, a * p_excl, 0.0)

        # chunk-final transmittance = p_incl at the LAST include (p_incl is
        # non-increasing since om <= 1), i.e. the masked min — cheaper than
        # re-multiplying an effective-om product
        new_t = jnp.min(jnp.where(include, p_incl, t_carry), axis=0)
        state[0, :] = new_t

        dims = (((0,), (0,)), ((), ()))
        mm = functools.partial(
            jax.lax.dot_general, dimension_numbers=dims,
            preferred_element_type=jnp.float32)
        acc_w[:] = acc_w[:] + mm(w, block)
        acc_wx[:] = acc_wx[:] + mm(w * dx, block)
        acc_wy[:] = acc_wy[:] + mm(w * dy, block)

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
            m_w = mm(sel, block)
            m_wx = mm(sel * dx, block)
            m_wy = mm(sel * dy, block)
            vp, cp, rp = S["view_point"], S["camera_planes"], S["ray_plane"]
            ts_s = S["ts"]
            mc0 = (m_w[:, vp.start] + m_wx[:, cp.start] + m_wy[:, cp.start + 1])
            mc1 = (m_w[:, vp.start + 1] + m_wx[:, cp.start + 2] + m_wy[:, cp.start + 3])
            mc2 = (m_w[:, vp.start + 2] + m_wx[:, cp.start + 4] + m_wy[:, cp.start + 5])
            mt = (m_w[:, ts_s.start] + m_wx[:, rp.start] + m_wy[:, rp.start + 1])
            med[0, :] = jnp.where(hasv, mt, med[0, :])
            med[1, :] = jnp.where(hasv, mc0, med[1, :])
            med[2, :] = jnp.where(hasv, mc1, med[2, :])
            med[3, :] = jnp.where(hasv, mc2, med[3, :])

    jax.lax.fori_loop(0, n_chunks, body, jnp.float32(1.0))

    # ---- finalize (forward.cu:757-821) ----
    S = PAYLOAD_SLICES
    aw = acc_w[:]    # [PIX, F]
    awx = acc_wx[:]
    awy = acc_wy[:]
    # every include contributes w >= ALPHA_MIN * T_STOP (positive in f32),
    # so weight > 0 is exactly "any contributor" — no per-chunk tracking
    weight = aw[:, ONES_COL:ONES_COL + 1]                   # [PIX, 1]
    any_c = weight > 0.0
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
         exp_depth, mdepth, tongue, out_normal, n_len],
        axis=1,
    )  # [PIX, OUT_DIM]
    packed = jnp.pad(packed, ((0, 0), (0, OUT_PAD - OUT_DIM)))
    out_ref[0] = packed


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

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            payload_hbm.at[pl.ds(start + c * chunk, chunk)],
            buf.at[slot], sem.at[slot])

    def alphas_of(block, c):
        xy_x = block[:, S["mean2d"].start:S["mean2d"].start + 1]
        xy_y = block[:, S["mean2d"].start + 1:S["mean2d"].start + 2]
        c0 = block[:, S["conic"].start:S["conic"].start + 1]
        c1 = block[:, S["conic"].start + 1:S["conic"].start + 2]
        c2 = block[:, S["conic"].start + 2:S["conic"].start + 3]
        op = block[:, S["opacity"]]
        dx = xy_x - pxf
        dy = xy_y - pyf
        power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
        alpha_raw = op * jnp.exp(power)
        alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
        inrow = (c * chunk + rowid) < count
        passes = inrow & (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(passes, alpha, 0.0)
        return dx, dy, power, alpha_raw, alpha, passes, a, (c0, c1, c2)

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
        _dx, _dy, _pw, _ar, _al, passes, a, _con = alphas_of(block, c)
        om = 1.0 - a
        t_carry = tchk[c].reshape(1, PIX)
        cum_raw = _cumprod_sublane(om)
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

    # ---- un-finalize the output cotangents --------------------------------
    pk = packed_ref[0]       # [PIX, OUT_PAD]
    ct = cot_ref[0]
    W = pk[:, OC["weight"]][:, 0]                     # [PIX]
    anyc = W > 0.0
    safe_W = jnp.where(anyc, W, 1.0)
    t_fin = pk[:, OC["t_final"]][:, 0]
    cot_W = ct[:, OC["weight"]][:, 0]
    cot_T = ct[:, OC["t_final"]][:, 0]

    cot_rgb = ct[:, OC["color"]]                      # [PIX, 3]
    cot_tng = ct[:, OC["tongue"]][:, 0]

    ec = pk[:, OC["coord"]]                           # already divided
    cot_ec = ct[:, OC["coord"]]
    cot_Ac = jnp.where(anyc[:, None], cot_ec / safe_W[:, None], 0.0)
    cot_W = cot_W - jnp.where(anyc, jnp.sum(cot_ec * ec, axis=1) / safe_W, 0.0)

    ed = pk[:, OC["depth"]][:, 0]
    cot_ed = ct[:, OC["depth"]][:, 0]
    cot_Ad = jnp.where(anyc, cot_ed / (ln * safe_W), 0.0)
    cot_W = cot_W - jnp.where(anyc, cot_ed * ed / safe_W, 0.0)

    cot_mt = jnp.where(anyc, ct[:, OC["mdepth"]][:, 0] / ln, 0.0)
    cot_mc = jnp.where(anyc[:, None], ct[:, OC["mcoord"]], 0.0)

    nrm = pk[:, OC["normal"]]
    nlen = pk[:, OC["normal_len"]][:, 0]
    cot_nrm = ct[:, OC["normal"]]
    inv_len = jnp.where(anyc, 1.0 / jnp.maximum(nlen, NORMALIZE_EPS), 0.0)
    ndot = jnp.sum(nrm * cot_nrm, axis=1)
    degen = nlen * nlen < 1e-30
    cot_An = jnp.where(
        degen[:, None],
        cot_nrm * jnp.where(anyc, 1.0 / NORMALIZE_EPS, 0.0)[:, None],
        (cot_nrm - nrm * ndot[:, None]) * inv_len[:, None])

    # cotangent matrices for the three-matmul structure: G = B@M1^T + dx*(B@M2^T)
    # + dy*(B@M3^T); and dB += w@M1 + (w dx)@M2 + (w dy)@M3. Built by pure
    # concatenation along the payload column layout (Mosaic has no scatter):
    # [0:2 mean2d][2:5 conic][5 opacity][6:9 rgb][9 tongue][10:13 vp]
    # [13:19 cp][19:21 rp][21 ts][22:25 normal][25 ones][pad]
    F = PAYLOAD_PAD
    z1 = jnp.zeros((PIX, 1), jnp.float32)

    def build_m(rgb3, tng1, vp3, cp6, rp2, ts1, n3, ones1):
        return jnp.concatenate(
            [jnp.zeros((PIX, 6), jnp.float32), rgb3, tng1, vp3, cp6, rp2,
             ts1, n3, ones1, jnp.zeros((PIX, F - 26), jnp.float32)], axis=1)

    zero3 = jnp.zeros((PIX, 3), jnp.float32)
    zero6 = jnp.zeros((PIX, 6), jnp.float32)
    zero2 = jnp.zeros((PIX, 2), jnp.float32)
    ac0 = cot_Ac[:, 0:1]
    ac1 = cot_Ac[:, 1:2]
    ac2 = cot_Ac[:, 2:3]
    ad1 = cot_Ad[:, None]
    M1 = build_m(cot_rgb, cot_tng[:, None], cot_Ac, zero6, zero2, ad1,
                 cot_An, cot_W[:, None])
    cp_x = jnp.concatenate([ac0, z1, ac1, z1, ac2, z1], axis=1)
    cp_y = jnp.concatenate([z1, ac0, z1, ac1, z1, ac2], axis=1)
    M2 = build_m(zero3, z1, zero3, cp_x, jnp.concatenate([ad1, z1], 1), z1,
                 zero3, z1)
    M3 = build_m(zero3, z1, zero3, cp_y, jnp.concatenate([z1, ad1], 1), z1,
                 zero3, z1)
    # median cotangent matrices (routed to the selected splat only)
    mc0 = cot_mc[:, 0:1]
    mc1 = cot_mc[:, 1:2]
    mc2 = cot_mc[:, 2:3]
    mt1 = cot_mt[:, None]
    N1 = build_m(zero3, z1, cot_mc, zero6, zero2, mt1, zero3, z1)
    N2 = build_m(zero3, z1, zero3,
                 jnp.concatenate([mc0, z1, mc1, z1, mc2, z1], 1),
                 jnp.concatenate([mt1, z1], 1), z1, zero3, z1)
    N3 = build_m(zero3, z1, zero3,
                 jnp.concatenate([z1, mc0, z1, mc1, z1, mc2], 1),
                 jnp.concatenate([z1, mt1], 1), z1, zero3, z1)

    dims = (((1,), (1,)), ((), ()))  # contract feature axis: [C,F]x[PIX,F]->[C,PIX]

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
        dx, dy, power, alpha_raw, alpha, passes, a, (c0, c1, c2) = alphas_of(block, c)
        om = 1.0 - a
        t_carry = tchk[c].reshape(1, PIX)
        cum_raw = _cumprod_sublane(om)
        cum_excl = jnp.where(rowid >= 1, pltpu.roll(cum_raw, 1, axis=0), 1.0)
        p_incl = t_carry * cum_raw
        p_excl = t_carry * cum_excl
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
        pref = _cumsum_sublane(u)
        total_u = pref[chunk - 1:chunk, :]
        s_after = state[0, :].reshape(1, PIX) + (total_u - pref)
        tfin_term = (cot_T * t_fin).reshape(1, PIX)
        da = jnp.where(include,
                       p_excl * G - (s_after + tfin_term) / om, 0.0)
        state[0, :] = (state[0, :].reshape(1, PIX) + total_u).reshape(PIX)

        notcl = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
        dpow = da * alpha * notcl
        dop_pp = da * jnp.exp(power) * notcl
        # accumulate per-pair rows: dB = w@M1 + (w dx)@M2 + (w dy)@M3 (+ median)
        def acc(Wmat, M):  # [C,PIX] x [PIX,F] -> [C,F]
            return jax.lax.dot_general(Wmat, M, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        dB = acc(w, M1) + acc(w * dx, M2) + acc(w * dy, M3)
        dB = dB + acc(sel, N1) + acc(sel * dx, N2) + acc(sel * dy, N3)

        ddx = dpow * (-c0 * dx - c1 * dy) + w * G2 + sel * (H2)
        ddy = dpow * (-c2 * dy - c1 * dx) + w * G3 + sel * (H3)
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
            pl.BlockSpec((1, PIX, OUT_PAD), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, OUT_PAD), lambda t, *_: (t, 0, 0),
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
    """Run the forward kernel; returns packed [T, PIX, OUT_PAD] channels.

    half_wh ([2] f32 array) overrides the ray-direction origin
    (u = (px - half_w)/focal): the tile-sharded path rasterizes an image
    strip whose local pixel (0, 0) is not the full image's corner; the value
    may be traced (it depends on lax.axis_index under shard_map).
    """
    params = _kernel_params(focal_x, focal_y, width, height, grid_x, half_wh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
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
