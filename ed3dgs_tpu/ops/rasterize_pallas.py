"""Pallas TPU rasterizer kernels.

TPU-native replacement of the reference renderCUDA forward tile kernel
(forward.cu:550-822). One grid step per (tile, chunk) pair: the grid walks a
prefetched block-sparse schedule (tile_of/blk/off arrays, same machinery as
ops/knn_loss.py pass B), and Mosaic's auto-pipeline streams the depth-sorted
pair-payload rows as TWO adjacent 32-lane blocks per step; the unaligned
chunk window [tile_start + c*chunk, +chunk) is cut out in-kernel with one
dynamic sublane roll. This keeps the pair payload at its NARROW 32-lane
width end to end: HBM stores narrow arrays packed (a [1M,32] f32 array is
134 MB on device, measured — NOT 128-lane tile padded), so the previous
[*, 128] payload + manual-DMA design moved 4x the necessary bytes and needed
a 537 MB lane-pad materialization every step (1.63 ms). Manual DMA cannot
move <128-lane slabs (Mosaic compile error, measured) — auto-pipelined
BlockSpecs can, which is what forces the chunk-grid structure.

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
With the 32-lane payload these matmuls stream M=32 rows instead of 128 —
the same products in 4x fewer MXU cycles. Median (T=0.5 crossing) channels
use the same trick with a one-hot `sel` mask. All finalization
(forward.cu:757-821) happens in-kernel; the output is a packed
[tiles, 24, 256] channel-major tensor reassembled outside.

Scan masks and the row iota live in VMEM scratch (built once at grid step
0): Mosaic does not hoist iota+compare invariants out of the grid loop, and
rebuilding them per chunk would cost more than the blend itself.

The backward kernel visits each tile's chunks TWICE through one schedule
(ascending: transmittance checkpoints; then descending: gradient rows with
the suffix-sum alpha chain), writes every chunk of the gradient array —
saturation-dead chunks as zeros, so no caller-side masking pass exists —
and emits rows PADDED BACK to 128 lanes via ordered manual write-DMA:
narrow (<64 lane) permute-gathers lower to a column-major per-channel loop
(measured 38 ns/row vs 11 at >=64 lanes), so the cotangent that feeds the
downstream un-permute must stay wide even though the payload itself is
narrow. Tiles write in ascending order, so a tile's final partial chunk
(which extends into its successor's rows) is corrected by the successor's
own writes — deterministic, unlike the reference's atomics
(backward.cu:878-1016).
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
GRAD_PAD = 128   # backward gradient-row width (permute-safe; see module doc)

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


def _scan_sublane(x, op, identity, masks_ref):
    """Inclusive scan along axis 0 of [C, P] via log2(C) masked rolls.
    masks_ref: VMEM scratch [log2(C), C, P] bool (built once at grid step 0;
    Mosaic does not hoist the iota+compare invariants out of the grid loop)."""
    k = 1
    i = 0
    C = x.shape[0]
    while k < C:
        shifted = pltpu.roll(x, k, axis=0)
        x = op(x, jnp.where(masks_ref[i], shifted, identity))
        k *= 2
        i += 1
    return x


def _cumprod_sublane(x, masks_ref):
    return _scan_sublane(x, jnp.multiply, 1.0, masks_ref)


def _cumsum_sublane(x, masks_ref):
    return _scan_sublane(x, jnp.add, 0.0, masks_ref)


def _n_scan_steps(c):
    n, k = 0, 1
    while k < c:
        n += 1
        k *= 2
    return n


def _build_invariants(masks_ref, rowid_ref, chunk):
    """Grid-step-0 setup: scan masks + row iota into VMEM scratch."""
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, PIX), 0)
    rowid_ref[...] = row
    k = 1
    i = 0
    while k < chunk:
        masks_ref[i] = row >= k
        k *= 2
        i += 1


def _tile_pixels(t, params_ref):
    """Per-tile pixel coordinate rows/cols (cheap; rebuilt per grid step)."""
    grid_x = params_ref[4].astype(jnp.int32)
    tx = ((t % grid_x) * TILE).astype(jnp.float32)
    ty = ((t // grid_x) * TILE).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    pxf_col = tx + (lane % TILE).astype(jnp.float32)
    pyf_col = ty + (lane // TILE).astype(jnp.float32)
    return pxf_col, pyf_col


def _window_block(pay1_ref, pay2_ref, off, chunk):
    """Cut the unaligned [chunk, W] window out of two adjacent blocks."""
    two = jnp.concatenate([pay1_ref[...], pay2_ref[...]], axis=0)
    return pltpu.roll(two, -off, axis=0)[:chunk]


def _alphas_of(block, pxf, pyf, rowid, rows_left):
    """Shared alpha evaluation (e-folded conic: the -0.5 of the quadratic and
    the exp->exp2 rescale fold into [C,1] conic columns so the [C,PIX] power
    chain is 7 ops; NOTE power2 reassociates the reference's quadratic — the
    passes mask can flip for splats exactly on a pixel boundary, see
    tests/test_rasterize_pallas.py)."""
    S = PAYLOAD_SLICES
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
    inrow = rowid < rows_left
    passes = inrow & (power2 <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(passes, alpha, 0.0)
    return dx, dy, e2, alpha_raw, alpha, passes, a, (c0e, c1e, c2e)


def _forward_kernel(
    # scalar prefetch
    tile_of_ref, c_of_ref, blk_ref, off_ref, tile_count_ref, params_ref,
    # tensor inputs: two adjacent 32-lane payload blocks covering the window
    pay1_ref, pay2_ref,
    # output
    out_ref,
    # scratch
    acc_w, acc_wx, acc_wy, med, state, masks_s, rowid_s,
    *, chunk: int, max_chunks: int, num_tiles: int,
):
    # every step is real: the grid's dynamic bound is exactly the schedule
    # total, so tile_of[g] < num_tiles for all executed steps
    g = pl.program_id(0)
    t = tile_of_ref[g]
    is_first = jnp.logical_or(
        g == 0, tile_of_ref[jnp.maximum(g - 1, 0)] != t)
    is_last = tile_of_ref[g + 1] != t
    c = c_of_ref[g]
    count = jnp.minimum(tile_count_ref[t], chunk * max_chunks)

    focal_x = params_ref[0]
    focal_y = params_ref[1]
    half_w = params_ref[2]
    half_h = params_ref[3]

    @pl.when(g == 0)
    def _():
        _build_invariants(masks_s, rowid_s, chunk)

    @pl.when(is_first)
    def _():
        acc_w[:] = jnp.zeros_like(acc_w)
        acc_wx[:] = jnp.zeros_like(acc_wx)
        acc_wy[:] = jnp.zeros_like(acc_wy)
        med[:] = jnp.zeros_like(med)
        state[:] = jnp.zeros_like(state)
        state[0, :] = jnp.ones((PIX,), jnp.float32)  # transmittance carry

    pxf_col, pyf_col = _tile_pixels(t, params_ref)
    pxf = pxf_col.reshape(1, PIX)
    pyf = pyf_col.reshape(1, PIX)
    rowid = rowid_s[...]
    mask1 = masks_s[0]

    # skip blending once every pixel saturated (front-to-back early out,
    # forward.cu:668-671); the block DMA streams regardless — the grid
    # pipeline stays regular (measured faster than irregular early exit)
    tmax = jnp.max(state[0, :])

    @pl.when(tmax >= T_STOP)
    def _():
        t_carry = state[0, :].reshape(1, PIX)
        block = _window_block(pay1_ref, pay2_ref, off_ref[g], chunk)
        S = PAYLOAD_SLICES
        dx, dy, _e2, _ar, _al, passes, a, _con = _alphas_of(
            block, pxf, pyf, rowid, count - c * chunk)
        om = 1.0 - a

        cum_raw = _cumprod_sublane(om, masks_s)        # inclusive
        p_incl = t_carry * cum_raw
        # exclusive product by shifting the inclusive one (a divide by om
        # costs ~2x; t_carry broadcast fills row 0)
        p_excl = jnp.where(mask1, pltpu.roll(p_incl, 1, axis=0), t_carry)
        include = passes & (p_incl >= T_STOP)
        w = jnp.where(include, a * p_excl, 0.0)

        # chunk-final transmittance = p_incl at the LAST include (p_incl is
        # non-increasing since om <= 1), i.e. the masked min — cheaper than
        # re-multiplying an effective-om product
        new_t = jnp.min(jnp.where(include, p_incl, t_carry), axis=0)
        state[0, :] = new_t

        # accumulate channel-major [F, PIX] (F = 32: the narrow payload rides
        # the MXU's streaming M rows — 4x fewer cycles than F = 128)
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

    # ---- finalize (forward.cu:757-821), all in [rows, PIX] layout ----
    @pl.when(is_last)
    def _():
        S = PAYLOAD_SLICES
        aw = acc_w[:]    # [F, PIX]
        awx = acc_wx[:]
        awy = acc_wy[:]
        # every include contributes w >= ALPHA_MIN * T_STOP (positive in
        # f32), so weight > 0 is exactly "any contributor"
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
        out_ref[0] = packed


def _kernel_params(focal_x, focal_y, width, height, grid_x, half_wh):
    """[6] f32 scalar-prefetch vector; half_wh may be traced (shard_map)."""
    if half_wh is None:
        half_wh = jnp.array([width / 2.0, height / 2.0], jnp.float32)
    head = jnp.array([focal_x, focal_y], jnp.float32)
    tail = jnp.array([float(grid_x), 0.0], jnp.float32)
    return jnp.concatenate([head, half_wh.astype(jnp.float32), tail])


def _chunk_schedule(tile_start, tile_count, *, num_tiles, chunk, max_chunks,
                    G):
    """Block-sparse (tile, chunk) schedule for the forward grid.

    nc_t = clip(ceil(count/chunk), 1, max_chunks) — every tile gets at least
    one step so its output block is always written (empty tiles finalize to
    the background). Returns prefetch arrays:
      tile_of [G+1] (sentinel num_tiles for slack steps, num_tiles+1 tail),
      c_of    [G]  chunk index within the tile,
      blk     [G]  128-row block index of the window's first block,
      off     [G]  sublane offset of the window within that block.
    """
    nc = jnp.clip(-(-tile_count // chunk), 1, max_chunks).astype(jnp.int32)
    cbase = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(nc).astype(jnp.int32)])
    total = cbase[num_tiles]
    g = jnp.arange(G, dtype=jnp.int32)
    # tile-of-step via boundary scatter + cumsum: jnp.searchsorted lowers to
    # ~11 binary-search gather rounds over [G] (profiled ~2 ms/step); one
    # T-element scatter + a [G] cumsum + two small-source gathers don't
    t = jnp.cumsum(jnp.zeros((G,), jnp.int32)
                   .at[cbase[1:num_tiles]].add(1, mode="drop"))
    t = jnp.minimum(t, num_tiles - 1)
    real = g < total
    tile_of = jnp.where(real, t, num_tiles)
    tile_of_ext = jnp.concatenate(
        [tile_of, jnp.full((1,), num_tiles + 1, jnp.int32)])
    c_of = jnp.where(real, g - cbase[t], 0)
    blk = jnp.where(real, tile_start[t] // chunk + c_of, 0)
    off = jnp.where(real, tile_start[t] % chunk, 0)
    return tile_of_ext, c_of, blk, off, total


def rasterize_pallas_forward(
    pair_payload: jnp.ndarray,   # [K + chunk, PAYLOAD_PAD(=32)] pair rows
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
    max_chunks: int = 512,
    interpret: bool = False,
    half_wh=None,
) -> jnp.ndarray:
    """Run the forward kernel; returns packed [T, OUT_PAD, PIX] channels.

    half_wh ([2] f32 array) overrides the ray-direction origin
    (u = (px - half_w)/focal): the tile-sharded path rasterizes an image
    strip whose local pixel (0, 0) is not the full image's corner; the value
    may be traced (it depends on lax.axis_index under shard_map).
    """
    K = pair_payload.shape[0] - chunk
    G = num_tiles + K // chunk
    params = _kernel_params(focal_x, focal_y, width, height, grid_x, half_wh)
    tile_of, c_of, blk, off, total = _chunk_schedule(
        tile_start, tile_count, num_tiles=num_tiles, chunk=chunk,
        max_chunks=max_chunks, G=G)
    W = pair_payload.shape[1]
    nsteps = _n_scan_steps(chunk)
    # DYNAMIC grid bound: the schedule arrays are statically G-sized, but
    # the grid runs only the真 `total` steps (a traced scalar; Mosaic
    # supports dynamic grid dims). Sizing the grid by the static capacity
    # instead costs ~0.5us of fixed per-step work for every unused chunk
    # slot — measured +15 ms/step on a scene using 1/6 of its capacity.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((chunk, W),
                         lambda g, tl, co, bk, of, tc, pr: (bk[g], 0)),
            pl.BlockSpec((chunk, W),
                         lambda g, tl, co, bk, of, tc, pr: (bk[g] + 1, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, OUT_PAD, PIX),
            lambda g, tl, co, bk, of, tc, pr: (
                jnp.minimum(tl[g], num_tiles - 1), 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, PIX), jnp.float32),
            pltpu.VMEM((W, PIX), jnp.float32),
            pltpu.VMEM((W, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((nsteps, chunk, PIX), jnp.bool_),
            pltpu.VMEM((chunk, PIX), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, chunk=chunk, max_chunks=max_chunks,
                          num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_PAD, PIX), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(tile_of, c_of, blk, off, tile_count, params, pair_payload, pair_payload)


def _backward_kernel(
    # scalar prefetch
    tile_of_ref, c_of_ref, blk_ref, off_ref, phase_ref, bslot_ref, bge2_ref,
    bmeta_ref, tile_start_ref, tile_count_ref, params_ref,
    # tensor inputs
    pay1_ref, pay2_ref, packed_ref, cot_ref,
    # outputs
    dpay_hbm,
    # scratch
    obuf, osem, tchk, state, mats, masks_s, rowid_s,
    *, chunk: int, max_chunks: int, num_tiles: int,
):
    """Gradient of the tile forward pass w.r.t. the pair payload.

    One schedule step per (tile, chunk, pass): each tile's chunks are visited
    ascending (pass A: transmittance checkpoints, with the same saturation
    early-stop as the forward) then descending (pass B: recompute
    alphas/weights, assemble the per-pair payload gradient rows with the same
    three-matmul structure as the forward, chain the alpha gradient with a
    suffix-sum carry). EVERY chunk's rows are written — saturation-dead
    chunks as zeros — so the output needs no masking pass. Writes go through
    an ordered 2-slot manual DMA ring (the row offsets are unaligned;
    GRAD_PAD = 128 lanes keeps the downstream un-permute off the narrow
    column-major slow path).

    Cross-step sequencing carries NO scalar state: pass B's liveness test
    reads the transmittance checkpoints pass A left in VMEM (dead chunks
    get a copied-forward checkpoint below T_STOP), and the write-ring slot/
    wait flags are prefetched schedule columns — an SMEM counter chain here
    serializes the scalar core against the vector pipeline on every step.
    """
    # every step is real (dynamic grid bound == schedule total)
    g = pl.program_id(0)
    t = tile_of_ref[g]
    prev = tile_of_ref[jnp.maximum(g - 1, 0)]
    is_first = jnp.logical_or(g == 0, prev != t)
    phase_b = phase_ref[g] > 0
    first_b = jnp.logical_and(
        phase_b, jnp.logical_or(g == 0, phase_ref[jnp.maximum(g - 1, 0)] == 0))
    c = c_of_ref[g]
    start = tile_start_ref[t]
    count = jnp.minimum(tile_count_ref[t], chunk * max_chunks)

    focal_x = params_ref[0]
    focal_y = params_ref[1]
    half_w = params_ref[2]
    half_h = params_ref[3]

    @pl.when(g == 0)
    def _():
        _build_invariants(masks_s, rowid_s, chunk)

    pxf_col, pyf_col = _tile_pixels(t, params_ref)
    pxf = pxf_col.reshape(1, PIX)
    pyf = pyf_col.reshape(1, PIX)
    rowid = rowid_s[...]
    mask1 = masks_s[0]

    S = PAYLOAD_SLICES
    OC = OUT_CHANNELS
    F = PAYLOAD_PAD

    # ---- pass A: transmittance checkpoints --------------------------------
    @pl.when(is_first)
    def _():
        tchk[0] = jnp.ones((PIX,), jnp.float32)

    @pl.when(~phase_b)
    def _():
        t_carry_row = tchk[c]
        active = jnp.max(t_carry_row) >= T_STOP

        @pl.when(active)
        def _():
            block = _window_block(pay1_ref, pay2_ref, off_ref[g], chunk)
            _dx, _dy, _e2, _ar, _al, passes, a, _con = _alphas_of(
                block, pxf, pyf, rowid, count - c * chunk)
            om = 1.0 - a
            t_carry = t_carry_row.reshape(1, PIX)
            cum_raw = _cumprod_sublane(om, masks_s)
            p_incl = t_carry * cum_raw
            include = passes & (p_incl >= T_STOP)
            # masked-min form of the chunk-final transmittance (see forward)
            new_t = jnp.min(jnp.where(include, p_incl, t_carry), axis=0)
            tchk[c + 1] = new_t

        @pl.when(~active)
        def _():
            # copy the (saturated) checkpoint forward so pass B's liveness
            # test — max(tchk[c]) >= T_STOP — reads initialized memory
            tchk[c + 1] = t_carry_row

    # ---- pass B setup: un-finalize the output cotangents once per tile ----
    # (all [rows, PIX]; built into the `mats` scratch: rows [0:F) = M1,
    # [F:2F) = M2, ... [5F:6F) = N3)
    @pl.when(first_b)
    def _():
        pk = packed_ref[0]       # [OUT_PAD, PIX]
        ct = cot_ref[0]
        W_ = pk[OC["weight"], :]                          # [1, PIX]
        anyc = W_ > 0.0
        safe_W = jnp.where(anyc, W_, 1.0)
        cot_W = ct[OC["weight"], :]

        cot_rgb = ct[OC["color"], :]                      # [3, PIX]
        cot_tng = ct[OC["tongue"], :]

        ec = pk[OC["coord"], :]                           # already divided
        cot_ec = ct[OC["coord"], :]
        cot_Ac = jnp.where(anyc, cot_ec / safe_W, 0.0)
        cot_W = cot_W - jnp.where(anyc, jnp.sum(cot_ec * ec, axis=0, keepdims=True) / safe_W, 0.0)

        u_pix = (pxf_col - half_w) / focal_x
        v_pix = (pyf_col - half_h) / focal_y
        ln_row = jnp.sqrt(u_pix * u_pix + v_pix * v_pix + 1.0).reshape(1, PIX)
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

        # cotangent matrices for the three-matmul structure, stored
        # transposed [F, PIX]: G = B@M1 + dx*(B@M2) + dy*(B@M3) contracting
        # F, and dB += w@M1^T + (w dx)@M2^T + (w dy)@M3^T contracting PIX.
        # Built by pure concatenation along the payload row layout:
        # [0:2 mean2d][2:5 conic][5 opacity][6:9 rgb][9 tongue][10:13 vp]
        # [13:19 cp][19:21 rp][21 ts][22:25 normal][25 ones][pad]
        z1 = jnp.zeros((1, PIX), jnp.float32)

        def build_m(rgb3, tng1, vp3, cp6, rp2, ts1, n3, ones1):
            return jnp.concatenate(
                [jnp.zeros((6, PIX), jnp.float32), rgb3, tng1, vp3, cp6, rp2,
                 ts1, n3, ones1, jnp.zeros((F - 26, PIX), jnp.float32)],
                axis=0)

        zero3 = jnp.zeros((3, PIX), jnp.float32)
        zero6 = jnp.zeros((6, PIX), jnp.float32)
        ac0 = cot_Ac[0:1, :]
        ac1 = cot_Ac[1:2, :]
        ac2 = cot_Ac[2:3, :]
        ad1 = cot_Ad
        mats[0:F] = build_m(cot_rgb, cot_tng, cot_Ac, zero6,
                            jnp.zeros((2, PIX), jnp.float32), ad1,
                            cot_An, cot_W)
        cp_x = jnp.concatenate([ac0, z1, ac1, z1, ac2, z1], axis=0)
        cp_y = jnp.concatenate([z1, ac0, z1, ac1, z1, ac2], axis=0)
        mats[F:2 * F] = build_m(zero3, z1, zero3, cp_x,
                                jnp.concatenate([ad1, z1], 0), z1, zero3, z1)
        mats[2 * F:3 * F] = build_m(zero3, z1, zero3, cp_y,
                                    jnp.concatenate([z1, ad1], 0), z1,
                                    zero3, z1)
        # median cotangent matrices (routed to the selected splat only)
        mc0 = cot_mc[0:1, :]
        mc1 = cot_mc[1:2, :]
        mc2 = cot_mc[2:3, :]
        mt1 = cot_mt
        mats[3 * F:4 * F] = build_m(zero3, z1, cot_mc, zero6,
                                    jnp.zeros((2, PIX), jnp.float32), mt1,
                                    zero3, z1)
        mats[4 * F:5 * F] = build_m(
            zero3, z1, zero3, jnp.concatenate([mc0, z1, mc1, z1, mc2, z1], 0),
            jnp.concatenate([mt1, z1], 0), z1, zero3, z1)
        mats[5 * F:6 * F] = build_m(
            zero3, z1, zero3, jnp.concatenate([z1, mc0, z1, mc1, z1, mc2], 0),
            jnp.concatenate([z1, mt1], 0), z1, zero3, z1)

        state[0, :] = jnp.zeros((PIX,), jnp.float32)      # suffix carry S
        state[1, :] = jnp.zeros((PIX,), jnp.float32)      # med_done flag
        state[2, :] = (ct[OC["t_final"], :]
                       * pk[OC["t_final"], :]).reshape(PIX)  # cotT * Tfin

    # ---- pass B: gradient rows, back-to-front -----------------------------
    @pl.when(phase_b)
    def _():
        # chunk c was processed by pass A iff its entry checkpoint was
        # unsaturated — the same condition pass A used
        live = jnp.max(tchk[c]) >= T_STOP
        slot = bslot_ref[g]

        @pl.when(live)
        def _():
            block = _window_block(pay1_ref, pay2_ref, off_ref[g], chunk)
            dx, dy, e2, alpha_raw, alpha, passes, a, (c0e, c1e, c2e) = \
                _alphas_of(block, pxf, pyf, rowid, count - c * chunk)
            om = 1.0 - a
            t_carry = tchk[c].reshape(1, PIX)
            cum_raw = _cumprod_sublane(om, masks_s)
            p_incl = t_carry * cum_raw
            p_excl = jnp.where(mask1, pltpu.roll(p_incl, 1, axis=0), t_carry)
            include = passes & (p_incl >= T_STOP)
            w = jnp.where(include, a * p_excl, 0.0)

            dims = (((1,), (0,)), ((), ()))
            mm = functools.partial(jax.lax.dot_general,
                                   dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
            M1 = mats[0:F]
            M2 = mats[F:2 * F]
            M3 = mats[2 * F:3 * F]
            N1 = mats[3 * F:4 * F]
            N2 = mats[4 * F:5 * F]
            N3 = mats[5 * F:6 * F]
            G1 = mm(block, M1)     # [C, PIX]
            G2m = mm(block, M2)
            G3 = mm(block, M3)
            Gq = G1 + dx * G2m + dy * G3

            # median selection for this chunk (route once, from the back)
            mmask = include & (p_excl > MEDIAN_T)
            midx = jnp.max(jnp.where(mmask, rowid, -1), axis=0)   # [PIX]
            sel_raw = jnp.where((rowid == midx[None, :]) & mmask, 1.0, 0.0)
            not_done = (state[1, :] == 0.0).reshape(1, PIX)
            sel = sel_raw * not_done
            state[1, :] = jnp.maximum(state[1, :],
                                      (midx >= 0).astype(jnp.float32))

            H2 = mm(block, N2)
            H3 = mm(block, N3)

            # alpha gradient:
            # da = inc * (P_excl*G - S_after/(1-a) - cotT*Tfin/(1-a))
            u = w * Gq
            pref = _cumsum_sublane(u, masks_s)
            total_u = pref[chunk - 1:chunk, :]
            s_after = state[0, :].reshape(1, PIX) + (total_u - pref)
            tfin_term = state[2, :].reshape(1, PIX)
            da = jnp.where(include,
                           p_excl * Gq - (s_after + tfin_term) / om, 0.0)
            state[0, :] = (state[0, :].reshape(1, PIX) + total_u).reshape(PIX)

            notcl = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
            dpow = da * alpha * notcl   # dL/d(natural-log power)
            dop_pp = da * e2 * notcl
            # accumulate per-pair rows: dB = w@M1^T + (w dx)@M2^T + ...
            def acc(Wmat, M):  # [C,PIX] x [F,PIX] -> [C,F]
                return jax.lax.dot_general(
                    Wmat, M, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dB = acc(w, M1) + acc(w * dx, M2) + acc(w * dy, M3)
            dB = dB + acc(sel, N1) + acc(sel * dx, N2) + acc(sel * dy, N3)

            # -c0 = 2*ln2*c0e, -c1 = ln2*c1e (e-folded conic): fold the ln2
            # into one dpow rescale, the 2x into [C,1] columns
            dpl = dpow * LN2
            c0e2 = c0e * 2.0
            c2e2 = c2e * 2.0
            ddx = dpl * (c0e2 * dx + c1e * dy) + w * G2m + sel * H2
            ddy = dpl * (c2e2 * dy + c1e * dx) + w * G3 + sel * H3
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
            obuf[slot] = jnp.pad(dB, ((0, 0), (0, GRAD_PAD - F)))

        @pl.when(~live)
        def _():
            obuf[slot] = jnp.zeros((chunk, GRAD_PAD), jnp.float32)

        # ordered 2-slot write ring: before reusing a slot, drain the write
        # issued two B-steps ago on it (the wait matches on semaphore +
        # size, so the descriptor's destination offset is immaterial)
        @pl.when(bge2_ref[g] > 0)
        def _():
            pltpu.make_async_copy(
                obuf.at[slot], dpay_hbm.at[pl.ds(0, chunk)],
                osem.at[slot]).wait()

        row0 = start + c * chunk
        pltpu.make_async_copy(
            obuf.at[slot], dpay_hbm.at[pl.ds(row0, chunk)],
            osem.at[slot]).start()

    # drain the last (up to two) in-flight writes at the end of the grid
    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        nb = bmeta_ref[0]

        @pl.when(nb >= 1)
        def _():
            s0 = jax.lax.rem(nb - 1, 2)
            pltpu.make_async_copy(
                obuf.at[s0], dpay_hbm.at[pl.ds(0, chunk)],
                osem.at[s0]).wait()

        @pl.when(nb >= 2)
        def _():
            s1 = jax.lax.rem(nb, 2)
            pltpu.make_async_copy(
                obuf.at[s1], dpay_hbm.at[pl.ds(0, chunk)],
                osem.at[s1]).wait()


def _chunk_schedule_bwd(tile_start, tile_count, *, num_tiles, chunk,
                        max_chunks, G2):
    """Backward schedule: each tile's chunks ascending (pass A) then
    descending (pass B); phase flags prefetched."""
    nc = jnp.clip(-(-tile_count // chunk), 1, max_chunks).astype(jnp.int32)
    base2 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(2 * nc).astype(jnp.int32)])
    total2 = base2[num_tiles]
    g = jnp.arange(G2, dtype=jnp.int32)
    # boundary scatter + cumsum instead of searchsorted (see _chunk_schedule)
    t = jnp.cumsum(jnp.zeros((G2,), jnp.int32)
                   .at[base2[1:num_tiles]].add(1, mode="drop"))
    t = jnp.minimum(t, num_tiles - 1)
    real = g < total2
    j = jnp.where(real, g - base2[t], 0)
    phase = (j >= nc[t]).astype(jnp.int32)
    c = jnp.where(phase > 0, 2 * nc[t] - 1 - j, j)
    tile_of = jnp.where(real, t, num_tiles)
    tile_of_ext = jnp.concatenate(
        [tile_of, jnp.full((1,), num_tiles + 1, jnp.int32)])
    blk = jnp.where(real, tile_start[t] // chunk + c, 0)
    off = jnp.where(real, tile_start[t] % chunk, 0)
    # write-ring sequencing, fully precomputed so the kernel carries NO
    # cross-step scalar state (an SMEM counter chain serializes the scalar
    # core against the vector pipeline every grid step)
    bcum = jnp.cumsum(phase) - phase          # exclusive B-step count
    bslot = jnp.where(real, bcum % 2, 0)
    bge2 = jnp.where(real, (bcum >= 2).astype(jnp.int32), 0)
    nb = jnp.sum(jnp.where(real, phase, 0))
    bmeta = jnp.stack([nb]).astype(jnp.int32)
    return tile_of_ext, c, blk, off, phase, bslot, bge2, bmeta, total2


def rasterize_pallas_backward(
    pair_payload, tile_start, tile_count, packed, cot_packed,
    *, num_tiles, grid_x, width, height, focal_x, focal_y,
    chunk: int = 128, max_chunks: int = 512, interpret: bool = False,
    half_wh=None,
):
    """Returns d pair_payload [K+chunk, GRAD_PAD].

    EVERY row of every tile's chunk range is written (saturation-dead chunks
    as zeros); only the capacity slack past the last tile's aligned end — and
    the final `chunk` pad rows — remain unwritten, which the caller redirects
    to a zeroed row (ops/rasterize.py)."""
    K = pair_payload.shape[0] - chunk
    G2 = 2 * (num_tiles + K // chunk)
    params = _kernel_params(focal_x, focal_y, width, height, grid_x, half_wh)
    (tile_of, c_of, blk, off, phase, bslot, bge2, bmeta,
     total2) = _chunk_schedule_bwd(
        tile_start, tile_count, num_tiles=num_tiles, chunk=chunk,
        max_chunks=max_chunks, G2=G2)
    W = pair_payload.shape[1]
    nsteps = _n_scan_steps(chunk)
    # dynamic grid bound (see rasterize_pallas_forward)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(total2,),
        in_specs=[
            pl.BlockSpec(
                (chunk, W),
                lambda g, tl, co, bk, of, ph, bs, b2, bm, ts, tc, pr: (
                    bk[g], 0)),
            pl.BlockSpec(
                (chunk, W),
                lambda g, tl, co, bk, of, ph, bs, b2, bm, ts, tc, pr: (
                    bk[g] + 1, 0)),
            pl.BlockSpec(
                (1, OUT_PAD, PIX),
                lambda g, tl, co, bk, of, ph, bs, b2, bm, ts, tc, pr: (
                    jnp.minimum(tl[g], num_tiles - 1), 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, OUT_PAD, PIX),
                lambda g, tl, co, bk, of, ph, bs, b2, bm, ts, tc, pr: (
                    jnp.minimum(tl[g], num_tiles - 1), 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, GRAD_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((max_chunks + 1, PIX), jnp.float32),
            pltpu.VMEM((8, PIX), jnp.float32),
            pltpu.VMEM((6 * PAYLOAD_PAD, PIX), jnp.float32),
            pltpu.VMEM((nsteps, chunk, PIX), jnp.bool_),
            pltpu.VMEM((chunk, PIX), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_backward_kernel, chunk=chunk,
                          max_chunks=max_chunks, num_tiles=num_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K + chunk, GRAD_PAD), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
    )(tile_of, c_of, blk, off, phase, bslot, bge2, bmeta, tile_start,
      tile_count, params, pair_payload, pair_payload, packed, cot_packed)
