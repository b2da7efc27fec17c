"""Fused embedding-KNN regularizer: loss + exact embedding gradient in one
Morton-windowed Pallas pass (plus a small far-pair pass), with NO per-pair
[P, E] tensor gathered or permuted in HBM.

The reference computes this loss as a torch fancy-index gather + autodiff
(train.py:231-235). At production scale (C=100k gaussians, K=20 neighbors,
P=2M pairs) every formulation that materializes per-pair embedding rows pays
an index-rate-bound gather: the round-3 two-pass design still spent 7.4 ms/
step gathering 4.1M rows of [*, 32] (measured ~1.8 ns/row on v5e, the
small-source gather floor) on top of ~3.8 ms of kernels.

This rewrite exploits SPATIAL LOCALITY instead. At cache-build time (the
KNN graph refreshes only on the densify cadence, so all build cost
amortizes to ~0):

  * gaussians are ordered by the Morton code of their positions; on a
    bench-scale random cloud ~80% of each point's 20 spatial NN then fall
    within +-384 ranks (surface clouds cluster tighter);
  * per 256-rank block, neighbor embeddings come from a CENTERED 3-block
    window (rows of rank blocks b-1, b, b+1 — contiguous, streamed by
    BlockSpec, no gather) plus a small per-block SPILL list of the distinct
    out-of-window neighbor ranks; the per-step gather shrinks from 4.1M
    rows (7.4 ms) to 0.7M (permutation + both spill lists, 1.3 ms);
  * inside the kernel every needed row is reconstructed by a one-hot
    membership matmul  g_t [E, 256] = src [S, E] (x) onehot [S, 256]
    contracted over the source dim. Measured on v5e: Mosaic lowers this
    pattern at >90 TF/s-equivalent — the full 392-block sweep including the
    loss math costs ~1.9 ms, ~3x cheaper than the gather it replaces. The
    output orientation matters: [E, 256] (wide lane dim) measured ~6x
    faster than [256, E] (0.24 vs 1.46 ms for the reconstruction sweep).
    The point's OWN row e_i is reconstructed the same way as a pseudo-
    neighbor (slot 0), so no operand ever needs an in-kernel transpose.

Gradients accumulate at BOTH endpoints of every pair without any scatter:

  * dL/de_i accumulates in-register per block (output column block);
  * dL/de_j for IN-WINDOW pairs accumulates into a per-block [E, 768]
    window image via the transposed one-hot contraction; the overlapping
    per-block window images are summed afterwards by three STATIC band
    shifts (window offsets are structurally b-1, b, b+1, and the clamped
    edge bands route to the same clamped blocks the builder used);
  * dL/de_j for FAR pairs (the ~20% tail) is recomputed by a second, small
    scheduled pass that groups far pairs by the block of their *neighbor*
    j (256-pair chunks, block-sparse schedule like the round-3 CSR pass):
    there e_j is window-local — its gradient joins the same banded window
    image — and e_i is reconstructed from a second per-block spill list.
    Each far pair costs two one-hot reconstructions and one contraction,
    all MXU work, instead of a gather + sort + scatter.

Spill lists and the far-pair list have static capacities (adaptive buckets,
chosen by the trainer like the rasterizer's pair capacity); overflow is
surfaced in `KnnGraph.overflow`, and overflowing pairs are dropped
deterministically (their w forced to 0) until the trainer re-prepares with
the next bucket. With `pts=None` the ordering is identity (correct for any
input; window locality only by luck) — tests use both.

Accumulation order is fixed by the schedule, so gradients are bit-exactly
deterministic — unlike the reference's CUDA atomics (backward.cu:878-1013).

The custom_vjp computes everything in the forward and the backward is just
a scalar multiply, so value_and_grad costs one evaluation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BA = 256            # ranks per block
_FB = 1024           # far pairs per schedule chunk: the far pass is grid-
#                      step-overhead bound (~0.8 us/step; 2441 steps = 1.9 ms
#                      at bench shape with 256-pair chunks), and its matmuls
#                      are tiny — wider chunks halve the step count for the
#                      same MXU work. 512 -> 1024 measured after the round-5
#                      Morton fix made most far chunks LIVE (n_far ~665k).
_WIN = 3 * _BA       # centered window rows per block
_EPS = 1e-20         # matches train/losses.py sqrt epsilon
_BIG = 2147480000   # plain int: a module-level jnp call would
#                     initialize the backend before jax.distributed


class KnnGraph(NamedTuple):
    """Prepared KNN graph (build once per cache refresh, reuse every step).

    Rank space = Morton order of the positions; na = Cp//256 blocks.
    Capacities (SPA, SPB, FAR) are static shapes.
    """
    pi: jnp.ndarray          # [Cp] s32 rank -> original id
    inv: jnp.ndarray         # [Cp] s32 id -> rank
    lidx_a: jnp.ndarray      # [na*K1p, 256] s32 per-slot local source index:
    #                          [0,768) window, [768, 768+SPA) spill,
    #                          == 768+SPA for dropped (overflow) slots.
    #                          Row kk=0 of each block is the point itself.
    aux_a: jnp.ndarray       # [na*K1p, 256] f32: row 0 = coef_i,
    #                          rows 1..K = w_ik (0 for dropped slots)
    spill_a: jnp.ndarray     # [na, SPA] s32 id-space gather rows (pad 0)
    spill_b: jnp.ndarray     # [na, SPB] s32 id-space far-i gather rows
    far_aux: jnp.ndarray     # [8, FAR] f32 far pairs sorted by j-block:
    #                          rows 0=w 1=coef 2=lidx_i (spill_b-local)
    #                          3=lidx_j (window-local) 4=j-block id
    blk_f: jnp.ndarray       # [Gf] s32 far-pass schedule: j-block per step
    chp_f: jnp.ndarray       # [Gf] s32 far-pass chunk index per step
    live_f: jnp.ndarray      # [Gf] s32 1 for real schedule steps, 0 for the
    #                          capacity-padding steps (compute skipped)
    overflow: jnp.ndarray    # [3] s32 dropped counts: (spill_a, spill_b, far)
    n_far: jnp.ndarray       # [] s32 TRUE far-pair demand — lets the trainer
    #                          shrink an oversized far bucket (each unused
    #                          256-pair capacity chunk costs a padding grid
    #                          step in the far pass, ~0.9 us each)
    ktag: jnp.ndarray        # [K] s32 zeros: the SHAPE statically records the
    #                          K this graph was prepared with, so a caller
    #                          passing a mismatched k errors instead of
    #                          silently misreading neighbor slots


def _morton_ranks(pts: jnp.ndarray, Cp: int, valid: jnp.ndarray | None = None):
    """Morton (z-order) rank permutation of [C, 3] points, padded to Cp.
    10 bits/axis; pad rows sort stably to the end.

    `valid` masks rows included in the quantization bounds: callers
    (train/trainer.py update_knn_cache) park dead capacity slots on a far
    shell at ~1e3, and a min/max box spanning that shell collapses the real
    cloud (extent ~5) into a handful of Morton cells — the ranks degenerate
    to near-random order and the window kernels see ~85%% far pairs instead
    of ~15%% (measured; this exact bug shipped in round 4). Invalid rows
    clip to the top boundary cell, which is where dead slots belong."""
    C = pts.shape[0]
    if valid is None:
        lo = jnp.min(pts, axis=0)
        hi = jnp.max(pts, axis=0)
    else:
        v = valid[:, None]
        lo = jnp.min(jnp.where(v, pts, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(v, pts, -jnp.inf), axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)   # all-dead safety
        hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    q = jnp.clip((pts - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0, 0, 1023)
    q = q.astype(jnp.int32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    code = jnp.concatenate([code, _BIG + jnp.arange(Cp - C, dtype=jnp.int32)])
    pi = jnp.argsort(code, stable=True).astype(jnp.int32)
    inv = jnp.zeros((Cp,), jnp.int32).at[pi].set(
        jnp.arange(Cp, dtype=jnp.int32))
    return pi, inv


def _sort_two_key(primary: jnp.ndarray, secondary: jnp.ndarray):
    """Stable order by (primary, secondary) via two stable argsorts
    (avoids building a combined key that could overflow int32)."""
    o1 = jnp.argsort(secondary, stable=True)
    o2 = jnp.argsort(primary[o1], stable=True)
    return o1[o2]


def _positions_in_block(blk: jnp.ndarray, key: jnp.ndarray, nb: int,
                        capacity: int):
    """For (blk, key) pairs sorted by (blk, key): the position of each
    entry's DISTINCT key within its block, the [nb, capacity] table of
    distinct keys (pad 0), and the dropped-distinct count. Entries with
    key >= _BIG are invalid (sorted last within their block)."""
    prev_b = jnp.concatenate([jnp.full((1,), -1, jnp.int32), blk[:-1]])
    prev_k = jnp.concatenate([jnp.full((1,), -1, jnp.int32), key[:-1]])
    valid = key < _BIG
    is_new = valid & ((blk != prev_b) | (key != prev_k))
    snew = jnp.cumsum(is_new.astype(jnp.int32))
    starts = jnp.searchsorted(blk, jnp.arange(nb, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32), snew])[starts]
    pos = jnp.where(valid, snew - 1 - base[jnp.clip(blk, 0, nb - 1)], 0)
    overflow = jnp.sum(((pos >= capacity) & is_new).astype(jnp.int32))
    ok = valid & (pos < capacity)
    table = jnp.zeros((nb, capacity), jnp.int32).at[
        jnp.where(ok, blk, nb - 1), jnp.where(ok, pos, capacity - 1)].set(
            jnp.where(ok, key, 0), mode="drop")
    return pos, table, overflow


def prepare_knn_graph(idx: jnp.ndarray, w: jnp.ndarray, coef: jnp.ndarray,
                      pts: Optional[jnp.ndarray] = None, *,
                      pts_valid: Optional[jnp.ndarray] = None,
                      spill_a: int = 512, spill_b: int = 512,
                      far_capacity: Optional[int] = None) -> KnnGraph:
    """Cache-time preparation. idx/w: [C, K]; coef: [C] (already includes
    the mask and normalization, i.e. loss = Sum_ik coef_i sqrt(d2 w + eps));
    pts: [C, 3] positions for the Morton ordering (None -> identity order);
    pts_valid: [C] bool rows included in the Morton quantization bounds —
    pass it whenever dead rows are parked on a far shell, or the shell
    stretches the quantization box and destroys the ordering's locality
    (see _morton_ranks).

    spill_a / spill_b / far_capacity must be multiples of 256; far_capacity
    None sizes the far list for the worst case (exact for any input —
    production passes a measured bucket instead). All shapes are static, so
    this is eval_shape-safe; overflow decisions live with the caller."""
    C, K = idx.shape
    Cp = C + (-C) % 1024
    na = Cp // _BA
    K1p = (K + 1) + (-(K + 1)) % 8
    if far_capacity is None:
        far_capacity = Cp * K
    # worst-case clamps: a spill list never holds more than Cp distinct
    # ranks, the far list never more than Cp*K pairs (keeps small problems
    # small regardless of the production-sized default buckets)
    spill_a = min(spill_a, Cp)
    spill_b = min(spill_b, Cp)
    far_capacity = min(far_capacity, Cp * K)
    far_capacity = far_capacity + (-far_capacity) % _FB   # whole chunks
    assert spill_a % _BA == 0 and spill_b % _BA == 0
    S_A = _WIN + spill_a

    idx_pad = jnp.concatenate(
        [idx.astype(jnp.int32),
         jnp.broadcast_to(jnp.arange(C, Cp, dtype=jnp.int32)[:, None],
                          (Cp - C, K))], axis=0)
    w_pad = jnp.pad(w.astype(jnp.float32), ((0, Cp - C), (0, 0)))
    coef_pad = jnp.pad(coef.astype(jnp.float32), (0, Cp - C))

    if pts is None:
        pi = jnp.arange(Cp, dtype=jnp.int32)
        inv = pi
    else:
        pi, inv = _morton_ranks(pts.astype(jnp.float32), Cp, pts_valid)

    nbr = inv[idx_pad[pi]]                       # [Cp, K] neighbor ranks
    w_r = w_pad[pi]
    coef_r = coef_pad[pi]

    rank = jnp.arange(Cp, dtype=jnp.int32)
    b_of = rank // _BA
    # window-local index: first (lowest d) of the three clamped 256-blocks
    # (b-1, b, b+1) that contains the neighbor rank
    base3 = jnp.stack([jnp.clip(b_of - 1, 0, na - 1),
                       b_of,
                       jnp.clip(b_of + 1, 0, na - 1)], axis=1) * _BA  # [Cp,3]
    off = nbr[:, None, :] - base3[:, :, None]    # [Cp, 3, K]
    inw = (off >= 0) & (off < _BA)
    lidx_win = jnp.full((Cp, K), -1, jnp.int32)
    for d in (2, 1, 0):
        lidx_win = jnp.where(inw[:, d, :], d * _BA + off[:, d, :], lidx_win)
    far = lidx_win < 0                           # [Cp, K]

    # ---- spill_a: distinct far neighbor ranks per i-block ----
    slot_b = jnp.broadcast_to(b_of[:, None], (Cp, K)).reshape(-1)
    slot_r = jnp.where(far, nbr, _BIG).reshape(-1)
    order_a = _sort_two_key(slot_b, jnp.minimum(slot_r, Cp))
    pos_a, table_a, ovf_a = _positions_in_block(
        slot_b[order_a], slot_r[order_a], na, spill_a)
    pos_slot = jnp.zeros((Cp * K,), jnp.int32).at[order_a].set(pos_a)
    dropped_a = jnp.zeros((Cp * K,), bool).at[order_a].set(pos_a >= spill_a)
    dropped_a = dropped_a.reshape(Cp, K) & far
    lidx_full = jnp.where(
        far, _WIN + jnp.minimum(pos_slot.reshape(Cp, K), spill_a - 1),
        lidx_win)
    lidx_full = jnp.where(dropped_a, S_A, lidx_full)
    w_eff = jnp.where(dropped_a, 0.0, w_r)

    # ---- far-pair list, sorted by neighbor rank (hence by j-block) ----
    fkey = jnp.where(far & ~dropped_a, nbr, _BIG).reshape(-1)
    order_f = jnp.argsort(fkey, stable=True)
    fj_all = fkey[order_f]
    n_far = jnp.sum((fj_all < _BIG).astype(jnp.int32))
    FAR = int(far_capacity)
    take = min(FAR, Cp * K)
    fi_all = (jnp.arange(Cp * K, dtype=jnp.int32) // K)[order_f]
    fw_all = w_eff.reshape(-1)[order_f]
    ovf_far = jnp.maximum(n_far - FAR, 0)
    fvalid = (jnp.arange(FAR, dtype=jnp.int32)
              < jnp.minimum(n_far, FAR))
    # invalid/pad rows map to rank Cp-1 so bjf stays sorted for the
    # schedule's searchsorted (their w/coef are zeroed below)
    fj_c = jnp.pad(jnp.where(fj_all < _BIG, fj_all, Cp - 1)[:take],
                   (0, FAR - take), constant_values=Cp - 1)
    fi_c = jnp.pad(fi_all[:take], (0, FAR - take))
    fw_c = jnp.pad(fw_all[:take], (0, FAR - take))
    fcoef_c = coef_r[fi_c]
    fw_c = jnp.where(fvalid, fw_c, 0.0)
    fcoef_c = jnp.where(fvalid, fcoef_c, 0.0)
    bjf = fj_c // _BA                            # [FAR] j-block per far pair
    lj = fj_c - jnp.clip(bjf - 1, 0, na - 1) * _BA   # window-local (mid)

    # ---- spill_b: distinct far-i ranks per j-block ----
    fkey_i = jnp.where(fvalid, fi_c, _BIG)
    order_b = _sort_two_key(bjf, jnp.minimum(fkey_i, Cp))
    pos_b, table_b, ovf_b = _positions_in_block(
        bjf[order_b], fkey_i[order_b], na, spill_b)
    li = jnp.zeros((FAR,), jnp.int32).at[order_b].set(
        jnp.minimum(pos_b, spill_b - 1))
    dropped_b = jnp.zeros((FAR,), bool).at[order_b].set(pos_b >= spill_b)
    fw_c = jnp.where(dropped_b, 0.0, fw_c)
    # propagate the spill_b drop back to the pair's (i, k) slot so an
    # overflowed pair is dropped CONSISTENTLY from loss, dL/de_i (main pass)
    # and dL/de_j (far pass) — order_f IS the flat pair index per far row
    fpid_c = jnp.pad(order_f[:take].astype(jnp.int32), (0, FAR - take))
    drop_hits = jnp.zeros((Cp * K,), jnp.int32).at[fpid_c].add(
        (dropped_b & fvalid).astype(jnp.int32))
    w_eff = jnp.where(drop_hits.reshape(Cp, K) > 0, 0.0, w_eff)

    z = jnp.zeros((FAR,), jnp.float32)
    far_aux = jnp.stack([
        fw_c, fcoef_c, li.astype(jnp.float32), lj.astype(jnp.float32),
        bjf.astype(jnp.float32), z, z, z], axis=0)       # [8, FAR]

    # ---- far-pass schedule: _FB-pair chunks covering each j-block's rows,
    # >=1 chunk per block so every window image gets zero-initialized ----
    blocks = jnp.arange(na, dtype=jnp.int32)
    starts = jnp.searchsorted(bjf, blocks, side="left").astype(jnp.int32)
    # invalid/pad far rows map to rank Cp-1, i.e. they sort to the LAST
    # block (na-1); clamping starts/ends to the valid prefix [0, n_far)
    # excludes them from every block's range
    nval = jnp.minimum(n_far, FAR)
    starts = jnp.minimum(starts, nval)
    ends = jnp.minimum(
        jnp.searchsorted(bjf, blocks, side="right").astype(jnp.int32), nval)
    first_ch = starts // _FB
    nch = jnp.maximum(1, -(-(ends - first_ch * _FB) // _FB))
    Gf = FAR // _FB + na + 1
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(nch).astype(jnp.int32)])
    g = jnp.arange(Gf, dtype=jnp.int32)
    blk_f = jnp.clip(jnp.searchsorted(cum, g, side="right").astype(jnp.int32)
                     - 1, 0, na - 1)
    chp_f = jnp.minimum(first_ch[blk_f] + g - cum[blk_f], FAR // _FB - 1)
    live_f = (g < cum[na]).astype(jnp.int32)

    # ---- blocked slot arrays [na*K1p, 256]: row 0 self, rows 1..K ----
    self_l = _BA + (rank - b_of * _BA)           # self is in the mid block
    lidx_rows = jnp.concatenate([self_l[:, None], lidx_full], axis=1)
    lidx_rows = jnp.pad(lidx_rows, ((0, 0), (0, K1p - (K + 1))),
                        constant_values=S_A)
    lidx_a = lidx_rows.reshape(na, _BA, K1p).transpose(0, 2, 1).reshape(
        na * K1p, _BA)
    aux_rows = jnp.concatenate([coef_r[:, None], w_eff], axis=1)
    aux_rows = jnp.pad(aux_rows, ((0, 0), (0, K1p - (K + 1))))
    aux_a = aux_rows.reshape(na, _BA, K1p).transpose(0, 2, 1).reshape(
        na * K1p, _BA).astype(jnp.float32)

    # the pad rows at the "wrong" copy of a clamped edge window are fine:
    # duplicated window copies hold identical values, and _band_sum routes
    # the clamped bands back to the same clamped blocks
    return KnnGraph(
        pi=pi, inv=inv, lidx_a=lidx_a, aux_a=aux_a,
        spill_a=pi[table_a], spill_b=pi[table_b], far_aux=far_aux,
        blk_f=blk_f, chp_f=chp_f, live_f=live_f,
        overflow=jnp.stack([ovf_a, ovf_b, ovf_far]).astype(jnp.int32),
        n_far=n_far.astype(jnp.int32),
        ktag=jnp.zeros((K,), jnp.int32))


def _main_kernel(lidx_ref, aux_ref, wlo_ref, wmid_ref, whi_ref, sp_ref,
                 de_ref, dj_ref, lp_ref, *, K: int, SPA: int):
    """Per 256-rank block: loss, dL/de_i, and the in-window half of dL/de_j.
    Every e-row is a one-hot reconstruction from [window ++ spill]; all
    tensors stay embedding-major ([E, .]) so the wide dim fills MXU lanes."""
    S = _WIN + SPA
    src = jnp.concatenate(
        [wlo_ref[...], wmid_ref[...], whi_ref[...], sp_ref[...]], axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    dims_r = (((0,), (0,)), ((), ()))   # [S,E] x [S,BA] -> [E,BA]
    dims_j = (((1,), (1,)), ((), ()))   # [E,BA] x [WIN,BA] -> [E,WIN]
    mm = functools.partial(jax.lax.dot_general,
                           preferred_element_type=jnp.float32)
    coef = aux_ref[0:1, :]
    E = src.shape[1]
    de = jnp.zeros((E, _BA), jnp.float32)
    dj = jnp.zeros((E, _WIN), jnp.float32)
    acc = jnp.float32(0.0)
    oh0 = (iota == lidx_ref[0:1, :]).astype(jnp.float32)
    e_t = mm(src, oh0, dims_r)                       # [E, BA] own rows
    for kk in range(1, K + 1):
        oh = (iota == lidx_ref[kk:kk + 1, :]).astype(jnp.float32)
        g_t = mm(src, oh, dims_r)
        diff = e_t - g_t
        d2 = jnp.sum(diff * diff, axis=0, keepdims=True)   # [1, BA]
        wk = aux_ref[kk:kk + 1, :]
        v = jnp.sqrt(d2 * wk + _EPS)
        acc += jnp.sum(coef * v)
        sd = (coef * wk / v) * diff
        de = de + sd
        dj = dj - mm(sd, oh[:_WIN], dims_j)
    de_ref[...] = de
    dj_ref[0] = dj
    lp_ref[...] = jnp.full(lp_ref.shape, acc, jnp.float32)


def _far_kernel(blk_s, chp_s, live_s, faux_ref, wlo_ref, wmid_ref, whi_ref,
                sp_ref, djf_ref, *, SPB: int):
    """dL/de_j of far pairs, grouped by j's 256-block: e_j is window-local
    (its gradient joins the banded window image), e_i comes from the second
    spill list. Revisits the same output block across consecutive grid
    steps; rows of other blocks sharing the chunk are masked out. Capacity-
    padding steps (live == 0) skip all compute — they revisit the last real
    block, which is already written (measured 0.86 us/step of dead matmuls
    without the skip: 5 ms at the worst-case capacity)."""
    g = pl.program_id(0)
    is_first = jnp.logical_or(g == 0, blk_s[jnp.maximum(g - 1, 0)] != blk_s[g])

    @pl.when(is_first)
    def _():
        djf_ref[0] = jnp.zeros_like(djf_ref[0])

    @pl.when(live_s[g] == 1)
    def _():
        _far_body(blk_s, g, faux_ref, wlo_ref, wmid_ref, whi_ref, sp_ref,
                  djf_ref, SPB)


def _far_body(blk_s, g, faux_ref, wlo_ref, wmid_ref, whi_ref, sp_ref,
              djf_ref, SPB):
    w = faux_ref[0:1, :]
    coef = faux_ref[1:2, :]
    li = faux_ref[2:3, :].astype(jnp.int32)
    lj = faux_ref[3:4, :].astype(jnp.int32)
    mine = (faux_ref[4:5, :] == blk_s[g].astype(jnp.float32)
            ).astype(jnp.float32)

    win = jnp.concatenate([wlo_ref[...], wmid_ref[...], whi_ref[...]], axis=0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (_WIN, 1), 0)
    isp = jax.lax.broadcasted_iota(jnp.int32, (SPB, 1), 0)
    dims_r = (((0,), (0,)), ((), ()))
    dims_j = (((1,), (1,)), ((), ()))
    mm = functools.partial(jax.lax.dot_general,
                           preferred_element_type=jnp.float32)
    oh_j = (iw == lj).astype(jnp.float32)            # [WIN, 256]
    oh_i = (isp == li).astype(jnp.float32)           # [SPB, 256]
    e_j = mm(win, oh_j, dims_r)                      # [E, 256]
    e_i = mm(sp_ref[...], oh_i, dims_r)
    diff = e_i - e_j
    d2 = jnp.sum(diff * diff, axis=0, keepdims=True)
    v = jnp.sqrt(d2 * w + _EPS)
    s = coef * w / v * mine
    djf_ref[0] += -mm(s * diff, oh_j, dims_j)        # [E, WIN]


def _band_sum(dj_blocks):
    """[na, E, 768] per-block window images -> [E, na*256] global image.
    The window of block b covers blocks (b-1, b, b+1) clamped at edges."""
    na = dj_blocks.shape[0]
    E = dj_blocks.shape[1]
    b0 = dj_blocks[:, :, 0:_BA]
    b1 = dj_blocks[:, :, _BA:2 * _BA]
    b2 = dj_blocks[:, :, 2 * _BA:3 * _BA]
    res = b1
    if na > 1:
        res = res.at[:na - 1].add(b0[1:])
        res = res.at[1:].add(b2[:na - 1])
    res = res.at[0].add(b0[0])            # clamped lo band of block 0
    res = res.at[na - 1].add(b2[na - 1])  # clamped hi band of the last block
    return jnp.transpose(res, (1, 0, 2)).reshape(E, na * _BA)


def _run(emb: jnp.ndarray, graph: KnnGraph, K: int, interpret: bool):
    C, E = emb.shape
    if K != graph.ktag.shape[0]:
        raise ValueError(
            f"knn_loss_fused called with k={K} but the graph was prepared "
            f"with K={graph.ktag.shape[0]} (neighbor slots would be "
            f"silently dropped or misread)")
    Cp = graph.pi.shape[0]
    na = Cp // _BA
    K1p = graph.lidx_a.shape[0] // na
    SPA = graph.spill_a.shape[1]
    SPB = graph.spill_b.shape[1]
    Gf = graph.blk_f.shape[0]
    emb_p = jnp.pad(emb.astype(jnp.float32), ((0, Cp - C), (0, 0)))

    # ONE gather feeds everything: the Morton-permuted table (rows [0, Cp))
    # and the spill rows of both passes. Splitting related gathers lets XLA
    # make independent VMEM-staging decisions for the source table —
    # measured one of them falling off the fast staged path (3.6 -> 20 ms)
    # inside the full train step (round 3). Indexing the spill sections
    # through BlockSpec block offsets is only correct when the offsets are
    # multiples of the block sizes — Cp // SPA silently truncates for e.g.
    # Cp=3072 with a 2048 bucket (advisor r4, high) — so the sections are
    # ALIGNED BY CONSTRUCTION: dummy index rows (gathering row 0, never read
    # by any kernel block) pad each section start up to a multiple of its
    # block size. Costs < SPA+SPB extra gathered rows; slicing the buffer
    # instead measured 0.9 ms/step of copies at the bench shape.
    off_a = Cp + (-Cp) % SPA
    off_b = off_a + na * SPA + (-(off_a + na * SPA)) % SPB
    total = off_b + na * SPB
    all_ids = jnp.zeros((total,), jnp.int32)
    all_ids = jax.lax.dynamic_update_slice(all_ids, graph.pi, (0,))
    all_ids = jax.lax.dynamic_update_slice(
        all_ids, graph.spill_a.reshape(-1), (off_a,))
    all_ids = jax.lax.dynamic_update_slice(
        all_ids, graph.spill_b.reshape(-1), (off_b,))
    gall = emb_p[all_ids]                            # [total, E]
    spa0 = off_a // SPA                              # exact by construction
    spb0 = off_b // SPB

    de_t, dj_blocks, lp = pl.pallas_call(
        functools.partial(_main_kernel, K=K, SPA=SPA),
        grid=(na,),
        in_specs=[
            pl.BlockSpec((K1p, _BA), lambda b: (b, 0)),
            pl.BlockSpec((K1p, _BA), lambda b: (b, 0)),
            pl.BlockSpec((_BA, E), lambda b: (jnp.maximum(b - 1, 0), 0)),
            pl.BlockSpec((_BA, E), lambda b: (b, 0)),
            pl.BlockSpec((_BA, E), lambda b: (jnp.minimum(b + 1, na - 1), 0)),
            pl.BlockSpec((SPA, E), lambda b: (spa0 + b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((E, _BA), lambda b: (0, b)),
            pl.BlockSpec((1, E, _WIN), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, Cp), jnp.float32),
            jax.ShapeDtypeStruct((na, E, _WIN), jnp.float32),
            jax.ShapeDtypeStruct((na, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(graph.lidx_a, graph.aux_a, gall, gall, gall, gall)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Gf,),
        in_specs=[
            pl.BlockSpec((8, _FB), lambda g, blk, chp, lv: (0, chp[g])),
            pl.BlockSpec((_BA, E),
                         lambda g, blk, chp, lv: (jnp.maximum(blk[g] - 1, 0),
                                                  0)),
            pl.BlockSpec((_BA, E), lambda g, blk, chp, lv: (blk[g], 0)),
            pl.BlockSpec((_BA, E),
                         lambda g, blk, chp, lv: (jnp.minimum(blk[g] + 1,
                                                              na - 1), 0)),
            pl.BlockSpec((SPB, E), lambda g, blk, chp, lv: (spb0 + blk[g], 0)),
        ],
        out_specs=pl.BlockSpec((1, E, _WIN),
                               lambda g, blk, chp, lv: (blk[g], 0, 0)),
    )
    djf_blocks = pl.pallas_call(
        functools.partial(_far_kernel, SPB=SPB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((na, E, _WIN), jnp.float32),
        interpret=interpret,
    )(graph.blk_f, graph.chp_f, graph.live_f, graph.far_aux,
      gall, gall, gall, gall)

    dj_t = _band_sum(dj_blocks + djf_blocks)         # [E, Cp]
    demb_rank = (de_t + dj_t).T                      # [Cp, E]
    demb = demb_rank[graph.inv[:C]]
    loss = jnp.sum(lp[:, 0, 0])
    return loss, demb


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def knn_loss_fused(emb, graph: KnnGraph, k: int, interpret: bool = False):
    loss, _ = _run(emb, graph, k, interpret)
    return loss


def _fused_fwd(emb, graph, k, interpret):
    loss, demb = _run(emb, graph, k, interpret)
    return loss, demb


def _fused_bwd(k, interpret, demb, g):
    return g * demb, None


knn_loss_fused.defvjp(_fused_fwd, _fused_bwd)


def knn_loss_ref(emb, idx, w, coef):
    """jnp oracle: Sum_ik coef_i sqrt(||e_i - e_j||^2 w_ik + eps)."""
    d2 = jnp.sum((emb[:, None, :] - emb[idx]) ** 2, axis=-1)
    return jnp.sum(coef[:, None] * jnp.sqrt(d2 * w + _EPS))
