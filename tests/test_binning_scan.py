"""Fused pair-slot scan kernel (ops/binning_scan.py) vs the XLA scan path.

The kernel fuses the three [K] scans + rect decode + key pack of bin_rows;
this test runs bin_rows both ways (FUSED_SCAN interpret vs None) on random
scenes and asserts identical BinnedPairs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ed3dgs_tpu.ops import binning


def _random_rows(rng, n, grid_x, grid_y):
    depth = rng.uniform(0.5, 5.0, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.2
    rmin = np.stack([rng.integers(0, grid_x, n), rng.integers(0, grid_y, n)], 1)
    spanx = rng.integers(1, 4, n)
    spany = rng.integers(1, 4, n)
    rmax = np.stack([np.minimum(rmin[:, 0] + spanx, grid_x),
                     np.minimum(rmin[:, 1] + spany, grid_y)], 1)
    tiles = np.where(valid, (rmax[:, 0] - rmin[:, 0]) * (rmax[:, 1] - rmin[:, 1]), 0)
    return (jnp.asarray(depth), jnp.asarray(valid),
            jnp.asarray(tiles.astype(np.int32)),
            jnp.asarray(rmin.astype(np.int32)), jnp.asarray(rmax.astype(np.int32)))


@pytest.mark.parametrize("n,gx,gy,cap", [(300, 7, 5, 2048), (1000, 11, 9, 8192)])
def test_fused_scan_matches_xla(n, gx, gy, cap):
    rng = np.random.default_rng(3)
    args = _random_rows(rng, n, gx, gy)

    def run(mode):
        old = binning.FUSED_SCAN
        binning.FUSED_SCAN = mode
        try:
            return binning.bin_rows(*args, grid_x=gx, grid_y=gy,
                                    pair_capacity=cap)
        finally:
            binning.FUSED_SCAN = old

    ref = run(None)          # pure-XLA scans
    fused = run(True)        # pallas kernel, interpret mode
    for name in ("pair_gauss", "pair_tile", "pair_perm", "tile_start",
                 "tile_count", "num_pairs"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, name)),
                                      np.asarray(getattr(fused, name)),
                                      err_msg=name)


def test_fused_scan_overflow_and_odd_capacity():
    # capacity overflow path: more pairs than slots; K stays 128-multiple
    rng = np.random.default_rng(11)
    args = _random_rows(rng, 2000, 13, 13, )
    ref = None
    for mode in (None, True):
        old = binning.FUSED_SCAN
        binning.FUSED_SCAN = mode
        try:
            out = binning.bin_rows(*args, grid_x=13, grid_y=13,
                                   pair_capacity=1024)
        finally:
            binning.FUSED_SCAN = old
        if ref is None:
            ref = out
        else:
            np.testing.assert_array_equal(np.asarray(ref.pair_tile),
                                          np.asarray(out.pair_tile))
            np.testing.assert_array_equal(np.asarray(ref.pair_gauss),
                                          np.asarray(out.pair_gauss))
    assert int(ref.num_pairs) > 1024


@pytest.mark.tpu
def test_fused_scan_compiled_matches_xla_tpu():
    """Compiled Mosaic path (incl. the SMEM carry across grid steps) vs the
    pure-XLA scans on a real TPU — the interpret-mode tests above can't
    cover the compiled lowering on CPU-only runners."""
    rng = np.random.default_rng(7)
    gx, gy, cap = 11, 9, 8192
    args = _random_rows(rng, 1000, gx, gy)
    ref = binning.bin_rows(*args, grid_x=gx, grid_y=gy, pair_capacity=cap,
                           fused_scan=None)
    fused = binning.bin_rows(*args, grid_x=gx, grid_y=gy, pair_capacity=cap,
                             fused_scan=False)
    for name in ("pair_gauss", "pair_tile", "pair_perm", "tile_start",
                 "tile_count", "num_pairs"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, name)),
                                      np.asarray(getattr(fused, name)),
                                      err_msg=name)
