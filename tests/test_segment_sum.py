"""CSR segment-sum kernels (interpret mode) vs the jnp oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from ed3dgs_tpu.ops.segment_sum import (segment_sum_rows,
                                        segment_sum_rows_packed,
                                        segment_sum_rows_ref)


def _random_csr(rng, R, S):
    cuts = np.sort(rng.integers(0, R + 1, S + 1))
    cuts[0], cuts[-1] = 0, R
    return (jnp.asarray(cuts[:-1], jnp.int32),
            jnp.asarray(cuts[1:], jnp.int32))


@pytest.mark.parametrize("R,S", [(700, 40), (1500, 300), (64, 200)])
def test_segment_sum_rows_matches_ref(R, S):
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(R, 128)), jnp.float32)
    starts, ends = _random_csr(rng, R, S)
    out = segment_sum_rows(rows, starts, ends, chunk=64, interpret=True)
    ref = segment_sum_rows_ref(rows, starts, ends)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("F", [26, 32, 7])
@pytest.mark.parametrize("R,S", [(701, 40), (1502, 300)])
def test_segment_sum_rows_packed_matches_ref(F, R, S):
    """Packed (4 pairs / 128-lane row) variant: narrow rows, odd counts,
    empty segments, unaligned CSR bounds."""
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.normal(size=(R, F)), jnp.float32)
    starts, ends = _random_csr(rng, R, S)
    out = segment_sum_rows_packed(rows, starts, ends, chunk=16,
                                  interpret=True)
    ref = segment_sum_rows_ref(rows, starts, ends)
    assert out.shape == (S, F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-5)


def test_segment_sum_rows_packed_empty_and_full():
    rng = np.random.default_rng(2)
    R, S = 260, 130
    rows = jnp.asarray(rng.normal(size=(R, 32)), jnp.float32)
    # one segment owns everything, the rest are empty
    starts = jnp.asarray([0] + [R] * (S - 1), jnp.int32)
    ends = jnp.full((S,), R, jnp.int32)
    out = segment_sum_rows_packed(rows, starts, ends, chunk=8,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(rows.sum(0)), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1:]), 0.0)
