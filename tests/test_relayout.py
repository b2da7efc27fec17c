"""Pallas relayout kernels (ops/relayout.py): packed tiles <-> image."""

import jax
import jax.numpy as jnp
import numpy as np

from ed3dgs_tpu.ops.relayout import GROUP, pad_grid_x, unpack_image
from ed3dgs_tpu.ops.common import TILE


def _oracle_unpack(packed):
    gy, gxp, C, PIX = packed.shape
    img = packed.reshape(gy, gxp, C, TILE, TILE)
    return img.transpose(2, 0, 3, 1, 4).reshape(C, gy * TILE, gxp * TILE)


def test_unpack_matches_transpose_oracle():
    rng = np.random.default_rng(0)
    gy, gx, C = 3, 11, 24
    gxp = pad_grid_x(gx)
    assert gxp == 16 and GROUP == 8
    packed = jnp.asarray(rng.normal(size=(gy, gxp, C, TILE * TILE)),
                         jnp.float32)
    img = unpack_image(packed, True)
    np.testing.assert_array_equal(np.asarray(img),
                                  _oracle_unpack(np.asarray(packed)))


def test_unpack_gradient_is_exact_inverse():
    """The cotangent path (pack kernel) must be the exact adjoint: for a
    permutation, vjp(cot) == oracle-transpose-back(cot)."""
    rng = np.random.default_rng(1)
    gy, gxp, C = 2, 8, 8
    packed = jnp.asarray(rng.normal(size=(gy, gxp, C, TILE * TILE)),
                         jnp.float32)
    _, vjp = jax.vjp(lambda p: unpack_image(p, True), packed)
    cot = jnp.asarray(rng.normal(size=(C, gy * TILE, gxp * TILE)), jnp.float32)
    (got,) = vjp(cot)
    want = np.asarray(cot).reshape(C, gy, TILE, gxp, TILE).transpose(
        1, 3, 0, 2, 4).reshape(gy, gxp, C, TILE * TILE)
    np.testing.assert_array_equal(np.asarray(got), want)
