"""Probe: which formulation of the width-32 permute-gather + packed segsum
keeps the gather row-major (fast)? xprof device-time per variant."""
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scripts.dev_microprof import profile
from ed3dgs_tpu.ops.segment_sum import (segment_sum_rows,
                                        segment_sum_rows_packed)

C, P = 100_000, 2_000_000
rng = np.random.default_rng(0)
g26 = jnp.asarray(rng.normal(size=(P, 26)), jnp.float32)
perm = jnp.asarray(rng.permutation(P), jnp.int32)
# contiguous-ish CSR bounds over C segments
cuts = np.sort(rng.integers(0, P, C + 1)); cuts[0], cuts[-1] = 0, P
starts = jnp.asarray(cuts[:-1], jnp.int32)
ends = jnp.asarray(cuts[1:], jnp.int32)


def v_pad32(i, g, p):
    g32 = jnp.pad(g, ((0, 0), (0, 6)))
    gp = lax.optimization_barrier(lax.optimization_barrier(g32)[(p + i) % P])
    return segment_sum_rows_packed(gp, starts, ends)


def v_gather3d(i, g, p):
    g32 = jnp.pad(g, ((0, 0), (0, 6)))
    p2 = ((p + i) % P).reshape(-1, 4)
    gp = g32[p2].reshape(-1, 128)           # [P/4, 4, 32] -> [P/4, 128]
    return segment_sum_rows_packed(gp.reshape(-1, 32), starts, ends)


def v_gather3d_direct(i, g, p):
    # feed the packed rows straight to the kernel path (skip its re-pack)
    g32 = jnp.pad(g, ((0, 0), (0, 6)))
    p2 = ((p + i) % P).reshape(-1, 4)
    gp = g32[p2].reshape(-1, 128)
    # emulate kernel input by reusing packed variant on pre-packed rows:
    # segment_sum_rows_packed repads/reshapes; instead call the 128-wide
    # kernel on the packed rows is WRONG semantically — so just barrier-sum
    # to measure the gather cost alone.
    return jnp.sum(gp[::4096, ::32])


def v_flatten(i, g, p):
    g32 = jnp.pad(g, ((0, 0), (0, 6)))
    gp = g32[(p + i) % P].reshape(-1)
    gp = lax.optimization_barrier(gp).reshape(-1, 32)
    return segment_sum_rows_packed(gp, starts, ends)


def v_128wide(i, g, p):
    g128 = lax.optimization_barrier(jnp.pad(g, ((0, 0), (0, 102))))
    gp = lax.optimization_barrier(g128[(p + i) % P])
    return segment_sum_rows(gp, starts, ends)


if __name__ == "__main__":
    profile("A pad32 + barriers + packed segsum", v_pad32, g26, perm)
    profile("B 3d-index gather [P/4,4,32] + packed segsum", v_gather3d, g26, perm)
    profile("C 3d-index gather alone (slice consumer)", v_gather3d_direct, g26, perm)
    profile("D flatten-consumer gather + packed segsum", v_flatten, g26, perm)
    profile("E 128-wide gather + unpacked segsum", v_128wide, g26, perm)
