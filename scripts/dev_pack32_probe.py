"""Probe: 4-packed 32-lane payload path mechanics on real TPU.

Tests whether Mosaic supports the [R,128] -> [4R,32] value reshape (the
bitcast unfold of a 4-pair-per-row packed payload block) inside a kernel,
and times it against a matmul-based interleave fallback. Also probes the
static-select row shift used for 4-misaligned tile starts.

Run: python scripts/dev_pack32_probe.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _probe_reshape_kernel(x_hbm, o_ref, buf, sem):
    # DMA a [33,128] slab, reshape to [132,32], shift by h (static select),
    # reduce to prove the values flow.
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 33)], buf, sem)
    cp.start()
    cp.wait()
    raw = buf[...]            # [33, 128]
    unf = raw.reshape(132, 32)
    acc = jnp.zeros((1, 32), jnp.float32)
    for h in range(4):
        blk = unf[h:h + CHUNK]
        acc += jnp.sum(blk, axis=0, keepdims=True) * (h + 1.0)
    o_ref[0, :] = jnp.pad(acc[0], (0, 128 - 32))


def probe_reshape():
    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    try:
        out = pl.pallas_call(
            _probe_reshape_kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((33, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(x)
        out.block_until_ready()
        # oracle
        raw = np.asarray(x[:33]).reshape(132, 32)
        want = sum(raw[h:h + CHUNK].sum(axis=0) * (h + 1.0) for h in range(4))
        got = np.asarray(out)[0, :32]
        err = np.abs(got - want).max()
        print(f"reshape probe: OK, max err {err:.3e}")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"reshape probe: FAILED: {type(e).__name__}: {str(e)[:500]}")
        return False


def _timed_kernel(x_hbm, o_ref, buf, sem, *, mode, iters):
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 33)], buf, sem)
    cp.start()
    cp.wait()

    def body(i, acc):
        raw = buf[...]
        if mode == "reshape":
            unf = raw.reshape(132, 32)
            blk = unf[1:1 + CHUNK]
        elif mode == "matmul":
            # interleave via 4 one-hot matmuls: blk[p] = raw[(p+h)//4, 32*((p+h)%4):...]
            h = 1
            prow = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 33), 0) + h
            src = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 33), 1)
            blk = jnp.zeros((CHUNK, 32), jnp.float32)
            for j in range(4):
                pj = jnp.where((prow // 4 == src) & (prow % 4 == j), 1.0, 0.0)
                sub = raw[:, 32 * j:32 * (j + 1)]
                blk += jax.lax.dot_general(
                    pj, sub, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:  # baseline: no unfold, just consume raw 32 lanes
            blk = raw[:32, :32] * 1.0
        return acc + jnp.sum(blk) + jnp.float32(i) * 0.0

    acc = jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    o_ref[0, :] = jnp.full((128,), acc, jnp.float32)


def time_mode(mode, iters=20000):
    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    f = pl.pallas_call(
        functools.partial(_timed_kernel, mode=mode, iters=iters),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((33, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    g = jax.jit(lambda v: f(v))
    out = g(x); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = g(x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 3
    print(f"mode={mode:8s} iters={iters}: {dt*1e9/iters:8.1f} ns/iter "
          f"(total {dt*1e3:.2f} ms)  val={float(out[0,0]):.1f}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    ok = probe_reshape()
    for m in (["baseline", "reshape", "matmul"] if ok
              else ["baseline", "matmul"]):
        try:
            time_mode(m)
        except Exception as e:  # noqa: BLE001
            print(f"mode={m}: FAILED {type(e).__name__}: {str(e)[:300]}")
