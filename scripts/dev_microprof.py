"""Micro-profiler: xprof device-time of small jitted ops, by trace parsing.

Usage: python scripts/dev_microprof.py   (TPU; run alone)
Each candidate op runs REPS times inside one trace with perturbed indices;
we report total XLA-Ops-lane device time / REPS. This sidesteps both the
tunnel's same-input execution cache and its async dispatch weirdness.
"""
import glob
import gzip
import json
import os
import shutil
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPS = 8


def device_ms(trace_dir):
    tj = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True))[-1]
    with gzip.open(tj, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops = [e for e in events if e.get("ph") == "X"
           and pid_names.get(e["pid"], "").startswith("/device:TPU")
           and tid_names.get((e["pid"], e.get("tid"))) == "XLA Ops"]
    ops.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    stack, agg = [], defaultdict(float)
    for e in ops:
        s, d = e["ts"], e.get("dur", 0)
        while stack and stack[-1] <= s:
            stack.pop()
        if not stack:
            agg[e["name"]] += d
        stack.append(s + d)
    return sum(agg.values()) / 1e3, agg


def profile(name, f, *args):
    @jax.jit
    def run(*a):
        def it(i, acc):
            out = lax.optimization_barrier(f(i, *a))
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(x.reshape(-1)[0].astype(jnp.float32)
                             for x in leaves)
        return lax.fori_loop(0, REPS, it, 0.0)

    jax.block_until_ready(run(*args))
    d = "/tmp/microprof"
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        jax.block_until_ready(run(*args))
    total, agg = device_ms(d)
    print(f"{name:58s} {total / REPS:8.3f} ms/it")
    return agg


if __name__ == "__main__":
    C, P, K = 100_000, 2_000_000, 20
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.normal(size=(C, 128)), jnp.float32)
    T32 = jnp.asarray(rng.normal(size=(C, 32)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, P), jnp.int32)
    perm = jnp.asarray(rng.permutation(P), jnp.int32)
    big = jnp.asarray(rng.normal(size=(P, 128)), jnp.float32)
    s1d = jnp.asarray(rng.normal(size=(P,)), jnp.float32)

    profile("row gather [2M,128] <- [100k,128]",
            lambda i, T, ix: T[(ix + i) % C], T, idx)
    profile("row gather [2M,32] <- [100k,32]",
            lambda i, T, ix: T[(ix + i) % C], T32, idx)
    profile("row gather [2M,128] <- [2M,128] big-src perm",
            lambda i, B, p: B[(p + i) % P], big, perm)
    profile("elem gather [2M] <- [2M] 1d perm",
            lambda i, s, p: s[(p + i) % P], s1d, perm)
    profile("elem gather [2M] <- [100k] 1d",
            lambda i, s, ix: s[:C][(ix + i) % C], s1d, idx)
    profile("concat(T[i], lane) [2M,129]",
            lambda i, T, ix: jnp.concatenate(
                [T[(ix + i) % C], ((ix + i) % K)[:, None].astype(jnp.float32)], 1),
            T, idx)
    profile("row gather bf16 [2M,128] <- [100k,128]",
            lambda i, T, ix: T[(ix + i) % C], T.astype(jnp.bfloat16), idx)
