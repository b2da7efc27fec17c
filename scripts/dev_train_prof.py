"""Profile the bench train step on the TPU and print a device-op breakdown.

Usage: python scripts/dev_train_prof.py [out_dir]
Parses the xprof trace.json.gz device track: per-op total duration over the
steady-state steps, grouped by op name, top-N printed.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_prof"
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    raw_step, state, aux, batch, knn_cache = bench.build_train()
    step = jax.jit(raw_step)
    print("compiling...", flush=True)
    t0 = time.time()
    state, aux, m = step(state, aux, batch, knn_cache)
    jax.block_until_ready(m["loss"])
    print(f"compile+1st {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        state, aux, m = step(state, aux, batch, knn_cache)
    jax.block_until_ready(m["loss"])

    jax.profiler.start_trace(out)
    for _ in range(4):
        state, aux, m = step(state, aux, batch, knn_cache)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    paths = glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                      recursive=True)
    paths.sort(key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # device-track pids: name contains "TPU" / "/device:"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm and "XLA" not in nm:
                dev_pids.add(e["pid"])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    n_steps = 4
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total_all = sum(tot.values())
    print(f"\ndevice total {total_all/1e3/n_steps:.2f} ms/step over {n_steps} steps")
    print(f"{'us/step':>10} {'count':>6}  op")
    for name, dur in rows[:45]:
        print(f"{dur/n_steps:10.1f} {cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
