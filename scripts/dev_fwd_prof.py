"""Profile the bench FORWARD render on the TPU and print a device-op breakdown.

Usage: python scripts/dev_fwd_prof.py [out_dir]
Same trace parsing as dev_train_prof.py, but over bench.build()'s forward fn.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fwd_prof"
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    forward, w, h = bench.build()
    f, fargs = forward("pallas")
    print("compiling...", flush=True)
    t0 = time.time()
    o = f(*fargs)
    jax.block_until_ready(o)
    print(f"compile+1st {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        o = f(*fargs)
    jax.block_until_ready(o)

    n_steps = 12
    jax.profiler.start_trace(out)
    for _ in range(n_steps):
        o = f(*fargs)
    jax.block_until_ready(o)
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    paths = glob.glob(os.path.join(out, "**", "*.trace.json.gz"), recursive=True)
    paths.sort(key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as fh:
        data = json.load(fh)
    events = data["traceEvents"]
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
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total_all = sum(tot.values())
    print(f"\ndevice total {total_all/1e3/n_steps:.2f} ms/frame over {n_steps} frames")
    print(f"{'us/frame':>10} {'count':>6}  op")
    for name, dur in rows[:40]:
        print(f"{dur/n_steps:10.1f} {cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
