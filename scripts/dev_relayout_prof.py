"""xprof the relayout kernel pair alone at the bench shape (802x550, C=24).

Usage: python scripts/dev_relayout_prof.py [out_dir]
Prints per-op device times for unpack (packed->image) and pack (the vjp).
Small trace -> fast through the tunnel (unlike the full train profile).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/relayout_prof"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ed3dgs_tpu.ops.relayout import unpack_image

    gy, gxp, C, PIX = 35, 56, 24, 256
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(gy, gxp, C, PIX)), jnp.float32)

    @jax.jit
    def both(p):
        img, vjp = jax.vjp(lambda q: unpack_image(q, False), p)
        (cot,) = vjp(img * 2.0)
        return cot

    r = both(packed)
    jax.block_until_ready(r)
    jax.profiler.start_trace(out)
    for i in range(8):
        r = both(packed + jnp.float32(1e-6 * i))
        jax.block_until_ready(r)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
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
        n = e.get("name", "?")
        if n.startswith("jit_") or n.isdigit():
            continue
        tot[n] += e.get("dur", 0.0)
        cnt[n] += 1
    for n, d in sorted(tot.items(), key=lambda kv: -kv[1])[:8]:
        print(f"{d/8:9.1f}us {cnt[n]//8:3d}x  {n}")


if __name__ == "__main__":
    main()
