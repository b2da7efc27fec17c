"""Profile the embedding-KNN loss block (Morton windows + far pass) alone.

Usage: python scripts/dev_knn_prof.py [out_dir]
Builds the bench-shaped graph (100k capacity, 95k alive, K=20, E=32),
xprof-traces value_and_grad of knn_loss_fused, prints the per-op breakdown.
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
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/knn_prof"
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ed3dgs_tpu.ops import knn_loss
    from ed3dgs_tpu.ops.knn import knn as knn_op

    C, E, K = 100_352, 32, 20
    n_alive = 95_000
    rng = np.random.default_rng(0)
    pts = np.zeros((C, 3), np.float32)
    pts[:n_alive] = np.stack([rng.uniform(-1, 1, n_alive),
                              rng.uniform(-0.7, 0.7, n_alive),
                              rng.uniform(1.2, 3.5, n_alive)], 1)
    alive = np.zeros(C, bool)
    alive[:n_alive] = True
    far = 1e3 + 1e-3 * np.arange(C, dtype=np.float32)[:, None]
    q = np.where(alive[:, None], pts, far)
    d2, idx = knn_op(jnp.asarray(q), k=K)
    w = jnp.where(jnp.asarray(alive)[:, None],
                  jnp.exp(-2000.0 * jnp.maximum(d2, 0.0)), 0.0)
    coef = jnp.asarray(alive, jnp.float32) / max(n_alive * K, 1)
    graph = jax.jit(lambda *a: knn_loss.prepare_knn_graph(
        a[0], a[1], a[2], a[3], spill_b=1024, far_capacity=1 << 19))(idx, w, coef, jnp.asarray(q))
    emb = jnp.asarray(rng.normal(0, 0.1, (C, E)).astype(np.float32))

    @jax.jit
    def f(e):
        return jax.value_and_grad(
            lambda ee: knn_loss.knn_loss_fused(ee, graph, K, False))(e)

    loss, g = f(emb)
    jax.block_until_ready(g)
    print(f"loss={float(loss):.6f} |g|={float(jnp.linalg.norm(g)):.6f}",
          flush=True)
    for _ in range(3):
        loss, g = f(emb + 1e-6)
    jax.block_until_ready(g)

    n_steps = 16
    jax.profiler.start_trace(out)
    for i in range(n_steps):
        loss, g = f(emb + 1e-6 * i)
    jax.block_until_ready(g)
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    paths = glob.glob(os.path.join(out, "**", "*.trace.json.gz"), recursive=True)
    paths.sort(key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f2:
        data = json.load(f2)
    events = data["traceEvents"]
    tid_names, pid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"]["name"]
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"]["name"]
    tot, cnt, long = defaultdict(float), defaultdict(int), {}
    for e in events:
        if e.get("ph") != "X":
            continue
        tn = tid_names.get((e.get("pid"), e.get("tid")), "")
        pn = pid_names.get(e.get("pid"), "")
        if "TPU" not in pn or "Ops" not in tn:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
        a = e.get("args", {})
        long[name] = a.get("long_name", a.get("tf_op", ""))[:150]
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"total {sum(tot.values())/1e3/n_steps:.3f} ms/step")
    for name, dur in rows[:25]:
        print(f"{dur/n_steps:9.1f}us {cnt[name]:5d}  {name[:36]:36s} "
              f"{long.get(name, '')}")


if __name__ == "__main__":
    main()
