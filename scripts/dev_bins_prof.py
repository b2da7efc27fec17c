"""xprof the projection+binning stage alone; print per-op breakdown."""

import glob
import gzip
import json
import math
import os
import sys
import time
from collections import defaultdict

import numpy as np


def main():
    out = "/tmp/bins_prof"
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from ed3dgs_tpu.core.projection import project_gaussians
    from ed3dgs_tpu.data.cameras import look_at_camera
    from ed3dgs_tpu.ops.binning import bin_gaussians

    n, w, h = 100_000, 802, 550
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                      rng.uniform(1.2, 3.5, n)], 1).astype(np.float32)
    scales = np.exp(rng.normal(-4.5, 0.5, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    shs = (rng.normal(0, 0.3, (n, 16, 3)) * np.array([3.0] + [0.3] * 15)[None, :, None]).astype(np.float32)
    fov = math.radians(50.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 2.0), (0, -1, 0), fov,
                         2 * math.atan(math.tan(fov / 2) * h / w), w, h).matrices()
    kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
              campos=jnp.asarray(cam.campos), width=w, height=h,
              tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
              focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
    A = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
         jnp.asarray(opac), jnp.asarray(shs))

    @jax.jit
    def f_bins(m, s, qq, o, sh):
        p = project_gaussians(m, s, qq, o, sh, **kw)
        b = bin_gaussians(p, width=w, height=h, pair_capacity=1 << 20)
        return (b.tile_start, b.tile_count, b.pair_gauss, b.pair_perm,
                b.seg_starts, b.seg_ends, b.order, b.num_pairs)

    o = jax.block_until_ready(f_bins(*A))
    n_steps = 30
    jax.profiler.start_trace(out)
    acc = None
    for i in range(n_steps):
        o = f_bins(A[0] + np.float32(1e-6 * i), *A[1:])
    jax.block_until_ready(o)
    jax.profiler.stop_trace()

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
    args_of = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
        a = e.get("args", {})
        if name not in args_of and a:
            args_of[name] = str(a)[:220]
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    total_all = sum(tot.values())
    print(f"\ndevice total {total_all/1e3/n_steps:.2f} ms/it over {n_steps}")
    for name, dur in rows[:28]:
        print(f"{dur/n_steps:8.1f}us {cnt[name]:5d}  {name[:60]}")
        if name in args_of:
            print(f"            {args_of[name]}")


if __name__ == "__main__":
    main()
