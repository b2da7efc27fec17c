"""xprof trace of the full jitted train step; aggregates device time by op.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/dev_train_profile.py
"""
import glob
import gzip
import json
import math
import os
import shutil
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ed3dgs_tpu.config.params import DeformHiddenConfig, OptimizationConfig
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.ops.rasterize import RasterConfig
from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                      make_train_step, update_knn_cache)

rng = np.random.default_rng(0)
n, cap = 95_000, 100_000
w, h = 802, 550
pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                rng.uniform(1.2, 3.5, n)], 1).astype(np.float32)
cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
params, aux = gm.create_from_points(pts, cols, capacity=cap)
hidden = DeformHiddenConfig(net_width=128, defor_depth=1)
opt_cfg = OptimizationConfig()
fov = math.radians(50.0)
cam = look_at_camera((0, 0, 0), (0, 0, 2.0), (0, -1, 0), fov,
                     2 * math.atan(math.tan(fov / 2) * h / w), w, h).matrices()
rcfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                    pair_capacity=1 << 20, chunk=128, backend="pallas",
                    max_per_tile=2048)
state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                   disable_filter3d=True, radegs_from_iter=10 ** 9)
step = make_train_step(setup, opt_cfg, optimizer)
knn_cache = update_knn_cache(params, aux)
batch = {
    "gt_image": jnp.asarray(rng.uniform(0, 1, (1, 3, h, w)).astype(np.float32)),
    "viewmatrix": jnp.asarray(cam.world_view)[None],
    "projmatrix": jnp.asarray(cam.full_proj)[None],
    "campos": jnp.asarray(cam.campos)[None],
    "time": jnp.zeros((1,)), "cam_no": jnp.zeros((1,), jnp.int32),
    "use_ssim": jnp.asarray(False),
}
print("compiling...", flush=True)
state, aux, metrics = step(state, aux, batch, knn_cache)
jax.block_until_ready(metrics["loss"])

trace_dir = "/tmp/train_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
with jax.profiler.trace(trace_dir):
    for i in range(3):
        batch["time"] = batch["time"] + 1e-4
        state, aux, metrics = step(state, aux, batch, knn_cache)
    jax.block_until_ready(metrics["loss"])

tj = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
               recursive=True)
print("trace:", tj)
with gzip.open(tj[0], "rt") as f:
    data = json.load(f)

# device-lane events only: find pids whose process name mentions TPU/device
events = data["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dev_pids = {p for p, name in pid_names.items()
            if "TPU" in name or "/device" in name.lower()}
agg = defaultdict(float)
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e.get("name", "?")
        agg[name] += e.get("dur", 0)
        total += e.get("dur", 0)
print(f"\ntotal device time over 3 steps: {total / 1e3:.1f} ms "
      f"({total / 3e3:.1f} ms/step)")
rows = sorted(agg.items(), key=lambda kv: -kv[1])
for name, dur in rows[:40]:
    print(f"{dur / 3e3:8.2f} ms  {name[:110]}")
