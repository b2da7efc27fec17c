"""Time the DISPATCHED train step by queuing N async steps and differencing
two queue lengths (amortizes tunnel round trips; no in-jit chaining, so the
compiled artifact is exactly what tools/train.py runs)."""
import math
import time

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
CAPS = [1 << 20, 1 << 21]
for capk in CAPS:
    rcfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x,
                        focal_y=cam.focal_y, pair_capacity=capk, chunk=128,
                        backend="pallas", max_per_tile=2048)
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
    st, au, m = step(state, aux, batch, knn_cache)
    jax.block_until_ready(m["loss"])

    def run(k, st, au):
        t0 = time.time()
        for i in range(k):
            b = dict(batch)
            b["time"] = batch["time"] + 1e-4 * (i + 1)
            st, au, m = step(st, au, b, knn_cache)
        jax.block_until_ready(m["loss"])
        return time.time() - t0, st, au

    for rep in range(3):
        t_lo, st, au = run(3, st, au)
        t_hi, st, au = run(13, st, au)
        print(f"cap=1<<{capk.bit_length()-1} rep{rep}: "
              f"{(t_hi - t_lo) / 10 * 1000:.1f} ms/step "
              f"(lo {t_lo:.3f}s hi {t_hi:.3f}s)", flush=True)
