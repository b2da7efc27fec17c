"""Slope-time the forward pipeline in stages on the TPU.

Stages: projection | +binning | +payload gather/pad | full pallas render.
Uses bench.time_fn's chained-slope methodology (tunnel-safe).
"""

import math
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from ed3dgs_tpu.core.projection import project_gaussians
    from ed3dgs_tpu.data.cameras import look_at_camera
    from ed3dgs_tpu.ops.binning import (bin_gaussians, build_gaussian_payload,
                                        tile_grid)
    from ed3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    n, w, h = 100_000, 802, 550
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                      rng.uniform(1.2, 3.5, n)], 1).astype(np.float32)
    scales = np.exp(rng.normal(-4.5, 0.5, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    shs = (rng.normal(0, 0.3, (n, 16, 3)) * np.array([3.0] + [0.3] * 15)[None, :, None]).astype(np.float32)
    tongue = np.zeros(n, np.float32)
    fov = math.radians(50.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 2.0), (0, -1, 0), fov,
                         2 * math.atan(math.tan(fov / 2) * h / w), w, h).matrices()
    kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
              campos=jnp.asarray(cam.campos), width=w, height=h,
              tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
              focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
    A = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
         jnp.asarray(opac), jnp.asarray(shs))
    K = 1 << 20

    def f_proj(m, s, qq, o, sh):
        p = project_gaussians(m, s, qq, o, sh, **kw)
        return (p.mean2d, p.depth, p.conic)

    def f_bins(m, s, qq, o, sh):
        p = project_gaussians(m, s, qq, o, sh, **kw)
        b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
        return (b.tile_start.astype(jnp.float32), b.tile_count.astype(jnp.float32), b.pair_gauss.astype(jnp.float32))

    def f_payload(m, s, qq, o, sh):
        p = project_gaussians(m, s, qq, o, sh, **kw)
        b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
        pay = build_gaussian_payload(p, jnp.asarray(tongue), pad=False)
        pair = jnp.pad(pay[b.order][b.pair_gauss], ((0, 128), (0, 102)))
        return (pair[:, :1], b.tile_start.astype(jnp.float32), b.tile_count.astype(jnp.float32))

    cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                       pair_capacity=K, max_per_tile=2048, chunk=128, backend="pallas")

    def f_full(m, s, qq, o, sh):
        p = project_gaussians(m, s, qq, o, sh, **kw)
        out = rasterize(p, jnp.asarray(tongue), jnp.ones(3), cfg)
        return out.color, out.expected_depth, out.normal

    def slope_time(f, fargs, iters=12):
        means0 = fargs[0]
        rest = fargs[1:]

        def make(nn):
            @jax.jit
            def run(m, *r):
                def it(i, acc):
                    out = f(m + 1e-6 * i.astype(jnp.float32), *r)
                    return acc + jnp.sum(out[0][..., ::64]).astype(jnp.float32)
                return jax.lax.fori_loop(0, nn, it, 0.0)
            return run

        lo, hi = max(2, iters // 4), iters
        rlo, rhi = make(lo), make(hi)
        jax.block_until_ready(rlo(means0, *rest))
        jax.block_until_ready(rhi(means0, *rest))
        tls, ths = [], []
        for rep in range(5):
            eps = np.float32(1e-5 * (rep + 1))
            t0 = time.time()
            jax.block_until_ready(rlo(means0 + eps, *rest))
            tls.append(time.time() - t0)
            t0 = time.time()
            jax.block_until_ready(rhi(means0 + 2 * eps, *rest))
            ths.append(time.time() - t0)
        return float((min(ths) - min(tls)) / (hi - lo))

    for name, f in [("proj", f_proj), ("bins", f_bins), ("payload", f_payload),
                    ("full", f_full)]:
        t0 = time.time()
        t = slope_time(f, A, iters=12)
        print(f"{name}: {t*1e3:.2f} ms   (compile+measure {time.time()-t0:.0f}s)",
              flush=True)
    print("Mpix/s full:", round(w * h / t / 1e6, 2))


if __name__ == "__main__":
    main()
