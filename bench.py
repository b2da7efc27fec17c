"""Benchmark: forward render throughput on NerSemble-shaped workloads.

Run standalone on one real TPU chip (the driver does this at round end).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no benchmark numbers (BASELINE.md), so
`vs_baseline` reports the speedup of the Pallas tile kernel over this
framework's own pure-XLA tiled fallback on the identical workload — the
honest available baseline until reference-hardware numbers exist.

Workload: 100k Gaussians (capacity-padded), 802x550 image (NerSemble
downsampled resolution), SH degree 3, mip-splatting kernel 0.1 — the
steady-state shape of NerSemble training/rendering.
"""

import json
import math
import sys
import time

import numpy as np

# timers that exhausted their plausibility retries this run; the emitted
# JSON carries "suspect": true so an implausible slope (e.g. ~0 or
# negative dt through the tunnel) is never mistaken for a valid number
_SUSPECT = []


def _flag_suspect(name, dt):
    _SUSPECT.append(name)
    print(f"WARNING: {name} slope {dt:.3g}s/iter still outside the "
          "plausible range after 3 retries; emitting it flagged as suspect",
          file=sys.stderr)


def _scene(n=100_000, w=802, h=550):
    import jax.numpy as jnp

    from ed3dgs_tpu.data.cameras import look_at_camera

    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-1.0, 1.0, n), rng.uniform(-0.7, 0.7, n),
                      rng.uniform(1.2, 3.5, n)], 1).astype(np.float32)
    scales = np.exp(rng.normal(-4.5, 0.5, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
    shs = (rng.normal(0, 0.3, (n, 16, 3)) * np.array([3.0] + [0.3] * 15)[None, :, None]
           ).astype(np.float32)
    tongue = np.zeros(n, np.float32)
    fov = math.radians(50.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 2.0), (0, -1, 0), fov,
                         2 * math.atan(math.tan(fov / 2) * h / w), w, h).matrices()
    args = dict(
        viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.campos), width=w, height=h,
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
    return means, scales, q, opac, shs, tongue, cam, args


def policy_capacity(demand: int) -> int:
    """The pair capacity the production driver would run this demand at:
    tools/train.py sizes the static pair buffer with CapacityPolicy
    (headroom * window-peak rounded up to the bucket). The bench uses the
    same policy so its numbers are the production steady state, not a
    hand-picked buffer size."""
    from ed3dgs_tpu.train.capacity import CapacityPolicy
    p = CapacityPolicy(capacity=0)
    return p._bucket_for(demand)


# Measured true pair demand of the fixed bench scene/camera (deterministic;
# rasterize reports num_pairs). Forward frame: 790,267; train-step cloud
# (sigmoid(0.1) opacities, 3NN scales): 755,767. Both land in the same
# policy bucket.
BENCH_PAIRS_FWD = 790_267
BENCH_PAIRS_TRAIN = 755_767


def build(n=100_000, w=802, h=550, pair_capacity=None):
    import jax
    import jax.numpy as jnp

    from ed3dgs_tpu.core.projection import project_gaussians
    from ed3dgs_tpu.ops.rasterize import RasterConfig, rasterize

    means, scales, q, opac, shs, tongue, cam, args = _scene(n, w, h)
    if pair_capacity is None:
        pair_capacity = policy_capacity(BENCH_PAIRS_FWD)

    def forward(backend):
        # capacity sized to the workload by the production CapacityPolicy
        # (rasterize reports num_pairs so real pipelines size this the same)
        cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x,
                           focal_y=cam.focal_y, pair_capacity=pair_capacity,
                           max_per_tile=2048, chunk=128, backend=backend)

        def run(means, scales, q, opac, shs):
            proj = project_gaussians(means, scales, q, opac, shs, **args)
            out = rasterize(proj, jnp.asarray(tongue), jnp.ones(3), cfg)
            return out.color, out.expected_depth, out.normal

        return jax.jit(run), (jnp.asarray(means), jnp.asarray(scales),
                              jnp.asarray(q), jnp.asarray(opac), jnp.asarray(shs))

    return forward, w, h


def time_fn(f, fargs, iters=20):
    """Slope timing: chain `iters` input-perturbed evaluations inside one jit
    and difference two chain lengths. This defeats (a) the tunnel terminal's
    same-input execution cache and (b) per-dispatch round-trip overhead —
    both of which make naive loop timing wildly wrong on this setup."""
    import jax
    import jax.numpy as jnp

    means = fargs[0]
    rest = fargs[1:]

    def make(n):
        @jax.jit
        def run(m, *r):
            def it(i, acc):
                out = f(m + 1e-6 * i.astype(jnp.float32), *r)
                return acc + jnp.sum(out[0][:, ::64, ::64])
            return jax.lax.fori_loop(0, n, it, 0.0)
        return run

    lo, hi = max(2, iters // 4), iters
    rlo, rhi = make(lo), make(hi)
    jax.block_until_ready(rlo(means, *rest))
    jax.block_until_ready(rhi(means, *rest))
    # the tunnel adds large one-sided latency spikes (hundreds of ms);
    # min-of-reps per chain length is robust to them, a per-rep difference
    # median is not (measured: spikes flipped the slope by 10x). It can
    # still rarely collapse to ~0 (a sub-real fast return on one side), so
    # retry until the slope is physically plausible.
    for attempt in range(3):
        tls, ths = [], []
        for rep in range(5):
            eps = np.float32(1e-5 * (attempt * 7 + rep + 1))
            t0 = time.time()
            jax.block_until_ready(rlo(means + eps, *rest))
            tls.append(time.time() - t0)
            t0 = time.time()
            jax.block_until_ready(rhi(means + 2 * eps, *rest))
            ths.append(time.time() - t0)
        dt = float((min(ths) - min(tls)) / (hi - lo))
        if 2e-4 < dt < 1.0:
            return dt
    _flag_suspect("time_fn", dt)
    return dt


# --- roofline model (VERDICT r4 item 6) ------------------------------------
# v5e public peaks; VPU throughput is MODELED (8x128 vector with 4 ALUs per
# lane position at ~1.5 GHz — the clock implied by 197 TF/s bf16 over four
# 128x128 MXUs). Utilization numbers below are relative to this model, so
# they are comparable across rounds but not vendor-certified.
PEAK_HBM_BPS = 819e9
PEAK_MXU_F32 = 49e12
PEAK_VPU_OPS = 8 * 128 * 4 * 1.5e9          # ~6.1e12 element-ops/s
VPU_OPS_PER_CHUNK_ITER = 55                  # xprof-measured blend-loop ops
#                                              on [128, 256] (performance.md)


def roofline(t_fwd, t_train, n=100_000, cap=100_352, w=802, h=550,
             chunk=128, max_per_tile=2048):
    """Modeled speed-of-light floors for the forward frame and train step vs
    the measured times: bytes-moved / PEAK_HBM and blend-VPU / MLP-MXU floors.
    One cheap jit computes the true pair/chunk counts of the bench workload;
    everything else is closed-form byte/op accounting (formulas inline)."""
    import jax
    import jax.numpy as jnp

    from ed3dgs_tpu.core.projection import project_gaussians
    from ed3dgs_tpu.ops.binning import bin_gaussians, tile_grid

    means, scales, q, opac, shs, _tongue, _cam, args = _scene(n, w, h)

    @jax.jit
    def stats(means, scales, q, opac, shs):
        proj = project_gaussians(means, scales, q, opac, shs, **args)
        bins = bin_gaussians(proj, width=w, height=h,
                             pair_capacity=policy_capacity(BENCH_PAIRS_FWD))
        c = jnp.minimum(bins.tile_count, max_per_tile)
        return (jnp.sum(jnp.where(proj.valid, proj.tiles_touched, 0)),
                jnp.sum(-(-c // chunk)), jnp.sum(c))

    num_pairs, n_chunks, n_blend = (int(x) for x in jax.device_get(
        stats(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
              jnp.asarray(opac), jnp.asarray(shs))))
    gx, gy = tile_grid(w, h)
    T = gx * gy
    L = 128 * 4                                  # one payload row (128 lanes)

    # ---- forward frame floors ----
    # payload table write+read, pair gather write, kernel pair stream,
    # tile-major channel write + relayout to [24, H, W]
    fwd_bytes = (2 * n * L + num_pairs * L + n_chunks * chunk * L
                 + 2 * T * 24 * 256 * 4 + 24 * h * w * 4)
    fwd_hbm_ms = fwd_bytes / PEAK_HBM_BPS * 1e3
    # blend loop: ~55 VPU ops per [chunk, 256] iteration (semantic floor is
    # ~21; current kernel measured 50-70 — see performance.md kernel diet)
    fwd_vpu_ops = n_chunks * VPU_OPS_PER_CHUNK_ITER * chunk * 256
    fwd_vpu_ms = fwd_vpu_ops / PEAK_VPU_OPS * 1e3

    # ---- train step floors (batch 1, the bench shape) ----
    # raster: fwd stream + 2-pass checkpointed bwd reads + pair-grad write
    #         + the index-rate-bound un-permute (bytes floor only)
    raster_bytes = (fwd_bytes + 2 * n_chunks * chunk * L + num_pairs * L
                    + 2 * num_pairs * L)
    # KNN loss (Morton-windowed, ops/knn_loss.py): lidx+aux streams, window
    # + spill reads for both passes, banded dj images, combined gather
    Cp = cap + (-cap) % 1024
    na, K1p, E, SPA, SPB = Cp // 256, 24, 32, 512, 1024
    knn_bytes = (2 * Cp * K1p * 4                        # lidx_a + aux_a
                 + 2 * na * (768 + SPA) * E * 4          # main pass srcs
                 + na * (768 + SPB) * E * 4              # far pass srcs
                 + 4 * na * E * 768 * 4                  # dj images r/w
                 + 2 * (Cp + na * (SPA + SPB)) * E * 4)  # combined gather
    # Adam: 91 floats/gaussian (xyz3 sc3 rot4 op1 dc3 rest45 emb32), read
    # param+m+v, write param+m+v
    adam_bytes = cap * 91 * 4 * 6
    # per-gaussian elementwise tail (activations, projection, stats):
    # ~30 [cap, 128-lane] array traversals measured in the r4 xprof
    misc_bytes = 30 * cap * L
    train_bytes = raster_bytes + knn_bytes + adam_bytes + misc_bytes
    train_hbm_ms = train_bytes / PEAK_HBM_BPS * 1e3
    # deform MLP (net 128x1, in 288): fwd 2 towers x (feature + 5 heads),
    # backward ~2x forward flops
    W_mlp, n_in = 128, 288
    tower = 2 * cap * (n_in * W_mlp + 5 * (W_mlp * W_mlp + W_mlp * 12))
    mlp_flops = 3 * 2 * tower
    train_mxu_ms = mlp_flops / PEAK_MXU_F32 * 1e3

    fwd_floor = max(fwd_hbm_ms, fwd_vpu_ms)
    train_floor = max(train_hbm_ms, train_mxu_ms)
    return {
        "pairs": num_pairs, "blend_chunks": n_chunks,
        "fwd_bytes_mb": round(fwd_bytes / 1e6, 1),
        "fwd_hbm_floor_ms": round(fwd_hbm_ms, 3),
        "fwd_vpu_floor_ms": round(fwd_vpu_ms, 3),
        "fwd_measured_ms": round(t_fwd * 1e3, 2),
        "fwd_sol_fraction": round(fwd_floor / (t_fwd * 1e3), 3),
        "train_bytes_mb": round(train_bytes / 1e6, 1),
        "train_hbm_floor_ms": round(train_hbm_ms, 3),
        "train_mlp_mxu_floor_ms": round(train_mxu_ms, 3),
        **({"train_measured_ms": round(t_train * 1e3, 2),
            "train_sol_fraction": round(train_floor / (t_train * 1e3), 3)}
           if t_train else {}),
        "model": "v5e 819GB/s HBM, 49TF/s f32 MXU, VPU modeled 6.1T ops/s",
    }


def build_train(n_alive=95_000, cap=100_352, w=802, h=550,
                pair_capacity=None, backend="pallas", chunk=128,
                batch_size=1, batch_mode="scan", knn_policy=True):
    """One full jitted train step at the NerSemble steady-state shape:
    95k alive / 100k capacity, 802x550, SH3, deformation net 128x1, batch 1,
    every loss active (L1, opacity-mean, embedding-KNN, temporal-TV,
    depth-normal), Adam update, densification stats. batch_size/batch_mode
    generalize the camera batch for the --scaling harness ("vmap" keeps B a
    real batch axis the sharded path partitions over the "data" mesh axis)."""
    import jax
    import jax.numpy as jnp

    from ed3dgs_tpu.config.params import (DeformHiddenConfig,
                                          OptimizationConfig)
    from ed3dgs_tpu.data.cameras import look_at_camera
    from ed3dgs_tpu.models import gaussians as gm
    from ed3dgs_tpu.ops.rasterize import RasterConfig
    from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                          make_train_step, refresh_knn_cache,
                                          update_knn_cache)

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1.0, 1.0, n_alive),
                    rng.uniform(-0.7, 0.7, n_alive),
                    rng.uniform(1.2, 3.5, n_alive)], 1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n_alive, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=cap)
    if pair_capacity is None:
        pair_capacity = policy_capacity(BENCH_PAIRS_TRAIN)
    hidden = DeformHiddenConfig(net_width=128, defor_depth=1)
    opt_cfg = OptimizationConfig()
    fov = math.radians(50.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 2.0), (0, -1, 0), fov,
                         2 * math.atan(math.tan(fov / 2) * h / w),
                         w, h).matrices()
    rcfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x,
                        focal_y=cam.focal_y, pair_capacity=pair_capacity,
                        max_per_tile=2048, chunk=chunk, backend=backend)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=batch_size,
                       kernel_size=0.1, disable_filter3d=True,
                       radegs_from_iter=0, coef_tv_temporal=1.0,
                       batch_mode=batch_mode)
    raw_step = make_train_step(setup, opt_cfg, optimizer, jit=False)
    B = batch_size
    gt = rng.uniform(0, 1, (B, 3, h, w)).astype(np.float32)
    batch = {
        "gt_image": jnp.asarray(gt),
        "viewmatrix": jnp.tile(jnp.asarray(cam.world_view)[None], (B, 1, 1)),
        "projmatrix": jnp.tile(jnp.asarray(cam.full_proj)[None], (B, 1, 1)),
        "campos": jnp.tile(jnp.asarray(cam.campos)[None], (B, 1)),
        "time": jnp.linspace(0.3, 0.6, B, dtype=jnp.float32),
        "cam_no": jnp.arange(B, dtype=jnp.int32),
        "use_ssim": jnp.asarray(False),
    }
    if knn_policy:
        # the PRODUCTION refresh policy (growth to the coverage target +
        # far shrink), not a hand-picked bucket set: the benched step runs
        # the same KNN graph a real training run reaches on this cloud
        knn_cache = refresh_knn_cache(
            params, aux, coverage_target=opt_cfg.knn_coverage_target)
    else:
        # default-bucket cache without the (host-concrete) growth loop —
        # for abstract tracing callers (tests eval_shape this builder)
        knn_cache = update_knn_cache(params, aux)
    return raw_step, state, aux, batch, knn_cache


def time_train(raw_step, state, aux, batch, knn_cache, iters=12,
               shardings=None):
    """Same chained-slope methodology as time_fn: carry the real TrainState
    through a fori_loop of input-perturbed steps, difference two chain
    lengths (defeats the tunnel's execution cache + dispatch overhead).
    The trip count is a TRACED argument so both chain lengths share one
    compile of the (large) train-step program. `shardings` (st_sh, aux_sh,
    gt_sh) jits the chain onto a mesh for the --scaling harness."""
    import jax
    import jax.numpy as jnp

    def run_fn(state, aux, gt0, n):
        def it(i, carry):
            st, ax = carry
            b = dict(batch)
            b["gt_image"] = gt0 + 1e-6 * i.astype(jnp.float32)
            st, ax, _m = raw_step(st, ax, b, knn_cache)
            return (st, ax)
        return jax.lax.fori_loop(0, n, it, (state, aux))

    if shardings is None:
        run = jax.jit(run_fn)
    else:
        st_sh, aux_sh, gt_sh = shardings
        run = jax.jit(run_fn, in_shardings=(st_sh, aux_sh, gt_sh, None),
                      out_shardings=(st_sh, aux_sh))

    lo, hi = max(2, iters // 4), iters
    gt0 = batch["gt_image"]
    jax.block_until_ready(run(state, aux, gt0, lo))
    jax.block_until_ready(run(state, aux, gt0, hi))
    # min-of-reps per chain length + plausibility retry (see time_fn)
    for attempt in range(3):
        tls, ths = [], []
        for rep in range(5):
            eps = np.float32(1e-5 * (attempt * 7 + rep + 1))
            t0 = time.time()
            jax.block_until_ready(run(state, aux, gt0 + eps, lo))
            tls.append(time.time() - t0)
            t0 = time.time()
            jax.block_until_ready(run(state, aux, gt0 + 2 * eps, hi))
            ths.append(time.time() - t0)
        dt = float((min(ths) - min(tls)) / (hi - lo))
        if 1e-3 < dt < 1.0:
            return dt
    _flag_suspect("time_train", dt)
    return dt


def run_scaling(mesh_spec: str):
    """`bench.py --scaling [data=D,gauss=G|auto]` — the BASELINE.json
    scaling metric as ONE command: train-step pixels/s at 1 device and at
    the full mesh, plus the efficiency ratio pixN / (N * pix1). Runs the
    real sharded train step (parallel/sharded.py) with the same
    chained-perturbation slope timing as the per-chip bench. On a CPU host
    (set XLA_FLAGS=--xla_force_host_platform_device_count=N) a small
    workload is used and the EMITTED NUMBERS VALIDATE THE HARNESS ONLY —
    N virtual devices time-share the host cores, so the efficiency ratio
    is meaningless there; on TPU hardware the production NerSemble shape
    runs and the ratio is the BASELINE scaling metric."""
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # this environment's sitecustomize force-sets jax_platforms at
        # interpreter start (env vars alone are ignored) — same override
        # dance as tests/conftest.py
        jax.config.update("jax_platforms", "cpu")
        try:
            from jax._src import xla_bridge as _xb
            if _xb.backends_are_initialized():
                from jax.extend.backend import clear_backends
                clear_backends()
        except Exception:
            pass

    from ed3dgs_tpu.parallel import make_mesh
    from ed3dgs_tpu.parallel.sharded import (aux_shardings, batch_shardings,
                                             shard_batch, shard_knn_cache,
                                             shard_train_state,
                                             state_shardings)

    if mesh_spec in ("", "auto"):
        n = len(jax.devices())
        spec = {"data": 1, "gauss": n}
    else:
        spec = {k: int(v) for k, v in
                (kv.split("=") for kv in mesh_spec.split(","))}
    mesh = make_mesh(**spec)
    N = mesh.size
    D = mesh.shape["data"]
    B = max(D, 1)

    on_accel = jax.default_backend() in ("tpu", "axon")
    if on_accel:
        shape = dict(w=802, h=550)
    else:
        # tiny: each virtual device's program section between collectives
        # must stay well under XLA's fixed 40 s CPU-rendezvous timeout even
        # on an oversubscribed host (collectives run one thread per device)
        shape = dict(n_alive=600, cap=1024, w=96, h=64,
                     pair_capacity=1 << 13, backend="xla")
    w, h = shape.get("w", 802), shape.get("h", 550)
    iters = 12 if on_accel else 4

    r1 = build_train(batch_size=1, **shape)
    t1 = time_train(*r1, iters=iters)
    pix1 = w * h / t1

    raw_step, state, aux, batch, knn = build_train(
        batch_size=B, batch_mode="vmap", **shape)
    st_sh = state_shardings(mesh, state)
    aux_sh = aux_shardings(mesh, aux)
    gt_sh = batch_shardings(mesh, batch)["gt_image"]
    state_s, aux_s = shard_train_state(mesh, state, aux)
    batch_s = shard_batch(mesh, batch)
    knn_s = shard_knn_cache(mesh, knn)
    tN = time_train(raw_step, state_s, aux_s, batch_s, knn_s, iters=iters,
                    shardings=(st_sh, aux_sh, gt_sh))
    pixN = B * w * h / tN

    print(json.dumps({
        "metric": "train_scaling",
        "mesh": f"data={spec.get('data', 1)},gauss={spec.get('gauss', 1)}",
        "n_devices": N,
        "pixels_per_s_1": round(pix1, 1),
        "pixels_per_s_N": round(pixN, 1),
        "efficiency": round(pixN / (N * pix1), 4),
        "unit": "pixels/s",
        **({"suspect": True} if _SUSPECT else {}),
    }))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        return run_scaling(sys.argv[2] if len(sys.argv) > 2 else "auto")
    forward, w, h = build()
    f_pal, fargs = forward("pallas")
    t_pal = time_fn(f_pal, fargs)
    f_xla, fargs2 = forward("xla")
    try:
        t_xla = time_fn(f_xla, fargs2, iters=5)
    except Exception:
        t_xla = float("nan")
    mpix_s = (w * h / t_pal) / 1e6
    vs = (t_xla / t_pal) if np.isfinite(t_xla) else 1.0

    # the north-star training metric (BASELINE.json: "NerSemble frames/s
    # train + Mpixels/s render per chip")
    try:
        t_train = time_train(*build_train())
        train_ms = round(t_train * 1e3, 2)
        train_fps = round(1.0 / t_train, 2)
    except Exception:
        t_train = None
        train_ms = None
        train_fps = None
    try:
        rl = roofline(t_pal, t_train)
    except Exception as e:
        rl = {"error": repr(e)[:200]}
    print(json.dumps({
        "metric": "render_throughput_pallas_802x550_100k",
        "value": round(mpix_s, 2),
        "unit": "Mpixels/s",
        "vs_baseline": round(vs, 3),
        "train_step_ms_802x550_100k": train_ms,
        "train_frames_per_s": train_fps,
        "roofline": rl,
        **({"suspect": True} if _SUSPECT else {}),
    }))


if __name__ == "__main__":
    sys.exit(main())
