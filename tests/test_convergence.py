"""Convergence gates (VERDICT r1 item 5) — stronger than the end-to-end
smoke test:

(a) static scene driven to PSNR > 28 WITH densification growing the cloud
    (BASELINE config 1: static single-frame splatting);
(b) a moving synthetic scene where loss only drops if the deformation net
    actually learns motion — held-out-timestep PSNR beats a wrong-time
    render by several dB;
(c) the same optimizer loop through the REAL pallas kernel path
    (interpret mode) end to end: forward kernel, 2-pass backward kernel,
    segment-sum gradients, Adam.

All gates run the library-level jitted train step directly (no CLI/IO) to
stay inside the suite's wall-clock budget."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.config.params import DeformHiddenConfig, OptimizationConfig
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.ops.rasterize import RasterConfig
from ed3dgs_tpu.render import render, settings_from_camera
from ed3dgs_tpu.train import losses as L
from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                      make_densify_step, make_train_step,
                                      update_knn_cache)

FOV = math.radians(55.0)


def oracle_images(pts, cols, cams, rcfg, hidden, opt_cfg, bg):
    """GT renders of the true cloud (deformation disabled)."""
    params_gt, aux_gt = gm.create_from_points(pts, cols,
                                              capacity=len(pts))
    dparams = init_train_state(params_gt, hidden, opt_cfg, 1.0)[0] \
        .params["deform"]
    return [np.asarray(render(
        params_gt, aux_gt, dparams, hidden,
        settings_from_camera(cam, 0.0, 0), rcfg, bg,
        iteration=0, disable_deform=True)["render"]) for cam in cams]


def batch_of(cam, gt, t=0.0):
    return {
        "gt_image": jnp.asarray(gt)[None],
        "viewmatrix": jnp.asarray(cam.world_view)[None],
        "projmatrix": jnp.asarray(cam.full_proj)[None],
        "campos": jnp.asarray(cam.campos)[None],
        "time": jnp.full((1,), t, jnp.float32),
        "cam_no": jnp.zeros((1,), jnp.int32),
        "use_ssim": jnp.asarray(False),
    }


def full_psnr(state, aux, hidden, cams, gts, rcfg, bg, it, times=None):
    ps = []
    for j, cam in enumerate(cams):
        o = render(state.params["gaussians"], aux, state.params["deform"],
                   hidden, settings_from_camera(
                       cam, 0.0 if times is None else float(times[j]), 0),
                   rcfg, bg, iteration=it)
        ps.append(float(jnp.mean(L.psnr(o["render"][None],
                                        jnp.asarray(gts[j])[None]))))
    return float(np.mean(ps))


@pytest.mark.slow
def test_static_scene_converges_past_28db_with_densify():
    """BASELINE config 1: static splatting from a poor init (28% of the true
    points, perturbed, gray) must densify AND converge well — not just the
    end-to-end smoke's PSNR > 14."""
    w = h = 48
    n, cap = 90, 256
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                    rng.uniform(1.9, 2.5, n)], 1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    cams = [look_at_camera(
        (0.5 * math.sin(a), 0.12 * i - 0.2, 2.2 - 0.7 * math.cos(a)),
        (0, 0, 2.2), (0, -1, 0), FOV, FOV, w, h).matrices()
        for i, a in enumerate(np.linspace(-0.5, 0.5, 4))]
    rcfg = RasterConfig(width=w, height=h, focal_x=cams[0].focal_x,
                        focal_y=cams[0].focal_y, backend="xla",
                        pair_capacity=1 << 14, max_per_tile=256, chunk=32)
    hidden = DeformHiddenConfig(net_width=32, defor_depth=1,
                                no_coarse_deform=True, no_fine_deform=True)
    opt_cfg = OptimizationConfig()
    bg = jnp.ones(3)
    gts = oracle_images(pts, cols, cams, rcfg, hidden, opt_cfg, bg)

    idx = rng.choice(n, 25, replace=False)
    pts2 = pts[idx] + rng.normal(0, 0.05, (25, 3)).astype(np.float32)
    params, aux = gm.create_from_points(
        pts2, np.full((25, 3), 0.5, np.float32), capacity=cap)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                       white_background=True, disable_filter3d=True,
                       radegs_from_iter=10 ** 9, reg_coef=0.0,
                       opacity_l1_coef=0.0001)
    step = make_train_step(setup, opt_cfg, optimizer)
    densify_fn = make_densify_step(opt_cfg, opt_cfg.percent_dense, 1.0)
    knn = update_knn_cache(state.params["gaussians"], aux)
    key = jax.random.PRNGKey(0)
    for i in range(1, 361):
        state, aux, _ = step(state, aux,
                             batch_of(cams[i % 4], gts[i % 4]), knn)
        if 40 < i < 300 and i % 60 == 0:
            key, sub = jax.random.split(key)
            state, aux, _, _ = densify_fn(state, aux, sub, 1e-5)
            knn = update_knn_cache(state.params["gaussians"], aux)
    alive = int(jnp.sum(aux.alive))
    assert alive > 60, alive              # densify actually grew the cloud
    psnr = full_psnr(state, aux, hidden, cams, gts, rcfg, bg, 360)
    assert psnr > 28.0, psnr


@pytest.mark.slow
@pytest.mark.parametrize("bf16_mlp", [False, True],
                         ids=["f32", "bf16_activations"])
def test_deformation_learns_motion_at_held_out_time(bf16_mlp):
    """A globally swaying scene, one timestep held out: the trained model's
    render at the held-out time must beat a far-off-time render by >= 3 dB —
    i.e. the temporal embedding + deformation MLP interpolate real motion,
    they don't just average it away.

    Runs twice: the reference-exact f32 towers and the bf16-activation mode
    (DeformHiddenConfig.bf16_activations) — the convergence A/B gating the
    quality deviation of the bf16 fast path."""
    w = h = 48
    n, cap = 60, 128
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-0.45, 0.45, n), rng.uniform(-0.45, 0.45, n),
                    rng.uniform(2.0, 2.4, n)], 1).astype(np.float32)
    cols = rng.uniform(0.25, 0.95, (n, 3)).astype(np.float32)

    def moved(t):
        p = pts.copy()
        p[:, 0] += 0.25 * math.sin(2 * math.pi * t)
        p[:, 1] += 0.15 * math.cos(2 * math.pi * t)
        return p

    cams = [look_at_camera((0.4 * s, -0.1, 2.2 - 0.6 * abs(s)), (0, 0, 2.2),
                           (0, -1, 0), FOV, FOV, w, h).matrices()
            for s in (-0.5, 0.5)]
    rcfg = RasterConfig(width=w, height=h, focal_x=cams[0].focal_x,
                        focal_y=cams[0].focal_y, backend="xla",
                        pair_capacity=1 << 14, max_per_tile=256, chunk=32)
    hidden = DeformHiddenConfig(net_width=64, defor_depth=1, use_anneal=False,
                                min_embeddings=6, max_embeddings=12,
                                c2f_temporal_iter=200, total_num_frames=6,
                                bf16_activations=bf16_mlp)
    # 10x LRs: the reference schedule is built for 80k iterations
    opt_cfg = OptimizationConfig(
        deformation_lr_init=0.0016, deformation_lr_final=0.00016,
        position_lr_init=0.0016, position_lr_final=0.00016,
        position_lr_max_steps=600, deformation_lr_max_steps=600)
    bg = jnp.zeros(3)
    times = np.arange(6) / 6.0
    hold = 2

    def gt_render(cam, t):
        pgt, agt = gm.create_from_points(moved(t), cols, capacity=64)
        st, _ = init_train_state(pgt, hidden, opt_cfg, 1.0)
        return np.asarray(render(
            pgt, agt, st.params["deform"], hidden,
            settings_from_camera(cam, float(t), 0), rcfg, bg,
            iteration=0, disable_deform=True)["render"])

    GT = {(ci, ti): gt_render(cam, t)
          for ci, cam in enumerate(cams) for ti, t in enumerate(times)}

    params, aux = gm.create_from_points(
        moved(0.0) + rng.normal(0, 0.02, (n, 3)).astype(np.float32), cols,
        capacity=cap)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                       white_background=False, disable_filter3d=True,
                       radegs_from_iter=10 ** 9, reg_coef=0.01,
                       opacity_l1_coef=0.0, num_down_emb=6)
    step = make_train_step(setup, opt_cfg, optimizer)
    knn = update_knn_cache(state.params["gaussians"], aux)
    train_tis = [0, 1, 3, 4, 5]
    for i in range(1, 251):
        ti = train_tis[i % 5]
        state, aux, _ = step(state, aux,
                             batch_of(cams[i % 2], GT[(i % 2, ti)],
                                      times[ti]), knn)

    def eval_at(t_query, ti_gt):
        ps = []
        for ci, cam in enumerate(cams):
            o = render(state.params["gaussians"], aux,
                       state.params["deform"], hidden,
                       settings_from_camera(cam, float(t_query), 0), rcfg,
                       bg, iteration=250)
            ps.append(float(jnp.mean(L.psnr(
                o["render"][None], jnp.asarray(GT[(ci, ti_gt)])[None]))))
        return float(np.mean(ps))

    held = eval_at(times[hold], hold)          # unseen timestep, right time
    wrong = eval_at(times[5], hold)            # far-off time vs held-out GT
    trained = eval_at(times[0], 0)
    assert trained > 23.0, trained
    assert held > 23.0, (held, wrong)
    assert held - wrong >= 3.0, (held, wrong)  # motion actually learned


@pytest.mark.slow
def test_pallas_kernel_path_trains_end_to_end():
    """The real Pallas forward + 2-pass backward kernels (interpret mode on
    CPU) inside the full jitted train step: loss must drop substantially and
    PSNR improve — covers payload packing, the tile kernels, segment-sum
    gradient accumulation, and Adam end to end."""
    w = h = 32
    n = 40
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-0.4, 0.4, n), rng.uniform(-0.4, 0.4, n),
                    rng.uniform(2.0, 2.4, n)], 1).astype(np.float32)
    cols = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
    cam = look_at_camera((0, 0, 0), (0, 0, 2.2), (0, -1, 0), FOV, FOV,
                         w, h).matrices()
    rcfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x,
                        focal_y=cam.focal_y, backend="pallas",
                        interpret=True, pair_capacity=1 << 11, chunk=16)
    hidden = DeformHiddenConfig(net_width=32, defor_depth=1,
                                no_coarse_deform=True, no_fine_deform=True)
    opt_cfg = OptimizationConfig()
    bg = jnp.ones(3)
    gt = oracle_images(pts, cols, [cam], rcfg, hidden, opt_cfg, bg)[0]

    params, aux = gm.create_from_points(
        pts + rng.normal(0, 0.04, (n, 3)).astype(np.float32),
        np.full((n, 3), 0.5, np.float32), capacity=64)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                       white_background=True, disable_filter3d=True,
                       radegs_from_iter=10 ** 9, reg_coef=0.0,
                       opacity_l1_coef=0.0)
    step = make_train_step(setup, opt_cfg, optimizer)
    knn = update_knn_cache(state.params["gaussians"], aux)
    batch = batch_of(cam, gt)
    first = None
    for _ in range(60):
        state, aux, m = step(state, aux, batch, knn)
        if first is None:
            first = (float(m["loss"]), float(m["psnr"]))
    final = (float(m["loss"]), float(m["psnr"]))
    assert final[0] < 0.55 * first[0], (first, final)
    assert final[1] > first[1] + 3.0, (first, final)
