"""Trainer tests: loss math, densify mechanics, synthetic overfit smoke."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.config.params import DeformHiddenConfig, OptimizationConfig
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.ops.rasterize import RasterConfig
from ed3dgs_tpu.render import raster_config_from_camera, settings_from_camera, render
from ed3dgs_tpu.train import losses as L
from ed3dgs_tpu.train.densify import DensifyResult, densify
from ed3dgs_tpu.train.optim import expon_lr_schedule
from ed3dgs_tpu.train.trainer import (TrainSetup, init_train_state,
                                      make_densify_step, make_train_step,
                                      update_knn_cache)


def test_ssim_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from math import exp as mexp

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    def torch_ssim(img1, img2, window_size=11):
        g = torch.tensor([mexp(-(x - window_size // 2) ** 2 / (2 * 1.5 ** 2))
                          for x in range(window_size)])
        g = (g / g.sum()).unsqueeze(1)
        w2 = g.mm(g.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
        mu1 = F.conv2d(img1, w2, padding=5, groups=3)
        mu2 = F.conv2d(img2, w2, padding=5, groups=3)
        s1 = F.conv2d(img1 * img1, w2, padding=5, groups=3) - mu1 ** 2
        s2 = F.conv2d(img2 * img2, w2, padding=5, groups=3) - mu2 ** 2
        s12 = F.conv2d(img1 * img2, w2, padding=5, groups=3) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
        return m.mean().item()

    want = torch_ssim(torch.tensor(a), torch.tensor(b))
    got = float(L.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-4


def test_expon_lr_schedule():
    sched = expon_lr_schedule(1.6e-4, 1.6e-6, lr_delay_mult=0.01, max_steps=20000)
    assert float(sched(0)) == pytest.approx(1.6e-4, rel=1e-5)
    assert float(sched(20000)) == pytest.approx(1.6e-6, rel=1e-5)
    assert float(sched(30000)) == pytest.approx(1.6e-6, rel=1e-5)
    mid = float(sched(10000))
    assert 1.6e-6 < mid < 1.6e-4
    assert mid == pytest.approx(math.sqrt(1.6e-4 * 1.6e-6), rel=1e-4)


def test_psnr():
    a = jnp.zeros((1, 3, 8, 8))
    b = jnp.full((1, 3, 8, 8), 0.1)
    assert float(L.psnr(a, b)[0]) == pytest.approx(20.0, abs=1e-3)


def test_densify_clone_and_split():
    rng = np.random.default_rng(0)
    n, cap = 20, 40
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=cap)
    # mark some gaussians hot: 3 small (clone) + 2 large (split)
    accum = np.zeros(cap, np.float32)
    accum[:5] = 10.0
    denom = np.zeros(cap, np.float32)
    denom[:5] = 1.0
    scaling = np.array(params.scaling)
    scaling[:3] = -8.0   # tiny -> clone
    scaling[3:5] = 2.0   # big -> split
    params = params._replace(scaling=jnp.asarray(scaling))
    aux = aux._replace(xyz_grad_accum=jnp.asarray(accum), denom=jnp.asarray(denom))

    res: DensifyResult = densify(params, aux, jax.random.PRNGKey(0),
                                 grad_threshold=0.5, percent_dense=0.01,
                                 scene_extent=1.0, max_gaussians=1000)
    assert int(res.n_cloned) == 3
    assert int(res.n_split) == 2
    # alive count: 20 + 3 clones + 2 split children
    assert int(jnp.sum(res.aux.alive)) == 25
    # split parents moved and shrank
    assert np.all(np.asarray(res.params.scaling)[3:5] < 2.0)
    # stats reset
    assert float(jnp.sum(res.aux.denom)) == 0
    # capacity cap respected
    res2 = densify(params, aux, jax.random.PRNGKey(0), grad_threshold=0.5,
                   percent_dense=0.01, scene_extent=1.0, max_gaussians=22)
    assert int(jnp.sum(res2.aux.alive)) <= 22 + 1  # clone+split budgeting


def _make_setup(w=64, h=64, n=120, cap=160, batch=1):
    rng = np.random.default_rng(7)
    # ground-truth scene: colored blobs on a plane
    pts = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
                    rng.uniform(2.0, 2.4, n)], 1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    fov = math.radians(60.0)
    cams = [look_at_camera((0.3 * i - 0.3, 0, 0), (0, 0, 2.2), (0, -1, 0),
                           fov, fov, w, h).matrices() for i in range(3)]
    return pts, cols, cams


@pytest.mark.slow
def test_training_improves_psnr():
    pts, cols, cams = _make_setup()
    w = h = 64
    # ground truth images: render a reference cloud with tight gaussians
    params_gt, aux_gt = gm.create_from_points(pts, cols, capacity=160)
    hidden = DeformHiddenConfig(net_width=32, defor_depth=1)
    opt_cfg = OptimizationConfig()
    rcfg = RasterConfig(width=w, height=h, focal_x=cams[0].focal_x,
                        focal_y=cams[0].focal_y, backend="xla",
                        pair_capacity=1 << 14, max_per_tile=256, chunk=32)
    state_gt, _ = init_train_state(params_gt, hidden, opt_cfg, 1.0)
    gts = []
    for cam in cams:
        out = render(params_gt, aux_gt, state_gt.params["deform"], hidden,
                     settings_from_camera(cam, 0.0, 0), rcfg, jnp.ones(3),
                     iteration=0, disable_deform=True)
        gts.append(np.asarray(out["render"]))

    # training cloud: perturbed positions + gray colors
    rng = np.random.default_rng(1)
    pts2 = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
    params, aux = gm.create_from_points(pts2, np.full_like(cols, 0.5), capacity=160)
    state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
    setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                       white_background=True, disable_filter3d=True,
                       radegs_from_iter=10_000_000, reg_coef=0.0,
                       opacity_l1_coef=0.0)
    step = make_train_step(setup, opt_cfg, optimizer)
    knn_cache = update_knn_cache(state.params["gaussians"], aux)

    def batch_for(i):
        cam = cams[i % 3]
        return {
            "gt_image": jnp.asarray(gts[i % 3])[None],
            "viewmatrix": jnp.asarray(cam.world_view)[None],
            "projmatrix": jnp.asarray(cam.full_proj)[None],
            "campos": jnp.asarray(cam.campos)[None],
            "time": jnp.zeros((1,)),
            "cam_no": jnp.zeros((1,), jnp.int32),
            "use_ssim": jnp.asarray(False),
        }

    m0 = None
    for i in range(60):
        state, aux, metrics = step(state, aux, batch_for(i), knn_cache)
        if m0 is None:
            m0 = float(metrics["psnr"])
    m1 = float(metrics["psnr"])
    assert m1 > m0 + 1.0, (m0, m1)  # at least +1dB in 60 steps
    assert np.isfinite(m1)


def test_update_knn_cache_builds_consistent_graph():
    """The prepared graph's fused loss equals the oracle formula the trainer
    used to call directly (masked mean over the alive&non-tongue rows)."""
    from ed3dgs_tpu.ops.knn_loss import knn_loss_fused
    from ed3dgs_tpu.train.trainer import update_knn_cache

    rng = np.random.default_rng(7)
    pts = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (60, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=96)
    cache = update_knn_cache(params, aux, tongue_enabled=False, k=5)
    emb = params.embedding

    v = knn_loss_fused(emb, cache.graph, 5, True)

    tongue = jnp.round(aux.tongue_class[:, 0]) > 0.5
    mask = aux.alive & ~tongue
    far = 1e3 + 1e-3 * jnp.arange(96, dtype=jnp.float32)[:, None]
    pts = jnp.where(mask[:, None], params.xyz, far)
    from ed3dgs_tpu.ops.knn import knn as knn_op
    d2, idx = knn_op(pts, k=5)
    w = jnp.where(mask[:, None], jnp.exp(-2000.0 * jnp.maximum(d2, 0.0)), 0.0)
    v0 = L.embedding_knn_loss(emb, idx, w, mask=mask)
    assert float(v) == pytest.approx(float(v0), rel=1e-5)


def test_refresh_knn_cache_coverage_policy():
    """Production bucket policy: buckets grow until dropped edges fit the
    coverage budget (coverage_target=1.0 demands the exact graph), and an
    oversized far bucket shrinks to its snug 2^17-granular size only after
    the 3-refresh hysteresis."""
    from ed3dgs_tpu.train import trainer

    rng = np.random.default_rng(3)
    # adversarial cloud: big enough that the 768-rank Morton window cannot
    # cover it, dense enough that many true neighbors land out-of-window
    pts = rng.uniform(-1, 1, (7800, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (7800, 3)).astype(np.float32)
    params, aux = gm.create_from_points(pts, cols, capacity=8192)

    # the cloud's true far demand is ~3.3k out-of-window pairs; a 2048 far
    # bucket must overflow, and exact coverage demands growth
    caps = {"spill_a": 256, "spill_b": 256, "far": 2048}
    cache = trainer.refresh_knn_cache(params, aux, caps,
                                      coverage_target=1.0, k=5)
    ovf = np.asarray(cache.graph.overflow)
    assert ovf.sum() == 0, ovf          # exact graph demanded and delivered
    assert caps["far"] > 2048           # far growth happened (2^17 jump)
    assert caps["far"] <= trainer.KNN_CAPS_MAX["far"]
    assert int(cache.graph.n_far) * 1.25 <= caps["far"]

    # far-shrink hysteresis: oversized far bucket, tiny demand
    caps2 = dict(caps, far=1 << 19, _far_quiet=0)
    for i in range(3):
        assert caps2["far"] == 1 << 19, (i, caps2)
        trainer.refresh_knn_cache(params, aux, caps2,
                                  coverage_target=1.0, k=5)
    assert caps2["far"] == 1 << 17, caps2   # snapped to the 2^17 granule
    assert caps2["_far_quiet"] == 0
