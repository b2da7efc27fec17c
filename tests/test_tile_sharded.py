"""Tile-sharded distributed rasterization vs the single-device path.

Runs on the 8-device virtual CPU mesh (conftest). The strip decomposition
re-bins the exchanged splats per strip in the same global depth order and
identical chunk groupings, so outputs should match the single-device
rasterizer to float tolerance.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize import RasterConfig, rasterize
from ed3dgs_tpu.parallel import make_mesh
from ed3dgs_tpu.parallel.tile_sharded import tile_sharded_rasterize

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

W, H = 64, 48  # 4x3 tile grid


def build(n=120, cap=128, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
                      rng.uniform(1.5, 3.0, n)], 1).astype(np.float32)
    means = np.pad(means, ((0, cap - n), (0, 0)))
    scales = np.exp(rng.normal(-2.2, 0.4, (cap, 3))).astype(np.float32)
    q = rng.normal(size=(cap, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, cap).astype(np.float32)
    shs = (rng.normal(0, 0.3, (cap, 16, 3)) *
           np.array([2.0] + [0.2] * 15)[None, :, None]).astype(np.float32)
    tongue = (rng.uniform(0, 1, cap) > 0.7).astype(np.float32)
    mask = np.zeros(cap, bool)
    mask[:n] = True
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 2.0), (0, -1, 0), fov,
                         2 * math.atan(math.tan(fov / 2) * H / W), W, H
                         ).matrices()
    args = dict(viewmatrix=jnp.asarray(cam.world_view),
                projmatrix=jnp.asarray(cam.full_proj),
                campos=jnp.asarray(cam.campos), width=W, height=H,
                tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                focal_x=cam.focal_x, focal_y=cam.focal_y,
                kernel_size=0.1, sh_degree=3, mask=jnp.asarray(mask))
    cfg = RasterConfig(width=W, height=H, focal_x=cam.focal_x,
                       focal_y=cam.focal_y, pair_capacity=1 << 11,
                       max_per_tile=160, chunk=32, backend="xla")
    arrs = tuple(jnp.asarray(a) for a in (means, scales, q, opac, shs))
    return arrs, jnp.asarray(tongue), args, cfg


def test_tile_sharded_matches_single_device():
    (means, scales, q, opac, shs), tongue, args, cfg = build()
    bg = jnp.asarray([1.0, 1.0, 1.0])
    proj = project_gaussians(means, scales, q, opac, shs, **args)
    ref = rasterize(proj, tongue, bg, cfg)

    mesh = make_mesh(data=1, gauss=8)
    out, overflow = jax.jit(
        lambda p, t, b: tile_sharded_rasterize(p, t, b, cfg, mesh)
    )(proj, tongue, bg)

    assert int(overflow) <= 2 * 128 // 8 * 8  # within default capacity
    for name in ref._fields:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4,
                                   err_msg=f"channel {name}")


def test_tile_sharded_gradients_match():
    (means, scales, q, opac, shs), tongue, args, cfg = build(seed=3)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    mesh = make_mesh(data=1, gauss=8)
    tgt = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (3, H, W))
                      .astype(np.float32))

    def loss_single(means, opac, shs):
        proj = project_gaussians(means, scales, q, opac, shs, **args)
        out = rasterize(proj, tongue, bg, cfg)
        return (jnp.mean(jnp.abs(out.color - tgt))
                + 0.1 * jnp.mean(out.expected_depth)
                + 0.1 * jnp.mean(out.normal))

    def loss_sharded(means, opac, shs):
        proj = project_gaussians(means, scales, q, opac, shs, **args)
        out, _ = tile_sharded_rasterize(proj, tongue, bg, cfg, mesh)
        return (jnp.mean(jnp.abs(out.color - tgt))
                + 0.1 * jnp.mean(out.expected_depth)
                + 0.1 * jnp.mean(out.normal))

    g1 = jax.jit(jax.grad(loss_single, argnums=(0, 1, 2)))(means, opac, shs)
    g2 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(means, opac, shs)
    for a, b, nm in zip(g1, g2, ("means", "opac", "shs")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5,
                                   rtol=1e-3, err_msg=f"grad {nm}")


def test_tile_sharded_overflow_reported():
    # small scene + 4-strip mesh: compile cost only, semantics identical
    (means, scales, q, opac, shs), tongue, args, cfg = build(n=48, cap=64)
    from dataclasses import replace as dc_replace
    cfg = dc_replace(cfg, pair_capacity=1 << 10)
    bg = jnp.ones(3)
    proj = project_gaussians(means, scales, q, opac, shs, **args)
    mesh = make_mesh(data=1, gauss=4)
    _, overflow = tile_sharded_rasterize(proj, tongue, bg, cfg, mesh,
                                         send_capacity=4)
    assert int(overflow) > 4  # demand honestly reported past the cap


def test_batched_strip_exchange_matches_single_device():
    """The pre-built hardware-day A/B path: the per-camera strip exchange
    run for a CAMERA BATCH via lax.map inside one shard_map over a
    data=2 x gauss=4 mesh (parallel/tile_sharded.batched_strip_rasterize).
    Parity only — perf is hardware-day task 3 (docs/hardware_day.md)."""
    from ed3dgs_tpu.ops.binning import build_gaussian_payload
    from ed3dgs_tpu.parallel.tile_sharded import batched_strip_rasterize

    (means, scales, q, opac, shs), tongue, args, cfg = build(n=100, seed=7)
    bg = jnp.asarray([0.3, 0.2, 0.1])

    # two cameras: the base view and a slightly shifted one
    fov = math.radians(60.0)
    cam2 = look_at_camera((0.15, 0.1, 0), (0, 0, 2.0), (0, -1, 0), fov,
                          2 * math.atan(math.tan(fov / 2) * H / W), W, H
                          ).matrices()
    args2 = dict(args, viewmatrix=jnp.asarray(cam2.world_view),
                 projmatrix=jnp.asarray(cam2.full_proj),
                 campos=jnp.asarray(cam2.campos))

    projs = [project_gaussians(means, scales, q, opac, shs, **a)
             for a in (args, args2)]
    refs = [rasterize(p, tongue, bg, cfg) for p in projs]

    payload_b = jnp.stack([build_gaussian_payload(p, tongue, pad=False)
                           for p in projs])
    depth_b = jnp.stack([p.depth for p in projs])
    valid_b = jnp.stack([p.valid & (p.tiles_touched > 0) for p in projs])
    rmin_b = jnp.stack([p.rect_min for p in projs])
    rmax_b = jnp.stack([p.rect_max for p in projs])

    mesh = make_mesh(data=2, gauss=4)
    out, overflow = jax.jit(
        lambda *xs: batched_strip_rasterize(*xs, cfg=cfg, mesh=mesh)
    )(payload_b, depth_b, valid_b, rmin_b, rmax_b, bg)

    assert int(overflow) <= 2 * 128 // 4 * 4
    for i, ref in enumerate(refs):
        for name in ref._fields:
            if name == "tile_overflow":
                continue
            a = np.asarray(getattr(ref, name))
            b = np.asarray(getattr(out, name))[i]
            np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4,
                                       err_msg=f"camera {i} channel {name}")
