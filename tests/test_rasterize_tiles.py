"""Parity: tiled XLA backend vs the per-pixel oracle on random scenes."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.binning import bin_gaussians, tile_grid
from ed3dgs_tpu.ops.rasterize_ref import rasterize_reference
from ed3dgs_tpu.ops.rasterize_tiles import rasterize_tiles


def random_scene(n, seed=0, depth_range=(1.5, 4.0)):
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-1.0, 1.0, n),
        rng.uniform(-1.0, 1.0, n),
        rng.uniform(*depth_range, n),
    ], axis=1).astype(np.float32)
    scales = np.exp(rng.normal(-2.5, 0.5, (n, 3))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, n).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    tongue = (rng.uniform(0, 1, n) > 0.7).astype(np.float32)
    return means, scales, q, opac, rgb, tongue


def project(cam, means, scales, quats, opac, rgb, kernel_size=0.1):
    n = means.shape[0]
    return project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.zeros((n, 16, 3)),
        viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.campos), width=cam.width, height=cam.height,
        tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        focal_x=cam.focal_x, focal_y=cam.focal_y,
        kernel_size=kernel_size, sh_degree=0, colors_precomp=jnp.asarray(rgb),
    )


@pytest.mark.parametrize("wh", [(64, 64), (80, 48), (50, 34)])
def test_tiles_match_oracle(wh):
    w, h = wh
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 1), (0, -1, 0), fov, fov, w, h).matrices()
    means, scales, quats, opac, rgb, tongue = random_scene(300, seed=w)
    proj = project(cam, means, scales, quats, opac, rgb)
    bg = jnp.array([0.1, 0.2, 0.3])
    ref = rasterize_reference(proj, jnp.asarray(tongue), bg, width=w, height=h,
                              focal_x=cam.focal_x, focal_y=cam.focal_y)
    tiled = rasterize_tiles(proj, jnp.asarray(tongue), bg, width=w, height=h,
                            focal_x=cam.focal_x, focal_y=cam.focal_y,
                            pair_capacity=1 << 15, max_per_tile=512, chunk=32)
    for name in ref._fields:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(tiled, name))
        assert a.shape == b.shape, name
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3, err_msg=name)


def test_tiles_gradients_match_oracle():
    w = h = 48
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 1), (0, -1, 0), fov, fov, w, h).matrices()
    means, scales, quats, opac, rgb, tongue = random_scene(64, seed=7)
    bg = jnp.array([0.0, 0.0, 0.0])

    target = np.random.default_rng(1).uniform(0, 1, (3, h, w)).astype(np.float32)

    def loss_with(backend):
        def f(means_, opac_, rgb_):
            proj = project(cam, means_, scales, quats, opac_, rgb_)
            out = backend(proj)
            return (jnp.mean(jnp.abs(out.color - target))
                    + 0.1 * jnp.mean(out.expected_depth)
                    + 0.05 * jnp.mean(out.normal ** 2))
        return f

    ref_backend = lambda p: rasterize_reference(
        p, jnp.asarray(tongue), bg, width=w, height=h,
        focal_x=cam.focal_x, focal_y=cam.focal_y)
    tile_backend = lambda p: rasterize_tiles(
        p, jnp.asarray(tongue), bg, width=w, height=h,
        focal_x=cam.focal_x, focal_y=cam.focal_y,
        pair_capacity=1 << 13, max_per_tile=256, chunk=32)

    args = (jnp.asarray(means), jnp.asarray(opac), jnp.asarray(rgb))
    g_ref = jax.grad(loss_with(ref_backend), argnums=(0, 1, 2))(*args)
    g_tile = jax.grad(loss_with(tile_backend), argnums=(0, 1, 2))(*args)
    for gr, gt in zip(g_ref, g_tile):
        gr, gt = np.asarray(gr), np.asarray(gt)
        assert np.all(np.isfinite(gt))
        denom = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gt, gr, atol=3e-3 * denom, rtol=2e-2)


def test_binning_counts():
    w = h = 64
    fov = math.radians(60.0)
    cam = look_at_camera((0, 0, 0), (0, 0, 1), (0, -1, 0), fov, fov, w, h).matrices()
    means, scales, quats, opac, rgb, _ = random_scene(100, seed=3)
    proj = project(cam, means, scales, quats, opac, rgb)
    bins = bin_gaussians(proj, width=w, height=h, pair_capacity=1 << 14)
    total = int(np.asarray(proj.tiles_touched).sum())
    assert int(bins.num_pairs) == total
    assert int(np.asarray(bins.tile_count).sum()) == min(total, 1 << 14)
    gx, gy = tile_grid(w, h)
    assert bins.tile_start.shape[0] == gx * gy
    # per-tile depth order: within each tile the ranks must be increasing
    pt = np.asarray(bins.pair_tile)
    pg = np.asarray(bins.pair_gauss)
    for t in range(gx * gy):
        ranks = pg[pt == t]
        assert np.all(np.diff(ranks) > 0)
