"""Per-tile truncation must be SURFACED, not silent: a pathological dense
tile trips `tile_overflow` on every capped backend (the reference processes
unbounded per-tile ranges, rasterizer_impl.cu:151-173 — fixed-capacity TPU
tiles report instead)."""

import math

import numpy as np
import jax.numpy as jnp

from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize import RasterConfig, rasterize

W = H = 32


def build_proj(n, spread):
    """n gaussians all landing on the same tile (spread ~ 0) or spread out."""
    rng = np.random.default_rng(0)
    means = np.stack([rng.uniform(-spread, spread, n),
                      rng.uniform(-spread, spread, n),
                      rng.uniform(2.0, 2.4, n)], 1).astype(np.float32)
    scales = np.full((n, 3), 0.01, np.float32)
    q = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (n, 1))
    opac = np.full(n, 0.5, np.float32)
    fov = math.radians(55.0)
    m = look_at_camera((0, 0, 0), (0, 0, 2.2), (0, -1, 0), fov, fov,
                       W, H).matrices()
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(opac), jnp.zeros((n, 16, 3)),
        viewmatrix=jnp.asarray(m.world_view),
        projmatrix=jnp.asarray(m.full_proj), campos=jnp.asarray(m.campos),
        width=W, height=H, tan_fovx=m.tan_fovx, tan_fovy=m.tan_fovy,
        focal_x=m.focal_x, focal_y=m.focal_y, kernel_size=0.0, sh_degree=0,
        colors_precomp=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)))
    return proj, m


def _cfg(backend, **kw):
    m = build_proj(1, 0.1)[1]
    base = dict(width=W, height=H, focal_x=m.focal_x, focal_y=m.focal_y,
                pair_capacity=1 << 12, backend=backend)
    base.update(kw)
    return RasterConfig(**base)


def test_xla_backend_reports_tile_overflow():
    proj, _ = build_proj(200, 0.02)      # all on the center tile
    cfg = _cfg("xla", max_per_tile=64, chunk=32)
    out = rasterize(proj, jnp.zeros(200), jnp.ones(3), cfg)
    assert bool(out.tile_overflow)
    # spread-out scene under the cap: no overflow
    proj2, _ = build_proj(200, 0.6)
    out2 = rasterize(proj2, jnp.zeros(200), jnp.ones(3),
                     _cfg("xla", max_per_tile=512, chunk=32))
    assert not bool(out2.tile_overflow)


def test_pallas_interpret_reports_tile_overflow():
    # the pallas kernel caps at chunk*512 pairs/tile; chunk=8 -> cap 4096.
    # 4600 gaussians stacked on the center tile exceed it.
    proj, _ = build_proj(4600, 0.02)
    cfg = _cfg("pallas", chunk=8, interpret=True, pair_capacity=1 << 13)
    out = rasterize(proj, jnp.zeros(4600), jnp.ones(3), cfg)
    assert bool(out.tile_overflow)
    # spread-out scene under the cap: no overflow
    proj2, _ = build_proj(100, 0.3)
    out2 = rasterize(proj2, jnp.zeros(100), jnp.ones(3),
                     _cfg("pallas", chunk=8, interpret=True))
    assert not bool(out2.tile_overflow)


def test_reference_backend_never_overflows():
    proj, _ = build_proj(200, 0.02)
    out = rasterize(proj, jnp.zeros(200), jnp.ones(3), _cfg("reference"))
    assert not bool(out.tile_overflow)
