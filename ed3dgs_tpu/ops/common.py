"""Shared types/constants for the rasterizer backends."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

TILE = 16
ALPHA_MIN = 1.0 / 255.0       # skip threshold (forward.cu:693)
ALPHA_MAX = 0.99              # clamp (forward.cu:692)
T_STOP = 1e-4                 # early-stop transmittance (forward.cu:696)
MEDIAN_T = 0.5                # median crossing (forward.cu:708)
NORMALIZE_EPS = 1e-12         # auxiliary.h:23


class RasterOutputs(NamedTuple):
    """Rendered channels, matching the reference autograd 9-tuple
    (diff_gaussian_rasterization/__init__.py:110-113) in [C, H, W] layout."""

    color: jnp.ndarray          # [3, H, W] alpha-blended RGB + T*bg
    alpha: jnp.ndarray          # [1, H, W] accumulated blend weight
    expected_coord: jnp.ndarray  # [3, H, W] weight-normalized expected cam coord
    median_coord: jnp.ndarray   # [3, H, W] coord at the T=0.5 crossing splat
    expected_depth: jnp.ndarray  # [1, H, W] weight-normalized expected z-depth
    median_depth: jnp.ndarray   # [1, H, W] z-depth at the T=0.5 crossing splat
    normal: jnp.ndarray         # [3, H, W] normalized accumulated splat normal
    tongue: jnp.ndarray         # [1, H, W] blended tongue-class channel
    # [] bool: some tile's true splat demand exceeded the backend's per-tile
    # cap, i.e. the image silently dropped splats (the reference processes
    # unbounded per-tile ranges, rasterizer_impl.cu:151-173 — fixed-capacity
    # TPU tiles must surface truncation instead). None only on paths that
    # cannot truncate.
    tile_overflow: jnp.ndarray | None = None


def safe_div(num: jnp.ndarray, den: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """num/den where mask else 0, with zero (not NaN) gradients off-mask."""
    den_safe = jnp.where(mask, den, 1.0)
    return jnp.where(mask, num / den_safe, 0.0)
