"""Fixed-capacity Gaussian cloud: parameters, activations, lifecycle, ply I/O.

Re-architecture of the reference GaussianModel (scene/gaussian_model.py:28-604)
for XLA static shapes: the cloud lives in a fixed-capacity pytree with an
`alive` mask. Densify/clone/split/prune (reference :425-518) become masked
scatter ops into free slots (see train.densify) instead of reallocation, so
the jitted train step never recompiles as the point count changes; the Adam
moments live in an optax state over the same pytree and are zeroed at newly
activated slots.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sh import rgb_to_sh
from ..data import ply as plyio
from ..ops.knn import mean_sqdist_3nn


class GaussianParams(NamedTuple):
    """Learnable per-Gaussian parameters (raw / pre-activation), capacity C."""

    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, 15, 3]
    scaling: jnp.ndarray        # [C, 3] log-scales
    rotation: jnp.ndarray       # [C, 4] unnormalized quaternions (w,x,y,z)
    opacity: jnp.ndarray        # [C, 1] logit-opacity
    embedding: jnp.ndarray      # [C, E] per-gaussian latent


class GaussianAux(NamedTuple):
    """Non-learnable per-Gaussian state."""

    alive: jnp.ndarray          # [C] bool
    tongue_class: jnp.ndarray   # [C, 1] float 0/1 (not optimized, ref :63)
    filter_3d: jnp.ndarray      # [C, 1] RaDe-GS 3D low-pass scale
    max_radii2d: jnp.ndarray    # [C] float
    xyz_grad_accum: jnp.ndarray  # [C] densification stat
    denom: jnp.ndarray          # [C]


# --- activations (scene/gaussian_model.py:30-46) ---------------------------

def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def get_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.scaling)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)


def get_rotation(params: GaussianParams) -> jnp.ndarray:
    sq = jnp.sum(params.rotation * params.rotation, axis=-1, keepdims=True)
    return params.rotation / jnp.sqrt(jnp.where(sq < 1e-24, 1.0, sq))


def get_features(params: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def apply_3d_filter(opacity_raw, scaling_raw, filter_3d):
    """Fused 3D-filter scale/opacity correction
    (apply_scaling_n_opacity_with_3D_filter, scene/gaussian_model.py:594-603)."""
    opacity = jax.nn.sigmoid(opacity_raw)
    scales = jnp.exp(scaling_raw)
    s2 = scales * scales
    det1 = jnp.prod(s2, axis=-1)
    s2f = s2 + filter_3d * filter_3d
    det2 = jnp.prod(s2f, axis=-1)
    coef = jnp.sqrt(det1 / det2)
    return jnp.sqrt(s2f), opacity * coef[..., None]


# --- construction ----------------------------------------------------------

def create_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    *,
    capacity: int,
    embedding_dim: int = 32,
    sh_degree: int = 3,
    tongue_mask_loss_enabled: bool = False,
):
    """Initialize from a point cloud (create_from_pcd,
    scene/gaussian_model.py:150-192): SH DC from colors, log-scales from the
    3-NN mean squared distance (clamped to <= 1.0), identity rotations,
    opacity 0.1, zero embeddings; tongue class = pure-red input points."""
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"init cloud ({n}) exceeds capacity ({capacity})")
    C = capacity
    pts = jnp.asarray(points, jnp.float32)
    d2 = jnp.maximum(mean_sqdist_3nn(pts), 1e-7)
    scales = jnp.minimum(jnp.log(jnp.sqrt(d2)), 1.0)[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        widths = [(0, C - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    fused_color = rgb_to_sh(jnp.asarray(colors, jnp.float32))
    params = GaussianParams(
        xyz=pad(pts),
        features_dc=pad(fused_color[:, None, :]),
        features_rest=jnp.zeros((C, (sh_degree + 1) ** 2 - 1, 3), jnp.float32),
        scaling=pad(scales, fill=-10.0),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (C, 1)),
        opacity=pad(jnp.full((n, 1), inverse_sigmoid(jnp.float32(0.1)))),
        embedding=jnp.zeros((C, embedding_dim), jnp.float32),
    )
    red = np.all(np.asarray(colors) == np.array([1.0, 0, 0]), axis=1)
    tongue = jnp.zeros((C, 1), jnp.float32)
    if tongue_mask_loss_enabled and red.any():
        tongue = tongue.at[: n, 0].set(jnp.asarray(red, jnp.float32))
    aux = GaussianAux(
        alive=pad(jnp.ones(n, bool), fill=False),
        tongue_class=tongue,
        filter_3d=jnp.zeros((C, 1), jnp.float32),
        max_radii2d=jnp.zeros(C, jnp.float32),
        xyz_grad_accum=jnp.zeros(C, jnp.float32),
        denom=jnp.zeros(C, jnp.float32),
    )
    return params, aux


def num_alive(aux: GaussianAux) -> jnp.ndarray:
    return jnp.sum(aux.alive.astype(jnp.int32))


# --- RaDe-GS 3D filter (scene/gaussian_model.py:538-592) -------------------

def compute_3d_filter(xyz: jnp.ndarray, alive: jnp.ndarray,
                      view_mats: jnp.ndarray, focals_x: jnp.ndarray,
                      focals_y: jnp.ndarray, widths: jnp.ndarray,
                      heights: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian screen-space low-pass scale from the closest camera.

    Args:
      view_mats: [M, 4, 4] world->view matrices (math convention).
      focals_x/focals_y: [M] per-camera focals; widths/heights: [M].
    Returns:
      [C, 1] filter scale (distance/focal * sqrt(0.2)).
    """
    R = view_mats[:, :3, :3]
    t = view_mats[:, :3, 3]
    cam_xyz = jnp.einsum("mij,nj->mni", R, xyz) + t[:, None, :]
    x, y, z = cam_xyz[..., 0], cam_xyz[..., 1], cam_xyz[..., 2]
    valid_depth = z > 0.2
    zc = jnp.maximum(z, 0.001)
    px = x / zc * focals_x[:, None] + widths[:, None] / 2.0
    py = y / zc * focals_y[:, None] + heights[:, None] / 2.0
    in_screen = (
        (px >= -0.15 * widths[:, None]) & (px <= 1.15 * widths[:, None])
        & (py >= -0.15 * heights[:, None]) & (py <= 1.15 * heights[:, None])
    )
    valid = valid_depth & in_screen & alive[None, :]
    dist = jnp.min(jnp.where(valid, z, 1e5), axis=0)
    seen = jnp.any(valid, axis=0)
    max_seen = jnp.max(jnp.where(seen, dist, -jnp.inf))
    dist = jnp.where(seen, dist, max_seen)
    focal = jnp.max(focals_x)
    return (dist / focal * math.sqrt(0.2))[:, None]


# --- ply checkpoint I/O (scene/gaussian_model.py:231-347) ------------------

def save_ply(path: str, params: GaussianParams, aux: GaussianAux):
    """Write alive Gaussians in the reference's attribute layout (channel-major
    feature flattening), so checkpoints load in either implementation."""
    alive = np.asarray(aux.alive)
    xyz = np.asarray(params.xyz)[alive]
    n = xyz.shape[0]
    f_dc = np.asarray(params.features_dc)[alive].transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(params.features_rest)[alive].transpose(0, 2, 1).reshape(n, -1)
    names = ["x", "y", "z", "nx", "ny", "nz", "f_dc", "f_rest", "opacity",
             "scale", "rot", "embedding", "tongue_class", "filter_3D"]
    arrays = [xyz[:, 0], xyz[:, 1], xyz[:, 2],
              np.zeros(n), np.zeros(n), np.zeros(n),
              f_dc, f_rest,
              np.asarray(params.opacity)[alive],
              np.asarray(params.scaling)[alive],
              np.asarray(params.rotation)[alive],
              np.asarray(params.embedding)[alive],
              np.asarray(aux.tongue_class)[alive],
              np.asarray(aux.filter_3d)[alive]]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plyio.write_ply(path, names, arrays)


def load_ply(path: str, *, capacity: Optional[int] = None, sh_degree: int = 3):
    """Load a Gaussian checkpoint ply -> (params, aux). Accepts files written
    by this framework or by the reference CUDA implementation."""
    data = plyio.read_ply(path)["vertex"]
    names = data.dtype.names
    n = len(data)
    C = capacity or n

    def grab(prefix, count):
        cols = sorted((x for x in names if x.startswith(prefix)),
                      key=lambda s: int(s.split("_")[-1]))
        assert len(cols) == count, (prefix, len(cols), count)
        return np.stack([data[c] for c in cols], axis=1).astype(np.float32)

    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float32)
    k = (sh_degree + 1) ** 2
    f_dc = grab("f_dc_", 3).reshape(n, 3, 1).transpose(0, 2, 1)
    f_rest = grab("f_rest_", 3 * (k - 1)).reshape(n, 3, k - 1).transpose(0, 2, 1)
    scal = grab("scale_", 3)
    rot = grab("rot_", 4)
    emb_cols = [x for x in names if x.startswith("embedding_")]
    emb = grab("embedding_", len(emb_cols)) if emb_cols else np.zeros((n, 32), np.float32)
    opac = np.asarray(data["opacity"], np.float32)[:, None]
    tongue = (np.asarray(data["tongue_class"], np.float32)[:, None]
              if "tongue_class" in names else np.zeros((n, 1), np.float32))
    filt = (np.asarray(data["filter_3D"], np.float32)[:, None]
            if "filter_3D" in names else np.zeros((n, 1), np.float32))

    def pad(x, fill=0.0):
        return jnp.asarray(np.pad(x, [(0, C - n)] + [(0, 0)] * (x.ndim - 1),
                                  constant_values=fill))

    params = GaussianParams(
        xyz=pad(xyz), features_dc=pad(f_dc), features_rest=pad(f_rest),
        scaling=pad(scal, -10.0), rotation=pad(rot), opacity=pad(opac),
        embedding=pad(emb),
    )
    aux = GaussianAux(
        alive=jnp.asarray(np.pad(np.ones(n, bool), (0, C - n))),
        tongue_class=pad(tongue), filter_3d=pad(filt),
        max_radii2d=jnp.zeros(C, jnp.float32),
        xyz_grad_accum=jnp.zeros(C, jnp.float32),
        denom=jnp.zeros(C, jnp.float32),
    )
    return params, aux
