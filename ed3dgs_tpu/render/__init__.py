"""High-level differentiable renderer: deform -> activate -> project -> blend.

API parity with the reference gaussian_renderer.render / render_tongue /
render_without_tongue (gaussian_renderer/__init__.py:8-431): returns the same
output dictionary keys. The whole function is jit-able; camera matrices enter
as arrays, static ints (W, H) via the RasterConfig.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config.params import DeformHiddenConfig
from ..core.projection import project_gaussians
from ..data.cameras import CameraMatrices
from ..models import gaussians as gm
from ..models.deformation import deform_forward
from ..ops.rasterize import RasterConfig, rasterize


class RenderSettings(NamedTuple):
    """Per-camera dynamic inputs (all arrays -> no recompilation per camera)."""

    viewmatrix: jnp.ndarray   # [4,4]
    projmatrix: jnp.ndarray   # [4,4]
    campos: jnp.ndarray       # [3]
    time: jnp.ndarray         # scalar
    cam_no: Optional[jnp.ndarray] = None  # scalar int or None (eval)


def settings_from_camera(cam: CameraMatrices, time=0.0, cam_no=None) -> RenderSettings:
    return RenderSettings(
        viewmatrix=jnp.asarray(cam.world_view),
        projmatrix=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.campos),
        time=jnp.asarray(time, jnp.float32),
        cam_no=None if cam_no is None else jnp.asarray(cam_no, jnp.int32),
    )


def raster_config_from_camera(cam: CameraMatrices, **kw) -> RasterConfig:
    return RasterConfig(width=cam.width, height=cam.height,
                        focal_x=cam.focal_x, focal_y=cam.focal_y, **kw)


def project_for_render(
    params: gm.GaussianParams,
    aux: gm.GaussianAux,
    deform_params,
    hidden_cfg: DeformHiddenConfig,
    settings: RenderSettings,
    raster_cfg: RasterConfig,
    *,
    iteration=0,
    sh_degree: int = 3,
    kernel_size: float = 0.0,
    disable_filter3d: bool = True,
    disable_deform: bool = False,
    num_down_emb_c: int = 30,
    num_down_emb_f: int = 30,
    tongue_filter: Optional[str] = None,  # None | "only" | "without"
    mean2d_offset: Optional[jnp.ndarray] = None,
    active_sh_degree=None,
):
    """Deform -> activate -> project one camera: the per-camera first half of
    render(), split out so the batched strip-exchange trainer path (--comms
    strip) can vmap THIS over cameras and hoist the single collective
    rasterize out of the vmap (all_to_all does not compose with vmap).
    Returns (proj, shs_f, xyz_f, extras)."""
    shs = gm.get_features(params)
    if disable_deform:
        xyz_f, scales_f = params.xyz, params.scaling
        rot_f, opac_f, shs_f = params.rotation, params.opacity, shs
        extras = None
    else:
        (xyz_f, scales_f, rot_f, opac_f, shs_f), extras = deform_forward(
            deform_params, hidden_cfg,
            params.xyz, params.scaling, params.rotation, params.opacity, shs,
            params.embedding, settings.time, iteration, cam_no=settings.cam_no,
            num_down_emb_c=num_down_emb_c, num_down_emb_f=num_down_emb_f,
        )

    # safe normalize: dead slots may carry zero quaternions, and ||.|| has a
    # non-finite derivative at exactly 0 (0-cotangent * NaN still poisons)
    rot_sq = jnp.sum(rot_f * rot_f, axis=-1, keepdims=True)
    rot_act = rot_f / jnp.sqrt(jnp.where(rot_sq < 1e-24, 1.0, rot_sq))

    if active_sh_degree is not None:
        # oneupSHdegree (gaussian_model.py:146-148) without recompiling:
        # zeroing bands above the active degree is exactly truncated SH eval,
        # so the degree can be a traced value under one jit.
        band = jnp.asarray([0] + [1] * 3 + [2] * 5 + [3] * 7, jnp.int32)
        shs_f = shs_f * (band <= active_sh_degree)[None, :, None]
    if disable_filter3d:
        scales_act = jnp.exp(scales_f)
        opac_act = jax.nn.sigmoid(opac_f)
    else:
        scales_act, opac_act = gm.apply_3d_filter(opac_f, scales_f, aux.filter_3d)

    mask = aux.alive
    if tongue_filter == "only":
        mask = mask & (jnp.round(aux.tongue_class[:, 0]) > 0.5)
    elif tongue_filter == "without":
        mask = mask & ~(jnp.round(aux.tongue_class[:, 0]) > 0.5)

    proj = project_gaussians(
        xyz_f, scales_act, rot_act, opac_act[:, 0], shs_f,
        viewmatrix=settings.viewmatrix, projmatrix=settings.projmatrix,
        campos=settings.campos, width=raster_cfg.width, height=raster_cfg.height,
        tan_fovx=raster_cfg.width / (2.0 * raster_cfg.focal_x),
        tan_fovy=raster_cfg.height / (2.0 * raster_cfg.focal_y),
        focal_x=raster_cfg.focal_x, focal_y=raster_cfg.focal_y,
        kernel_size=kernel_size, sh_degree=sh_degree, mask=mask,
        mean2d_offset=mean2d_offset,
    )
    return proj, shs_f, xyz_f, extras


def render(
    params: gm.GaussianParams,
    aux: gm.GaussianAux,
    deform_params,
    hidden_cfg: DeformHiddenConfig,
    settings: RenderSettings,
    raster_cfg: RasterConfig,
    bg: jnp.ndarray,
    *,
    iteration=0,
    sh_degree: int = 3,
    kernel_size: float = 0.0,
    disable_filter3d: bool = True,
    disable_deform: bool = False,
    num_down_emb_c: int = 30,
    num_down_emb_f: int = 30,
    tongue_filter: Optional[str] = None,  # None | "only" | "without"
    mean2d_offset: Optional[jnp.ndarray] = None,
    active_sh_degree=None,
    mesh=None,
    send_capacity: Optional[int] = None,
) -> dict:
    """One differentiable render (reference gaussian_renderer.render :8-142).

    tongue_filter implements render_tongue / render_without_tongue
    (:145-431): the full set is deformed, then only the (non-)tongue subset
    rasterized via the validity mask.

    mesh: optional jax Mesh with a "gauss" axis — renders this one camera
    across all chips via tile-sharded rasterization
    (parallel/tile_sharded.py); params/aux should be gauss-sharded.
    """
    proj, shs_f, xyz_f, extras = project_for_render(
        params, aux, deform_params, hidden_cfg, settings, raster_cfg,
        iteration=iteration, sh_degree=sh_degree, kernel_size=kernel_size,
        disable_filter3d=disable_filter3d, disable_deform=disable_deform,
        num_down_emb_c=num_down_emb_c, num_down_emb_f=num_down_emb_f,
        tongue_filter=tongue_filter, mean2d_offset=mean2d_offset,
        active_sh_degree=active_sh_degree)
    send_overflow = None
    if mesh is not None:
        # multi-chip single-camera scaling: Gaussian-sharded projection above,
        # explicit payload exchange + strip-sharded blending below
        from ..parallel.tile_sharded import tile_sharded_rasterize
        out, send_overflow = tile_sharded_rasterize(
            proj, aux.tongue_class[:, 0], bg, raster_cfg, mesh,
            send_capacity=send_capacity)
    else:
        out = rasterize(proj, aux.tongue_class[:, 0], bg, raster_cfg)
    return assemble_outputs(out, proj, shs_f, xyz_f, extras, send_overflow)


def assemble_outputs(out, proj, shs_f, xyz_f, extras, send_overflow=None):
    """RasterOutputs + projection residues -> the reference's output dict."""
    # true (tile, gaussian) pair demand of this view — the trainer uses it to
    # right-size the static pair_capacity (all binning/sort/gather/kernel
    # costs scale with it; an oversized buffer measured 113 vs 85 ms/step)
    num_pairs = jnp.sum(jnp.where(proj.valid, proj.tiles_touched, 0))

    return {
        "render": out.color,
        "num_pairs": num_pairs,
        # tile-sharded path only: max per-(src,dst) splat demand — if it
        # exceeds send_capacity, deepest splats were dropped (re-render with
        # a larger capacity)
        "send_overflow": send_overflow,
        # [] bool: a tile exceeded the backend's per-tile splat cap and was
        # truncated (raise max_per_tile for the xla backend / chunk for
        # pallas); reported by every backend including tile-sharded strips
        "tile_overflow": out.tile_overflow,
        "mask": out.alpha,
        "expected_coord": out.expected_coord,
        "median_coord": out.median_coord,
        "expected_depth": out.expected_depth,
        "median_depth": out.median_depth,
        "viewspace_points": proj.mean2d,
        "visibility_filter": proj.radius > 0,
        "radii": proj.radius,
        "normal": out.normal,
        "sh_coefs_final": shs_f,
        "extras": extras,
        "deformed_gaussian_positions": xyz_f,
        "tongue_mask": out.tongue,
    }
