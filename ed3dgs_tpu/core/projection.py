"""Per-Gaussian projection/preprocessing: EWA splatting + RaDe-GS geometry.

This is the TPU-native equivalent of the reference preprocess kernel
(submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:307-545 with
computeCov2D forward.cu:77-264): for every Gaussian it computes, vectorized
over the N axis as pure VPU-friendly jnp,

  * frustum validity, clip-space projection and pixel-space center,
  * the 2D screen covariance with the mip-splatting low-pass `kernel_size`
    and its opacity-compensation coefficient,
  * the inverse-conic + radius + 16x16 tile rectangle,
  * the RaDe-GS per-splat geometry: camera planes (d coord / d pixel),
    ray plane (d depth / d pixel) and splat normal,
  * SH -> RGB color.

All math uses standard (row-vector-free) conventions: matrices act on column
vectors; no transposed-storage tricks from the CUDA/glm code are carried over.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .camera_math import ndc_to_pixel
from .quaternion import (build_covariance_3d, sym3_congruence,
                         sym3_matvec)
from .sh import sh_to_rgb
from .sym3 import sym3_pseudo_inverse_min

TILE = 16  # BLOCK_X = BLOCK_Y (reference config.h:16-17)
NEAR_PLANE = 0.2
ALPHA_MIN = 1.0 / 255.0  # blend skip threshold; must match ops.common.ALPHA_MIN


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space payload (all [N, ...], float32 unless noted)."""

    valid: jnp.ndarray          # [N] bool: survives culling and has nonzero extent
    mean2d: jnp.ndarray         # [N, 2] pixel-space center
    depth: jnp.ndarray          # [N] view-space z (sort key)
    view_point: jnp.ndarray     # [N, 3] view-space position
    conic: jnp.ndarray          # [N, 3] inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray        # [N] opacity * low-pass compensation coef
    radius: jnp.ndarray         # [N] int32 screen-space radius (pixels)
    rect_min: jnp.ndarray       # [N, 2] int32 tile rect (x, y) inclusive start
    rect_max: jnp.ndarray       # [N, 2] int32 tile rect exclusive end
    tiles_touched: jnp.ndarray  # [N] int32
    camera_planes: jnp.ndarray  # [N, 6] d(cam xyz)/d(pixel xy)
    ray_plane: jnp.ndarray      # [N, 2] d(ray depth)/d(pixel xy)
    normal: jnp.ndarray         # [N, 3] camera-space splat normal
    ts: jnp.ndarray             # [N] distance camera->gaussian (ray depth at center)
    rgb: jnp.ndarray            # [N, 3] SH-evaluated color
    cov3d: jnp.ndarray          # [N, 6] packed world covariance (residual for bwd)
    invraycov: jnp.ndarray | None = None  # [N, 6] 3D ray-space inverse covariance
    well_conditioned: jnp.ndarray | None = None  # [N] bool (integrate path)


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    *,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    focal_x: float,
    focal_y: float,
    kernel_size: float = 0.0,
    sh_degree: int = 3,
    colors_precomp: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    mean2d_offset: jnp.ndarray | None = None,
    compute_invraycov: bool = False,
) -> ProjectedGaussians:
    """Project N Gaussians into one camera. Shapes: means3d [N,3], scales [N,3]
    (activated), quats [N,4] (unit), opacities [N], shs [N,K,3]."""
    N = means3d.shape[0]
    f32 = jnp.float32
    means3d = means3d.astype(f32)
    V = viewmatrix.astype(f32)
    P = projmatrix.astype(f32)
    R_cw = V[:3, :3]

    # --- view transform + frustum cull (forward.cu:350-358, auxiliary.h:155-178)
    p_view = means3d @ R_cw.T + V[:3, 3]
    in_frustum = p_view[:, 2] > NEAR_PLANE

    p_hom = means3d @ P[:3, :3].T + P[:3, 3]
    w_hom = means3d @ P[3, :3].T + P[3, 3]
    p_w = 1.0 / (w_hom + 1e-7)
    p_proj = p_hom * p_w[:, None]

    # --- world covariance (forward.cu:270-304)
    cov3d = build_covariance_3d(scales, quats)

    # --- EWA 2D covariance with fov-clamped view point (forward.cu:85-118)
    tz = p_view[:, 2]
    safe_tz = jnp.where(jnp.abs(tz) > 1e-8, tz, 1e-8)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    u = jnp.clip(p_view[:, 0] / safe_tz, -limx, limx)
    v = jnp.clip(p_view[:, 1] / safe_tz, -limy, limy)
    tx, ty = u * tz, v * tz

    Sigma_cam = sym3_congruence(R_cw, cov3d)        # packed [N, 6]
    # J rows: d(fx*x/z)/d(xyz), d(fy*y/z)/d(xyz) at the clamped point.
    inv_tz = 1.0 / safe_tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz * inv_tz
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz * inv_tz
    s00, s01, s02 = Sigma_cam[:, 0], Sigma_cam[:, 1], Sigma_cam[:, 2]
    s11, s12, s22 = Sigma_cam[:, 3], Sigma_cam[:, 4], Sigma_cam[:, 5]
    c00 = j00 * j00 * s00 + 2.0 * j00 * j02 * s02 + j02 * j02 * s22
    c01 = j00 * j11 * s01 + j00 * j12 * s02 + j02 * j11 * s12 + j02 * j12 * s22
    c11 = j11 * j11 * s11 + 2.0 * j11 * j12 * s12 + j12 * j12 * s22

    det0 = jnp.maximum(1e-6, c00 * c11 - c01 * c01)
    ck00, ck11 = c00 + kernel_size, c11 + kernel_size
    det1 = jnp.maximum(1e-6, ck00 * ck11 - c01 * c01)
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)
    coef = jnp.where((det0 <= 1e-6) | (det1 <= 1e-6), 0.0, coef)

    # --- conic + radius + tile rect (forward.cu:384-403)
    det = ck00 * ck11 - c01 * c01
    nonzero_det = det != 0.0
    det_inv = 1.0 / jnp.where(nonzero_det, det, 1.0)
    conic = jnp.stack([ck11 * det_inv, -c01 * det_inv, ck00 * det_inv], axis=-1)
    mid = 0.5 * (ck00 + ck11)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))
    mean2d = jnp.stack(
        [ndc_to_pixel(p_proj[:, 0], width), ndc_to_pixel(p_proj[:, 1], height)], axis=-1
    )
    if mean2d_offset is not None:
        # zero-valued hook: grad w.r.t. this input is the screen-space mean
        # gradient the densification heuristic needs (the TPU replacement for
        # the reference's screenspace_points trick, gaussian_renderer/__init__.py:16)
        mean2d = mean2d + mean2d_offset
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    # Tile rect: instead of the reference's opacity-blind 3*sigma_max square
    # (forward.cu:398-403), use the axis-aligned bbox of the *exact* level set
    # {d : alpha(d) >= 1/255}. A pixel contributes iff
    #   op_eff * exp(-q(d)) >= 1/255  <=>  q(d) <= ln(255 * op_eff) =: cmax,
    # and the bbox half-extents of {q <= cmax} are sqrt(2*cmax*Sigma_blur_ii).
    # Strictly conservative (identical outputs/grads) yet far tighter for
    # anisotropic or faint splats, so every downstream stage (binning, sort,
    # gather, tile kernel) does proportionally less work.
    op_eff = opacities.astype(f32) * coef
    cmax = jnp.log(jnp.maximum(op_eff, 1e-12) * (1.0 / ALPHA_MIN))
    safe_c = 2.0 * jnp.maximum(cmax, 0.0)
    ex = jnp.sqrt(safe_c * jnp.maximum(ck00, 0.0)) * (1.0 + 1e-6) + 0.3
    ey = jnp.sqrt(safe_c * jnp.maximum(ck11, 0.0)) * (1.0 + 1e-6) + 0.3
    rmin_x = jnp.clip(((mean2d[:, 0] - ex) / TILE).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((mean2d[:, 1] - ey) / TILE).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(((mean2d[:, 0] + ex + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    rmax_y = jnp.clip(((mean2d[:, 1] + ey + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    tiles = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    tiles = jnp.where(cmax > 0.0, tiles, 0)

    valid = in_frustum & nonzero_det & (tiles > 0)
    if mask is not None:
        valid = valid & mask
    radius_i = jnp.where(valid, radius, 0.0).astype(jnp.int32)
    tiles = jnp.where(valid, tiles, 0)

    # --- RaDe-GS plane/normal geometry (forward.cu:135-262)
    sigma_inv, well = sym3_pseudo_inverse_min(cov3d)
    cov_cam_inv = sym3_congruence(R_cw, sigma_inv)  # packed [N, 6]
    uvh = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
    uvh_m = jnp.stack(sym3_matvec(cov_cam_inv, u, v, jnp.ones_like(u)),
                      axis=-1)
    uvh_sq = jnp.sum(uvh_m * uvh_m, axis=-1, keepdims=True)
    geom_ok = (uvh_sq[:, 0] > 1e-30) & jnp.isfinite(uvh_sq[:, 0])
    # safe-input: sqrt has an unbounded derivative at 0, so feed it 1 off-mask
    uvh_norm = jnp.sqrt(jnp.where(uvh_sq > 1e-30, uvh_sq, 1.0))
    uvh_mn = uvh_m / uvh_norm

    u2, v2, uv = u * u, v * v, u * v
    nl = u2 + v2 + 1.0
    # safe-where: a gaussian exactly AT the camera center (e.g. a zero-padded
    # dead capacity slot with the camera at the origin) has l == 0; sqrt's
    # backward is inf there and tx/l is 0/0 — both poison the whole gradient
    # through the shared deform MLP even though the splat is culled. Any
    # valid splat has l >= tz > NEAR_PLANE, so the gate never changes them.
    l2 = tx * tx + ty * ty + tz * tz
    l_ok = l2 > 1e-16
    l = jnp.where(l_ok, jnp.sqrt(jnp.where(l_ok, l2, 1.0)), 1.0)
    vbn = jnp.maximum(jnp.sum(uvh_mn * uvh, axis=-1), 1e-7)
    pv = uvh_mn / vbn[:, None]
    # plane = nJ_inv @ pv with nJ_inv rows [[v2+1,-uv,-u],[-uv,u2+1,-v],[0,0,0]]
    plane0 = (v2 + 1.0) * pv[:, 0] - uv * pv[:, 1] - u * pv[:, 2]
    plane1 = -uv * pv[:, 0] + (u2 + 1.0) * pv[:, 1] - v * pv[:, 2]

    inv_nl = 1.0 / nl
    cp = jnp.stack(
        [
            (-(v2 + 1.0) * tz + plane0 * tx) * inv_nl / focal_x,
            (uv * tz + plane1 * tx) * inv_nl / focal_y,
            (uv * tz + plane0 * ty) * inv_nl / focal_x,
            (-(u2 + 1.0) * tz + plane1 * ty) * inv_nl / focal_y,
            (tx + plane0 * tz) * inv_nl / focal_x,
            (ty + plane1 * tz) * inv_nl / focal_y,
        ],
        axis=-1,
    )
    ray_plane = jnp.stack(
        [plane0 * l * inv_nl / focal_x, plane1 * l * inv_nl / focal_y], axis=-1
    )
    factor_normal = l * inv_nl
    # cam normal = nJ @ (-plane0*f, -plane1*f, -1), nJ rows
    # [[1/tz,0,tx/l],[0,1/tz,ty/l],[-tx/tz^2,-ty/tz^2,tz/l]]
    rn0, rn1, rn2 = -plane0 * factor_normal, -plane1 * factor_normal, -1.0
    cn0 = rn0 * inv_tz + rn2 * tx / l
    cn1 = rn1 * inv_tz + rn2 * ty / l
    cn2 = -rn0 * tx * inv_tz * inv_tz - rn1 * ty * inv_tz * inv_tz + rn2 * tz / l
    cn = jnp.stack([cn0, cn1, cn2], axis=-1)
    cn_sq = jnp.sum(cn * cn, axis=-1, keepdims=True)
    cn_norm = jnp.sqrt(jnp.where(cn_sq > 1e-30, cn_sq, 1.0))
    normal = cn / cn_norm

    geom_mask = geom_ok[:, None]
    cp = jnp.where(geom_mask, cp, 0.0)
    ray_plane = jnp.where(geom_mask, ray_plane, 0.0)
    normal = jnp.where(geom_mask, normal, 0.0)

    ts2 = jnp.sum(p_view * p_view, axis=-1)
    ts_ok = ts2 > 1e-16
    ts = jnp.where(ts_ok, jnp.sqrt(jnp.where(ts_ok, ts2, 1.0)), 0.0)

    invraycov = None
    if compute_invraycov:
        # integrate path (forward.cu:187-234): 3D inverse covariance in
        # (pixel-x, pixel-y, ray-depth) space,
        #   invraycov = S . nJif . Sigma_cam^-1 . nJif^T . S,
        # with nJif the full inverse ray Jacobian and S = diag(1/fx, 1/fy, 1).
        # The ill-conditioned eigen fallback of the reference is approximated
        # by the pseudo-inverse already inside Sigma_cam^-1.
        fac = tz * inv_nl
        nJif = jnp.stack(
            [
                jnp.stack([(v2 + 1.0) * fac, -uv * fac, -u * fac], -1),
                jnp.stack([-uv * fac, (u2 + 1.0) * fac, -v * fac], -1),
                jnp.stack([u * tz / l, v * tz / l, tz / l], -1),
            ],
            axis=-2,
        )  # [N, 3, 3]
        # offline integrate path only: the [N,3,3] einsum is fine here
        from .quaternion import unpack_sym3
        icr = jnp.einsum("nij,njk,nlk->nil", nJif, unpack_sym3(cov_cam_inv),
                         nJif)
        s = jnp.array([1.0 / focal_x, 1.0 / focal_y, 1.0], jnp.float32)
        icr = icr * s[None, :, None] * s[None, None, :]
        invraycov = jnp.stack(
            [icr[:, 0, 0], icr[:, 0, 1], icr[:, 0, 2],
             icr[:, 1, 1], icr[:, 1, 2], icr[:, 2, 2]], axis=-1)

    if colors_precomp is not None:
        rgb = colors_precomp.astype(f32)
    else:
        rgb = sh_to_rgb(sh_degree, shs.astype(f32), means3d, campos.astype(f32))

    return ProjectedGaussians(
        valid=valid,
        mean2d=mean2d,
        depth=p_view[:, 2],
        view_point=p_view,
        conic=conic,
        opacity=opacities.astype(f32) * coef,
        radius=radius_i,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=tiles,
        camera_planes=cp,
        ray_plane=ray_plane,
        normal=normal,
        ts=ts,
        rgb=rgb,
        cov3d=cov3d,
        invraycov=invraycov,
        well_conditioned=well if compute_invraycov else None,
    )
