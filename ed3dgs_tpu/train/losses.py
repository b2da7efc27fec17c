"""Training losses (reference utils/loss_utils.py, utils/image_utils.py and the
loss assembly in train.py:195-343), as pure jnp."""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..core.camera_math import depth_to_normal, points_to_normal


def l1_loss(pred, gt, keepdim=False):
    d = jnp.abs(pred - gt)
    if keepdim:
        return jnp.mean(d.reshape(d.shape[0], -1), axis=1)
    return jnp.mean(d)


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def psnr(pred, gt):
    """Per-image PSNR, matching utils/image_utils.py:17."""
    mse = jnp.mean(((pred - gt) ** 2).reshape(pred.shape[0], -1), axis=1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))


@functools.lru_cache(maxsize=None)
def _gaussian_window_np(window_size: int = 11, sigma: float = 1.5):
    import numpy as np
    g = np.array([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
                  for x in range(window_size)], dtype=np.float32)
    g = g / g.sum()
    return np.outer(g, g)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    # cached in numpy (a jnp cache would leak tracers across jit traces)
    return jnp.asarray(_gaussian_window_np(window_size, sigma))


def ssim(img1, img2, window_size: int = 11):
    """Gaussian-window SSIM, same constants/padding as the reference
    (utils/loss_utils.py:43-73). img: [B, C, H, W] or [C, H, W]."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    w = _gaussian_window(window_size)[None, None]  # [1,1,K,K]
    C = img1.shape[1]
    kernel = jnp.tile(w, (C, 1, 1, 1))

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(window_size // 2, window_size // 2)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


def weighted_l2_loss_v2(x, y, w):
    """sqrt(sum((x-y)^2, -1) * w + 1e-20).mean()  (utils/extra_utils.py:19)."""
    return jnp.mean(jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1) * w + 1e-20))


def embedding_knn_loss(embedding, neighbor_indices, neighbor_weight, mask=None):
    """Per-Gaussian embedding smoothness vs its cached 20-NN
    (train.py:231-235). `neighbor_indices` index into the same embedding
    array; masked rows contribute 0 (weights pre-zeroed for dead slots).

    This is the small-scale oracle; the train step uses the fused two-pass
    kernel (ops/knn_loss.py), which matches it to float tolerance — see
    tests/test_knn_loss.py."""
    emb_knn = embedding[neighbor_indices]           # [N, K, E]
    emb = embedding[:, None, :]
    d2 = jnp.sum((emb - emb_knn) ** 2, axis=-1)
    per = jnp.sqrt(d2 * neighbor_weight + 1e-20)
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(jnp.float32)[:, None]
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * per.shape[1], 1.0)


def temporal_tv_loss(weight):
    """Smoothness of the temporal table. NOTE: reproduces the reference's
    exact (quirky) formula (train.py:240-245): differences are taken against
    the broadcast *last row*, twice, not consecutive rows."""
    n = weight.shape[0]
    first = weight[1:, :] - weight[n - 1, :]
    second = first[1:, :] - first[n - 2, :]
    return jnp.mean(jnp.square(second))


def opacity_mean_loss(opacity_raw, alive):
    """sigmoid of the mean raw opacity over alive gaussians (train.py:213-215)."""
    m = alive.astype(jnp.float32)[:, None]
    mean_raw = jnp.sum(opacity_raw * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jax.nn.sigmoid(mean_raw)


def depth_normal_loss(rendered_normal, expected_depth, median_depth,
                      width, height, focal_x, focal_y, depth_ratio=0.6):
    """RaDe-GS depth-normal consistency (train.py:248-271 with
    depth_double_to_normal): normals from finite differences of the
    unprojected expected & median depth maps vs the rendered normal map."""
    n_exp = depth_to_normal(expected_depth[0], width, height, focal_x, focal_y)
    n_med = depth_to_normal(median_depth[0], width, height, focal_x, focal_y)
    err_exp = 1.0 - jnp.sum(rendered_normal * n_exp, axis=0)
    err_med = 1.0 - jnp.sum(rendered_normal * n_med, axis=0)
    return (1.0 - depth_ratio) * jnp.mean(err_exp) + depth_ratio * jnp.mean(err_med)


def coord_normal_loss(rendered_normal, expected_coord, median_coord,
                      depth_ratio=0.6):
    """use_coord_map variant (train.py:258-262): normals from the rendered
    camera-space coordinate maps directly."""
    n_exp = points_to_normal(expected_coord)
    n_med = points_to_normal(median_coord)
    err_exp = 1.0 - jnp.sum(rendered_normal * n_exp, axis=0)
    err_med = 1.0 - jnp.sum(rendered_normal * n_med, axis=0)
    return (1.0 - depth_ratio) * jnp.mean(err_exp) + depth_ratio * jnp.mean(err_med)


def colmap_pcd_loss(pcd_points, gaussian_positions, alive, chunk: int = 500):
    """COLMAP point-cloud supervision (train.py:273-295,
    utils/train_utils.py:73-89): for each GT point, the squared distance in
    millimeters (x1000 per axis) to its nearest deformed Gaussian; mean over
    points. Dead capacity slots are excluded. Chunked over GT points so the
    [P, C] distance matrix never materializes whole; each chunk is one
    [chunk,3]x[3,C] MXU matmul."""
    g = gaussian_positions * 1000.0                       # [C,3] mm
    g2 = jnp.sum(g * g, axis=1)                           # [C]
    dead_bump = jnp.where(alive, 0.0, jnp.float32(3e38))  # finite: inf breaks min-grad
    P = pcd_points.shape[0]
    if P % chunk:  # colmap_pcd_samples need not divide the default chunk
        chunk = math.gcd(P, chunk)
    p = pcd_points.reshape(-1, chunk, 3) * 1000.0         # [n,chunk,3]

    def one(pc):
        d2 = jnp.sum(pc * pc, 1)[:, None] + (g2 + dead_bump)[None, :] - 2.0 * pc @ g.T
        return jnp.min(d2, axis=1)

    d = jax.lax.map(one, p)
    return jnp.mean(jnp.maximum(d, 0.0))
