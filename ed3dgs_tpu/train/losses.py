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


def build_gather_csr(indices, num_rows):
    """CSR structure of a flat gather-index array, grouped by target row:
    (perm, starts, ends) with perm = stable argsort of the indices. Computed
    once per KNN-cache refresh (densify cadence), consumed every step by
    `gather_rows_csr`'s backward."""
    flat = indices.reshape(-1).astype(jnp.int32)
    perm = jnp.argsort(flat, stable=True).astype(jnp.int32)
    sorted_flat = flat[perm]
    rows = jnp.arange(num_rows, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_flat, rows, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_flat, rows, side="right").astype(jnp.int32)
    return perm, starts, ends


@jax.custom_vjp
def gather_rows_csr(table, flat_idx, perm, starts, ends):
    """table[flat_idx] with a deterministic CSR segment-sum backward.

    XLA lowers the autodiff backward of a [C,K] fancy-index gather to a
    per-channel while-loop scatter (measured ~50 ms/step at C=100k, K=20,
    E=32 on v5e); re-permuting the cotangent rows into by-target order and
    reducing with the Pallas CSR kernel replaces all of it."""
    return table[flat_idx]


def _gather_rows_csr_fwd(table, flat_idx, perm, starts, ends):
    return table[flat_idx], (perm, starts, ends, table.shape)


def _gather_rows_csr_bwd(res, g):
    from ..ops.segment_sum import segment_sum_rows
    perm, starts, ends, tshape = res
    P, F = g.shape
    # pad lanes to 128 BEFORE the permutation gather (barrier stops XLA from
    # commuting the pad inside, where a narrow row gather gets a column-major
    # layout and runs element-at-a-time — see ops/rasterize.py:_expand_pairs)
    g128 = jax.lax.optimization_barrier(jnp.pad(g, ((0, 0), (0, (-F) % 128))))
    g_csr = g128[perm]
    d = segment_sum_rows(g_csr, starts, ends,
                         interpret=jax.default_backend() == "cpu")
    return d[:tshape[0], :F], None, None, None, None


gather_rows_csr.defvjp(_gather_rows_csr_fwd, _gather_rows_csr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _repeat_rows(emb, K):
    """Each row repeated K times -> [C*K, E], with a backward that reduces
    over the K block via one MXU matmul. The autodiff backward of
    broadcast_to+reshape is a middle-axis reduce that XLA lays out
    channel-major ([E, C, K]) and then bridges with per-channel while-loops
    (~20 ms/step at C=100k) — the matmul keeps everything row-major."""
    C, E = emb.shape
    return jnp.reshape(jnp.broadcast_to(emb[:, None, :], (C, K, E)), (C * K, E))


def _repeat_rows_fwd(emb, K):
    return _repeat_rows(emb, K), emb.shape


def _repeat_rows_bwd(K, shape, g):
    C, E = shape
    sel = jnp.reshape(jnp.broadcast_to(jnp.eye(E, dtype=g.dtype)[None],
                                       (K, E, E)), (K * E, E))
    return (g.reshape(C, K * E) @ sel,)


_repeat_rows.defvjp(_repeat_rows_fwd, _repeat_rows_bwd)


def _lane_sum(x):
    """Row-wise sum over the minor (lane) axis as an MXU matvec: a plain
    jnp.sum(axis=1) reduce here is what drives XLA to the channel-major
    layout in the first place."""
    return x @ jnp.ones((x.shape[1],), x.dtype)


def embedding_knn_loss(embedding, neighbor_indices, neighbor_weight, mask=None,
                       csr=None):
    """Per-Gaussian embedding smoothness vs its cached 20-NN
    (train.py:231-235). `neighbor_indices` index into the same embedding
    array; masked rows contribute 0 (weights pre-zeroed for dead slots).
    With `csr` (from build_gather_csr) the neighbor gather's backward runs
    through the deterministic CSR segment-sum kernel instead of XLA's
    while-loop scatter."""
    C, K = neighbor_indices.shape
    if csr is None:
        emb_knn = embedding[neighbor_indices]       # [N, K, E]
        emb = embedding[:, None, :]
        d2 = jnp.sum((emb - emb_knn) ** 2, axis=-1)
    else:
        # flat [P,E] row-major formulation: a [C,K,E]-shaped consumer makes
        # XLA assign the gather a channel-major layout and lower it to
        # per-channel while-loops (~19 ms/step at C=100k); the barriers pin
        # the flat rows so everything stays vectorized row ops
        ej = gather_rows_csr(embedding, neighbor_indices.reshape(-1), *csr)
        ej = jax.lax.optimization_barrier(ej)       # [P, E] pair rows
        ei = _repeat_rows(embedding, K)
        d2 = _lane_sum((ei - ej) ** 2).reshape(C, K)
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
    p = pcd_points.reshape(-1, chunk, 3) * 1000.0         # [n,chunk,3]

    def one(pc):
        d2 = jnp.sum(pc * pc, 1)[:, None] + (g2 + dead_bump)[None, :] - 2.0 * pc @ g.T
        return jnp.min(d2, axis=1)

    d = jax.lax.map(one, p)
    return jnp.mean(jnp.maximum(d, 0.0))
