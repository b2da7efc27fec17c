"""Per-Gaussian embedding deformation network (E-D3DGS), as a JAX pytree.

Re-architecture of the reference deform_network (scene/deformation.py:15-148):
two cascaded towers (coarse then fine), each a feature MLP over
[temporal embedding ++ per-Gaussian embedding] with five delta heads
(position/scale/rotation/opacity/SH). The learned temporal table is sampled
with the exact semantics of the reference's
F.interpolate(align_corners=True) + F.grid_sample(reflection, align_corners)
pipeline (scene/deformation.py:53-67) — but reduced to its closed form: two
chained 1-D linear interpolations over table rows, so the current embedding
count can be a *traced* value (coarse-to-fine growth never recompiles).

All parameters live in one nested-dict pytree; the MLP runs as dense [N, .]
matmuls on the MXU for every Gaussian at once.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..config.params import DeformHiddenConfig

HEADS = ("pos", "scale", "rot", "opacity", "sh")
HEAD_DIMS = {"pos": 3, "scale": 3, "rot": 4, "opacity": 1, "sh": 48}


def _linear_init(key, fan_in, fan_out):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
    weight and bias (the reference's initialize_weights is never applied)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_tower(key, cfg: DeformHiddenConfig):
    in_dim = cfg.temporal_embedding_dim + cfg.gaussian_embedding_dim
    W = cfg.net_width
    keys = jax.random.split(key, cfg.defor_depth + 2 * len(HEADS))
    feature = [_linear_init(keys[0], in_dim, W)]
    for i in range(cfg.defor_depth - 1):
        feature.append(_linear_init(keys[1 + i], W, W))
    heads = {}
    for j, name in enumerate(HEADS):
        k1 = keys[cfg.defor_depth + 2 * j]
        k2 = keys[cfg.defor_depth + 2 * j + 1]
        heads[name] = [_linear_init(k1, W, W), _linear_init(k2, W, HEAD_DIMS[name])]
    return {"feature": feature, "heads": heads}


def init_deform_params(key, cfg: DeformHiddenConfig):
    kw, kc, kf = jax.random.split(key, 3)
    if cfg.zero_temporal:
        weight = jnp.zeros((cfg.max_embeddings, cfg.temporal_embedding_dim))
    else:
        weight = (
            jax.random.normal(kw, (cfg.max_embeddings, cfg.temporal_embedding_dim))
            * (0.01 / math.sqrt(cfg.temporal_embedding_dim))
        )
    return {
        "weight": weight,
        "offsets": jnp.zeros((cfg.max_cameras, 1), jnp.float32),
        "coarse": init_tower(kc, cfg),
        "fine": init_tower(kf, cfg),
    }


def _reflect(x, size):
    """Reflection padding coordinate map with align_corners=True semantics:
    reflect about 0 and size-1 (period 2*(size-1))."""
    size_f = size.astype(jnp.float32) if hasattr(size, "astype") else float(size)
    span = jnp.maximum(size_f - 1.0, 1e-12)
    x = jnp.abs(x)
    x = jnp.mod(x, 2.0 * span)
    return span - jnp.abs(x - span)


def temporal_embedding(weight: jnp.ndarray, t: jnp.ndarray, cur_emb) -> jnp.ndarray:
    """Closed form of get_temporal_embed (scene/deformation.py:53-67).

    Args:
      weight: [max_emb, D] learned table.
      t: scalar time in [0,1] (possibly offset outside).
      cur_emb: current embedding count (python int or traced int).

    Returns:
      [D] embedding at time t.
    """
    max_emb = weight.shape[0]
    cur = jnp.asarray(cur_emb, jnp.float32)
    # grid_sample y coordinate (align_corners): y = t*(cur-1), reflected
    y = _reflect(t * (cur - 1.0), cur)
    y0 = jnp.clip(jnp.floor(y), 0.0, jnp.maximum(cur - 1.0, 0.0))
    f = y - y0

    # the resized table row j corresponds to source coordinate
    # u(j) = j*(max_emb-1)/(cur-1)   (F.interpolate align_corners)
    scale = (max_emb - 1.0) / jnp.maximum(cur - 1.0, 1e-12)

    def resized_row(j):
        u = jnp.clip(j * scale, 0.0, max_emb - 1.0)
        u0 = jnp.clip(jnp.floor(u), 0.0, max_emb - 1.0)
        g = u - u0
        i0 = u0.astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, max_emb - 1)
        return (1.0 - g) * weight[i0] + g * weight[i1]

    r0 = resized_row(y0)
    r1 = resized_row(jnp.minimum(y0 + 1.0, jnp.maximum(cur - 1.0, 0.0)))
    return (1.0 - f) * r0 + f * r1


def _dot(h, layer, dtype):
    """Linear layer at the tower activation dtype; the MXU accumulates in
    f32 either way (preferred_element_type), only the HBM-resident
    activation tensors change width."""
    w = layer["w"].astype(dtype)
    b = layer["b"].astype(dtype)
    return (jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            .astype(dtype) + b)


def _run_feature(layers, h, dtype=jnp.float32):
    h = _dot(h.astype(dtype), layers[0], dtype)
    for layer in layers[1:]:
        h = _dot(jax.nn.relu(h), layer, dtype)
    return h


def _run_head(head, h, dtype=jnp.float32):
    x = _dot(jax.nn.relu(h), head[0], dtype)
    return _dot(jax.nn.relu(x), head[1], dtype).astype(jnp.float32)


def _tower_deform(tower, cfg, emb_t, embedding, xyz, scales, rotations, opacity,
                  sh, coef, coef_c, coef_o, coef_s):
    """query_time + deform for one tower (scene/deformation.py:72-106)."""
    n = xyz.shape[0]
    dt = jnp.bfloat16 if getattr(cfg, "bf16_activations", False) else jnp.float32
    h = jnp.concatenate([jnp.broadcast_to(emb_t[None, :], (n, emb_t.shape[0])),
                         embedding], axis=-1)
    h = _run_feature(tower["feature"], h, dt)
    xyz = xyz + _run_head(tower["heads"]["pos"], h, dt) * coef
    if not cfg.no_ds:
        scales = scales + _run_head(tower["heads"]["scale"], h, dt) * coef * coef_s
    if not cfg.no_dr:
        rotations = rotations + _run_head(tower["heads"]["rot"], h, dt) * coef
    if not cfg.no_do:
        opacity = opacity + _run_head(tower["heads"]["opacity"], h, dt) * coef * coef_o
    if not cfg.no_dc:
        dc = _run_head(tower["heads"]["sh"], h, dt).reshape(n, 16, 3)
        sh = sh + dc * coef_c
    return xyz, scales, rotations, opacity, sh


def c2f_num_embeddings(cfg: DeformHiddenConfig, iteration, num_down_emb):
    """int_lininterp of the embedding count (scene/deformation.py:69-70,80)."""
    it = jnp.clip(jnp.asarray(iteration, jnp.float32), 0.0, cfg.c2f_temporal_iter)
    val = num_down_emb + (cfg.max_embeddings - num_down_emb) * it / cfg.c2f_temporal_iter
    return jnp.floor(val).astype(jnp.int32)


def deform_forward(
    params,
    cfg: DeformHiddenConfig,
    xyz: jnp.ndarray,          # [N, 3] raw positions
    scales: jnp.ndarray,       # [N, 3] raw (log) scales
    rotations: jnp.ndarray,    # [N, 4] raw quaternions
    opacity: jnp.ndarray,      # [N, 1] raw (logit) opacity
    sh: jnp.ndarray,           # [N, 16, 3]
    embedding: jnp.ndarray,    # [N, E] per-gaussian embeddings
    time: jnp.ndarray,         # scalar time in [0,1]
    iteration,                 # scalar (traced ok)
    cam_no: Optional[jnp.ndarray] = None,  # scalar int or None (eval mode)
    num_down_emb_c: int = 30,
    num_down_emb_f: int = 30,
):
    """Full cascade forward (scene/deformation.py:108-141).

    Returns (xyz, scales, rotations, opacity, sh) final plus
    extras = ((coarse outputs), (original inputs)).
    """
    if cam_no is None:
        # eval: mean of nonzero offsets, nan -> 0 (scene/deformation.py:112-114)
        nz = params["offsets"][:, 0] != 0.0
        cnt = jnp.sum(nz.astype(jnp.float32))
        offset = jnp.where(cnt > 0, jnp.sum(params["offsets"][:, 0]) / jnp.maximum(cnt, 1.0), 0.0)
    else:
        offset = params["offsets"][cam_no, 0]
    t = jnp.asarray(time, jnp.float32) + offset

    it = jnp.asarray(iteration, jnp.float32)
    if cfg.use_anneal:
        coef = jnp.clip(it / 1000.0, 0.0, 1.0)
        coef_c = jnp.clip((it - cfg.deform_from_iter) / 1000.0, 0.0, 1.0)
        coef_o = coef_c
        coef_s = coef_c
    else:
        coef = coef_c = coef_o = coef_s = 1.0

    orig = (xyz, scales, rotations, opacity, sh)

    if cfg.no_coarse_deform:
        sub = orig
    else:
        if cfg.use_coarse_temporal_embedding:
            n_emb_c = jnp.asarray(num_down_emb_c, jnp.int32)
        elif cfg.no_c2f_temporal_embedding:
            n_emb_c = jnp.asarray(cfg.max_embeddings, jnp.int32)
        else:
            n_emb_c = c2f_num_embeddings(cfg, iteration, num_down_emb_c)
        emb_c = temporal_embedding(params["weight"], t, n_emb_c)
        sub = _tower_deform(params["coarse"], cfg, emb_c, embedding, *orig,
                            coef, coef_c, coef_o, coef_s)

    if cfg.no_fine_deform:
        final = sub
    else:
        if cfg.no_c2f_temporal_embedding:
            n_emb_f = jnp.asarray(cfg.max_embeddings, jnp.int32)
        else:
            n_emb_f = c2f_num_embeddings(cfg, iteration, num_down_emb_f)
        emb_f = temporal_embedding(params["weight"], t, n_emb_f)
        final = _tower_deform(params["fine"], cfg, emb_f, embedding, *sub,
                              coef, coef_c, coef_o, coef_s)

    return final, (sub, orig)


def mlp_param_labels(params):
    """Label pytree for per-group learning rates: 'offsets' vs 'deformation'
    (reference get_mlp_parameters excludes offsets, scene/deformation.py:143-148)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "offsets" if path[0].key == "offsets" else "deformation",
        params,
    )
