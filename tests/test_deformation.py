"""Deformation network tests, incl. exact temporal-embedding parity vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ed3dgs_tpu.config.params import DeformHiddenConfig
from ed3dgs_tpu.models.deformation import (c2f_num_embeddings, deform_forward,
                                           init_deform_params,
                                           temporal_embedding)


def torch_temporal_embed(weight_np, t, cur):
    """The reference pipeline verbatim in torch (scene/deformation.py:53-67):
    bilinear row-resize (align_corners) then grid_sample (reflection)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    w = torch.tensor(weight_np)[None, None]
    fdim = weight_np.shape[1]
    emb_resized = F.interpolate(w, size=(cur, fdim), mode="bilinear", align_corners=True)
    grid = torch.cat(
        [torch.arange(fdim).unsqueeze(-1) / (fdim - 1), torch.ones(fdim, 1) * t],
        dim=-1,
    )[None, None]
    grid = (grid - 0.5) * 2
    emb = F.grid_sample(emb_resized, grid.float(), align_corners=True,
                        mode="bilinear", padding_mode="reflection")
    return emb[0, 0, 0].numpy()


@pytest.mark.parametrize("cur", [30, 47, 150])
@pytest.mark.parametrize("t", [0.0, 0.25, 0.5034, 1.0, -0.07, 1.12])
def test_temporal_embedding_matches_torch(cur, t):
    rng = np.random.default_rng(0)
    weight = rng.normal(0, 0.01, (150, 256)).astype(np.float32)
    want = torch_temporal_embed(weight, t, cur)
    got = np.asarray(temporal_embedding(jnp.asarray(weight), jnp.float32(t), cur))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_c2f_num_embeddings():
    cfg = DeformHiddenConfig(min_embeddings=30, max_embeddings=150, c2f_temporal_iter=20000)

    def ref(t, init_val, final_val, until):
        return int(init_val + (final_val - init_val) * min(max(t, 0), until) / until)

    for it in [0, 1, 500, 9999, 20000, 25000]:
        got = int(c2f_num_embeddings(cfg, it, 30))
        assert got == ref(it, 30, 150, 20000), it


def test_deform_forward_shapes_and_anneal():
    cfg = DeformHiddenConfig()
    params = init_deform_params(jax.random.PRNGKey(0), cfg)
    n = 17
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    scales = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(n, 16, 3)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(n, cfg.gaussian_embedding_dim)), jnp.float32)

    (xyz2, s2, r2, o2, sh2), (sub, orig) = deform_forward(
        params, cfg, xyz, scales, rots, opac, sh, emb, 0.4, 5000, cam_no=jnp.int32(2))
    assert xyz2.shape == (n, 3) and s2.shape == (n, 3) and r2.shape == (n, 4)
    assert o2.shape == (n, 1) and sh2.shape == (n, 16, 3)
    # default no_do=True: opacity passes through unchanged
    np.testing.assert_allclose(np.asarray(o2), np.asarray(opac))
    # deformation is non-trivial after anneal ramp
    assert np.abs(np.asarray(xyz2 - xyz)).max() > 0

    # at iteration 0 with use_anneal, coef=0 -> no deformation at all
    (xyz0, s0, r0, o0, sh0), _ = deform_forward(
        params, cfg, xyz, scales, rots, opac, sh, emb, 0.4, 0, cam_no=jnp.int32(2))
    np.testing.assert_allclose(np.asarray(xyz0), np.asarray(xyz), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sh0), np.asarray(sh), atol=1e-7)


def test_deform_eval_offset_mean():
    # f32: asserts two *different* effective-time computations agree to 1e-6,
    # which bf16 activation rounding would smear
    cfg = DeformHiddenConfig(bf16_activations=False)
    params = init_deform_params(jax.random.PRNGKey(0), cfg)
    params["offsets"] = params["offsets"].at[3, 0].set(0.02).at[7, 0].set(0.04)
    n = 4
    xyz = jnp.zeros((n, 3))
    args = (jnp.zeros((n, 3)), jnp.zeros((n, 4)), jnp.zeros((n, 1)),
            jnp.zeros((n, 16, 3)), jnp.zeros((n, cfg.gaussian_embedding_dim)))
    # eval (cam_no=None) uses mean of nonzero offsets = 0.03; train uses offsets[cam]
    out_eval, _ = deform_forward(params, cfg, xyz, *args, 0.5, 10_000, cam_no=None)
    out_cam3, _ = deform_forward(params, cfg, xyz, *args, 0.5 + 0.01, 10_000, cam_no=jnp.int32(3))
    # t_eval = 0.5+0.03; t_cam3 = 0.51+0.02 = same effective time -> same deform
    np.testing.assert_allclose(np.asarray(out_eval[0]), np.asarray(out_cam3[0]), atol=1e-6)


def test_deform_gradients():
    cfg = DeformHiddenConfig()
    params = init_deform_params(jax.random.PRNGKey(0), cfg)
    n = 8
    rng = np.random.default_rng(2)
    xyz = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    args = (jnp.zeros((n, 3)), jnp.zeros((n, 4)), jnp.zeros((n, 1)),
            jnp.zeros((n, 16, 3)),
            jnp.asarray(rng.normal(size=(n, cfg.gaussian_embedding_dim)), jnp.float32))

    def loss(p):
        (x, s, r, o, sh), _ = deform_forward(p, cfg, xyz, *args, 0.3, 3000,
                                             cam_no=jnp.int32(0))
        return jnp.sum(x ** 2) + jnp.sum(sh ** 2) + jnp.sum(s ** 2) + jnp.sum(r ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # temporal table and both towers receive gradient
    assert np.abs(np.asarray(g["weight"])).max() > 0
    assert np.abs(np.asarray(g["coarse"]["feature"][0]["w"])).max() > 0
    assert np.abs(np.asarray(g["fine"]["heads"]["pos"][1]["w"])).max() > 0


def test_bf16_flag_off_is_f32_exact_and_load_bearing():
    """BASELINE parity pin: bf16_activations=False must reproduce the pure-
    f32 tower bit-for-bit (same inputs -> identical bits across calls, and
    equal to an explicit f32 jnp recomputation), while the default-on bf16
    path must actually differ (the flag is load-bearing)."""
    import dataclasses

    from ed3dgs_tpu.config.params import DeformHiddenConfig
    from ed3dgs_tpu.models.deformation import deform_forward, init_deform_params

    cfg32 = DeformHiddenConfig(net_width=32, defor_depth=2, min_embeddings=4,
                               max_embeddings=8, temporal_embedding_dim=16,
                               gaussian_embedding_dim=8,
                               bf16_activations=False)
    cfg16 = dataclasses.replace(cfg32, bf16_activations=True)
    params = init_deform_params(jax.random.PRNGKey(3), cfg32)
    rng = np.random.default_rng(5)
    N = 32
    args = (jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
            jnp.asarray(rng.normal(size=(N, 1)), jnp.float32),
            jnp.asarray(rng.normal(size=(N, 16, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(N, 8)), jnp.float32))

    def run(cfg):
        (out, _) = deform_forward(params, cfg, *args, jnp.float32(0.4), 500,
                                  cam_no=jnp.int32(0), num_down_emb_c=4,
                                  num_down_emb_f=4)[0:2]
        return [np.asarray(x) for x in out]

    a = run(cfg32)
    b = run(cfg32)
    c = run(cfg16)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)       # f32 path deterministic
    assert any(not np.array_equal(x, z) for x, z in zip(a, c))  # flag real
    for x, z in zip(a, c):                        # and bf16 stays close
        np.testing.assert_allclose(z, x, rtol=0.03, atol=0.03)
