"""Fused embedding-KNN loss (two-pass Pallas) vs the jnp autodiff oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ed3dgs_tpu.ops.knn_loss import (knn_loss_fused, knn_loss_ref,
                                     prepare_knn_graph)


@pytest.mark.parametrize("C,K,E,chunk", [(50, 5, 32, 16), (300, 20, 32, 64),
                                         (128, 3, 16, 32)])
def test_knn_loss_fused_matches_oracle(C, K, E, chunk):
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(C, E)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, (C, K)), jnp.int32)
    w = jnp.asarray(rng.uniform(0.0, 1.0, (C, K)), jnp.float32)
    mask = rng.random(C) > 0.25
    w = w * mask[:, None]                    # dead rows: zero weight
    coef = jnp.asarray(mask / max(mask.sum() * K, 1.0), jnp.float32)

    graph = prepare_knn_graph(idx, w, coef, chunk=chunk)
    f = lambda e: knn_loss_fused(e, graph, chunk, True, False)
    v, g = jax.value_and_grad(f)(emb)
    v0, g0 = jax.value_and_grad(lambda e: knn_loss_ref(e, idx, w, coef))(emb)

    assert float(v) == pytest.approx(float(v0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_knn_loss_fused_matches_trainer_formula():
    """Equals losses.embedding_knn_loss (masked mean) exactly."""
    from ed3dgs_tpu.train import losses as L
    rng = np.random.default_rng(3)
    C, K, E = 96, 7, 32
    emb = jnp.asarray(rng.normal(size=(C, E)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, (C, K)), jnp.int32)
    mask = jnp.asarray(rng.random(C) > 0.3)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (C, K)), jnp.float32)
    w = w * mask[:, None].astype(jnp.float32)

    coef = mask.astype(jnp.float32) / jnp.maximum(
        jnp.sum(mask.astype(jnp.float32)) * K, 1.0)
    graph = prepare_knn_graph(idx, w, coef, chunk=32)
    v1, g1 = jax.value_and_grad(
        lambda e: knn_loss_fused(e, graph, 32, True, False))(emb)
    v0, g0 = jax.value_and_grad(
        lambda e: L.embedding_knn_loss(e, idx, w, mask=mask))(emb)
    assert float(v1) == pytest.approx(float(v0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_knn_loss_bf16_gather_tolerance():
    """The trainer-default bf16 gathered copies: loss within 1e-2 relative,
    gradient direction preserved (cosine > 0.999) vs the f32 oracle."""
    rng = np.random.default_rng(5)
    C, K, E, chunk = 300, 20, 32, 64
    emb = jnp.asarray(rng.normal(size=(C, E)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, (C, K)), jnp.int32)
    w = jnp.asarray(rng.uniform(0.0, 1.0, (C, K)), jnp.float32)
    mask = rng.random(C) > 0.25
    w = w * mask[:, None]
    coef = jnp.asarray(mask / max(mask.sum() * K, 1.0), jnp.float32)
    graph = prepare_knn_graph(idx, w, coef, chunk=chunk)
    v, g = jax.value_and_grad(
        lambda e: knn_loss_fused(e, graph, chunk, True, True))(emb)
    v0, g0 = jax.value_and_grad(lambda e: knn_loss_ref(e, idx, w, coef))(emb)
    assert float(v) == pytest.approx(float(v0), rel=1e-2)
    ga, gb = np.asarray(g).ravel(), np.asarray(g0).ravel()
    cos = ga @ gb / (np.linalg.norm(ga) * np.linalg.norm(gb) + 1e-30)
    assert cos > 0.999, cos
