"""Fused embedding-KNN loss (Morton-windowed Pallas) vs the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ed3dgs_tpu.ops.knn_loss import (knn_loss_fused, knn_loss_ref,
                                     prepare_knn_graph)


def _problem(C, K, E, seed=0, spatial=False):
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(C, E)), jnp.float32)
    pts = jnp.asarray(rng.uniform(-1, 1, (C, 3)), jnp.float32)
    if spatial:
        # realistic neighborhoods: K nearest by position
        d = ((np.asarray(pts)[:, None, :] - np.asarray(pts)[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        idx = jnp.asarray(np.argsort(d, axis=1)[:, :K], jnp.int32)
    else:
        idx = jnp.asarray(rng.integers(0, C, (C, K)), jnp.int32)
    w = jnp.asarray(rng.uniform(0.0, 1.0, (C, K)), jnp.float32)
    mask = rng.random(C) > 0.25
    w = w * mask[:, None]                    # dead rows: zero weight
    coef = jnp.asarray(mask / max(mask.sum() * K, 1.0), jnp.float32)
    return emb, pts, idx, w, coef


@pytest.mark.parametrize("C,K,E,spatial", [
    (50, 5, 32, False),
    (300, 20, 32, False),      # adversarial: random graph => heavy far pass
    (128, 3, 16, False),
    (1200, 8, 32, True),       # multi-block, Morton windows do real work
])
def test_knn_loss_fused_matches_oracle(C, K, E, spatial):
    emb, pts, idx, w, coef = _problem(C, K, E, seed=C, spatial=spatial)
    graph = prepare_knn_graph(idx, w, coef, pts)
    assert int(jnp.sum(graph.overflow)) == 0
    f = lambda e: knn_loss_fused(e, graph, K, True)
    v, g = jax.value_and_grad(f)(emb)
    v0, g0 = jax.value_and_grad(lambda e: knn_loss_ref(e, idx, w, coef))(emb)

    assert float(v) == pytest.approx(float(v0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_knn_loss_identity_order_matches_oracle():
    """pts=None (identity rank order) stays exact — windows only help perf."""
    emb, _, idx, w, coef = _problem(260, 6, 32, seed=9)
    graph = prepare_knn_graph(idx, w, coef, None)
    assert int(jnp.sum(graph.overflow)) == 0
    v, g = jax.value_and_grad(lambda e: knn_loss_fused(e, graph, 6, True))(emb)
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
    pts = jnp.asarray(rng.uniform(-1, 1, (C, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, (C, K)), jnp.int32)
    mask = jnp.asarray(rng.random(C) > 0.3)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (C, K)), jnp.float32)
    w = w * mask[:, None].astype(jnp.float32)

    coef = mask.astype(jnp.float32) / jnp.maximum(
        jnp.sum(mask.astype(jnp.float32)) * K, 1.0)
    graph = prepare_knn_graph(idx, w, coef, pts)
    v1, g1 = jax.value_and_grad(
        lambda e: knn_loss_fused(e, graph, K, True))(emb)
    v0, g0 = jax.value_and_grad(
        lambda e: L.embedding_knn_loss(e, idx, w, mask=mask))(emb)
    assert float(v1) == pytest.approx(float(v0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_knn_loss_overflow_surfaced_and_deterministic():
    """Undersized capacities: overflow counts are reported, overflowing
    pairs drop deterministically (w -> 0), everything stays finite. The
    trainer reacts by re-preparing with the next capacity bucket."""
    emb, pts, idx, w, coef = _problem(2200, 20, 32, seed=1, spatial=False)
    graph = prepare_knn_graph(idx, w, coef, pts, spill_a=256, spill_b=256,
                              far_capacity=256)
    ovf = np.asarray(graph.overflow)
    assert ovf.sum() > 0, ovf                 # random graph must overflow
    v, g = jax.value_and_grad(
        lambda e: knn_loss_fused(e, graph, 20, True))(emb)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    # deterministic: same prepare -> same value
    graph2 = prepare_knn_graph(idx, w, coef, pts, spill_a=256, spill_b=256,
                               far_capacity=256)
    v2 = knn_loss_fused(emb, graph2, 20, True)
    assert float(v) == float(v2)

    # with sufficient capacity the same problem matches the oracle
    # (a random graph has no locality: spill needs worst-case room)
    graph3 = prepare_knn_graph(idx, w, coef, pts, spill_a=3072, spill_b=3072,
                               far_capacity=None)
    assert int(jnp.sum(graph3.overflow)) == 0
    v3, g3 = jax.value_and_grad(
        lambda e: knn_loss_fused(e, graph3, 20, True))(emb)
    v0, g0 = jax.value_and_grad(lambda e: knn_loss_ref(e, idx, w, coef))(emb)
    assert float(v3) == pytest.approx(float(v0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_knn_loss_spill_capacity_not_dividing_cp():
    """Regression (advisor r4, high): spill capacities that do NOT divide Cp
    (Cp=3072 with 2048 buckets) must still match the oracle exactly — the
    adaptive doubling buckets in tools/train.py can produce such shapes."""
    emb, pts, idx, w, coef = _problem(2100, 20, 32, seed=5, spatial=False)
    graph = prepare_knn_graph(idx, w, coef, pts, spill_a=2048, spill_b=2048,
                              far_capacity=None)
    assert int(jnp.sum(graph.overflow)) == 0
    v, g = jax.value_and_grad(
        lambda e: knn_loss_fused(e, graph, 20, True))(emb)
    v0, g0 = jax.value_and_grad(lambda e: knn_loss_ref(e, idx, w, coef))(emb)
    assert float(v) == pytest.approx(float(v0), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_knn_loss_overflow_grad_consistent_with_loss():
    """With spill_b overflow the returned gradient must be the TRUE gradient
    of the returned loss (dropped pairs leave loss, de_i and de_j together):
    directional finite differences of the fused loss match <grad, dir>."""
    emb, pts, idx, w, coef = _problem(2200, 20, 32, seed=7, spatial=False)
    graph = prepare_knn_graph(idx, w, coef, pts, spill_a=512, spill_b=256,
                              far_capacity=None)
    assert int(graph.overflow[1]) > 0          # spill_b must actually drop
    f = lambda e: knn_loss_fused(e, graph, 20, True)
    v, g = jax.value_and_grad(f)(emb)
    rng = np.random.default_rng(11)
    for _ in range(3):
        d = jnp.asarray(rng.normal(size=emb.shape), jnp.float32)
        h = 1e-3
        fd = (float(f(emb + h * d)) - float(f(emb - h * d))) / (2 * h)
        an = float(jnp.vdot(g, d))
        assert fd == pytest.approx(an, rel=2e-2, abs=1e-4)


def test_knn_loss_k_mismatch_raises():
    """A k different from the K the graph was prepared with must error,
    not silently drop/misread neighbor slots (advisor r4)."""
    emb, pts, idx, w, coef = _problem(300, 5, 16, seed=2)
    graph = prepare_knn_graph(idx, w, coef, pts)
    with pytest.raises(ValueError, match="prepared with K=5"):
        knn_loss_fused(emb, graph, 20, True)
