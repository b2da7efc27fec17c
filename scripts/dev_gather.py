import jax, jax.numpy as jnp, numpy as np, time
N=100_000; K=1<<21
rng = np.random.default_rng(0)
payload128 = jnp.asarray(rng.normal(size=(N,128)).astype(np.float32))
payload32 = payload128[:, :32]
order = jnp.asarray(rng.permutation(N).astype(np.int32))
rank = jnp.asarray(np.sort(rng.integers(0, N, K)).astype(np.int32))  # monotone like real
rank_scrambled = jnp.asarray(rng.integers(0, N, K).astype(np.int32))
def t(name, f, *a, iters=10):
    g = jax.jit(f); o = jax.block_until_ready(g(*a)); t0=time.time()
    for _ in range(iters): o=g(*a)
    jax.block_until_ready(o); print(name, round((time.time()-t0)/iters*1000,1), "ms")
t("two-step 128", lambda p, o_, r: p[o_][r], payload128, order, rank)
t("fused 128", lambda p, o_, r: p[o_[r]], payload128, order, rank)
t("gather 128 monotone", lambda p, r: p[r], payload128, rank)
t("gather 128 scrambled", lambda p, r: p[r], payload128, rank_scrambled)
t("gather 32 monotone", lambda p, r: p[r], payload32, rank)
t("gather 32 scrambled", lambda p, r: p[r], payload32, rank_scrambled)
t("take128", lambda p, r: jnp.take(p, r, axis=0, unique_indices=False, indices_are_sorted=True), payload128, rank)
