import jax, jax.numpy as jnp, numpy as np, time
K = 1<<21; N = 100_000
rng = np.random.default_rng(0)
offsets = jnp.asarray(np.sort(rng.integers(0, K, N)).astype(np.int32))
p = jnp.arange(K, dtype=jnp.int32)
def t(f, *a, iters=10):
    o = jax.block_until_ready(jax.jit(f)(*a)); t0=time.time()
    for _ in range(iters): o=jax.jit(f)(*a)
    jax.block_until_ready(o); return (time.time()-t0)/iters*1000
for m in ["scan", "scan_unrolled", "sort", "compare_all"]:
    try:
        print(m, round(t(lambda o_, q: jnp.searchsorted(o_, q, side='right', method=m), offsets, p),1), "ms")
    except Exception as e:
        print(m, "ERR", str(e)[:80])
idx = jnp.asarray(rng.integers(0, N, K).astype(np.int32))
src = jnp.asarray(rng.normal(size=(N, 2)).astype(np.float32))
print("gather [K,2] ms:", round(t(lambda s, i: s[i], src, idx),1))
src1 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
print("gather [K] ms:", round(t(lambda s, i: s[i], src1, idx),1))
srcp = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
print("gather [K,128] ms:", round(t(lambda s, i: s[i], srcp, idx, iters=3),1))
