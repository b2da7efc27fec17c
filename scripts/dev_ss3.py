import jax, jax.numpy as jnp, numpy as np, time
K = 1<<21; N = 100_000
rng = np.random.default_rng(0)
off_sorted = jnp.asarray(np.sort(rng.integers(0, K, N)).astype(np.int32))
off_cumsum = jnp.cumsum(jnp.asarray(rng.integers(0, 40, N).astype(np.int32)))
p = jnp.arange(K, dtype=jnp.int32)
def bench(name, f, *a, iters=20):
    g = jax.jit(f)
    jax.block_until_ready(g(*a))
    t0=time.time()
    for _ in range(iters): o=g(*a)
    jax.block_until_ready(o)
    print(name, round((time.time()-t0)/iters*1000, 2), "ms")
bench("ss(sorted-rand offsets, p arg)", lambda o_, q: jnp.searchsorted(o_, q, side='right'), off_sorted, p)
bench("ss(cumsum offsets, p arg)", lambda o_, q: jnp.searchsorted(o_, q, side='right'), off_cumsum, p)
bench("ss(cumsum offsets, p const)", lambda o_: jnp.searchsorted(o_, p, side='right'), off_cumsum)
bench("sort 2M (arg)", lambda a: jax.lax.sort(a), jnp.asarray(rng.integers(0,1<<30,K).astype(np.int32)))
bench("2op sort (args)", lambda a,b: jax.lax.sort((a,b), num_keys=1, is_stable=True),
      jnp.asarray(rng.integers(0,1785,K).astype(np.int32)), jnp.asarray(rng.integers(0,N,K).astype(np.int32)))
