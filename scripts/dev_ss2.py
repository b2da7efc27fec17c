import jax, jax.numpy as jnp, numpy as np, time
K = 1<<21; N = 100_000
rng = np.random.default_rng(0)
tiles_np = rng.integers(0, 40, N).astype(np.int32)
tiles_in = jnp.asarray(tiles_np)
p = jnp.arange(K, dtype=jnp.int32)
def t(f, *a, iters=5):
    g = jax.jit(f)
    o = jax.block_until_ready(g(*a)); t0=time.time()
    for _ in range(iters): o=g(*a)
    jax.block_until_ready(o); return (time.time()-t0)/iters*1000
def in_situ(method):
    def f(tiles):
        offsets = jnp.cumsum(tiles)
        return jnp.searchsorted(offsets, p, side='right', method=method)
    return f
for m in ["scan", "sort", "compare_all"]:
    try:
        print("in-situ cumsum +", m, round(t(in_situ(m), tiles_in),1), "ms")
    except Exception as e:
        print(m, "ERR", str(e)[:100])
# is it the cumsum? cumsum alone
print("cumsum alone:", round(t(lambda x: jnp.cumsum(x), tiles_in),1))
# searchsorted with precomputed offsets input
off = jnp.cumsum(tiles_in)
print("precomputed scan:", round(t(lambda o_: jnp.searchsorted(o_, p, side='right'), off),1))
