import jax, jax.numpy as jnp, numpy as np, time
K = 1<<21
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.integers(0, 1785, K).astype(np.int32))
ranks = jnp.asarray(rng.integers(0, 100000, K).astype(np.int32))
def t(f, *a, iters=10):
    o = jax.block_until_ready(jax.jit(f)(*a)); t0=time.time()
    for _ in range(iters): o=jax.jit(f)(*a)
    jax.block_until_ready(o); return (time.time()-t0)/iters*1000
print("stable 2-op sort ms:", round(t(lambda a,b: jax.lax.sort((a,b), num_keys=1, is_stable=True), tiles, ranks),1))
print("unstable 2-op sort ms:", round(t(lambda a,b: jax.lax.sort((a,b), num_keys=1, is_stable=False), tiles, ranks),1))
def fused(a, b):
    key = a.astype(jnp.uint32) << 21 | jax.lax.broadcasted_iota(jnp.uint32, (K,1), 0).squeeze(-1)
    s = jax.lax.sort(key)
    p = (s & ((1<<21)-1)).astype(jnp.int32)
    return s >> 21, b[p]
print("fused u32 key sort ms:", round(t(fused, tiles, ranks),1))
print("argsort ms:", round(t(lambda a: jnp.argsort(a), tiles),1))
print("sort u32 only ms:", round(t(lambda a: jax.lax.sort(a.astype(jnp.uint32)), tiles),1))
print("sort f32 only ms:", round(t(lambda a: jax.lax.sort(a.astype(jnp.float32)), tiles),1))
# segment-sum counting approach timing pieces
print("segment ms:", round(t(lambda a: jax.ops.segment_sum(jnp.ones_like(a), a, num_segments=1785), tiles),1))
