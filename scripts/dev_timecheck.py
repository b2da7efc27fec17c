import jax, jax.numpy as jnp, numpy as np, time
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(8192,8192)).astype(np.float32))
b = jnp.asarray(rng.normal(size=(8192,8192)).astype(np.float32))
f = jax.jit(lambda x, y: x @ y)
o = jax.block_until_ready(f(a,b))
for iters in [1, 5, 10]:
    t0=time.time()
    for _ in range(iters): o = f(a,b)
    jax.block_until_ready(o)
    print(f"same-input matmul x{iters}:", round((time.time()-t0)/iters*1000,2), "ms/iter")
# varying input
t0=time.time()
for i in range(10): o = f(a + np.float32(i), b)
jax.block_until_ready(o)
print("varying-input matmul:", round((time.time()-t0)/10*1000,2), "ms/iter (expect ~11ms f32 on v5e)")
# chained (dependency) loop
t0=time.time()
x = a
for i in range(10): x = f(x, b) * 1e-5
jax.block_until_ready(x)
print("chained matmul:", round((time.time()-t0)/10*1000,2), "ms/iter")
# gather, varying index
N=100_000; K=1<<21
payload = jnp.asarray(rng.normal(size=(N,128)).astype(np.float32))
ranki = [jnp.asarray(rng.integers(0,N,K).astype(np.int32)) for _ in range(10)]
g = jax.jit(lambda p, r: p[r])
o = jax.block_until_ready(g(payload, ranki[0]))
t0=time.time()
for i in range(10): o = g(payload, ranki[i])
jax.block_until_ready(o)
print("gather 2Mx128 varying:", round((time.time()-t0)/10*1000,2), "ms/iter")
