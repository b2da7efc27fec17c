import sys
import jax, jax.numpy as jnp, numpy as np
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.ops.knn import knn
from ed3dgs_tpu.train import losses as L
from ed3dgs_tpu.train.trainer import update_knn_cache
rng = np.random.default_rng(0)
n, cap = 95_000, 100_000
pts = np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32)
cols = rng.uniform(0.1,0.9,(n,3)).astype(np.float32)
params, aux = gm.create_from_points(pts, cols, capacity=cap)
print("start knn", flush=True)
cache = update_knn_cache(params, aux)
print("knn done", flush=True)
print("weights finite:", bool(jnp.isfinite(cache.weights).all()), "max:", float(cache.weights.max()))
print("indices range:", int(cache.indices.min()), int(cache.indices.max()))
emb_mask = aux.alive
el = L.embedding_knn_loss(params.embedding, cache.indices, cache.weights, mask=emb_mask)
print("emb_loss:", float(el))
ol = L.opacity_mean_loss(params.opacity, aux.alive)
print("opa:", float(ol))
# knn distances on dead slots
d2, idx = knn(jnp.where(aux.alive[:,None], params.xyz, 1e6*(1.0+jnp.arange(cap, dtype=jnp.float32))[:,None]), k=20)
print("d2 finite:", bool(jnp.isfinite(d2).all()), "min:", float(d2.min()))
