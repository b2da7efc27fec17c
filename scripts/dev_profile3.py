"""Honest timing: chain ITERS dependent, input-perturbed evaluations in ONE jit."""
import jax, jax.numpy as jnp, numpy as np, math, time
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize import rasterize, RasterConfig
from ed3dgs_tpu.ops.binning import bin_gaussians, build_gaussian_payload
n=100_000; w, h = 802, 550; K=1<<21
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32)
scales = np.exp(rng.normal(-4.5,0.5,(n,3))).astype(np.float32)
q = rng.normal(size=(n,4)).astype(np.float32); q/=np.linalg.norm(q,axis=1,keepdims=True)
opac = rng.uniform(0.3,0.95,n).astype(np.float32)
shs = rng.normal(0,0.3,(n,16,3)).astype(np.float32)
tongue = jnp.zeros(n)
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
    campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
A = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q), jnp.asarray(opac), jnp.asarray(shs))

def chain(body, iters=10):
    @jax.jit
    def run(ms, sc, qq, op, sh):
        def it(i, acc):
            out = body(ms + 1e-6*i.astype(jnp.float32), sc, qq, op, sh)
            return acc + out
        return jax.lax.fori_loop(0, iters, it, 0.0)
    o = jax.block_until_ready(run(*A))
    t0=time.time(); o = jax.block_until_ready(run(*A))
    # same-input cache would hit on the second call -> run a third with perturbed input
    t0=time.time()
    o = jax.block_until_ready(run(A[0]+1e-5, *A[1:]))
    return (time.time()-t0)/iters*1000

def s_proj(ms, sc, qq, op, sh):
    p = project_gaussians(ms, sc, qq, op, sh, **kw)
    return jnp.sum(p.depth) + jnp.sum(p.conic)
def s_bins(ms, sc, qq, op, sh):
    p = project_gaussians(ms, sc, qq, op, sh, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    return jnp.sum(b.tile_count.astype(jnp.float32)) + jnp.sum(b.pair_gauss[:100].astype(jnp.float32))
def s_gather(ms, sc, qq, op, sh):
    p = project_gaussians(ms, sc, qq, op, sh, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, tongue)[b.order]
    pair = pay[b.pair_gauss]
    return jnp.sum(pair[:, :4])
def s_full(ms, sc, qq, op, sh):
    p = project_gaussians(ms, sc, qq, op, sh, **kw)
    cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                       pair_capacity=K, chunk=256, backend="pallas")
    return jnp.sum(rasterize(p, tongue, jnp.ones(3), cfg).color)
print("proj:", round(chain(s_proj),1), "ms")
print("proj+bins:", round(chain(s_bins),1), "ms")
print("proj+bins+gather:", round(chain(s_gather),1), "ms")
print("full:", round(chain(s_full, iters=5),1), "ms")
