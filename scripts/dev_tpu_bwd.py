"""Real-TPU check of the pallas backward + train-step timing."""
import jax, jax.numpy as jnp, numpy as np, math, time
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize import rasterize, RasterConfig
n=100_000; w, h = 802, 550; K=1<<21
rng = np.random.default_rng(0)
means = jnp.asarray(np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32))
scales = jnp.asarray(np.exp(rng.normal(-4.5,0.5,(n,3))).astype(np.float32))
q = rng.normal(size=(n,4)).astype(np.float32); q/=np.linalg.norm(q,axis=1,keepdims=True); q=jnp.asarray(q)
opac = jnp.asarray(rng.uniform(0.3,0.95,n).astype(np.float32))
shs = jnp.asarray(rng.normal(0,0.3,(n,16,3)).astype(np.float32))
tongue = jnp.zeros(n)
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
    campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
target = jnp.asarray(rng.uniform(0,1,(3,h,w)).astype(np.float32))
def make(backend, iters):
    cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                       pair_capacity=K, chunk=128, backend=backend, max_per_tile=2048)
    def loss(ms):
        p = project_gaussians(ms, scales, q, opac, shs, **kw)
        out = rasterize(p, tongue, jnp.ones(3), cfg)
        return jnp.mean(jnp.abs(out.color-target)) + 0.1*jnp.mean(out.expected_depth)
    g = jax.grad(loss)
    @jax.jit
    def run(ms):
        def it(i, acc):
            gr = g(ms + 1e-6*i.astype(jnp.float32))
            return acc + jnp.sum(gr[::97])
        return jax.lax.fori_loop(0, iters, it, 0.0)
    return run
def slope(backend):
    lo, hi = 2, 7
    rlo, rhi = make(backend, lo), make(backend, hi)
    jax.block_until_ready(rlo(means)); jax.block_until_ready(rhi(means))
    ts=[]
    for rep in range(3):
        t0=time.time(); jax.block_until_ready(rlo(means+np.float32(1e-5*(rep+1)))); tl=time.time()-t0
        t0=time.time(); jax.block_until_ready(rhi(means+np.float32(2e-5*(rep+1)))); th=time.time()-t0
        ts.append((th-tl)/(hi-lo)*1000)
    return round(float(np.median(ts)),1)
# numeric sanity on real TPU first: compare pallas vs xla grad
# small-scale numeric parity on real TPU (XLA-backward OOMs at full scale)
ns = 3000
cfg_p = RasterConfig(width=w,height=h,focal_x=cam.focal_x,focal_y=cam.focal_y,pair_capacity=1<<17,chunk=128,backend="pallas",max_per_tile=128)
cfg_x = RasterConfig(width=w,height=h,focal_x=cam.focal_x,focal_y=cam.focal_y,pair_capacity=1<<17,chunk=32,backend="xla",max_per_tile=128)
def gr(cfg):
    def loss(ms):
        p = project_gaussians(ms, scales[:ns], q[:ns], opac[:ns], shs[:ns], **kw)
        out = rasterize(p, tongue[:ns], jnp.ones(3), cfg)
        return jnp.mean(jnp.abs(out.color-target))
    return jax.jit(jax.grad(loss))(means[:ns])
gp = np.asarray(jax.block_until_ready(gr(cfg_p)))
gx = np.asarray(jax.block_until_ready(gr(cfg_x)))
sc = np.abs(gx).max()
print("TPU grad pallas-vs-xla maxrel:", np.abs(gp-gx).max()/sc, "finite:", np.isfinite(gp).all())
print("fwd+bwd slope pallas (100k, 802x550):", slope("pallas"), "ms")
