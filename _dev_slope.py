import jax, jax.numpy as jnp, numpy as np, math, time, sys
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize import rasterize, RasterConfig
from ed3dgs_tpu.ops.binning import bin_gaussians, build_gaussian_payload
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

def slope(body, lo=3, hi=13):
    def make(iters):
        @jax.jit
        def run(ms):
            def it(i, acc):
                return acc + body(ms + 1e-6*i.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, it, 0.0)
        return run
    rlo, rhi = make(lo), make(hi)
    jax.block_until_ready(rlo(means)); jax.block_until_ready(rhi(means))
    ts = []
    for rep in range(3):
        t0=time.time(); jax.block_until_ready(rlo(means+np.float32(1e-5*(rep+1)))); tl=time.time()-t0
        t0=time.time(); jax.block_until_ready(rhi(means+np.float32(2e-5*(rep+1)))); th=time.time()-t0
        ts.append((th-tl)/(hi-lo)*1000)
    return round(float(np.median(ts)),1)

def s_bins(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    return jnp.sum(b.tile_count.astype(jnp.float32)) + jnp.sum((b.pair_gauss % 7).astype(jnp.float32))
def s_gather(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, tongue)[b.order]
    pair = pay[b.pair_gauss]
    return jnp.sum(pair[:, :32])
cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                   pair_capacity=K, chunk=128, backend="pallas")
def s_full(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    return jnp.sum(rasterize(p, tongue, jnp.ones(3), cfg).color)
which = sys.argv[1] if len(sys.argv)>1 else "all"
if which in ("all","bins"): print("proj+bins slope:", slope(s_bins), "ms")
if which in ("all","gather"): print("proj+bins+gather slope:", slope(s_gather), "ms")
if which in ("all","full"): print("full slope:", slope(s_full, 2, 8), "ms")
