import jax, jax.numpy as jnp, numpy as np, math, time, functools
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.rasterize import rasterize, RasterConfig
from ed3dgs_tpu.ops.binning import bin_gaussians, build_gaussian_payload
n=100_000; w, h = 802, 550
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
def t(f, iters=10):
    o = jax.block_until_ready(f(*A)); t0=time.time()
    for _ in range(iters): o=f(*A)
    jax.block_until_ready(o); return round((time.time()-t0)/iters*1000,1)
K=1<<21
@jax.jit
def f_gather(*a):
    p = project_gaussians(*a, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, tongue)
    return pay[b.order[b.pair_gauss]]
print("proj+bins+fused-gather:", t(f_gather), "ms")
for chunk in [128, 256, 512]:
    cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                       pair_capacity=K, chunk=chunk, backend="pallas")
    f = jax.jit(lambda *a: rasterize(project_gaussians(*a, **kw), tongue, jnp.ones(3), cfg).color)
    print(f"full pallas chunk={chunk}:", t(f), "ms")
