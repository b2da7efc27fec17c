import jax, jax.numpy as jnp, numpy as np, math, time
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
n=100_000; w, h = 802, 550; K = 1<<21
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32)
scales = np.exp(rng.normal(-4.5,0.5,(n,3))).astype(np.float32)
q = rng.normal(size=(n,4)).astype(np.float32); q/=np.linalg.norm(q,axis=1,keepdims=True)
opac = rng.uniform(0.3,0.95,n).astype(np.float32)
shs = rng.normal(0,0.3,(n,16,3)).astype(np.float32)
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
    campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
A = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q), jnp.asarray(opac), jnp.asarray(shs))
p_arg = jnp.arange(K, dtype=jnp.int32)

def variant(mode):
    def f(p, *a):
        proj = project_gaussians(*a, **kw)
        sort_key = jnp.where(proj.valid, proj.depth, jnp.inf)
        order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
        tiles_sorted = proj.tiles_touched[order].astype(jnp.int32)
        offsets = jnp.cumsum(tiles_sorted)
        if mode == "argonly":
            return jnp.searchsorted(offsets, p, side="right")
        if mode == "sortmethod":
            return jnp.searchsorted(offsets, p, side="right", method="sort")
        if mode == "barrier":
            offsets = jax.lax.optimization_barrier(offsets)
            return jnp.searchsorted(offsets, p, side="right")
    return jax.jit(f)
def t(f, *a, iters=5):
    o = jax.block_until_ready(f(*a)); t0=time.time()
    for _ in range(iters): o=f(*a)
    jax.block_until_ready(o); return round((time.time()-t0)/iters*1000,1)
for mode in ["argonly", "sortmethod", "barrier"]:
    print(mode, t(variant(mode), p_arg, *A), "ms")
