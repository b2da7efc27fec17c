import jax, jax.numpy as jnp, numpy as np, math, time, functools
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.binning import bin_gaussians, build_gaussian_payload, tile_grid
from ed3dgs_tpu.ops import rasterize_pallas as rp
n=100_000; w, h = 802, 550
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32)
scales = np.exp(rng.normal(-4.5,0.5,(n,3))).astype(np.float32)
q = rng.normal(size=(n,4)).astype(np.float32); q/=np.linalg.norm(q,axis=1,keepdims=True)
opac = rng.uniform(0.3,0.95,n).astype(np.float32)
shs = (rng.normal(0,0.3,(n,16,3))*np.array([3.0]+[0.3]*15)[None,:,None]).astype(np.float32)
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
    campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
A = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q), jnp.asarray(opac), jnp.asarray(shs))

@jax.jit
def f_proj(*a): return project_gaussians(*a, **kw)
proj = jax.block_until_ready(f_proj(*A))
print("tiles_touched total:", int(jnp.sum(proj.tiles_touched)), "valid:", int(jnp.sum(proj.valid)))

K = 1<<21
@jax.jit
def f_bins(*a):
    p = project_gaussians(*a, **kw)
    return bin_gaussians(p, width=w, height=h, pair_capacity=K)
@jax.jit
def f_payload(*a):
    p = project_gaussians(*a, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, jnp.zeros(n))
    pair = pay[b.order][b.pair_gauss]
    return pair, b.tile_start, b.tile_count
@jax.jit
def f_full(*a):
    pair, ts_, tc_ = f_payload(*a)
    pair = jnp.pad(pair, ((0,128),(0,0)))
    gx, gy = tile_grid(w,h)
    return rp.rasterize_pallas_forward(pair, ts_, tc_, num_tiles=gx*gy, grid_x=gx,
        width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y, chunk=128)

def t(f, iters=10):
    o = jax.block_until_ready(f(*A)); t0=time.time()
    for _ in range(iters): o=f(*A)
    jax.block_until_ready(o); return (time.time()-t0)/iters*1000
print("proj ms:", round(t(f_proj),2))
print("proj+bins ms:", round(t(f_bins),2))
print("proj+bins+payload ms:", round(t(f_payload),2))
print("full pallas ms:", round(t(f_full, 5),2))
b = jax.block_until_ready(f_bins(*A))
tc = np.asarray(b.tile_count)
print("pairs:", int(b.num_pairs), "max/tile:", tc.max(), "mean/tile:", tc.mean().round(1))
