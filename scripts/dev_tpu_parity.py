"""Dev script: pallas-vs-xla parity + timing on the real TPU."""
import jax, jax.numpy as jnp, numpy as np, math, time, functools
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data import look_at_camera
from ed3dgs_tpu.ops.rasterize import rasterize, RasterConfig

rng = np.random.default_rng(0)
N = 2000
means = np.stack([rng.uniform(-1,1,N), rng.uniform(-1,1,N), rng.uniform(1.5,4,N)],1).astype(np.float32)
scales = np.exp(rng.normal(-3.0,0.5,(N,3))).astype(np.float32)
q = rng.normal(size=(N,4)).astype(np.float32); q/=np.linalg.norm(q,axis=1,keepdims=True)
opac = rng.uniform(0.2,0.95,N).astype(np.float32)
rgb = rng.uniform(0,1,(N,3)).astype(np.float32)
tongue = (rng.uniform(0,1,N)>0.7).astype(np.float32)
fov = math.radians(60.0); w, h = 256, 192
cam = look_at_camera((0,0,0),(0,0,1),(0,-1,0),fov,fov,w,h).matrices()

def run(backend):
    proj = project_gaussians(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q), jnp.asarray(opac),
        jnp.zeros((N,16,3)), viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
        focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=0, colors_precomp=jnp.asarray(rgb))
    cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                       pair_capacity=1<<16, chunk=128, backend=backend, max_per_tile=512)
    return rasterize(proj, jnp.asarray(tongue), jnp.array([0.1,0.2,0.3]), cfg)

t0=time.time(); pal = jax.block_until_ready(run("pallas")); print("pallas compile+run", time.time()-t0, flush=True)
t0=time.time(); xla = jax.block_until_ready(run("xla")); print("xla compile+run", time.time()-t0, flush=True)
for name in pal._fields:
    a, b = np.asarray(getattr(xla,name)), np.asarray(getattr(pal,name))
    print(f"{name:16s} maxerr {np.abs(a-b).max():.2e}")
f_pal = jax.jit(functools.partial(run, "pallas")); jax.block_until_ready(f_pal())
t0=time.time()
for _ in range(20): out = f_pal()
jax.block_until_ready(out); print("pallas per-frame ms:", (time.time()-t0)/20*1000)
f_xla = jax.jit(functools.partial(run, "xla")); jax.block_until_ready(f_xla())
t0=time.time()
for _ in range(20): out = f_xla()
jax.block_until_ready(out); print("xla per-frame ms:", (time.time()-t0)/20*1000)
