"""Full jitted train step on real TPU with the pallas backend."""
import jax, jax.numpy as jnp, numpy as np, math, time
from ed3dgs_tpu.config.params import DeformHiddenConfig, OptimizationConfig
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.models import gaussians as gm
from ed3dgs_tpu.ops.rasterize import RasterConfig
from ed3dgs_tpu.train.trainer import TrainSetup, init_train_state, make_train_step, update_knn_cache

rng = np.random.default_rng(0)
n, cap = 95_000, 100_000
w, h = 802, 550
pts = np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32)
cols = rng.uniform(0.1,0.9,(n,3)).astype(np.float32)
params, aux = gm.create_from_points(pts, cols, capacity=cap)
hidden = DeformHiddenConfig(net_width=128, defor_depth=1)
opt_cfg = OptimizationConfig()
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
rcfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                    pair_capacity=1<<21, chunk=128, backend="pallas", max_per_tile=2048)
state, optimizer = init_train_state(params, hidden, opt_cfg, 1.0)
setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1, disable_filter3d=True,
                   radegs_from_iter=10**9)
step = make_train_step(setup, opt_cfg, optimizer)
knn_cache = update_knn_cache(params, aux)
batch = {
    "gt_image": jnp.asarray(rng.uniform(0,1,(1,3,h,w)).astype(np.float32)),
    "viewmatrix": jnp.asarray(cam.world_view)[None],
    "projmatrix": jnp.asarray(cam.full_proj)[None],
    "campos": jnp.asarray(cam.campos)[None],
    "time": jnp.zeros((1,)), "cam_no": jnp.zeros((1,), jnp.int32),
    "use_ssim": jnp.asarray(False),
}
print("compiling step...", flush=True)
t0=time.time()
state, aux, metrics = step(state, aux, batch, knn_cache)
jax.block_until_ready(metrics["loss"])
print("compile+first step:", round(time.time()-t0,1), "s; loss:", float(metrics["loss"]), "psnr:", round(float(metrics["psnr"]),2))
# chained steps for honest timing
def chain(iters):
    @jax.jit
    def run(state, aux, batch, knn_cache):
        def it(i, carry):
            st, au = carry
            b = dict(batch); b["time"] = batch["time"] + 1e-4*i.astype(jnp.float32)
            st, au, m = step._fun(st, au, b, knn_cache) if hasattr(step, "_fun") else step(st, au, b, knn_cache)
            return (st, au)
        return jax.lax.fori_loop(0, iters, it, (state, aux))
    return run
r2, r6 = chain(2), chain(6)
s2 = jax.block_until_ready(r2(state, aux, batch, knn_cache))
s6 = jax.block_until_ready(r6(state, aux, batch, knn_cache))
ts=[]
for rep in range(3):
    b2 = dict(batch); b2["gt_image"] = batch["gt_image"] + np.float32(1e-4*(rep+1))
    t0=time.time(); jax.block_until_ready(r2(state, aux, b2, knn_cache)); tl=time.time()-t0
    t0=time.time(); jax.block_until_ready(r6(state, aux, b2, knn_cache)); th=time.time()-t0
    ts.append((th-tl)/4*1000)
print("train step slope:", round(float(np.median(ts)),1), "ms")
loss2 = None
