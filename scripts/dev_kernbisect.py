"""Bisect pallas kernel cost: hack variants of the kernel module."""
import jax, jax.numpy as jnp, numpy as np, math, time, functools
import ed3dgs_tpu.ops.rasterize_pallas as rp
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.binning import bin_gaussians, build_gaussian_payload, tile_grid
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
grid_x, grid_y = tile_grid(w,h)

# precompute pair payload once (host side baked as jit consts would cache; pass as args)
@jax.jit
def prep(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, tongue)[b.order]
    pair = jnp.pad(pay[b.pair_gauss], ((0,512),(0,0)))
    return pair, b.tile_start, b.tile_count
pair, ts_, tc_ = jax.block_until_ready(prep(means))

def slope_kernel(chunk, iters_pair=(2,8)):
    def make(iters):
        @jax.jit
        def run(pair, ts_, tc_):
            def it(i, acc):
                out = rp.rasterize_pallas_forward(pair + 1e-7*i.astype(jnp.float32), ts_, tc_,
                    num_tiles=grid_x*grid_y, grid_x=grid_x, width=w, height=h,
                    focal_x=cam.focal_x, focal_y=cam.focal_y, chunk=chunk)
                return acc + jnp.sum(out[:, :, :3])
            return jax.lax.fori_loop(0, iters, it, 0.0)
        return run
    lo, hi = iters_pair
    rlo, rhi = make(lo), make(hi)
    jax.block_until_ready(rlo(pair, ts_, tc_)); jax.block_until_ready(rhi(pair, ts_, tc_))
    ts = []
    for rep in range(3):
        t0=time.time(); jax.block_until_ready(rlo(pair+np.float32(1e-6*(rep+1)), ts_, tc_)); tl=time.time()-t0
        t0=time.time(); jax.block_until_ready(rhi(pair+np.float32(2e-6*(rep+1)), ts_, tc_)); th=time.time()-t0
        ts.append((th-tl)/(hi-lo)*1000)
    return round(float(np.median(ts)),1)
for chunk in [128, 256, 512]:
    print(f"kernel-only slope chunk={chunk}:", slope_kernel(chunk), "ms")

from ed3dgs_tpu.ops.rasterize import RasterConfig, _unpack_pallas
def slope2(body, lo=2, hi=8):
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

cfg = RasterConfig(width=w, height=h, focal_x=cam.focal_x, focal_y=cam.focal_y,
                   pair_capacity=K, chunk=256, backend="pallas")
def s_nopad(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, tongue)[b.order]
    pair = pay[b.pair_gauss]
    out = rp.rasterize_pallas_forward(pair, b.tile_start, jnp.minimum(b.tile_count, K-256), # hack: no pad, clamp
        num_tiles=grid_x*grid_y, grid_x=grid_x, width=w, height=h,
        focal_x=cam.focal_x, focal_y=cam.focal_y, chunk=256)
    return jnp.sum(out[:, :, :3])
def s_pad(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, tongue)[b.order]
    pair = jnp.pad(pay[b.pair_gauss], ((0,256),(0,0)))
    out = rp.rasterize_pallas_forward(pair, b.tile_start, b.tile_count,
        num_tiles=grid_x*grid_y, grid_x=grid_x, width=w, height=h,
        focal_x=cam.focal_x, focal_y=cam.focal_y, chunk=256)
    return jnp.sum(out[:, :, :3])
def s_unpack(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    b = bin_gaussians(p, width=w, height=h, pair_capacity=K)
    pay = build_gaussian_payload(p, tongue)[b.order]
    pair = jnp.pad(pay[b.pair_gauss], ((0,256),(0,0)))
    out = rp.rasterize_pallas_forward(pair, b.tile_start, b.tile_count,
        num_tiles=grid_x*grid_y, grid_x=grid_x, width=w, height=h,
        focal_x=cam.focal_x, focal_y=cam.focal_y, chunk=256)
    o = _unpack_pallas(out, jnp.ones(3), cfg, (grid_x, grid_y))
    return jnp.sum(o.color)
print("pipeline nopad+kernel:", slope2(s_nopad), "ms")
print("pipeline pad+kernel:", slope2(s_pad), "ms")
print("pipeline pad+kernel+unpack:", slope2(s_unpack), "ms")

from ed3dgs_tpu.ops.rasterize import rasterize
def s_full_api(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    return jnp.sum(rasterize(p, tongue, jnp.ones(3), cfg).color)
print("full via rasterize():", slope2(s_full_api), "ms")
print("pipeline pad+kernel+unpack (repeat):", slope2(s_unpack), "ms")
print("wall of one s_unpack jit (iters=8):")
r = jax.jit(lambda ms: jax.lax.fori_loop(0, 8, lambda i, acc: acc + s_unpack(ms + 1e-6*i.astype(jnp.float32)), 0.0))
jax.block_until_ready(r(means))
t0=time.time(); jax.block_until_ready(r(means+np.float32(3e-5))); print(round((time.time()-t0)*1000,1), "ms total for 8 iter")
r2 = jax.jit(lambda ms: jax.lax.fori_loop(0, 8, lambda i, acc: acc + s_full_api(ms + 1e-6*i.astype(jnp.float32)), 0.0))
jax.block_until_ready(r2(means))
t0=time.time(); jax.block_until_ready(r2(means+np.float32(3e-5))); print(round((time.time()-t0)*1000,1), "ms total for 8 iter via rasterize()")
