import jax, jax.numpy as jnp, numpy as np, math, time
from ed3dgs_tpu.core import sym3
from ed3dgs_tpu.core.quaternion import build_covariance_3d, unpack_sym3
from ed3dgs_tpu.data.cameras import look_at_camera
n=100_000
rng = np.random.default_rng(0)
means = jnp.asarray(np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32))
scales = jnp.asarray(np.exp(rng.normal(-4.5,0.5,(n,3))).astype(np.float32))
q = rng.normal(size=(n,4)).astype(np.float32); q/=np.linalg.norm(q,axis=1,keepdims=True); q=jnp.asarray(q)
w,h = 802,550
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
V = jnp.asarray(cam.world_view); R_cw = V[:3,:3]

def slope(body):
    def make(iters):
        @jax.jit
        def run(ms):
            def it(i, acc):
                return acc + body(ms + 1e-6*i.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, it, 0.0)
        return run
    r5, r20 = make(5), make(20)
    jax.block_until_ready(r5(means)); jax.block_until_ready(r20(means))
    t0=time.time(); jax.block_until_ready(r5(means+1e-5)); t5=time.time()-t0
    t0=time.time(); jax.block_until_ready(r20(means+2e-5)); t20=time.time()-t0
    return (t20-t5)/15*1000

def s_cov3d(ms):
    c = build_covariance_3d(scales, q)
    return jnp.sum(c) + jnp.sum(ms)*0
def s_cov2d(ms):
    cov3d = build_covariance_3d(scales, q)
    p_view = ms @ R_cw.T + V[:3,3]
    Sigma = unpack_sym3(cov3d)
    Sigma_cam = jnp.einsum("ij,njk,lk->nil", R_cw, Sigma, R_cw)
    return jnp.sum(Sigma_cam)
def s_eig(ms):
    cov3d = build_covariance_3d(scales, q) + 1e-6*jnp.sum(ms)
    e = sym3.sym3_eigenvalues(cov3d)
    return jnp.sum(e)
def s_pinv(ms):
    cov3d = build_covariance_3d(scales, q) + 1e-6*jnp.sum(ms)
    inv, well = sym3.sym3_pseudo_inverse_min(cov3d)
    return jnp.sum(inv)
print("cov3d:", round(slope(s_cov3d),1), "ms")
print("cov2d(sigma_cam einsum):", round(slope(s_cov2d),1), "ms")
print("eigenvalues:", round(slope(s_eig),1), "ms")
print("pseudo-inverse:", round(slope(s_pinv),1), "ms")
from ed3dgs_tpu.core.projection import project_gaussians
kw = dict(viewmatrix=V, projmatrix=jnp.asarray(cam.full_proj),
    campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
shs = jnp.asarray(rng.normal(0,0.3,(n,16,3)).astype(np.float32))
opac = jnp.asarray(rng.uniform(0.3,0.95,n).astype(np.float32))
def s_proj(ms):
    p = project_gaussians(ms, scales, q, opac, shs, **kw)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in [p.mean2d, p.conic, p.camera_planes, p.normal, p.rgb, p.ray_plane, p.ts])
print("full projection:", round(slope(s_proj),1), "ms")
