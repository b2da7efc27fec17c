import jax, jax.numpy as jnp, numpy as np, math, time
from ed3dgs_tpu.core.projection import project_gaussians
from ed3dgs_tpu.data.cameras import look_at_camera
from ed3dgs_tpu.ops.binning import tile_grid
n=100_000; w, h = 802, 550; K = 1<<21
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-1,1,n), rng.uniform(-0.7,0.7,n), rng.uniform(1.2,3.5,n)],1).astype(np.float32)
scales = np.exp(rng.normal(-4.5,0.5,(n,3))).astype(np.float32)
q = rng.normal(size=(n,4)).astype(np.float32); q/=np.linalg.norm(q,axis=1,keepdims=True)
opac = rng.uniform(0.3,0.95,n).astype(np.float32)
shs = (rng.normal(0,0.3,(n,16,3))).astype(np.float32)
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
    campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
A = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q), jnp.asarray(opac), jnp.asarray(shs))
grid_x, grid_y = tile_grid(w, h)
num_tiles = grid_x*grid_y

def upto(stage):
    def f(*a):
        proj = project_gaussians(*a, **kw)
        sort_key = jnp.where(proj.valid, proj.depth, jnp.inf)
        order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
        if stage == "order": return order
        tiles_sorted = proj.tiles_touched[order].astype(jnp.int32)
        offsets = jnp.cumsum(tiles_sorted)
        excl = offsets - tiles_sorted
        if stage == "scan": return offsets
        p = jnp.arange(K, dtype=jnp.int32)
        rank = jnp.searchsorted(offsets, p, side="right").astype(jnp.int32)
        rank_c = jnp.minimum(rank, n-1)
        if stage == "rank": return rank_c
        k = p - excl[rank_c]
        in_range = p < offsets[-1]
        rmin = proj.rect_min[order][rank_c]
        rmax = proj.rect_max[order][rank_c]
        rw = jnp.maximum(rmax[:,0]-rmin[:,0],1)
        ti = rmin[:,0] + k % rw
        tj = rmin[:,1] + k // rw
        tile_id = jnp.where(in_range, tj*grid_x+ti, num_tiles).astype(jnp.int32)
        if stage == "tileid": return tile_id
        tile_sorted, rank_sorted = jax.lax.sort((tile_id, rank_c), num_keys=1, is_stable=True)
        if stage == "sort": return tile_sorted
        tid = jnp.arange(num_tiles, dtype=jnp.int32)
        ts_ = jnp.searchsorted(tile_sorted, tid, side="left").astype(jnp.int32)
        te_ = jnp.searchsorted(tile_sorted, tid, side="right").astype(jnp.int32)
        return ts_, te_, rank_sorted
    return jax.jit(f)
def t(f, iters=5):
    o = jax.block_until_ready(f(*A)); t0=time.time()
    for _ in range(iters): o=f(*A)
    jax.block_until_ready(o); return (time.time()-t0)/iters*1000
for s in ["order","scan","rank","tileid","sort","all"]:
    print(s, round(t(upto(s)),1), "ms")
