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
shs = rng.normal(0,0.3,(n,16,3)).astype(np.float32)
fov = math.radians(50.0)
cam = look_at_camera((0,0,0),(0,0,2.0),(0,-1,0),fov,2*math.atan(math.tan(fov/2)*h/w),w,h).matrices()
kw = dict(viewmatrix=jnp.asarray(cam.world_view), projmatrix=jnp.asarray(cam.full_proj),
    campos=jnp.asarray(cam.campos), width=w, height=h, tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
    focal_x=cam.focal_x, focal_y=cam.focal_y, kernel_size=0.1, sh_degree=3)
A = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q), jnp.asarray(opac), jnp.asarray(shs))
grid_x, grid_y = tile_grid(w, h); num_tiles = grid_x*grid_y

def alt(stage):
    def f(*a):
        proj = project_gaussians(*a, **kw)
        sort_key = jnp.where(proj.valid, proj.depth, jnp.inf)
        order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
        tiles_sorted = proj.tiles_touched[order].astype(jnp.int32)
        offsets = jnp.cumsum(tiles_sorted)
        excl = offsets - tiles_sorted
        # scatter-start + cummax to recover pair->rank
        starts = jnp.full((K,), -1, jnp.int32)
        gidx = jnp.arange(n, dtype=jnp.int32)
        pos = jnp.where(tiles_sorted > 0, excl, K)  # invalid -> dropped
        starts = starts.at[jnp.minimum(pos, K)].max(gidx, mode='drop')
        rank = jax.lax.cummax(starts)
        rank_c = jnp.maximum(rank, 0)
        if stage == "rank": return rank_c
        k = jnp.arange(K, dtype=jnp.int32) - excl[rank_c]
        total = offsets[-1]
        in_range = jnp.arange(K, dtype=jnp.int32) < total
        rmin = proj.rect_min[order][rank_c]
        rw = jnp.maximum(proj.rect_max[order][rank_c][:,0] - rmin[:,0], 1)
        ti = rmin[:,0] + k % rw
        tj = rmin[:,1] + k // rw
        tile_id = jnp.where(in_range, tj*grid_x+ti, num_tiles).astype(jnp.int32)
        if stage == "tileid": return tile_id
        tile_sorted, rank_sorted = jax.lax.sort((tile_id, rank_c), num_keys=1, is_stable=True)
        if stage == "sort": return tile_sorted
        cnt = jax.ops.segment_sum(jnp.ones_like(tile_sorted), tile_sorted, num_segments=num_tiles+1)
        tile_count = cnt[:num_tiles]
        tile_start = jnp.cumsum(tile_count) - tile_count
        return tile_start, tile_count, rank_sorted
    return jax.jit(f)
def t(f, iters=5):
    o = jax.block_until_ready(f(*A)); t0=time.time()
    for _ in range(iters): o=f(*A)
    jax.block_until_ready(o); return round((time.time()-t0)/iters*1000,1)
for s in ["rank","tileid","sort","all"]:
    print(s, t(alt(s)), "ms")
# correctness vs current implementation
from ed3dgs_tpu.ops.binning import bin_gaussians
proj = jax.jit(lambda *a: project_gaussians(*a, **kw))(*A)
ref = bin_gaussians(proj, width=w, height=h, pair_capacity=K)
ts_, tc_, rs_ = alt("all")(*A)
print("tile_start match:", bool(jnp.all(ts_[:num_tiles] == ref.tile_start)))
print("tile_count match:", bool(jnp.all(tc_ == ref.tile_count)))
print("rank match:", bool(jnp.all(rs_ == ref.pair_gauss)))
