"""TSDF-fusion mesh extraction CLI — reference mesh_extract_tsdf_fusion.py.

Renders every train view at a timestep (median depth masked by alpha and the
GT mask), fuses into a TSDF volume and exports recon_tsdf.ply.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", default=None)
    p.add_argument("--configs", default=None)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--loader", default=None)
    p.add_argument("--duration", type=int, default=None)
    p.add_argument("--timestep_index", type=int, default=0)
    p.add_argument("--voxel_size", type=float, default=0.002)
    p.add_argument("--engine", choices=("sparse", "dense"), default="sparse",
                   help="sparse = block-hashed voxel grid (reference-parity "
                        "VoxelBlockGrid, memory ~ surface area; default); "
                        "dense = full bounding-box grid (small scenes only)")
    p.add_argument("--alpha_thres", type=float, default=0.5)
    p.add_argument("--depth_max", type=float, default=8.0)
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config.loader import load_full_config
    from ..data.scene import Scene
    from ..mesh.tsdf import fuse_depths
    from ..mesh.tsdf_sparse import fuse_depths_sparse
    from ..data.ply import write_mesh_ply
    from ..models.deformation import init_deform_params
    from ..ops.rasterize import RasterConfig
    from ..render import RenderSettings, render as render_fn

    overrides = {k: v for k, v in {
        "source_path": args.source_path, "model_path": args.model_path,
        "loader": args.loader}.items() if v is not None}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    cfg = load_full_config(args.configs, overrides)
    model, hidden, opt = cfg.model, cfg.hidden, cfg.opt

    scene = Scene(model, hidden, capacity=opt.max_number_gaussians,
                  duration=args.duration, load_iteration=args.iteration,
                  shuffle=False)
    template = init_deform_params(jax.random.PRNGKey(0), hidden)
    dparams = scene.load_deformation(template)
    params, aux = scene.params, scene.aux

    views = sorted([c for c in scene.train_cameras
                    if c.frame_no == args.timestep_index],
                   key=lambda c: c.cam_no)
    m0 = views[0].matrices()
    rcfg = RasterConfig(width=m0.width, height=m0.height, focal_x=m0.focal_x,
                        focal_y=m0.focal_y, pair_capacity=opt.pair_capacity,
                        chunk=opt.raster_chunk, backend="auto",
                        max_per_tile=2048)
    bg = jnp.ones(3)

    @jax.jit
    def render_view(vm, pm, cp, t):
        s = RenderSettings(vm, pm, cp, t, None)
        return render_fn(params, aux, dparams, hidden, s, rcfg, bg,
                         iteration=10 ** 9, sh_degree=model.sh_degree,
                         kernel_size=model.kernel_size,
                         disable_filter3d=model.disable_filter3D,
                         num_down_emb_c=hidden.min_embeddings,
                         num_down_emb_f=hidden.min_embeddings)

    depths, colors, wvs, focals = [], [], [], []
    for view in views:
        m = view.matrices()
        out = render_view(jnp.asarray(m.world_view), jnp.asarray(m.full_proj),
                          jnp.asarray(m.campos),
                          jnp.asarray(view.time, jnp.float32))
        depth = np.asarray(out["median_depth"])[0].copy()
        depth[np.asarray(out["mask"])[0] < args.alpha_thres] = 0.0
        gt_mask = view.alpha_mask
        if gt_mask is not None:
            depth[np.asarray(gt_mask)[0] < 0.5] = 0.0
        depths.append(depth)
        colors.append(np.clip(np.asarray(out["render"]), 0, 1).transpose(1, 2, 0))
        wvs.append(m.world_view)
        focals.append((m.focal_x, m.focal_y))
        view.release_image()

    fuse = fuse_depths_sparse if args.engine == "sparse" else fuse_depths
    verts, faces, vcols = fuse(depths, colors, wvs, focals,
                               voxel_size=args.voxel_size,
                               depth_max=args.depth_max)
    out_path = os.path.join(model.model_path, "recon_tsdf.ply")
    write_mesh_ply(out_path, verts, faces, vcols)
    print(f"{len(verts)} vertices, {len(faces)} faces -> {out_path}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
