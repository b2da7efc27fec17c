"""Gaussian-ellipsoid mesh export CLI — reference gaussians_to_mesh.py.

Per timestep: deform the cloud, apply activations, emit one icosphere per
visible Gaussian colored by its SH-DC color, export as a colored ply.
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
    p.add_argument("--start_timestep_index", type=int, default=0)
    p.add_argument("--end_timestep_index", type=int, default=1)
    p.add_argument("--scale_factor", type=float, default=1.5)
    p.add_argument("--opacity_threshold", type=float, default=0.01)
    p.add_argument("--random_colors", action="store_true")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    import jax

    from ..config.loader import load_full_config
    from ..core.sh import sh_to_rgb_dc
    from ..data.ply import write_mesh_ply
    from ..data.scene import Scene
    from ..mesh.extract import deformed_gaussians
    from ..mesh.gaussians_viz import gaussians_to_mesh
    from ..models.deformation import init_deform_params

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
    alive = np.asarray(aux.alive)

    for ts in range(args.start_timestep_index, args.end_timestep_index):
        t = ts / scene.maxtime
        xyz, scales_f, rot_raw, opac_f, shs_f = deformed_gaussians(
            params, aux, dparams, hidden, t, hidden.min_embeddings,
            scene.loaded_iter or 10 ** 9)
        colors = np.asarray(sh_to_rgb_dc(shs_f[:, 0, :]))
        verts, faces, vcols = gaussians_to_mesh(
            np.asarray(xyz)[alive], np.asarray(scales_f)[alive],
            np.asarray(rot_raw)[alive], colors[alive],
            np.asarray(opac_f)[alive],
            scale_factor=args.scale_factor,
            opacity_threshold=args.opacity_threshold,
            random_colors=args.random_colors)
        out = os.path.join(model.model_path, "gaussian_meshes",
                           f"{ts:05d}.ply")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        write_mesh_ply(out, verts, faces, vcols)
        print(f"timestep {ts}: {len(verts)} verts -> {out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
