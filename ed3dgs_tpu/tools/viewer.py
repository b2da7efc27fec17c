"""Interactive viewer server CLI: serve renders of a checkpoint over the SIBR
remote-viewer socket protocol (see render/network_gui.py)."""

from __future__ import annotations

import argparse
import json
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
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--time", type=float, default=0.0,
                   help="timeline position to render")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config.loader import load_full_config
    from ..data.scene import Scene
    from ..models.deformation import init_deform_params
    from ..ops.rasterize import RasterConfig
    from ..render import RenderSettings, render as render_fn
    from ..render.network_gui import ViewerServer

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

    jitted = {}

    def handle(cam):
        key = (cam["width"], cam["height"])
        if key not in jitted:
            w, h = key
            rcfg = RasterConfig(width=w, height=h,
                                focal_x=w / (2 * np.tan(cam["fovx"] / 2)),
                                focal_y=h / (2 * np.tan(cam["fovy"] / 2)),
                                pair_capacity=opt.pair_capacity,
                                chunk=opt.raster_chunk, backend="auto",
                                max_per_tile=2048)

            @jax.jit
            def f(vm, pm, cp, t):
                s = RenderSettings(vm, pm, cp, t, None)
                return render_fn(params, aux, dparams, hidden, s, rcfg,
                                 jnp.ones(3), iteration=10 ** 9,
                                 sh_degree=model.sh_degree,
                                 kernel_size=model.kernel_size,
                                 disable_filter3d=model.disable_filter3D,
                                 num_down_emb_c=hidden.min_embeddings,
                                 num_down_emb_f=hidden.min_embeddings)["render"]
            jitted[key] = f
        wv = cam["world_view"]
        campos = np.linalg.inv(wv)[:3, 3]
        img = jitted[key](jnp.asarray(wv), jnp.asarray(cam["full_proj"]),
                          jnp.asarray(campos),
                          jnp.asarray(args.time, jnp.float32))
        return np.asarray(img)

    server = ViewerServer(args.ip, args.port)
    print(f"viewer server on {args.ip}:{args.port}", flush=True)
    try:
        server.serve_forever(handle, verify=model.model_path)
    finally:
        server.close()


if __name__ == "__main__":
    sys.exit(main())
