"""Rendering CLI — reference render.py equivalent.

Renders train/test/video camera sets from a saved checkpoint: RGB, depth,
Phong-shaded normal maps, tongue masks and the tongue / no-tongue subset
renders (render.py:30-121), plus an FPS report and optional video export.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ed3dgs_tpu renderer")
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", default=None)
    p.add_argument("--configs", default=None)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--loader", default=None)
    p.add_argument("--duration", type=int, default=None)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--skip_video", action="store_true")
    p.add_argument("--tongue_renders", action="store_true")
    p.add_argument("--backend", default="auto")
    p.add_argument("--max_frames", type=int, default=0,
                   help="cap rendered frames per split (0 = all)")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    return p.parse_args(argv)


def phong_shade(normal_img: np.ndarray) -> np.ndarray:
    """Phong-shaded normal visualization (reference phong_reflection,
    render.py:140-179): headlight diffuse+specular on the normal map."""
    n = normal_img  # [3, H, W], camera space
    light = np.array([0.0, 0.0, -1.0])
    ndotl = np.clip(-(n[0] * light[0] + n[1] * light[1] + n[2] * light[2]), 0, 1)
    ambient, diffuse, spec_pow = 0.1, 0.7, 16
    spec = np.clip(ndotl, 0, 1) ** spec_pow * 0.2
    shade = ambient + diffuse * ndotl + spec
    return np.clip(np.stack([shade] * 3), 0, 1)


def save_img(path, chw, clip=True):
    from PIL import Image
    arr = np.asarray(chw)
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[..., 0]
    if clip:
        arr = np.clip(arr, 0, 1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def export_video(frame_dir: str, out_path: str, fps: int = 30):
    """mp4 via imageio if available, else animated GIF fallback."""
    import glob
    frames = sorted(glob.glob(os.path.join(frame_dir, "*.png")))
    if not frames:
        return
    try:
        import imageio.v2 as imageio
        with imageio.get_writer(out_path, fps=fps) as w:
            for fpath in frames:
                w.append_data(imageio.imread(fpath))
    except Exception:
        from PIL import Image
        imgs = [Image.open(f) for f in frames]
        gif = out_path.rsplit(".", 1)[0] + ".gif"
        imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)


def render_set(out_dir, name, cams, renderer, tongue_renders=False,
               max_frames=0):
    import jax

    renders_dir = os.path.join(out_dir, name, "renders")
    gt_dir = os.path.join(out_dir, name, "gt")
    extra_dirs = {k: os.path.join(out_dir, name, k)
                  for k in ("depth", "normal", "tongue")}
    for d in [renders_dir, gt_dir, *extra_dirs.values()]:
        os.makedirs(d, exist_ok=True)

    if max_frames:
        cams = cams[:max_frames]
    t_total = 0.0
    for i, cam in enumerate(cams):
        t0 = time.time()
        out = renderer(cam)
        jax.block_until_ready(out["render"])
        if i > 0:
            t_total += time.time() - t0
        fname = f"{i:05d}.png"
        save_img(os.path.join(renders_dir, fname), np.asarray(out["render"]))
        d = np.asarray(out["expected_depth"])[0]
        dmax = d.max() or 1.0
        save_img(os.path.join(extra_dirs["depth"], fname), d / dmax)
        save_img(os.path.join(extra_dirs["normal"], fname),
                 phong_shade(np.asarray(out["normal"])))
        save_img(os.path.join(extra_dirs["tongue"], fname),
                 np.asarray(out["tongue_mask"])[0])
        gt = cam.image
        if gt is not None:
            save_img(os.path.join(gt_dir, fname), gt)
        cam.release_image()
        if tongue_renders:
            for mode, sub in (("only", "tongue_render"), ("without", "wo_tongue_render")):
                sub_dir = os.path.join(out_dir, name, sub)
                os.makedirs(sub_dir, exist_ok=True)
                save_img(os.path.join(sub_dir, fname),
                         np.asarray(renderer(cam, tongue_filter=mode)["render"]))
    if len(cams) > 1:
        fps = (len(cams) - 1) / max(t_total, 1e-9)
        print(f"{name}: {fps:.2f} FPS", flush=True)
    export_video(renders_dir, os.path.join(out_dir, name, "video.mp4"))


def main(argv=None):
    args = parse_args(argv)
    import jax.numpy as jnp

    from ..config.loader import load_full_config
    from ..data.scene import Scene
    from ..models.deformation import init_deform_params
    from ..ops.rasterize import RasterConfig
    from ..render import render as render_fn
    from ..render import settings_from_camera
    import jax

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
    params, aux = scene.params, scene.aux
    template = init_deform_params(jax.random.PRNGKey(0), hidden)
    dparams = scene.load_deformation(template)

    cam0 = (scene.test_cameras or scene.train_cameras)[0].matrices()
    rcfg = RasterConfig(width=cam0.width, height=cam0.height,
                        focal_x=cam0.focal_x, focal_y=cam0.focal_y,
                        pair_capacity=opt.pair_capacity, chunk=opt.raster_chunk,
                        backend=args.backend, max_per_tile=2048)
    bg = jnp.full((3,), 1.0 if model.white_background else 0.0)

    jitted = {}

    def renderer(cam, tongue_filter=None):
        key = tongue_filter or "full"
        if key not in jitted:
            def f(vm, pm, cp, t):
                from ..render import RenderSettings
                s = RenderSettings(vm, pm, cp, t, None)
                return render_fn(params, aux, dparams, hidden, s, rcfg, bg,
                                 iteration=10 ** 9, sh_degree=model.sh_degree,
                                 kernel_size=model.kernel_size,
                                 disable_filter3d=model.disable_filter3D,
                                 num_down_emb_c=hidden.min_embeddings,
                                 num_down_emb_f=hidden.min_embeddings,
                                 tongue_filter=tongue_filter)
            jitted[key] = jax.jit(f)
        m = cam.matrices()
        return jitted[key](jnp.asarray(m.world_view), jnp.asarray(m.full_proj),
                           jnp.asarray(m.campos), jnp.asarray(cam.time, jnp.float32))

    # reference directory layout: <model_path>/<split>/ours_<iter>/{renders,gt}
    out_dir = model.model_path
    it = scene.loaded_iter
    if not args.skip_train:
        render_set(out_dir, f"train/ours_{it}",
                   sorted(scene.train_cameras, key=lambda c: (c.cam_no, c.frame_no)),
                   renderer, args.tongue_renders, args.max_frames)
    if not args.skip_test:
        render_set(out_dir, f"test/ours_{it}",
                   sorted(scene.test_cameras, key=lambda c: (c.cam_no, c.frame_no)),
                   renderer, args.tongue_renders, args.max_frames)
    if not args.skip_video and scene.video_cameras:
        render_set(out_dir, f"video/ours_{it}", scene.video_cameras, renderer,
                   False, args.max_frames)


if __name__ == "__main__":
    sys.exit(main())
