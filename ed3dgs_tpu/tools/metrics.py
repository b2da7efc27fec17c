"""Image metrics CLI — reference metrics.py equivalent.

Walks <model_path>/test/ours_<iter>/{renders,gt}, computes per-image PSNR,
SSIM and (when pretrained weights are locally available) LPIPS, and writes
results.json / per_view.json in the reference's format (metrics.py:37-101).

LPIPS note: this environment has no network egress to fetch the pretrained
backbone/head weights. The full LPIPS computation lives in
utils/lpips_jax.py and activates when a converted weight file is present
($ED3DGS_LPIPS_WEIGHTS_VGG / ~/.cache/ed3dgs_tpu/lpips_vgg.npz, see
lpips_jax.convert_torch_checkpoints); otherwise LPIPS is reported as null
rather than silently wrong.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def load_image(path):
    from PIL import Image
    return np.asarray(Image.open(path), np.float32)[..., :3] / 255.0


def compute_lpips(renders, gts, net="vgg"):
    """LPIPS via the JAX reimplementation, if converted weights are present."""
    from ..utils.lpips_jax import load_lpips
    model = load_lpips(net)
    if model is None:
        return None
    vals = []
    for r, g in zip(renders, gts):
        vals.append(float(model(r.transpose(2, 0, 1)[None],
                                g.transpose(2, 0, 1)[None])[0]))
    return vals


def evaluate(model_paths, split="test"):
    import jax.numpy as jnp

    from ..train.losses import psnr as psnr_fn
    from ..train.losses import ssim as ssim_fn

    for model_path in model_paths:
        results, per_view = {}, {}
        split_dir = os.path.join(model_path, split)
        if not os.path.isdir(split_dir):
            print(f"no {split} renders in {model_path}")
            continue
        for method in sorted(os.listdir(split_dir)):
            rdir = os.path.join(split_dir, method, "renders")
            gdir = os.path.join(split_dir, method, "gt")
            if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
                continue
            names = sorted(os.listdir(rdir))
            names = [n for n in names if os.path.exists(os.path.join(gdir, n))]
            renders = [load_image(os.path.join(rdir, n)) for n in names]
            gts = [load_image(os.path.join(gdir, n)) for n in names]
            psnrs, ssims = [], []
            for r, g in zip(renders, gts):
                rc = jnp.asarray(r.transpose(2, 0, 1))[None]
                gc = jnp.asarray(g.transpose(2, 0, 1))[None]
                psnrs.append(float(psnr_fn(rc, gc)[0]))
                ssims.append(float(ssim_fn(rc, gc)))
            lp = compute_lpips(renders, gts, "vgg")
            lpa = compute_lpips(renders, gts, "alex")
            entry = {
                "PSNR": float(np.mean(psnrs)) if psnrs else None,
                "SSIM": float(np.mean(ssims)) if ssims else None,
                "LPIPS-vgg": float(np.mean(lp)) if lp else None,
                "LPIPS-alex": float(np.mean(lpa)) if lpa else None,
            }
            results[method] = entry
            per_view[method] = {
                "PSNR": dict(zip(names, psnrs)),
                "SSIM": dict(zip(names, ssims)),
                "LPIPS-vgg": dict(zip(names, lp)) if lp else {},
                "LPIPS-alex": dict(zip(names, lpa)) if lpa else {},
            }
            print(model_path, method, {k: (round(v, 4) if v else v)
                                       for k, v in entry.items()}, flush=True)
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    p.add_argument("--split", default="test")
    args = p.parse_args(argv)
    evaluate(args.model_paths, args.split)


if __name__ == "__main__":
    sys.exit(main())
