"""Image metrics CLI — reference metrics.py equivalent.

Walks <model_path>/test/ours_<iter>/{renders,gt}, computes per-image PSNR,
SSIM and (when pretrained weights are locally available) LPIPS, and writes
results.json / per_view.json in the reference's format (metrics.py:37-101).

LPIPS note: this environment has no network egress to fetch VGG/AlexNet
weights; if torchvision's cached weights are absent, LPIPS is reported as
null rather than silently wrong.
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
    """LPIPS via torchvision features, only if weights are cached locally."""
    try:
        import torch
        import torchvision.models as tvm
        weights = {"vgg": tvm.VGG16_Weights.IMAGENET1K_V1,
                   "alex": tvm.AlexNet_Weights.IMAGENET1K_V1}[net]
        model = (tvm.vgg16 if net == "vgg" else tvm.alexnet)(weights=weights)
    except Exception:
        return None
    model.eval()
    feats = list(model.features)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def feat_maps(x):
        out = []
        h = (x - mean) / std
        for i, layer in enumerate(feats):
            h = layer(h)
            if isinstance(layer, torch.nn.ReLU):
                out.append(h / (h.norm(dim=1, keepdim=True) + 1e-10))
        return out

    vals = []
    with torch.no_grad():
        for r, g in zip(renders, gts):
            tr = torch.tensor(r.transpose(2, 0, 1))[None]
            tg = torch.tensor(g.transpose(2, 0, 1))[None]
            fr, fg = feat_maps(tr), feat_maps(tg)
            d = sum(((a - b) ** 2).mean() for a, b in zip(fr, fg)) / len(fr)
            vals.append(float(d))
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
            entry = {
                "PSNR": float(np.mean(psnrs)) if psnrs else None,
                "SSIM": float(np.mean(ssims)) if ssims else None,
                "LPIPS-vgg": float(np.mean(lp)) if lp else None,
            }
            results[method] = entry
            per_view[method] = {
                "PSNR": dict(zip(names, psnrs)),
                "SSIM": dict(zip(names, ssims)),
                "LPIPS-vgg": dict(zip(names, lp)) if lp else {},
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
