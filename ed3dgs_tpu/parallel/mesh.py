"""Device mesh construction.

The reference has no distributed layer at all (SURVEY.md section 2.11); this
is the greenfield TPU scaling axis: a 2-D mesh with

  * axis "data"  — cameras of the batch (embarrassingly parallel across
    hosts/DCN: each camera's image is independent; one gradient psum/step),
  * axis "gauss" — the Gaussian axis (deformation MLP + projection shard
    perfectly; the rasterizer gathers the culled splat payload over ICI).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, gauss: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * gauss
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, gauss)
    return Mesh(arr, ("data", "gauss"))
