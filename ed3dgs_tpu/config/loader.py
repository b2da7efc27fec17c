"""Python config-file loader with `_base_` inheritance.

Self-contained replacement for the reference's mmcv.Config usage
(train.py:550-554, utils/params_utils.py:1-8): per-scene configs are plain
python files assigning module-level variables, optionally inheriting from
`_base_ = ["./default.py"]`. The reference's own config files under
arguments/{dynerf,hypernerf,technicolor,nersemble} load unchanged.
"""

from __future__ import annotations

import os
from typing import Any, Dict

from .params import FullConfig, apply_overrides


def load_config_file(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    scope: Dict[str, Any] = {}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), scope)
    out: Dict[str, Any] = {}
    bases = scope.get("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    for base in bases:
        base_path = os.path.join(os.path.dirname(path), base)
        out.update(load_config_file(base_path))
    for k, v in scope.items():
        if k.startswith("__") or k == "_base_":
            continue
        if isinstance(v, dict) and k in out and isinstance(out[k], dict):
            merged = dict(out[k])
            merged.update(v)
            out[k] = merged
        else:
            out[k] = v
    return out


def load_full_config(config_path: str | None = None, overrides: dict | None = None) -> FullConfig:
    cfg = FullConfig()
    if config_path:
        file_overrides = load_config_file(config_path)
        # reference configs use group dicts ModelParams/OptimizationParams/
        # ModelHiddenParams/PipelineParams (utils/params_utils.py:4)
        group_map = {"ModelParams": "model", "OptimizationParams": "opt",
                     "ModelHiddenParams": "hidden", "PipelineParams": "pipe"}
        flat = {}
        for k, v in file_overrides.items():
            if k in group_map and isinstance(v, dict):
                flat[group_map[k]] = v
            else:
                flat[k] = v
        apply_overrides(cfg, flat)
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg
