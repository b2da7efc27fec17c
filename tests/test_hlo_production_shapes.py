"""Production-shape AOT collective audit (VERDICT r2 missing #1 / weak #3).

The toy-shape audit (test_hlo_collectives.py) pins the collective SET; this
pins the BYTE contract at the real NerSemble training shape (C=100,352
capacity, 802x550, pair capacity 1<<20) for gauss=8 AND gauss=32 — a
compile-only jit(...).lower(...).compile() on a virtual CPU mesh, no
execution. It proves the claim in docs/performance.md: per-chip collective
traffic of the GSPMD sharded train step is bounded by a few payload-sized
arrays and does NOT grow with the gauss axis, so the all-gather strategy
stays a single-digit percentage of the step at any pod size.

Runs in a subprocess because gauss=32 needs 32 virtual devices and
conftest.py pins the suite to 8. Inputs are jax.eval_shape abstractions —
no 100k-point KNN graph is actually computed.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = """
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb
    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends
        clear_backends()
except Exception:
    pass
sys.path.insert(0, %(repo)r)
import numpy as np
import jax.numpy as jnp
import bench
from ed3dgs_tpu.parallel import make_mesh
from ed3dgs_tpu.parallel.sharded import (aux_shardings, batch_shardings,
                                         replicated, state_shardings)
from ed3dgs_tpu.parallel.hlo_audit import audit_compiled, summarize

# abstract values: everything bench.build_train would produce, without
# computing it (eval_shape traces the constructors only)
def build_values():
    return bench.build_train(w=802, h=550, pair_capacity=1 << 20,
                             backend="xla", knn_policy=False)[1:]

state, aux, batch, knn_cache = jax.eval_shape(build_values)
# the step closure itself is cheap host-side construction
from ed3dgs_tpu.config.params import DeformHiddenConfig, OptimizationConfig
from ed3dgs_tpu.ops.rasterize import RasterConfig
from ed3dgs_tpu.train.trainer import (TrainSetup, make_train_step)
from ed3dgs_tpu.train.optim import build_optimizer
hidden = DeformHiddenConfig(net_width=128, defor_depth=1)
opt_cfg = OptimizationConfig()
rcfg = RasterConfig(width=802, height=550, focal_x=860.0, focal_y=860.0,
                    pair_capacity=1 << 20, max_per_tile=2048, chunk=128,
                    backend="xla")
setup = TrainSetup(raster=rcfg, hidden=hidden, batch_size=1,
                   kernel_size=0.1, disable_filter3d=True,
                   radegs_from_iter=0, coef_tv_temporal=1.0)
optimizer = build_optimizer(opt_cfg, 1.0)
raw_step = make_train_step(setup, opt_cfg, optimizer, jit=False)

out = {}
for name, g in (("g8", 8), ("g32", 32)):
    mesh = make_mesh(data=1, gauss=g)
    st_sh = state_shardings(mesh, state)
    aux_sh = aux_shardings(mesh, aux)
    in_sh = (st_sh, aux_sh, batch_shardings(mesh, batch),
             replicated(mesh, knn_cache))
    step = jax.jit(raw_step, in_shardings=in_sh,
                   out_shardings=(st_sh, aux_sh, None))
    comp = step.lower(state, aux, batch, knn_cache).compile()
    out[name] = summarize(audit_compiled(comp))

# --comms strip at the same production shape (g=8): the explicit strip
# exchange replaces the GSPMD payload all-gather in the TRAIN step
from dataclasses import replace as dc_replace
from ed3dgs_tpu.parallel.hlo_audit import count_stablehlo_collectives
mesh = make_mesh(data=1, gauss=8)
setup_s = dc_replace(setup, batch_mode="vmap", comms="strip", mesh=mesh)
raw_strip = make_train_step(setup_s, opt_cfg, build_optimizer(opt_cfg, 1.0),
                            jit=False)
st_sh = state_shardings(mesh, state)
aux_sh = aux_shardings(mesh, aux)
in_sh = (st_sh, aux_sh, batch_shardings(mesh, batch),
         replicated(mesh, knn_cache))
step_s = jax.jit(raw_strip, in_shardings=in_sh,
                 out_shardings=(st_sh, aux_sh, None))
low = step_s.lower(state, aux, batch, knn_cache)
out["strip8_intent"] = count_stablehlo_collectives(low.as_text())
out["strip8"] = summarize(audit_compiled(low.compile()))
print("AUDIT " + json.dumps(out))
"""


@pytest.mark.slow
def test_production_shape_collective_bytes(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    p = subprocess.run(
        [sys.executable, "-c", PROBE % {"repo": REPO}], env=env, cwd=REPO,
        capture_output=True, timeout=1500)
    out = p.stdout.decode()
    assert p.returncode == 0, (out[-2000:], p.stderr.decode()[-3000:])
    audit = json.loads([ln for ln in out.splitlines()
                        if ln.startswith("AUDIT ")][-1][6:])

    C = 100_352
    payload = C * 128 * 4                    # one [C, 128-lane] f32 array
    for name in ("g8", "g32"):
        s = audit[name]
        # the explicit exchange lives in the tile-sharded serving path;
        # the batched GSPMD step must stay gather/reduce-only
        assert "all-to-all" not in s, s
        # every single collective is bounded by ONE payload-sized array
        for kind, e in s.items():
            assert e["max_bytes"] <= payload * 1.25, (kind, e)
        # total per-step traffic: a couple of payload-sized arrays, NOT
        # Adam state / the raw cloud / anything O(g)
        total = sum(e["bytes"] for e in s.values())
        assert total <= 3 * payload, (name, total, s)
    # per-chip traffic must NOT grow with the gauss axis — the fact that
    # keeps the GSPMD gather strategy viable at pod scale
    t8 = sum(e["bytes"] for e in audit["g8"].values())
    t32 = sum(e["bytes"] for e in audit["g32"].values())
    assert t32 <= t8 * 1.1, (t8, t32)

    # --comms strip contract at the same shape: the lowered program's
    # communication INTENT is the explicit strip exchange (>=1 all-to-all:
    # forward + its transpose in the backward; CPU may legally rewrite them
    # to collective-permutes after compile), and the COMPILED module never
    # all-gathers a payload-sized array — that gather is exactly what the
    # flag removes.
    intent = audit["strip8_intent"]
    assert intent.get("all-to-all", 0) >= 2, intent
    s = audit["strip8"]
    for kind, e in s.items():
        if kind == "all-gather":
            assert e["max_bytes"] < payload // 2, (kind, e)
