"""Sharded (multi-chip) training step via pjit + sharding annotations.

Strategy (idiomatic XLA SPMD — annotate shardings, let GSPMD insert the
collectives over ICI/DCN):

  * every per-Gaussian array (params, aux, Adam moments, KNN cache) is sharded
    along its leading capacity axis over mesh axis "gauss" — the deformation
    MLP and projection stages then run fully parallel with zero communication;
  * the camera batch is sharded over mesh axis "data" — each data-group
    renders its own cameras (the multi-host scaling axis);
  * the deformation MLP/temporal-table parameters are replicated; GSPMD
    produces exactly one gradient all-reduce per step for them;
  * the rasterizer's binning/blending over the full splat set makes XLA
    all-gather the projected payload — the SPMD analogue of the reference's
    duplicateWithKeys+sort feeding every tile (rasterizer_impl.cu:253-432).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import GaussianAux, GaussianParams
from ..train.optim import TrainState


def _gauss_spec(leaf_ndim: int) -> P:
    return P(*(("gauss",) + (None,) * (leaf_ndim - 1)))


def gauss_sharding(mesh: Mesh, tree):
    """Shard every leaf whose leading axis is the Gaussian capacity."""
    def spec(leaf):
        return NamedSharding(mesh, _gauss_spec(leaf.ndim))
    return jax.tree_util.tree_map(spec, tree)


def replicated(mesh: Mesh, tree):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def state_shardings(mesh: Mesh, state: TrainState):
    params_spec = {
        "gaussians": gauss_sharding(mesh, state.params["gaussians"]),
        "deform": replicated(mesh, state.params["deform"]),
    }

    def opt_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == _capacity(state):
            return NamedSharding(mesh, _gauss_spec(leaf.ndim))
        return NamedSharding(mesh, P())

    opt_state_spec = jax.tree_util.tree_map(opt_spec, state.opt_state)
    return TrainState(
        params=params_spec,
        opt_state=opt_state_spec,
        iteration=NamedSharding(mesh, P()),
    )


def _capacity(state: TrainState) -> int:
    return state.params["gaussians"].xyz.shape[0]


def aux_shardings(mesh: Mesh, aux: GaussianAux):
    return gauss_sharding(mesh, aux)


def batch_shardings(mesh: Mesh, batch):
    # pcd_* carry the (replicated) GT cloud for the last GLOBAL batch
    # entry's frame — not per-camera data, so never sharded over "data"
    replicated_keys = ("use_ssim", "pcd_points", "pcd_valid")

    def spec(k, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and k not in replicated_keys:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())
    return {k: spec(k, v) for k, v in batch.items()}


def shard_train_state(mesh: Mesh, state: TrainState, aux: GaussianAux):
    """device_put the whole training state onto the mesh."""
    state_s = jax.device_put(state, state_shardings(mesh, state))
    aux_s = jax.device_put(aux, aux_shardings(mesh, aux))
    return state_s, aux_s


def shard_batch(mesh: Mesh, batch):
    return {k: jax.device_put(v, s)
            for (k, v), s in zip(batch.items(), batch_shardings(mesh, batch).values())}


def shard_knn_cache(mesh: Mesh, cache):
    # the prepared KNN graph mixes gaussian-, pair- and schedule-indexed
    # arrays; the fused loss kernels (ops/knn_loss.py) run replicated (the
    # embedding table is small), so the cache is replicated too
    return jax.device_put(cache, replicated(mesh, cache))


def make_sharded_train_step(train_step, mesh: Mesh, state: TrainState,
                            aux: GaussianAux, batch, knn_cache):
    """Wrap a trainer.make_train_step function with explicit in/out shardings
    over `mesh`. The returned function expects pre-sharded inputs
    (shard_train_state / shard_batch)."""
    st_sh = state_shardings(mesh, state)
    aux_sh = aux_shardings(mesh, aux)
    in_sh = (st_sh, aux_sh, batch_shardings(mesh, batch),
             replicated(mesh, knn_cache))
    # metrics replicated
    out_sh = (st_sh, aux_sh, None)
    return jax.jit(train_step, in_shardings=in_sh, out_shardings=out_sh)
