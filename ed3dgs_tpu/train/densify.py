"""Densification (clone + split) as static-shape masked scatters.

Reference semantics (scene/gaussian_model.py:452-518, train.py:403-436):
  * stats: accumulate ||d mean2d||_2 per visible gaussian, denom += 1;
  * clone: grad >= threshold AND max(scale) <= percent_dense * extent
    -> duplicate the gaussian verbatim;
  * split: grad >= threshold AND max(scale) > percent_dense * extent
    -> two children sampled from N(mean, Sigma) with scales / (0.8*2),
    parent removed;
  * the standalone opacity prune is never called by the train loop (the
    opacity-mean L1 replaces opacity resets), so densify = clone + split.

TPU re-architecture: the cloud has fixed capacity with an alive mask, so
clone children go to free slots, split writes one child over the parent slot
and one child to a free slot; selections are capped by the free-slot budget
(the reference instead stops densifying at max_number_gaussians — we keep
that global cap at call sites too). Adam moments are zeroed at every touched
slot via the returned reset mask, matching the reference's optimizer surgery.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.quaternion import quat_to_rotmat
from ..models.gaussians import GaussianAux, GaussianParams


class DensifyResult(NamedTuple):
    params: GaussianParams
    aux: GaussianAux
    reset_mask: jnp.ndarray   # [C] slots whose Adam moments must be zeroed
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray


def add_densification_stats(aux: GaussianAux, viewspace_grad: jnp.ndarray,
                            visible: jnp.ndarray, radii: jnp.ndarray) -> GaussianAux:
    """train.py:405-407: max-radii update + grad-norm accumulation."""
    vis = visible & aux.alive
    norm = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1)
    return aux._replace(
        max_radii2d=jnp.where(vis, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
                              aux.max_radii2d),
        xyz_grad_accum=jnp.where(vis, aux.xyz_grad_accum + norm, aux.xyz_grad_accum),
        denom=jnp.where(vis, aux.denom + 1.0, aux.denom),
    )


def _masked_scatter(params: GaussianParams, src_idx, dst_idx, active):
    """params[dst_idx[i]] <- params[src_idx[i]] where active[i]."""
    def scatter(leaf):
        rows = leaf[src_idx]
        cur = leaf[dst_idx]
        sel = active.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return leaf.at[dst_idx].set(jnp.where(sel, rows, cur))
    return jax.tree_util.tree_map(scatter, params)


def densify(params: GaussianParams, aux: GaussianAux, key,
            *, grad_threshold: float, percent_dense: float,
            scene_extent: float, max_gaussians: int) -> DensifyResult:
    C = aux.alive.shape[0]
    grads = jnp.where(aux.denom > 0, aux.xyz_grad_accum / aux.denom, 0.0)
    scales = jnp.exp(params.scaling)
    max_scale = jnp.max(scales, axis=1)
    hot = (grads >= grad_threshold) & aux.alive
    clone_mask = hot & (max_scale <= percent_dense * scene_extent)
    split_mask = hot & (max_scale > percent_dense * scene_extent)

    n_alive = jnp.sum(aux.alive.astype(jnp.int32))
    # global cap (train.py:412): no densification beyond max_number_gaussians,
    # and never beyond physical capacity.
    budget = jnp.maximum(
        jnp.minimum(max_gaussians, C) - n_alive, 0)

    # free slots first (stable: lowest indices first)
    free_order = jnp.argsort(aux.alive.astype(jnp.int32), stable=True)
    # clone sources (selected first)
    clone_order = jnp.argsort(~clone_mask, stable=True)
    n_clone = jnp.minimum(jnp.sum(clone_mask.astype(jnp.int32)), budget)
    slot_i = jnp.arange(C)
    clone_active = slot_i < n_clone
    clone_dst = free_order
    params = _masked_scatter(params, clone_order, clone_dst, clone_active)
    new_alive = aux.alive.at[clone_dst].set(
        jnp.where(clone_active, True, aux.alive[clone_dst]))
    tongue = aux.tongue_class.at[clone_dst].set(
        jnp.where(clone_active[:, None], aux.tongue_class[clone_order],
                  aux.tongue_class[clone_dst]))

    # splits: child B -> next free slots after the clones
    budget2 = budget - n_clone
    free_order2 = jnp.argsort(new_alive.astype(jnp.int32), stable=True)
    split_order = jnp.argsort(~split_mask, stable=True)
    n_split = jnp.minimum(jnp.sum(split_mask.astype(jnp.int32)), budget2)
    split_active = slot_i < n_split
    split_src = split_order
    split_dst = free_order2

    # sample both children ~ N(mean, R diag(s) sample) (gaussian_model.py:462-467)
    ka, kb = jax.random.split(key)
    R = quat_to_rotmat(params.rotation / jnp.maximum(
        jnp.linalg.norm(params.rotation, axis=-1, keepdims=True), 1e-12))
    src_R = R[split_src]
    src_scales = scales[split_src]
    src_xyz = params.xyz[split_src]
    samp_a = jnp.einsum("nij,nj->ni", src_R, jax.random.normal(ka, (C, 3)) * src_scales)
    samp_b = jnp.einsum("nij,nj->ni", src_R, jax.random.normal(kb, (C, 3)) * src_scales)
    new_scaling_src = jnp.log(src_scales / (0.8 * 2.0))

    # child B into free slot: copy all fields from parent, then override
    params = _masked_scatter(params, split_src, split_dst, split_active)
    sel3 = split_active[:, None]
    params = params._replace(
        xyz=params.xyz.at[split_dst].set(
            jnp.where(sel3, src_xyz + samp_b, params.xyz[split_dst])),
        scaling=params.scaling.at[split_dst].set(
            jnp.where(sel3, new_scaling_src, params.scaling[split_dst])),
    )
    # child A overwrites the parent slot in place
    params = params._replace(
        xyz=params.xyz.at[split_src].set(
            jnp.where(sel3, src_xyz + samp_a, params.xyz[split_src])),
        scaling=params.scaling.at[split_src].set(
            jnp.where(sel3, new_scaling_src, params.scaling[split_src])),
    )
    alive2 = new_alive.at[split_dst].set(
        jnp.where(split_active, True, new_alive[split_dst]))
    tongue = tongue.at[split_dst].set(
        jnp.where(sel3, tongue[split_src], tongue[split_dst]))

    # touched slots -> Adam moment reset (clone targets keep the reference's
    # fresh-zero state; split parents were pruned+re-added there, so reset too)
    reset = jnp.zeros(C, bool)
    reset = reset.at[clone_dst].set(jnp.where(clone_active, True, reset[clone_dst]))
    reset = reset.at[split_dst].set(jnp.where(split_active, True, reset[split_dst]))
    reset = reset | (split_mask & (jnp.cumsum(split_mask) <= n_split))

    aux = aux._replace(
        alive=alive2,
        tongue_class=tongue,
        max_radii2d=jnp.zeros(C, jnp.float32),
        xyz_grad_accum=jnp.zeros(C, jnp.float32),
        denom=jnp.zeros(C, jnp.float32),
    )
    return DensifyResult(params, aux, reset, n_clone, n_split)
