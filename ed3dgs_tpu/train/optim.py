"""Per-group Adam optimizer with exponential LR schedules (optax).

Replaces the reference's 9-group torch Adam (scene/gaussian_model.py:194-229):
identical group learning rates, Adam eps=1e-15, and the Plenoxels log-lerp
schedule for xyz/deformation (utils/general_utils.py:32-79). Built as one
optax.multi_transform over the combined {gaussians, deform} pytree, so the
whole update is a single fused XLA computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config.params import OptimizationConfig
from ..models.deformation import mlp_param_labels
from ..models.gaussians import GaussianParams


def expon_lr_schedule(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1_000_000):
    """get_expon_lr_func as an optax schedule (utils/general_utils.py:32-79)."""
    if lr_init == 0.0 and lr_final == 0.0:
        return lambda step: 0.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return delay * log_lerp

    return schedule


class TrainState(NamedTuple):
    params: dict            # {"gaussians": GaussianParams, "deform": pytree}
    opt_state: optax.OptState
    iteration: jnp.ndarray  # scalar int32


def param_labels(params):
    gauss_labels = GaussianParams(
        xyz="xyz", features_dc="f_dc", features_rest="f_rest",
        scaling="scaling", rotation="rotation", opacity="opacity",
        embedding="embedding",
    )
    return {"gaussians": gauss_labels, "deform": mlp_param_labels(params["deform"])}


def build_optimizer(opt: OptimizationConfig, spatial_lr_scale: float):
    """The 9 reference param groups (scene/gaussian_model.py:199-209)."""
    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-15)

    transforms = {
        "xyz": adam(expon_lr_schedule(
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps)),
        "deformation": adam(expon_lr_schedule(
            opt.deformation_lr_init * spatial_lr_scale,
            opt.deformation_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.deformation_lr_delay_mult,
            max_steps=opt.deformation_lr_max_steps)),
        "offsets": adam(opt.offsets_lr),
        "f_dc": adam(opt.feature_lr),
        "f_rest": adam(opt.feature_lr / opt.feature_lr_div_factor),
        "opacity": adam(opt.opacity_lr),
        "scaling": adam(opt.scaling_lr),
        "rotation": adam(opt.rotation_lr),
        "embedding": adam(opt.feature_lr),
    }
    return optax.multi_transform(transforms, param_labels)


def reset_moments_at(opt_state, slot_mask: jnp.ndarray):
    """Zero Adam first/second moments at Gaussian slots touched by
    densification (the optimizer-state surgery of
    scene/gaussian_model.py:349-423, without any reallocation).

    slot_mask: [capacity] bool. Applied to every moment leaf whose leading
    dimension equals the capacity (i.e. all per-Gaussian parameters; the
    deformation MLP/table shapes never match the cloud capacity)."""
    capacity = slot_mask.shape[0]

    def zero_leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == capacity:
            shape = (capacity,) + (1,) * (x.ndim - 1)
            return jnp.where(slot_mask.reshape(shape), 0.0, x)
        return x

    def map_state(state):
        if isinstance(state, optax.ScaleByAdamState):
            return state._replace(
                mu=jax.tree_util.tree_map(zero_leaf, state.mu),
                nu=jax.tree_util.tree_map(zero_leaf, state.nu),
            )
        return state

    return jax.tree_util.tree_map(
        map_state, opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))
