"""Configuration dataclasses.

Mirrors the reference's four reflection-generated argparse groups
(arguments/__init__.py:47-172) with identical field names and defaults, so the
reference's per-scene python config files (dynerf/hypernerf/technicolor/
nersemble) can be applied as plain dict overrides (see config.loader).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class ModelConfig:
    # reference ModelParams (arguments/__init__.py:47-72)
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = True
    eval: bool = True
    render_process: bool = False
    loader: str = "colmap"
    shuffle: bool = True
    sampling_sequential_frame_enabled: bool = False
    sampling_first_frame_then_sequential_enabled: bool = False
    sampling_first_frame_change: int = 11_000
    is_sample_from_past: bool = False
    frame_indices_higher_preference: Tuple[int, ...] = ()
    frame_preference_probability: float = 0.5
    tongue_mask_loss_enabled: bool = False
    colmap_supervision_enabled: bool = False
    # GT clouds for the supervision loss. The reference hard-codes an absolute
    # user path (train.py:281-283); here a directory + per-frame pattern.
    # {frame} is camera.frame_no * colmap_pcd_frame_multiplier (the reference
    # maps 30fps training frames to 10fps GT captures via *3, train.py:278).
    colmap_pcd_dir: str = ""
    colmap_pcd_pattern: str = "frame_{frame:05d}/colmap/pointclouds/pointcloud_16.pcd"
    colmap_pcd_frame_multiplier: int = 3
    colmap_pcd_samples: int = 4000
    use_coord_map: bool = False
    kernel_size: float = 0.0
    disable_filter3D: bool = False
    # extension (dataset extent used by several preprocessing paths)
    extension: str = ".png"


@dataclass
class PipelineConfig:
    # reference PipelineParams (arguments/__init__.py:79-84)
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class DeformHiddenConfig:
    # reference ModelHiddenParams (arguments/__init__.py:86-109)
    net_width: int = 64
    defor_depth: int = 1
    min_embeddings: int = 30
    max_embeddings: int = 150
    no_ds: bool = False
    no_dr: bool = False
    no_do: bool = True
    no_dc: bool = False
    temporal_embedding_dim: int = 256
    gaussian_embedding_dim: int = 32
    use_coarse_temporal_embedding: bool = False
    no_c2f_temporal_embedding: bool = False
    no_coarse_deform: bool = False
    no_fine_deform: bool = False
    total_num_frames: int = 300
    c2f_temporal_iter: int = 20000
    deform_from_iter: int = 0
    use_anneal: bool = True
    zero_temporal: bool = False
    # TPU-native addition: hard cap on per-camera offset table (reference
    # hard-codes 30, scene/deformation.py:36)
    max_cameras: int = 30
    # TPU-native addition: run the deformation towers with bfloat16
    # activations (params/updates stay f32; matmuls accumulate f32 on the
    # MXU). Halves the HBM bytes of the ~30 [N, net_width] activation
    # tensors that dominate the MLP block's memory floor (~2 ms/step at
    # bench scale). Quality deviation from the f32 reference — measured
    # convergence-equivalent on the synthetic gates (tests/
    # test_convergence.py); `bf16_activations=false` reproduces reference
    # numerics bit-for-bit. Interleaved A/B at bench scale: 32.7 -> 30.6
    # ms/step.
    bf16_activations: bool = True


@dataclass
class OptimizationConfig:
    # reference OptimizationParams (arguments/__init__.py:111-170)
    dataloader: bool = False
    iterations: int = 30_000
    maxtime: int = 0
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 20_000
    deformation_lr_init: float = 0.00016
    deformation_lr_final: float = 0.000016
    deformation_lr_delay_mult: float = 0.01
    deformation_lr_max_steps: int = 60_000
    batch_size: int = 1
    feature_lr: float = 0.0025
    feature_lr_div_factor: float = 20.0
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.0
    lambda_lpips: float = 0.0
    weight_constraint_init: float = 1.0
    weight_constraint_after: float = 0.2
    weight_decay_iteration: int = 5000
    opacity_reset_interval: int = 6_000_000
    densification_interval: int = 100
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold_fine_init: float = 0.0002
    densify_grad_threshold_after: float = 0.0002
    pruning_from_iter: int = 500
    pruning_interval: int = 100
    opacity_threshold_fine_init: float = 0.005
    opacity_threshold_fine_after: float = 0.005
    reset_opacity_ratio: float = 0.0
    opacity_l1_coef_fine: float = 0.0001
    scene_bbox_min: Tuple[float, ...] = (-2.5, -2.0, -1.0)
    scene_bbox_max: Tuple[float, ...] = (2.5, 2.0, 1.0)
    num_pts: int = 2000
    threshold: int = 3
    downsample: float = 1.0
    use_dense_colmap: bool = False
    use_colmap: bool = False
    coef_tv_temporal_embedding: float = 0.0
    random_until: int = 10000
    num_multiview_ssim: int = 0
    offsets_lr: float = 0.00002
    reg_coef: float = 1.0
    max_number_gaussians: int = 200_000
    radegs_regularization_from_iter: int = 15_000
    lambda_depth_normal: float = 0.05
    appearance_embeddings_lr: float = 0.001
    appearance_network_lr: float = 0.001
    # tongue losses (reference train.py:298-343 coefficients)
    tongue_mask_loss_coef: float = 5.0
    # TPU-native additions
    pair_capacity: int = 1 << 21
    raster_chunk: int = 128
    raster_backend: str = "auto"
    # Minimum fraction of KNN-regularizer edges the Morton-windowed graph
    # must cover; capacity buckets grow until the dropped-edge count fits
    # the (1 - target) budget. 1.0 = exact graph (the reference's o3d_knn
    # semantics) at whatever bucket cost the cloud demands — see
    # train/trainer.py refresh_knn_cache and docs/performance.md round 5.
    knn_coverage_target: float = 0.95


@dataclass
class FullConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    pipe: PipelineConfig = field(default_factory=PipelineConfig)
    hidden: DeformHiddenConfig = field(default_factory=DeformHiddenConfig)
    opt: OptimizationConfig = field(default_factory=OptimizationConfig)


def apply_overrides(cfg, overrides: dict, strict: bool = False):
    """Apply a flat {field: value} dict across the four groups (the TPU
    replacement for the reference's mmcv merge_hparams, utils/params_utils.py:1),
    plus nested {group: {field: value}} form. Like the reference's
    merge_hparams, keys no group declares are dropped (with a warning) so the
    reference's own per-scene config files load unchanged."""
    import warnings

    groups = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}

    def set_anywhere(key, value):
        hit = False
        for g in groups.values():
            if hasattr(g, key):
                setattr(g, key, value)
                hit = True
        return hit

    for key, value in overrides.items():
        if key in groups and isinstance(value, dict):
            for k2, v2 in value.items():
                if not set_anywhere(k2, v2):
                    if strict:
                        raise KeyError(f"unknown config key: {key}.{k2}")
                    warnings.warn(f"dropping unknown config key {key}.{k2}")
            continue
        if not set_anywhere(key, value) and key not in ("_base_",):
            if strict:
                raise KeyError(f"unknown config key: {key}")
            warnings.warn(f"dropping unknown config key {key}")
    return cfg
