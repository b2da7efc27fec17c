# HyperNeRF vrig family defaults (reference arguments/hypernerf/default.py).
ModelParams = dict(loader="nerfies", shuffle=False)
ModelHiddenParams = dict(
    defor_depth=0, net_width=128,
    no_ds=False, no_do=True, no_dc=True,
    temporal_embedding_dim=256, gaussian_embedding_dim=32,
    use_coarse_temporal_embedding=True, zero_temporal=True, use_anneal=False,
)
OptimizationParams = dict(
    dataloader=True, batch_size=2,
    opacity_reset_interval=6_000_000,
    densify_from_iter=500, pruning_from_iter=500, densification_interval=100,
    densify_grad_threshold_fine_init=0.0002, densify_grad_threshold_after=0.0002,
    opacity_threshold_fine_init=0.005, opacity_threshold_fine_after=0.005,
    deformation_lr_max_steps=80_000,
    scene_bbox_min=[-3.0, -1.8, -1.2], scene_bbox_max=[3.0, 1.8, 1.2],
    lambda_dssim=0, num_multiview_ssim=0, use_colmap=True, offsets_lr=0,
    coef_tv_temporal_embedding=0.0001, reg_coef=1,
)
