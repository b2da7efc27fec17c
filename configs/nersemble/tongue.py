# NerSemble TONGUE experiment: RaDe-GS geometry regularization + tongue-channel
# losses + preference frame sampling (reference arguments/nersemble/037_...py).
_base_ = './default.py'
ModelParams = dict(
    disable_filter3D=False, kernel_size=0.0,
    tongue_mask_loss_enabled=True, colmap_supervision_enabled=False,
    frame_indices_higher_preference=list(range(20, 46)) + list(range(56, 132)),
    frame_preference_probability=0.5,
)
ModelHiddenParams = dict(total_num_frames=132)
OptimizationParams = dict(
    maxtime=132, iterations=80_000, densify_until_iter=80_000,
    position_lr_max_steps=80_000, deformation_lr_max_steps=80_000,
    radegs_regularization_from_iter=15_000,
    max_number_gaussians=150_000,
)
