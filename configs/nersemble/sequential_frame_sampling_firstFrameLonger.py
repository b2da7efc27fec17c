# Data-parity port of reference arguments/nersemble/sequential_frame_sampling_firstFrameLonger.py
# (same keys and values; tests/test_config_corpus.py asserts the
# merged FullConfig is identical to loading the reference file).
_base_ = './default.py'
ModelParams = {'disable_filter3D': True,
 'sampling_sequential_frame_enabled': False,
 'sampling_first_frame_then_sequential_enabled': True,
 'sampling_first_frame_change': 11000}
ModelHiddenParams = {'total_num_frames': 100, 'deform_from_iter': 11000}
OptimizationParams = {'maxtime': 100,
 'iterations': 80000,
 'densify_until_iter': 80000,
 'position_lr_max_steps': 80000,
 'deformation_lr_max_steps': 80000,
 'radegs_regularization_from_iter': 90000,
 'max_number_gaussians': 135000}
