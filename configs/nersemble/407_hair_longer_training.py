# Data-parity port of reference arguments/nersemble/407_hair_longer_training.py
# (same keys and values; tests/test_config_corpus.py asserts the
# merged FullConfig is identical to loading the reference file).
_base_ = './default.py'
ModelParams = {'disable_filter3D': False, 'kernel_size': 0.0}
ModelHiddenParams = {'total_num_frames': 147}
OptimizationParams = {'maxtime': 147,
 'iterations': 160000,
 'densify_until_iter': 160000,
 'position_lr_max_steps': 160000,
 'deformation_lr_max_steps': 160000,
 'radegs_regularization_from_iter': 15000,
 'max_number_gaussians': 200000}
