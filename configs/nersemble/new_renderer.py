# Data-parity port of reference arguments/nersemble/new_renderer.py
# (same keys and values; tests/test_config_corpus.py asserts the
# merged FullConfig is identical to loading the reference file).
_base_ = './default.py'
ModelParams = {'disable_filter3D': True, 'kernel_size': 0.3}
ModelHiddenParams = {'total_num_frames': 100}
OptimizationParams = {'maxtime': 100,
 'iterations': 80000,
 'densify_until_iter': 80000,
 'position_lr_max_steps': 80000,
 'deformation_lr_max_steps': 80000,
 'radegs_regularization_from_iter': 90000}
