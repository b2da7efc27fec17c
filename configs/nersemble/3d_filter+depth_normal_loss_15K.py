# Data-parity port of reference arguments/nersemble/3d_filter+depth_normal_loss_15K.py
# (same keys and values; tests/test_config_corpus.py asserts the
# merged FullConfig is identical to loading the reference file).
_base_ = './default.py'
ModelParams = {'disable_filter3D': False}
ModelHiddenParams = {'total_num_frames': 100}
OptimizationParams = {'maxtime': 100,
 'iterations': 80000,
 'densify_until_iter': 80000,
 'position_lr_max_steps': 80000,
 'deformation_lr_max_steps': 80000,
 'radegs_regularization_from_iter': 15000}
