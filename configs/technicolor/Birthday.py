# Data-parity port of reference arguments/technicolor/Birthday.py
# (same keys/values; asserted by tests/test_config_corpus.py).
_base_ = './default.py'
OptimizationParams = {'iterations': 100000,
 'densify_until_iter_coarse': 100000,
 'densify_until_iter': 100000,
 'position_lr_max_steps_coarse': 100000,
 'position_lr_max_steps': 100000,
 'deformation_lr_max_steps': 100000,
 'reg_coef': 0.1}
