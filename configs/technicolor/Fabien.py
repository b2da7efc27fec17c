# Data-parity port of reference arguments/technicolor/Fabien.py
# (same keys/values; asserted by tests/test_config_corpus.py).
_base_ = './default.py'
OptimizationParams = {'iterations': 120000,
 'densify_until_iter_coarse': 120000,
 'densify_until_iter': 120000,
 'position_lr_max_steps_coarse': 120000,
 'position_lr_max_steps': 120000,
 'deformation_lr_max_steps': 120000,
 'reg_coef': 0.1}
