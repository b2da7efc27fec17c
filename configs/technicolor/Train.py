# Data-parity port of reference arguments/technicolor/Train.py
# (same keys/values; asserted by tests/test_config_corpus.py).
_base_ = './default.py'
OptimizationParams = {'deformation_lr_init': 0.005,
 'deformation_lr_final': 5e-05,
 'deformation_lr_delay_mult': 0.01,
 'iterations': 120000,
 'densify_until_iter_coarse': 120000,
 'densify_until_iter': 120000,
 'position_lr_max_steps_coarse': 120000,
 'position_lr_max_steps': 120000,
 'deformation_lr_max_steps': 120000,
 'reg_coef': 0.1}
