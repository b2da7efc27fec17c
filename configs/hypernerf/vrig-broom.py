# Data-parity port of reference arguments/hypernerf/vrig-broom.py
# (same keys/values; asserted by tests/test_config_corpus.py).
_base_ = './default.py'
ModelHiddenParams = {'min_embeddings': 20,
 'max_embeddings': 100,
 'c2f_temporal_iter': 20000,
 'total_num_frames': 197}
OptimizationParams = {'maxtime': 197,
 'iterations': 60000,
 'densify_until_iter': 60000,
 'position_lr_max_steps': 60000,
 'deformation_lr_max_steps': 60000}
