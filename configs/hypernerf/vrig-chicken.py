# Data-parity port of reference arguments/hypernerf/vrig-chicken.py
# (same keys/values; asserted by tests/test_config_corpus.py).
_base_ = './default.py'
ModelHiddenParams = {'min_embeddings': 16,
 'max_embeddings': 80,
 'c2f_temporal_iter': 10000,
 'total_num_frames': 164}
OptimizationParams = {'maxtime': 164,
 'iterations': 60000,
 'densify_until_iter': 60000,
 'position_lr_max_steps': 60000,
 'deformation_lr_max_steps': 60000}
