# Data-parity port of reference arguments/hypernerf/vrig-peel-banana.py
# (same keys/values; asserted by tests/test_config_corpus.py).
_base_ = './default.py'
ModelHiddenParams = {'min_embeddings': 50,
 'max_embeddings': 250,
 'c2f_temporal_iter': 40000,
 'total_num_frames': 513}
OptimizationParams = {'maxtime': 513,
 'iterations': 80000,
 'densify_until_iter': 80000,
 'position_lr_max_steps': 80000,
 'deformation_lr_max_steps': 80000}
