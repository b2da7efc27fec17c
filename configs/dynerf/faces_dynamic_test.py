_base_ = './default.py'
ModelHiddenParams = dict(
    total_num_frames=4,
)
OptimizationParams = dict(
    maxtime=4,
)
