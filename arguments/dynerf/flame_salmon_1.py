_base_ = './default.py'

# reference arguments/dynerf/flame_salmon_1.py (no overrides beyond the defaults)
OptimizationParams = dict()
