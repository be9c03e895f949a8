_base_ = './default.py'

# reference arguments/dynerf/flame_steak.py (no overrides beyond the defaults)
OptimizationParams = dict()
