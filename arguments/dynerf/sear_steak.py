_base_ = './default.py'

# reference arguments/dynerf/sear_steak.py (no overrides beyond the defaults)
OptimizationParams = dict()
