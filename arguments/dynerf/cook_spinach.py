_base_ = './default.py'

# reference arguments/dynerf/cook_spinach.py (no overrides beyond the defaults)
OptimizationParams = dict()
