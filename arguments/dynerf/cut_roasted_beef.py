_base_ = './default.py'

# reference arguments/dynerf/cut_roasted_beef.py (no overrides beyond the defaults)
OptimizationParams = dict()
