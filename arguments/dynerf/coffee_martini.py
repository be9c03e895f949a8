_base_ = './default.py'

# reference arguments/dynerf/coffee_martini.py (no overrides beyond the defaults)
OptimizationParams = dict()
