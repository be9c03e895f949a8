_base_ = './hellwarrior.py'

# Reduced schedule for demo/scene_1 and demo/scene_2 end-to-end runs
# (coarse 3000 + fine 7000; the full 20k schedule is demonstrated on
# scene_0).  Pruning interval pulled in so the fine stage still exercises
# one prune cycle before 7000.
OptimizationParams = dict(
    iterations=7000,
    pruning_interval=5000,
)
