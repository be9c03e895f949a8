_base_ = './hellwarrior.py'

# Minimal end-to-end schedule for the round-5 late window (coarse 2000 +
# fine 4000): used when the remaining tunnel time cannot fit r4_reduced.
# Pruning is pulled inside the fine stage so the schedule still exercises
# one prune; opacity reset stays at its default cadence (3000).
OptimizationParams = dict(
    coarse_iterations=2000,
    iterations=4000,
    pruning_interval=3500,
)
