_base_ = './hellwarrior.py'

# scene_1 recovery schedule (round 5): coarse 3000 is already banked; the
# fine stage is shortened to 4000 so export+eval still fit the round's
# deadline after the 02:5x tunnel-wedge recovery (RESULTS.md).  Pruning
# pulled inside the fine stage so one prune cycle still runs.
OptimizationParams = dict(
    iterations=4000,
    pruning_interval=3500,
)
