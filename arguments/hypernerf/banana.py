_base_ = 'default.py'

# reference arguments/hypernerf/banana.py — QUIRK preserved: the override
# sits in ModelParams, not ModelHiddenParams; merge_hparams applies any
# known arg key regardless of group (utils/params_utils.py:1-9), so it
# still lands on args.kplanes_config.
ModelParams = dict(
    kplanes_config={
        'grid_dimensions': 2,
        'input_coordinate_dim': 4,
        'output_coordinate_dim': 16,
        'resolution': [64, 64, 64, 250],
    }
)
OptimizationParams = dict()
