_base_ = './dnerf_default.py'

# reference arguments/dnerf/eulerian_128_150.py
ModelHiddenParams = dict(
    kplanes_config={
        'grid_dimensions': 2,
        'input_coordinate_dim': 4,
        'output_coordinate_dim': 32,
        'resolution': [128, 128, 128, 150],
    }
)
