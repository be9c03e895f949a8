"""Config / flag system.

Dataclass mirrors of the reference's four ParamGroups
(arguments/__init__.py:47-152) with identical field names and defaults, plus:

- argparse registration / extraction (ParamGroup, arguments/__init__.py:19-45)
- python-config-file overrides replacing mmcv (utils/params_utils.py:1-9,
  including ``_base_`` single-inheritance as used by arguments/dnerf/*.py)
- ``cfg_args`` persistence readable by both this framework and the reference
  (a ``Namespace(...)`` repr, arguments/__init__.py:154-174 — parsed here with
  ast instead of eval).
"""

from __future__ import annotations

import ast
import dataclasses
import os
import sys
from argparse import ArgumentParser, Namespace
from dataclasses import dataclass, field


def _default_kplanes():
    return {
        "grid_dimensions": 2,
        "input_coordinate_dim": 4,
        "output_coordinate_dim": 32,
        "resolution": [64, 64, 64, 25],
    }


@dataclass
class ModelParams:
    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = True
    render_process: bool = False
    add_points: bool = False
    extension: str = ".png"
    llffhold: int = 8


@dataclass
class PipelineParams:
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class ModelHiddenParams:
    net_width: int = 64
    timebase_pe: int = 4
    defor_depth: int = 1
    posebase_pe: int = 10
    scale_rotation_pe: int = 2
    opacity_pe: int = 2
    timenet_width: int = 64
    timenet_output: int = 32
    bounds: float = 1.6
    plane_tv_weight: float = 0.0001
    time_smoothness_weight: float = 0.01
    l1_time_planes: float = 0.0001
    kplanes_config: dict = field(default_factory=_default_kplanes)
    multires: list = field(default_factory=lambda: [1, 2, 4, 8])
    no_dx: bool = False
    no_grid: bool = False
    no_ds: bool = False
    no_dr: bool = False
    no_do: bool = True
    no_dshs: bool = True
    empty_voxel: bool = False
    grid_pe: int = 0
    static_mlp: bool = False
    apply_rotation: bool = False


@dataclass
class OptimizationParams:
    dataloader: bool = False
    zerostamp_init: bool = False
    custom_sampler: object = None
    iterations: int = 30_000
    coarse_iterations: int = 3000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 20_000
    deformation_lr_init: float = 0.00016
    deformation_lr_final: float = 0.000016
    deformation_lr_delay_mult: float = 0.01
    grid_lr_init: float = 0.0016
    grid_lr_final: float = 0.00016
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0
    lambda_lpips: float = 0
    # extension: path to a torch lpips.LPIPS(net='alex') checkpoint; random
    # features when absent (train/lpips.py)
    lpips_ckpt: str | None = None
    weight_constraint_init: float = 1
    weight_constraint_after: float = 0.2
    weight_decay_iteration: int = 5000
    opacity_reset_interval: int = 3000
    densification_interval: int = 100
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold_coarse: float = 0.0002
    densify_grad_threshold_fine_init: float = 0.0002
    densify_grad_threshold_after: float = 0.0002
    pruning_from_iter: int = 500
    pruning_interval: int = 100
    opacity_threshold_coarse: float = 0.005
    opacity_threshold_fine_init: float = 0.005
    opacity_threshold_fine_after: float = 0.005
    batch_size: int = 1
    add_point: bool = False
    # Reference hard-codes these in the train loop (train_4DGS.py:275,279);
    # exposed here as real knobs (they also set the fixed buffer capacity).
    max_gaussians: int = 360_000
    min_gaussians_for_prune: int = 200_000


_GROUPS = {
    "ModelParams": ModelParams,
    "PipelineParams": PipelineParams,
    "ModelHiddenParams": ModelHiddenParams,
    "OptimizationParams": OptimizationParams,
}


def add_group_args(parser: ArgumentParser, group_cls, name: str | None = None):
    """Register a dataclass's fields as argparse flags (reference ParamGroup)."""
    group = parser.add_argument_group(name or group_cls.__name__)
    for f in dataclasses.fields(group_cls):
        default = f.default if f.default is not dataclasses.MISSING else (
            f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
        t = type(default)
        if t is bool:
            group.add_argument("--" + f.name, default=default, action="store_true")
        elif t in (dict, list) or default is None:
            continue  # complex fields only settable via config files
        else:
            group.add_argument("--" + f.name, default=default, type=t)


def extract_group(args: Namespace, group_cls):
    """Build a dataclass instance from parsed args (reference .extract)."""
    kwargs = {}
    for f in dataclasses.fields(group_cls):
        if hasattr(args, f.name):
            kwargs[f.name] = getattr(args, f.name)
    return group_cls(**kwargs)


def load_config_file(path: str) -> dict:
    """Execute a python config file (mmcv-style) and return its dict of
    group-name -> overrides, resolving a single level of ``_base_``."""
    scope: dict = {}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), scope)
    merged: dict = {}
    base = scope.get("_base_")
    if base:
        base_path = os.path.join(os.path.dirname(path), base)
        merged = load_config_file(base_path)
    for name in _GROUPS:
        if name in scope:
            merged.setdefault(name, {}).update(scope[name])
    # mmcv config files may also carry loose keys inside group dicts that are
    # not dataclass fields (e.g. render_process in OptimizationParams) — keep
    # them; merge_hparams below applies them onto args wholesale, mirroring
    # utils/params_utils.py:1-9.
    return merged


def merge_hparams(args: Namespace, config: dict) -> Namespace:
    """Apply config-file overrides onto the flat args namespace, mirroring
    merge_hparams (utils/params_utils.py:1-9): every key of every known group
    dict overwrites args."""
    # reference guard (params_utils.py:6): a key that is not an existing arg
    # is silently DROPPED, whichever group dict it sits in — e.g. hypernerf
    # configs override kplanes_config from inside ModelParams and it still
    # lands, but a typo'd key never creates a new attribute.  The reference
    # registers EVERY ParamGroup attribute on args (arguments/__init__.py
    # ParamGroup ctor), including dict/list fields our argparse layer skips,
    # so "exists on args" there = "is a field of any group" here.
    known = {f.name for cls in _GROUPS.values()
             for f in dataclasses.fields(cls)}
    for name in ("OptimizationParams", "ModelHiddenParams",
                 "ModelParams", "PipelineParams"):
        if name in config:
            for key, value in config[name].items():
                if hasattr(args, key) or key in known:
                    setattr(args, key, value)
    return args


def save_cfg_args(path: str, args: Namespace):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "cfg_args"), "w") as f:
        f.write(str(Namespace(**vars(args))))


def parse_namespace_repr(text: str) -> Namespace:
    """Parse a ``Namespace(a=1, b='x')`` repr without eval()."""
    text = text.strip()
    assert text.startswith("Namespace(") and text.endswith(")")
    tree = ast.parse(text, mode="eval")
    call = tree.body
    kwargs = {}
    for kw in call.keywords:
        try:
            kwargs[kw.arg] = ast.literal_eval(kw.value)
        except (ValueError, SyntaxError):
            kwargs[kw.arg] = None  # non-literal (e.g. device objects) — drop
    return Namespace(**kwargs)


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """Merge CLI args over a persisted cfg_args found in --input_dir
    (reference arguments/__init__.py:154-174)."""
    argv = sys.argv[1:] if argv is None else argv
    args_cmdline = parser.parse_args(argv)
    merged = {}
    try:
        cfgfilepath = os.path.join(args_cmdline.input_dir, "cfg_args")
        with open(cfgfilepath) as cfg_file:
            merged = vars(parse_namespace_repr(cfg_file.read()))
            print(f"Config file found: {cfgfilepath}")
    except (TypeError, FileNotFoundError):
        print("Config file not found")
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
