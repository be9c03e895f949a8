"""torch -> JAX weight conversion for the ZoeDepth stack.

Two source layouts:

1. transformers DPTForDepthEstimation with a BEiT backbone (the layout the
   parity tests instantiate): backbone.embeddings.*, backbone.encoder.
   layer.{i}.*, neck.reassemble_stage.*, neck.convs.{i}.*,
   neck.fusion_stage.layers.{i}.*, head.head.{0,2,4}.*.

2. The original ZoeD_M12_N.pt release layout (torch.hub MiDaS/timm naming,
   what the reference downloads at train_motion.py:36): core.core.
   pretrained.model.blocks.{i}.* (fused qkv, q_bias/v_bias, per-block
   relative_position_bias_table), core.core.pretrained.act_postprocess{k}.*,
   core.core.scratch.layer{k}_rn / refinenet{k} / output_conv.*, plus the
   metric head keys from zoedepth_v1.py (conv2, seed_bin_regressor._net,
   seed_projector._net, projectors.{i}._net, attractors.{i}._net,
   conditional_log_binomial.mlp).

All convs convert OIHW -> HWIO; ConvTranspose2d converts IOHW -> HWIO with a
spatial flip (see nn.layers.conv_transpose2d).  Relative-position tables are
resized to the target window and materialized.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .beit import materialize_rel_pos_bias, resize_rel_pos_table
from .model import ZoeConfig


def _a(x):
    return np.asarray(x.detach().cpu() if hasattr(x, "detach") else x,
                      np.float32)


def _conv(sd, key, bias=True):
    p = {"w": jnp.asarray(_a(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))}
    if bias and f"{key}.bias" in sd:
        p["b"] = jnp.asarray(_a(sd[f"{key}.bias"]))
    return p


def _conv_t(sd, key):
    w = _a(sd[f"{key}.weight"])                 # torch (in, out, kh, kw)
    w = w.transpose(2, 3, 0, 1)[::-1, ::-1]     # HWIO + spatial flip
    p = {"w": jnp.asarray(np.ascontiguousarray(w))}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(_a(sd[f"{key}.bias"]))
    return p


def _lin(sd, key, bias=True):
    p = {"w": jnp.asarray(_a(sd[f"{key}.weight"]).T)}
    if bias and f"{key}.bias" in sd:
        p["b"] = jnp.asarray(_a(sd[f"{key}.bias"]))
    return p


def _ln(sd, key):
    return {"g": jnp.asarray(_a(sd[f"{key}.weight"])),
            "b": jnp.asarray(_a(sd[f"{key}.bias"]))}


def _bias_entries(table: np.ndarray, stored_window: tuple,
                  window: tuple) -> dict:
    if tuple(stored_window) != tuple(window):
        table = resize_rel_pos_table(table, stored_window, window)
    return {"rel_pos_table": jnp.asarray(table),
            "rel_pos_bias": jnp.asarray(
                materialize_rel_pos_bias(table, window))}


def _stored_window_from_rows(rows: int) -> tuple:
    """Infer a square training window from the table row count."""
    side = int(round(np.sqrt(rows - 3)))
    assert (side * side) == rows - 3, rows
    wh = (side + 1) // 2
    return (wh, wh)


# ---------------------------------------------------------------------------
# layout 1: transformers DPT(+BEiT backbone)

def from_transformers_dpt(sd: dict, cfg: ZoeConfig) -> dict:
    """Converts backbone+neck+head of a transformers DPTForDepthEstimation
    (BeitBackbone) state dict into our {'backbone', 'decoder'} trees."""
    backbone = {
        "cls_token": jnp.asarray(
            _a(sd["backbone.embeddings.cls_token"]).reshape(-1)),
        "patch_embed": {
            "w": jnp.asarray(_a(
                sd["backbone.embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_a(
                sd["backbone.embeddings.patch_embeddings.projection.bias"]))},
        "layers": [],
    }
    i = 0
    while f"backbone.encoder.layer.{i}.layernorm_before.weight" in sd:
        pre = f"backbone.encoder.layer.{i}"
        table = _a(sd[f"{pre}.attention.attention.relative_position_bias"
                      ".relative_position_bias_table"])
        stored = _stored_window_from_rows(table.shape[0])
        lp = {
            "ln1": _ln(sd, f"{pre}.layernorm_before"),
            "ln2": _ln(sd, f"{pre}.layernorm_after"),
            "q": _lin(sd, f"{pre}.attention.attention.query"),
            "k": _lin(sd, f"{pre}.attention.attention.key", bias=False),
            "v": _lin(sd, f"{pre}.attention.attention.value"),
            "attn_out": _lin(sd, f"{pre}.attention.output.dense"),
            "fc1": _lin(sd, f"{pre}.intermediate.dense"),
            "fc2": _lin(sd, f"{pre}.output.dense"),
            "lambda1": jnp.asarray(_a(sd[f"{pre}.lambda_1"])),
            "lambda2": jnp.asarray(_a(sd[f"{pre}.lambda_2"])),
        }
        lp.update(_bias_entries(table, stored, cfg.window))
        backbone["layers"].append(lp)
        i += 1

    decoder = {"reassemble": [], "convs": [], "fusion": []}
    for k in range(4):
        stage = {
            "readout": _lin(
                sd, f"neck.reassemble_stage.readout_projects.{k}.0"),
            "projection": _conv(
                sd, f"neck.reassemble_stage.layers.{k}.projection"),
        }
        rk = f"neck.reassemble_stage.layers.{k}.resize"
        if f"{rk}.weight" in sd:
            w = _a(sd[f"{rk}.weight"])
            if cfg.dpt().reassemble_factors[k] > 1:
                stage["resize"] = _conv_t(sd, rk)      # ConvTranspose2d
            else:
                stage["resize"] = _conv(sd, rk)
        decoder["reassemble"].append(stage)
        decoder["convs"].append(_conv(sd, f"neck.convs.{k}", bias=False))
    for k in range(4):
        pre = f"neck.fusion_stage.layers.{k}"
        decoder["fusion"].append({
            "projection": _conv(sd, f"{pre}.projection"),
            "res1": {"conv1": _conv(sd, f"{pre}.residual_layer1.convolution1"),
                     "conv2": _conv(sd, f"{pre}.residual_layer1.convolution2")},
            "res2": {"conv1": _conv(sd, f"{pre}.residual_layer2.convolution1"),
                     "conv2": _conv(sd, f"{pre}.residual_layer2.convolution2")},
        })
    decoder["head"] = {
        "conv1": _conv(sd, "head.head.0"),
        "conv2": _conv(sd, "head.head.2"),
        "conv3": _conv(sd, "head.head.4"),
    }
    return {"backbone": backbone, "decoder": decoder}


# ---------------------------------------------------------------------------
# layout 2: original ZoeD_N checkpoint (MiDaS/timm inside MidasCore)

def _timm_block(sd: dict, pre: str, cfg: ZoeConfig) -> dict:
    C = _a(sd[f"{pre}.norm1.weight"]).shape[0]
    qkv_w = _a(sd[f"{pre}.attn.qkv.weight"])          # (3C, C)
    qw, kw, vw = np.split(qkv_w, 3, axis=0)
    table = _a(sd[f"{pre}.attn.relative_position_bias_table"])
    stored = _stored_window_from_rows(table.shape[0])
    lp = {
        "ln1": _ln(sd, f"{pre}.norm1"),
        "ln2": _ln(sd, f"{pre}.norm2"),
        "q": {"w": jnp.asarray(qw.T),
              "b": jnp.asarray(_a(sd[f"{pre}.attn.q_bias"]))},
        "k": {"w": jnp.asarray(kw.T)},
        "v": {"w": jnp.asarray(vw.T),
              "b": jnp.asarray(_a(sd[f"{pre}.attn.v_bias"]))},
        "attn_out": _lin(sd, f"{pre}.attn.proj"),
        "fc1": _lin(sd, f"{pre}.mlp.fc1"),
        "fc2": _lin(sd, f"{pre}.mlp.fc2"),
        "lambda1": jnp.asarray(_a(sd[f"{pre}.gamma_1"])),
        "lambda2": jnp.asarray(_a(sd[f"{pre}.gamma_2"])),
    }
    lp.update(_bias_entries(table, stored, cfg.window))
    return lp


def from_zoedepth_checkpoint(sd: dict, cfg: ZoeConfig) -> dict:
    """Converts the released ZoeD_M12_N.pt state dict (MidasCore wrapping
    torch.hub MiDaS DPT_BEiT_L_384 + the metric head)."""
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    bb = "core.core.pretrained.model"
    backbone = {
        "cls_token": jnp.asarray(_a(sd[f"{bb}.cls_token"]).reshape(-1)),
        "patch_embed": {
            "w": jnp.asarray(
                _a(sd[f"{bb}.patch_embed.proj.weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_a(sd[f"{bb}.patch_embed.proj.bias"]))},
        "layers": [],
    }
    i = 0
    while f"{bb}.blocks.{i}.norm1.weight" in sd:
        backbone["layers"].append(_timm_block(sd, f"{bb}.blocks.{i}", cfg))
        i += 1

    pt = "core.core.pretrained"
    sc = "core.core.scratch"
    decoder = {"reassemble": [], "convs": [], "fusion": []}
    factors = cfg.dpt().reassemble_factors
    for k in range(4):
        ap = f"{pt}.act_postprocess{k + 1}"
        stage = {
            "readout": _lin(sd, f"{ap}.0.project.0"),
            "projection": _conv(sd, f"{ap}.3"),
        }
        if factors[k] > 1:
            stage["resize"] = _conv_t(sd, f"{ap}.4")
        elif factors[k] < 1:
            stage["resize"] = _conv(sd, f"{ap}.4")
        decoder["reassemble"].append(stage)
        decoder["convs"].append(
            _conv(sd, f"{sc}.layer{k + 1}_rn", bias=False))
    # MiDaS refinenet4..1 == our fusion[0..3]
    for k, rn in enumerate((4, 3, 2, 1)):
        pre = f"{sc}.refinenet{rn}"
        decoder["fusion"].append({
            "projection": _conv(sd, f"{pre}.out_conv"),
            "res1": {"conv1": _conv(sd, f"{pre}.resConfUnit1.conv1"),
                     "conv2": _conv(sd, f"{pre}.resConfUnit1.conv2")},
            "res2": {"conv1": _conv(sd, f"{pre}.resConfUnit2.conv1"),
                     "conv2": _conv(sd, f"{pre}.resConfUnit2.conv2")},
        })
    decoder["head"] = {
        "conv1": _conv(sd, f"{sc}.output_conv.0"),
        "conv2": _conv(sd, f"{sc}.output_conv.2"),
        "conv3": _conv(sd, f"{sc}.output_conv.4"),
    }

    def mlp2(prefix):
        return [_conv(sd, f"{prefix}.0"), _conv(sd, f"{prefix}.2")]

    params = {
        "backbone": backbone,
        "decoder": decoder,
        "conv2": _conv(sd, "conv2"),
        "seed_bin_regressor": mlp2("seed_bin_regressor._net"),
        "seed_projector": mlp2("seed_projector._net"),
        "projectors": [mlp2(f"projectors.{i}._net") for i in range(4)],
        "attractors": [mlp2(f"attractors.{i}._net") for i in range(4)],
        "conditional_log_binomial": mlp2("conditional_log_binomial.mlp"),
    }
    return params


def load_zoedepth(path: str, cfg: ZoeConfig | None = None) -> tuple:
    """Load a ZoeD_N torch checkpoint from disk -> (params, cfg).

    Handles the released ZoeD_M12_N.pt nesting exactly as the reference's
    loader does (ZoeDepth/zoedepth/models/model_io.py:27-52): an optional
    {'model': state_dict} wrapper and optional DataParallel 'module.' key
    prefixes, or a pickled model object."""
    import torch
    cfg = cfg or ZoeConfig()
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"],
                                                             dict):
        sd = sd["model"]
    if any(k.startswith("module.") for k in sd):
        sd = {(k[7:] if k.startswith("module.") else k): v
              for k, v in sd.items()}
    return from_zoedepth_checkpoint(sd, cfg), cfg
