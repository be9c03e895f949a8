"""ZoeDepth port parity tests.

Backbone/decoder: vs transformers DPTForDepthEstimation with a BEiT
backbone (Intel's verified port of the MiDaS 3.1 DPT_BEiT architecture the
reference downloads via torch.hub, midas.py:343) at random weights.

Metric-bins head: vs the VENDORED reference layers
(ZoeDepth/zoedepth/models/layers/*) imported from /root/reference.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.parity
import torch

import jax
import jax.numpy as jnp

from mom_tpu.motion.zoe import beit as B
from mom_tpu.motion.zoe import bins as BN
from mom_tpu.motion.zoe import dpt as DPT
from mom_tpu.motion.zoe import model as ZM
from mom_tpu.motion.zoe import convert as CV

SMALL = ZM.ZoeConfig(
    hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
    neck_hidden_sizes=(16, 32, 48, 64), fusion_hidden_size=32,
    out_indices=(1, 2, 3, 4), img_size=(64, 64),
    n_bins=8, bin_embedding_dim=16, n_attractors=(4, 3, 2, 1))


def _hf_model(cfg: ZM.ZoeConfig, image_size):
    from transformers import BeitConfig, DPTConfig, DPTForDepthEstimation
    bc = BeitConfig(
        image_size=image_size, patch_size=16, num_channels=3,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_dim,
        use_absolute_position_embeddings=False,
        use_relative_position_bias=True,
        use_shared_relative_position_bias=False,
        layer_scale_init_value=0.1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
        out_features=[f"stage{i}" for i in cfg.out_indices],
        reshape_hidden_states=False,
        attn_implementation="eager")
    dc = DPTConfig(
        backbone_config=bc, is_hybrid=False, readout_type="project",
        neck_hidden_sizes=list(cfg.neck_hidden_sizes),
        reassemble_factors=[4, 2, 1, 0.5],
        fusion_hidden_size=cfg.fusion_hidden_size,
        use_batch_norm_in_fusion_residual=False, head_in_index=-1,
        add_projection=False)
    torch.manual_seed(0)
    m = DPTForDepthEstimation(dc).eval()
    # non-degenerate lambdas / biases for a meaningful test
    with torch.no_grad():
        for p in m.parameters():
            if (p == 0).all():
                p.add_(0.02 * torch.randn_like(p))
    return m


def _my_forward(params, cfg, x_nhwc):
    taps = B.beit_forward(params["backbone"], cfg.beit(),
                          jnp.asarray(x_nhwc))
    return DPT.dpt_forward(params["decoder"], cfg.dpt(), taps)


def test_dpt_beit_matches_transformers():
    cfg = SMALL
    m = _hf_model(cfg, 64)
    sd = {k: v for k, v in m.state_dict().items()}
    params = CV.from_transformers_dpt(sd, cfg)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(x).permute(0, 3, 1, 2)).predicted_depth.numpy()
    out = _my_forward(params, cfg, x)
    ours = np.asarray(out["rel_depth"])
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_dpt_beit_rectangular_window_specialization():
    """Feed a 64x96 input: transformers resizes each layer's rel-pos table
    on the fly; we specialize the params once — outputs must match."""
    cfg = SMALL
    m = _hf_model(cfg, 64)
    params = CV.from_transformers_dpt(dict(m.state_dict()), cfg)
    params = dict(params)
    params["backbone"] = B.specialize_window(params["backbone"],
                                             cfg.window, (4, 6))
    cfg2 = cfg._replace(img_size=(64, 96))

    rng = np.random.RandomState(2)
    x = rng.rand(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(x).permute(0, 3, 1, 2)).predicted_depth.numpy()
    ours = np.asarray(_my_forward(params, cfg2, x)["rel_depth"])
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# metric-bins head vs the vendored reference layers

@pytest.fixture(scope="module")
def zoe_layers():
    sys.path.insert(0, "/root/reference/ZoeDepth")
    try:
        from zoedepth.models.layers import localbins_layers, attractor
        from zoedepth.models.layers import dist_layers
    except Exception as e:          # pragma: no cover
        pytest.skip(f"vendored ZoeDepth not importable: {e}")
    yield localbins_layers, attractor, dist_layers
    sys.path.remove("/root/reference/ZoeDepth")


def _convert_mlp2(torch_seq_sd, prefix="_net"):
    def conv(i):
        return {"w": jnp.asarray(np.asarray(
            torch_seq_sd[f"{prefix}.{i}.weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np.asarray(torch_seq_sd[f"{prefix}.{i}.bias"]))}
    return [conv(0), conv(2)]


def test_seed_bin_regressor_parity(zoe_layers):
    localbins, _, _ = zoe_layers
    torch.manual_seed(3)
    ref = localbins.SeedBinRegressorUnnormed(8, n_bins=6, mlp_dim=16).eval()
    p = _convert_mlp2(ref.state_dict())
    x = np.random.RandomState(4).randn(2, 5, 7, 8).astype(np.float32)
    with torch.no_grad():
        _, rc = ref(torch.tensor(x).permute(0, 3, 1, 2))
    _, ours = BN.seed_bin_regressor_unnormed(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               rc.permute(0, 2, 3, 1).numpy(), atol=1e-5)

    ref2 = localbins.SeedBinRegressor(8, n_bins=6, mlp_dim=16,
                                      min_depth=0.1, max_depth=5.0).eval()
    p2 = _convert_mlp2(ref2.state_dict())
    with torch.no_grad():
        wn, rc2 = ref2(torch.tensor(x).permute(0, 3, 1, 2))
    wn_o, ours2 = BN.seed_bin_regressor_normed(p2, jnp.asarray(x), 0.1, 5.0)
    np.testing.assert_allclose(np.asarray(ours2),
                               rc2.permute(0, 2, 3, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wn_o),
                               wn.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_attractor_parity(zoe_layers):
    _, attractor, _ = zoe_layers
    torch.manual_seed(5)
    rng = np.random.RandomState(6)
    x = rng.randn(1, 6, 8, 16).astype(np.float32)
    b_prev = np.abs(rng.randn(1, 3, 4, 10)).astype(np.float32)
    prev_emb = rng.randn(1, 3, 4, 16).astype(np.float32)

    # unnormed / inv / mean — the ZoeD_N configuration
    ref = attractor.AttractorLayerUnnormed(
        16, 10, n_attractors=4, mlp_dim=16, alpha=1000, gamma=2,
        kind="mean", attractor_type="inv").eval()
    p = _convert_mlp2(ref.state_dict())
    with torch.no_grad():
        bn, bc = ref(torch.tensor(x).permute(0, 3, 1, 2),
                     torch.tensor(b_prev).permute(0, 3, 1, 2),
                     torch.tensor(prev_emb).permute(0, 3, 1, 2),
                     interpolate=True)
    ours_b, ours_c = BN.attractor_layer_unnormed(
        p, jnp.asarray(x), jnp.asarray(b_prev), jnp.asarray(prev_emb),
        alpha=1000.0, gamma=2, kind="mean", attractor_type="inv")
    np.testing.assert_allclose(np.asarray(ours_c),
                               bc.permute(0, 2, 3, 1).numpy(), atol=1e-5)

    # normed / exp / sum
    ref2 = attractor.AttractorLayer(
        16, 10, n_attractors=4, mlp_dim=16, min_depth=0.1, max_depth=5.0,
        alpha=300, gamma=2, kind="sum", attractor_type="exp").eval()
    p2 = _convert_mlp2(ref2.state_dict())
    b_prev01 = (rng.rand(1, 3, 4, 10)).astype(np.float32)
    with torch.no_grad():
        bn2, bc2 = ref2(torch.tensor(x).permute(0, 3, 1, 2),
                        torch.tensor(b_prev01).permute(0, 3, 1, 2),
                        torch.tensor(prev_emb).permute(0, 3, 1, 2),
                        interpolate=True)
    o_b2, o_c2 = BN.attractor_layer_normed(
        p2, jnp.asarray(x), jnp.asarray(b_prev01), jnp.asarray(prev_emb),
        min_depth=0.1, max_depth=5.0, alpha=300.0, gamma=2, kind="sum",
        attractor_type="exp")
    np.testing.assert_allclose(np.asarray(o_c2),
                               bc2.permute(0, 2, 3, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_b2),
                               bn2.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_cond_log_binomial_parity(zoe_layers):
    _, _, dist_layers = zoe_layers
    torch.manual_seed(7)
    ref = dist_layers.ConditionalLogBinomial(
        9, 16, n_classes=8, bottleneck_factor=2, min_temp=0.0212,
        max_temp=50.0).eval()
    p = _convert_mlp2(ref.state_dict(), prefix="mlp")
    rng = np.random.RandomState(8)
    x = rng.randn(1, 5, 6, 9).astype(np.float32)
    cond = rng.randn(1, 5, 6, 16).astype(np.float32)
    with torch.no_grad():
        rp = ref(torch.tensor(x).permute(0, 3, 1, 2),
                 torch.tensor(cond).permute(0, 3, 1, 2))
    ours = BN.cond_log_binomial(p, jnp.asarray(x), jnp.asarray(cond),
                                n_classes=8, min_temp=0.0212, max_temp=50.0)
    np.testing.assert_allclose(np.asarray(ours),
                               rp.permute(0, 2, 3, 1).numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# full assembly vs a torch re-composition (transformers core + vendored head)

def test_full_zoedepth_parity(zoe_layers):
    localbins, attractor, dist_layers = zoe_layers
    import torch.nn as tnn
    import torch.nn.functional as TF
    cfg = SMALL
    m = _hf_model(cfg, 64)
    params = CV.from_transformers_dpt(dict(m.state_dict()), cfg)

    torch.manual_seed(9)
    F = cfg.fusion_hidden_size
    t_conv2 = tnn.Conv2d(F, F, 1).eval()
    t_seed = localbins.SeedBinRegressorUnnormed(
        F, n_bins=cfg.n_bins, mlp_dim=256).eval()
    t_seed_proj = localbins.Projector(F, cfg.bin_embedding_dim).eval()
    t_projs = [localbins.Projector(F, cfg.bin_embedding_dim).eval()
               for _ in range(4)]
    t_attrs = [attractor.AttractorLayerUnnormed(
        cfg.bin_embedding_dim, cfg.n_bins, n_attractors=cfg.n_attractors[i],
        alpha=cfg.attractor_alpha, gamma=cfg.attractor_gamma,
        kind=cfg.attractor_kind, attractor_type=cfg.attractor_type).eval()
        for i in range(4)]
    t_clb = dist_layers.ConditionalLogBinomial(
        32 + 1, cfg.bin_embedding_dim, n_classes=cfg.n_bins,
        min_temp=cfg.min_temp, max_temp=cfg.max_temp).eval()

    params["conv2"] = {
        "w": jnp.asarray(np.asarray(
            t_conv2.weight.detach()).transpose(2, 3, 1, 0)),
        "b": jnp.asarray(np.asarray(t_conv2.bias.detach()))}
    params["seed_bin_regressor"] = _convert_mlp2(t_seed.state_dict())
    params["seed_projector"] = _convert_mlp2(t_seed_proj.state_dict())
    params["projectors"] = [_convert_mlp2(t.state_dict()) for t in t_projs]
    params["attractors"] = [_convert_mlp2(t.state_dict()) for t in t_attrs]
    params["conditional_log_binomial"] = _convert_mlp2(
        t_clb.state_dict(), prefix="mlp")

    rng = np.random.RandomState(10)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)

    # ---- torch re-composition of zoedepth_v1.forward (:144-216)
    with torch.no_grad():
        xt = torch.tensor(x).permute(0, 3, 1, 2)
        feats = m.backbone.forward_with_filtered_kwargs(
            xt, output_hidden_states=True).feature_maps
        fused = m.neck(list(feats), patch_height=4, patch_width=4)
        l4_rn = m.neck.convs[3](
            m.neck.reassemble_stage(list(feats), 4, 4)[3])
        r4, r3, r2, r1 = fused[0], fused[1], fused[2], fused[3]
        h0 = m.head.head[0](r1)
        h1 = m.head.head[1](h0)
        out_conv = m.head.head[3](m.head.head[2](h1))
        rel_depth = m.head.head[5](m.head.head[4](out_conv))

        xd = t_conv2(l4_rn)
        _, seed_centers = t_seed(xd)
        b_prev = seed_centers
        prev_emb = t_seed_proj(xd)
        for proj, attr, blk in zip(t_projs, t_attrs, (r4, r3, r2, r1)):
            emb = proj(blk)
            b, b_centers = attr(emb, b_prev, prev_emb, interpolate=True)
            b_prev, prev_emb = b, emb
        rel_cond = TF.interpolate(rel_depth, out_conv.shape[2:],
                                  mode="bilinear", align_corners=True)
        last = torch.cat([out_conv, rel_cond], dim=1)
        emb_up = TF.interpolate(prev_emb, last.shape[2:], mode="bilinear",
                                align_corners=True)
        probs = t_clb(last, emb_up)
        centers_up = TF.interpolate(b_centers, probs.shape[2:],
                                    mode="bilinear", align_corners=True)
        ref_depth = torch.sum(probs * centers_up, dim=1).numpy()

    ours = np.asarray(
        ZM.zoedepth_forward(params, cfg, jnp.asarray(x))["metric_depth"])
    np.testing.assert_allclose(ours, ref_depth, atol=1e-3, rtol=1e-3)


def test_infer_depth_runs_end_to_end():
    cfg = SMALL
    params = ZM.init_zoedepth(jax.random.PRNGKey(0), cfg)
    img = np.random.RandomState(11).rand(60, 90, 3).astype(np.float32)
    depth = ZM.infer_depth(params, cfg, img)
    assert depth.shape == (60, 90)
    assert np.isfinite(depth).all() and (depth >= 0).all()


# ---------------------------------------------------------------------------
# released-file layout (ZoeD_M12_N.pt) round trip


def _synthetic_zoed_state_dict(cfg, seed=0):
    """A random state dict with EXACTLY the released ZoeD_M12_N.pt key
    nesting at test scale: MidasCore prefixes core.core.pretrained.model
    (BEiT) / core.core.pretrained.act_postprocess* / core.core.scratch
    (DPT) + the top-level metric-bins head (train_motion.py:36 load site;
    key manifest mirrored by from_zoedepth_checkpoint)."""
    rng = np.random.RandomState(seed)
    C, M, H = cfg.hidden_size, cfg.mlp_dim, 2
    neck = cfg.neck_hidden_sizes
    F = cfg.fusion_hidden_size
    wh = cfg.window[0]
    rows = (2 * wh - 1) ** 2 + 3
    sd = {}

    def t(key, *shape):
        sd[key] = torch.tensor(rng.randn(*shape).astype(np.float32))

    bb = "core.core.pretrained.model"
    t(f"{bb}.cls_token", 1, 1, C)
    t(f"{bb}.patch_embed.proj.weight", C, 3, 16, 16)
    t(f"{bb}.patch_embed.proj.bias", C)
    for i in range(cfg.num_layers):
        p = f"{bb}.blocks.{i}"
        for n in ("norm1", "norm2"):
            t(f"{p}.{n}.weight", C); t(f"{p}.{n}.bias", C)
        t(f"{p}.attn.qkv.weight", 3 * C, C)
        t(f"{p}.attn.q_bias", C); t(f"{p}.attn.v_bias", C)
        t(f"{p}.attn.proj.weight", C, C); t(f"{p}.attn.proj.bias", C)
        t(f"{p}.mlp.fc1.weight", M, C); t(f"{p}.mlp.fc1.bias", M)
        t(f"{p}.mlp.fc2.weight", C, M); t(f"{p}.mlp.fc2.bias", C)
        t(f"{p}.gamma_1", C); t(f"{p}.gamma_2", C)
        t(f"{p}.attn.relative_position_bias_table", rows, H)

    pt, sc = "core.core.pretrained", "core.core.scratch"
    factors = cfg.dpt().reassemble_factors
    for k in range(4):
        ap = f"{pt}.act_postprocess{k + 1}"
        t(f"{ap}.0.project.0.weight", C, 2 * C)
        t(f"{ap}.0.project.0.bias", C)
        t(f"{ap}.3.weight", neck[k], C, 1, 1); t(f"{ap}.3.bias", neck[k])
        if factors[k] > 1:
            f = int(factors[k])
            t(f"{ap}.4.weight", neck[k], neck[k], f, f)
            t(f"{ap}.4.bias", neck[k])
        elif factors[k] < 1:
            t(f"{ap}.4.weight", neck[k], neck[k], 3, 3)
            t(f"{ap}.4.bias", neck[k])
        t(f"{sc}.layer{k + 1}_rn.weight", F, neck[k], 3, 3)
    for rn in (1, 2, 3, 4):
        p = f"{sc}.refinenet{rn}"
        t(f"{p}.out_conv.weight", F, F, 1, 1); t(f"{p}.out_conv.bias", F)
        for u in ("resConfUnit1", "resConfUnit2"):
            for cv in ("conv1", "conv2"):
                t(f"{p}.{u}.{cv}.weight", F, F, 3, 3)
                t(f"{p}.{u}.{cv}.bias", F)
    t(f"{sc}.output_conv.0.weight", F // 2, F, 3, 3)
    t(f"{sc}.output_conv.0.bias", F // 2)
    t(f"{sc}.output_conv.2.weight", 32, F // 2, 3, 3)
    t(f"{sc}.output_conv.2.bias", 32)
    t(f"{sc}.output_conv.4.weight", 1, 32, 1, 1)
    t(f"{sc}.output_conv.4.bias", 1)

    t("conv2.weight", F, F, 1, 1); t("conv2.bias", F)

    def mlp2(prefix, cin, chid, cout):
        t(f"{prefix}.0.weight", chid, cin, 1, 1); t(f"{prefix}.0.bias", chid)
        t(f"{prefix}.2.weight", cout, chid, 1, 1); t(f"{prefix}.2.bias", cout)

    mlp2("seed_bin_regressor._net", F, 256, cfg.n_bins)
    mlp2("seed_projector._net", F, 128, cfg.bin_embedding_dim)
    for i in range(4):
        mlp2(f"projectors.{i}._net", F, 128, cfg.bin_embedding_dim)
    for i in range(4):
        mlp2(f"attractors.{i}._net", cfg.bin_embedding_dim, 16,
             cfg.n_attractors[i])
    mlp2("conditional_log_binomial.mlp", 33, 64, 16)
    return sd


def test_zoed_m12_n_file_roundtrip(tmp_path):
    """File-level seam: a ZoeD_M12_N.pt written exactly as released —
    {'model': state_dict} wrapper with DataParallel 'module.' prefixes
    (model_io.py:27-52 strips both) — loads via load_zoedepth identically
    to the in-memory converter on the raw state dict."""
    cfg = SMALL
    sd = _synthetic_zoed_state_dict(cfg)
    path = tmp_path / "ZoeD_M12_N.pt"
    torch.save({"model": {f"module.{k}": v for k, v in sd.items()},
                "optimizer": {}, "epoch": 5}, path)
    got, _ = CV.load_zoedepth(str(path), cfg)
    expect = CV.from_zoedepth_checkpoint(sd, cfg)
    jax.tree.map(np.testing.assert_array_equal, got, expect)
