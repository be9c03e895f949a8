"""Parity tests against torch reconstructions of the reference deformation
math: HexPlane multi-scale sampling (grid_sample products, plane order and
the raw-time quirk) and the MLP heads applied through the converted
state-dict — verifying both the math and the checkpoint key layout."""

import pytest

pytestmark = pytest.mark.parity
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mom_tpu import pipeline, config as C
from mom_tpu.models import deformation as D
from mom_tpu.models import hexplane as HX
from mom_tpu.data.checkpoints import deformation_to_torch_state


def _cfg():
    h = C.ModelHiddenParams()
    h.multires = [1, 2]
    h.defor_depth = 0
    h.kplanes_config = {"grid_dimensions": 2, "input_coordinate_dim": 4,
                        "output_coordinate_dim": 8,
                        "resolution": [8, 8, 8, 5]}
    return pipeline.deform_config_from_hidden(h)


def torch_hexplane_features(grids, aabb, pts, times):
    """Reference HexPlaneField.get_density math (scene/hexplane.py:160-175)
    rebuilt with torch ops."""
    import itertools
    pts_t = torch.tensor(np.asarray(pts))
    aabb_t = torch.tensor(np.asarray(aabb))
    # normalize_aabb: aabb[0] is the MAX row
    p = (pts_t - aabb_t[0]) * (2.0 / (aabb_t[1] - aabb_t[0])) - 1.0
    coords4 = torch.cat([p, torch.tensor(np.asarray(times))[:, None]], -1)
    combs = list(itertools.combinations(range(4), 2))
    feats = []
    for scale_planes in grids:
        interp = 1.0
        for ci, comb in enumerate(combs):
            plane = torch.tensor(np.asarray(scale_planes[ci]))[None]
            c = coords4[:, list(comb)]
            out = F.grid_sample(plane, c.view(1, 1, -1, 2),
                                align_corners=True, mode="bilinear",
                                padding_mode="border")
            interp = interp * out[0, :, 0, :].T
        feats.append(interp)
    return torch.cat(feats, -1).numpy()


def test_hexplane_matches_torch_reference_math():
    cfg = _cfg()
    params = HX.init_hexplane(jax.random.PRNGKey(0), cfg.grid, cfg.bounds)
    # randomize the time planes too so products are non-trivial
    key = jax.random.PRNGKey(1)
    grids = []
    for planes in params["grids"]:
        new = []
        for p in planes:
            key, sub = jax.random.split(key)
            new.append(p + 0.3 * jax.random.normal(sub, p.shape))
        grids.append(new)
    params = {**params, "grids": grids}
    params = HX.set_aabb(params, [1.0, 2.0, 3.0], [-1.0, -0.5, 0.0])

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 3, (50, 3)).astype(np.float32)
    times = rng.uniform(0, 1, 50).astype(np.float32)

    ours = np.asarray(HX.hexplane_features(params, jnp.asarray(pts),
                                           jnp.asarray(times)))
    ref = torch_hexplane_features(params["grids"], params["aabb"], pts, times)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_deformation_matches_torch_through_state_dict():
    """Build the reference MLP structure in torch, load our converted state
    dict into it, and compare full deform() outputs."""
    cfg = _cfg()
    params = D.init_deformation(jax.random.PRNGKey(2), cfg)
    sd = deformation_to_torch_state(params, cfg)

    W = cfg.net_width
    feat_dim = cfg.grid.feat_dim

    class TorchDeform(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_out = torch.nn.Sequential(
                torch.nn.Linear(feat_dim, W))
            def head(out):
                return torch.nn.Sequential(
                    torch.nn.ReLU(), torch.nn.Linear(W, W),
                    torch.nn.ReLU(), torch.nn.Linear(W, out))
            self.pos_deform = head(3)
            self.scales_deform = head(3)
            self.rotations_deform = head(4)

        def forward(self, grid_feat, xyz, scales, rots, flow, frame_num,
                    delta_scale):
            h = self.feature_out(grid_feat)
            dx = self.pos_deform(h) + delta_scale * (frame_num * flow)
            return (xyz + dx, scales + self.scales_deform(h),
                    rots + self.rotations_deform(h))

    tm = TorchDeform()
    prefix = "deformation_net."
    tsd = {}
    for name in ["feature_out.0", "pos_deform.1", "pos_deform.3",
                 "scales_deform.1", "scales_deform.3",
                 "rotations_deform.1", "rotations_deform.3"]:
        tsd[name + ".weight"] = sd[prefix + name + ".weight"]
        tsd[name + ".bias"] = sd[prefix + name + ".bias"]
    tm.load_state_dict(tsd)

    rng = np.random.RandomState(3)
    n = 40
    xyz = rng.randn(n, 3).astype(np.float32)
    scales = rng.randn(n, 3).astype(np.float32)
    rots = rng.randn(n, 4).astype(np.float32)
    flow = rng.randn(n, 3).astype(np.float32) * 0.1
    opac = rng.randn(n, 1).astype(np.float32)
    shs = rng.randn(n, 16, 3).astype(np.float32)
    times = rng.uniform(0, 1, n).astype(np.float32)
    frame_num = 7.0

    mf, sf, rf, of, shf = D.deform(params, cfg, jnp.asarray(xyz),
                                   jnp.asarray(scales), jnp.asarray(rots),
                                   jnp.asarray(opac), jnp.asarray(shs),
                                   jnp.asarray(times), jnp.asarray(flow),
                                   frame_num, 1.0)

    grid_feat = np.asarray(HX.hexplane_features(params["grid"],
                                                jnp.asarray(xyz),
                                                jnp.asarray(times)))
    with torch.no_grad():
        t_m, t_s, t_r = tm(torch.tensor(grid_feat), torch.tensor(xyz),
                           torch.tensor(scales), torch.tensor(rots),
                           torch.tensor(flow), frame_num, 1.0)
    np.testing.assert_allclose(np.asarray(mf), t_m.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sf), t_s.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rf), t_r.numpy(), atol=2e-5)
    # opacity/shs pass through unchanged (no_do/no_dshs defaults)
    np.testing.assert_allclose(np.asarray(of), opac, atol=0)
    np.testing.assert_allclose(np.asarray(shf), shs, atol=0)


def test_dense_grid_matches_torch_grid_sample():
    """DenseGrid trilinear sampling vs the reference forward
    (scene/grid.py:26-37): grid [1,C,*ws], ind_norm flipped, align_corners."""
    from mom_tpu.models import grid as DG
    rng = np.random.RandomState(4)
    ws = (5, 6, 7)
    params = DG.init_dense_grid(2, ws, bounds=1.6)
    params["grid"] = jnp.asarray(rng.randn(2, *ws).astype(np.float32))
    params = DG.set_aabb(params, [1.0, 2.0, 0.5], [-1.0, -0.5, -1.5])

    pts = rng.uniform(-1.2, 1.8, (64, 3)).astype(np.float32)
    ours = np.asarray(DG.dense_grid_sample(params, jnp.asarray(pts)))

    g = torch.tensor(np.asarray(params["grid"]))[None]        # (1, C, X, Y, Z)
    xyz = torch.tensor(pts).reshape(1, 1, 1, -1, 3)
    mn = torch.tensor(np.asarray(params["xyz_min"]))
    mx = torch.tensor(np.asarray(params["xyz_max"]))
    ind = ((xyz - mn) / (mx - mn)).flip((-1,)) * 2 - 1
    ref = F.grid_sample(g, ind, mode="bilinear", align_corners=True)
    ref = ref.reshape(2, -1).T.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_empty_voxel_mask_deform():
    """empty_voxel=True: mask multiplies the BASE parameters
    (scene/deformation.py:101-102, 113-116) and the DenseGrid joins the grid
    optimizer group."""
    h = C.ModelHiddenParams()
    h.multires = [1, 2]
    h.defor_depth = 0
    h.empty_voxel = True
    h.kplanes_config = {"grid_dimensions": 2, "input_coordinate_dim": 4,
                        "output_coordinate_dim": 8,
                        "resolution": [8, 8, 8, 5]}
    cfg = pipeline.deform_config_from_hidden(h)
    assert cfg.empty_voxel

    params = D.init_deformation(jax.random.PRNGKey(5), cfg)
    assert "empty_voxel" in params
    params = D.set_deform_aabb(params, [1.0, 1.0, 1.0], [-1.0, -1.0, -1.0])
    # a non-trivial mask grid
    key = jax.random.PRNGKey(6)
    params["empty_voxel"]["grid"] = (
        params["empty_voxel"]["grid"]
        + 0.5 * jax.random.normal(key, params["empty_voxel"]["grid"].shape))

    # optimizer grouping: empty_voxel's grid parameter lands in the grid group
    assert "empty_voxel" in D.grid_param_tree(params)
    assert "empty_voxel" not in D.mlp_param_tree(params)

    rng = np.random.RandomState(7)
    n = 32
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scales = rng.randn(n, 3).astype(np.float32)
    rots = rng.randn(n, 4).astype(np.float32)
    flow = rng.randn(n, 3).astype(np.float32) * 0.1
    opac = rng.randn(n, 1).astype(np.float32)
    shs = rng.randn(n, 16, 3).astype(np.float32)
    times = rng.uniform(0, 1, n).astype(np.float32)

    mf, sf, rf, of, shf = D.deform(params, cfg, jnp.asarray(xyz),
                                   jnp.asarray(scales), jnp.asarray(rots),
                                   jnp.asarray(opac), jnp.asarray(shs),
                                   jnp.asarray(times), jnp.asarray(flow),
                                   5.0, 1.0)

    from mom_tpu.models import grid as DG
    from mom_tpu.models import hexplane as HX2
    mask = np.asarray(DG.dense_grid_sample(params["empty_voxel"],
                                           jnp.asarray(xyz)))
    # recompute the heads through the non-masked config to isolate the mask
    cfg_plain = cfg._replace(empty_voxel=False)
    mp, sp, rp, _, _ = D.deform(params, cfg_plain, jnp.asarray(xyz),
                                jnp.asarray(scales), jnp.asarray(rots),
                                jnp.asarray(opac), jnp.asarray(shs),
                                jnp.asarray(times), jnp.asarray(flow),
                                5.0, 1.0)
    dx = np.asarray(mp) - xyz
    ds = np.asarray(sp) - scales
    np.testing.assert_allclose(np.asarray(mf), xyz * mask + dx, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sf), scales * mask + ds, atol=1e-5)
    # rotations never use the mask (scene/deformation.py:126-135)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rp), atol=0)

    # state-dict round trip keeps the voxel grid
    from mom_tpu.data.checkpoints import (deformation_to_torch_state,
                                          deformation_from_torch_state)
    sd = deformation_to_torch_state(params, cfg)
    assert "deformation_net.empty_voxel.grid" in sd
    back = deformation_from_torch_state(sd, D.init_deformation(
        jax.random.PRNGKey(8), cfg))
    np.testing.assert_allclose(np.asarray(back["empty_voxel"]["grid"]),
                               np.asarray(params["empty_voxel"]["grid"]),
                               atol=0)
