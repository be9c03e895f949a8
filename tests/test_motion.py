"""Stage-1 motion stack tests: geometry, flow ops, euler integration,
softmax splatting, scene-flow optimization, and the full stage-1 -> stage-2
handoff on a tiny synthetic input."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mom_tpu.motion import pcd as pcd_mod
from mom_tpu.motion.euler import euler_integrate
from mom_tpu.motion.splat import softsplat
from mom_tpu.motion.sceneflow import optimize_scene_flow, sample_dense_flow
from mom_tpu.motion.flow import densify_hints, smooth_and_mask_flow
from mom_tpu.motion.flow_viz import flow2img, make_colorwheel


def test_unproject_project_roundtrip():
    cam = pcd_mod.camera_model(64, 48)
    depth = np.full((48, 64), 5.0, np.float32)
    R0 = np.eye(3)
    T0 = np.zeros((3, 1))
    pts = pcd_mod.unproject(depth, cam, R0, T0)
    pix, z, valid = pcd_mod.project(jnp.asarray(pts), jnp.asarray(cam.K),
                                    jnp.eye(3), jnp.zeros((3, 1)), 64, 48)
    x, y = np.meshgrid(np.arange(64, dtype=np.float32),
                       np.arange(48, dtype=np.float32), indexing="xy")
    np.testing.assert_allclose(np.asarray(pix[0]).reshape(48, 64), x,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(pix[1]).reshape(48, 64), y,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), 5.0, atol=1e-4)
    assert bool(jnp.all(valid))


def test_c2w_export_roundtrips_through_stage2_reader():
    """c2w_export -> from_c2w must recover the same world->view transform
    used for projection, keeping stages 1 and 2 geometrically consistent."""
    from mom_tpu.cameras import from_c2w
    render = np.zeros((1, 3, 4))
    render[0, :3, :3] = np.eye(3)
    internal = np.zeros((1, 3, 4))
    th = 0.1
    internal[0, :3, :3] = np.array([[np.cos(th), 0, -np.sin(th)],
                                    [0, 1, 0],
                                    [np.sin(th), 0, np.cos(th)]])
    internal[0, :3, 3] = [0.4, 0.1, -0.2]
    Rw2j, Tw2j = pcd_mod.compose_pose(render, internal, 0, 0)
    c2w = pcd_mod.c2w_export(Rw2j, Tw2j)

    cam = from_c2w(c2w, 0.8, 0.8, 64, 48)
    # the yz_reverse in the export and the yz flip in the stage-2 reader
    # cancel: the recovered world->view transform IS [Rw2j | Tw2j] in the
    # stage-1 projection convention (+y down, +z forward)
    p = np.array([0.3, -0.2, 4.0])
    v_stage1 = Rw2j @ p[:, None] + Tw2j
    v_stage2 = cam.world_view[:3, :3] @ p + cam.world_view[:3, 3]
    np.testing.assert_allclose(v_stage2, v_stage1[:, 0], atol=1e-5)


def test_euler_integration_constant_flow():
    flow = np.zeros((16, 16, 2), np.float32)
    flow[..., 0] = 0.5                  # constant +x drift
    disp = np.asarray(euler_integrate(jnp.asarray(flow), 4))
    # interior pixels: 4 steps of 0.5 -> 2.0 (borders stop early)
    assert abs(disp[8, 4, 0] - 2.0) < 1e-4
    assert abs(disp[8, 4, 1]) < 1e-6
    # pixels near the right edge stop at the boundary
    assert disp[8, 15, 0] <= 2.0 + 1e-6


def test_softsplat_average_preserves_constant():
    feat = np.ones((8, 8, 3), np.float32) * 0.7
    flow = np.zeros((8, 8, 2), np.float32)
    out = np.asarray(softsplat(jnp.asarray(feat), jnp.asarray(flow),
                               mode="average"))
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_softsplat_translation():
    feat = np.zeros((8, 8, 1), np.float32)
    feat[4, 2, 0] = 1.0
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 3.0                   # move +3 in x
    out = np.asarray(softsplat(jnp.asarray(feat), jnp.asarray(flow),
                               mode="average"))
    assert out[4, 5, 0] > 0.99
    assert out[4, 2, 0] < 1e-5


def test_scene_flow_recovers_translation():
    """Points moved by a known 3D offset: optimization should recover it
    from multi-view 2D projections."""
    rng = np.random.RandomState(0)
    N = 200
    pts = np.stack([rng.uniform(-1, 1, N), rng.uniform(-1, 1, N),
                    rng.uniform(4, 6, N)], 0).astype(np.float32)
    true_flow = np.tile(np.array([[0.05], [-0.03], [0.0]], np.float32),
                        (1, N))
    cam = pcd_mod.camera_model(64, 64)

    Ks, Rs, Ts, gts, valids = [], [], [], [], []
    for th in [-0.1, 0.0, 0.1]:
        R = np.array([[np.cos(th), 0, -np.sin(th)], [0, 1, 0],
                      [np.sin(th), 0, np.cos(th)]], np.float32)
        T = np.zeros((3, 1), np.float32)
        pix0, _, valid = pcd_mod.project(jnp.asarray(pts),
                                         jnp.asarray(cam.K), jnp.asarray(R),
                                         jnp.asarray(T), 64, 64)
        pix1, _, _ = pcd_mod.project(jnp.asarray(pts + true_flow),
                                     jnp.asarray(cam.K), jnp.asarray(R),
                                     jnp.asarray(T), 64, 64)
        Ks.append(cam.K)
        Rs.append(R)
        Ts.append(T)
        gts.append(np.asarray(pix1 - pix0))
        valids.append(np.asarray(valid))

    flow, losses = optimize_scene_flow(
        jnp.asarray(pts), jnp.asarray(np.stack(Ks)),
        jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(Ts)),
        jnp.asarray(np.stack(gts)), jnp.asarray(np.stack(valids), jnp.float32),
        epochs=300)
    # the recovered flow must reproduce the 2D flows (the 3D flow itself is
    # under-determined along viewing rays — same as the reference objective);
    # L1 + decaying SGD converges linearly, so check strong decrease plus a
    # sub-pixel median residual
    assert float(losses[-1]) < float(losses[0]) * 0.15, (
        float(losses[0]), float(losses[-1]))
    # and the projected 2D displacement of the recovered flow matches GT
    pix0, _, _ = pcd_mod.project(jnp.asarray(pts), jnp.asarray(cam.K),
                                 jnp.asarray(Rs[1]), jnp.asarray(Ts[1]),
                                 64, 64)
    pix1, _, _ = pcd_mod.project(jnp.asarray(pts) + flow, jnp.asarray(cam.K),
                                 jnp.asarray(Rs[1]), jnp.asarray(Ts[1]),
                                 64, 64)
    err = np.abs(np.asarray(pix1 - pix0) - gts[1])[:, valids[1]]
    assert np.median(err) < 1.0, np.median(err)


def test_hint_densification_and_smoothing():
    mask = np.zeros((32, 32), np.float32)
    mask[16:, :] = 1.0
    dense = densify_hints(np.array([[8.0, 24.0]]), np.array([[8.0, 80.0]]),
                          mask, 32, 32)
    d = np.asarray(dense)
    assert d[24, 8, 1] > 0.5            # +y motion at the hint ((80-24)/50)
    assert np.all(d[:16] == 0)          # masked out above
    sm = np.asarray(smooth_and_mask_flow(dense, jnp.asarray(mask)))
    assert np.all(sm[:16] == 0)
    assert abs(np.abs(sm).max() - np.abs(d).max()) < 1e-4  # rescaled


def test_flow_viz():
    assert make_colorwheel().shape == (55, 3)
    flow = np.zeros((2, 8, 8), np.float32)
    flow[0, :, :] = 1.0
    img = flow2img(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8


@pytest.mark.parity
def test_stage1_to_stage2_handoff(tmp_path):
    """Full stage 1 on a tiny synthetic input, then stage-2 scene loading."""
    from PIL import Image
    scene_dir = tmp_path / "scene_t"
    (scene_dir / "image_json").mkdir(parents=True)
    W, H = 64, 48
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    img[:H // 3] = [100, 150, 250]       # sky-ish band
    Image.fromarray(img).save(scene_dir / "image.png")
    mask = np.zeros((H, W), np.uint8)
    mask[H // 2:, :] = 255
    Image.fromarray(mask).save(scene_dir / "image_json" / "mask.png")
    hints = {"shapes": [{"label": "hint1",
                         "points": [[10, 40], [20, 44]]}]}
    (scene_dir / "image.json").write_text(json.dumps(hints))

    import train_motion
    train_motion.main(["--input_dir", str(scene_dir),
                       "--train_iteration", "20", "--n_frames", "6"])

    mom = scene_dir / "MOM"
    assert (mom / "train_data.pth").exists()
    assert (mom / "scene_flow.pth").exists()
    assert (mom / "video" / "sampled_video.mp4").exists()
    assert len(list((mom / "Flow_viz").glob("*.png"))) > 0

    from mom_tpu.data.scene import load_scene
    scene = load_scene(str(mom / "train_data.pth"))
    # at tiny test resolutions the fixed focal (582.69) yields a ~5 deg FOV,
    # so wide-yaw views get culled (the reference's none_idx path) — require
    # at least the hemisphere views around the identity pose
    n_frames = len(scene.train_cams)
    assert 5 <= n_frames <= 25
    assert len(scene.train2_cams) == 6 + n_frames
    assert scene.point_cloud.points.shape == (W * H, 3)
    assert scene.scene_flow.shape == (W * H, 3)
    assert scene.cameras_extent > 0


def test_densify_hints_matches_reference_math():
    """Exact port check vs generate_mask_hints_from_user's densification
    (demo.py:78-97) re-implemented with torch ops."""
    import torch
    height = width = 40
    mask = np.zeros((height, width), np.float32)
    mask[10:, :] = 1.0
    hs = np.array([[5.0, 15.0], [30.0, 30.0]], np.float32)
    he = np.array([[5.0, 65.0], [20.0, 30.0]], np.float32)
    seed = 3
    dense = np.asarray(densify_hints(hs, he, mask, height, width,
                                     rng=np.random.RandomState(seed)))

    # torch replica
    rng = np.random.RandomState(seed)
    m = len(hs)
    sigma = float(rng.randint(height // (2 * m), int(height // (m / 2))))
    hint_motion = torch.tensor((he - hs).T[None] / 50.0)
    xs = torch.linspace(0, width - 1, width).view(1, 1, width).repeat(1, height, 1)
    ys = torch.linspace(0, height - 1, height).view(1, height, 1).repeat(1, 1, width)
    xys = torch.cat((xs, ys), 1).view(2, -1)
    num = torch.zeros(1, 2, height * width)
    den = torch.zeros(1, 2, height * width)
    for k in range(m):
        hx, hy = int(hs[k][0]), int(hs[k][1])
        dist = ((xys - xys.view(2, height, width)[:, hy, hx].unsqueeze(1)) ** 2).sum(0, True).sqrt()
        w = (-(dist / sigma) ** 2).exp().unsqueeze(0)
        num += w * hint_motion[:, :, k].unsqueeze(2)
        den += w
    den[den == 0.0] = 1.0
    ref = (num / den).view(1, 2, height, width) * torch.tensor(mask).bool()
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(dense, ref, atol=1e-5)


@pytest.mark.parity
def test_spade_flow_backend_end_to_end():
    """FlowEstimator(backend='spade') with random weights: full 768^2
    pre/post-processing path produces a masked native-res flow."""
    from mom_tpu.motion.flow import FlowEstimator
    est = FlowEstimator(backend="spade")
    H, W = 96, 128
    img = np.random.RandomState(0).rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W), np.float32)
    mask[H // 2:, :] = 1.0
    flow = est.estimate(img, mask, [[10.0, 80.0]], [[10.0, 120.0]], seed=1)
    assert flow.shape == (1, 2, H, W)
    assert np.isfinite(flow).all()
    # flow vanishes far outside the (area-downsampled, re-upsampled) mask
    assert np.abs(flow[0, :, :H // 4]).max() < np.abs(flow).max() * 0.2
