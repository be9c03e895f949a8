"""Point-cloud multi-view synthesis — the device-side replacement for
render_PCD (train_motion.py:211-366).

The reference re-renders the unprojected point cloud from 25 synthetic poses
with scipy.interpolate.griddata (Delaunay linear interpolation over all
H*W scattered points — the dominant CPU hot loop, SURVEY.md §3.1).  Here the
resampling is a z-weighted bilinear forward splat + normalization + hole
filling, fully jitted and batched over views; the mask morphology
(maximum_filter 9x9 then minimum_filter 11x11, train_motion.py:310-316) maps
to lax.reduce_window.

Geometry (camera intrinsics/pose algebra) matches the reference exactly:
- K with focal 582.69 * aspect (train_motion.py:47-62)
- unprojection through K^-1 at pose 0 (train_motion.py:220-222)
- pose composition Rw2j = Ri2j Rw2i, Tw2j = Ri2j Tw2i + Ti2j and the
  yz-flip c2w export (train_motion.py:276-283)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

FOCAL = 5.8269e+02
YZ_REVERSE = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)


class CameraModel(NamedTuple):
    K: np.ndarray        # (3, 3)
    W: int
    H: int
    fovx: float
    fovy: float


def camera_model(width: int, height: int) -> CameraModel:
    aspect = width / height
    fx = FOCAL * aspect
    fy = FOCAL
    K = np.array([[fx, 0.0, width / 2],
                  [0.0, fy, height / 2],
                  [0.0, 0.0, 1.0]], np.float32)
    fovx = 2 * np.arctan(width / (2 * fx))
    fovy = 2 * np.arctan(height / (2 * fy))
    return CameraModel(K=K, W=width, H=height, fovx=float(fovx),
                       fovy=float(fovy))


def unproject(depth: np.ndarray, cam: CameraModel,
              R0=None, T0=None) -> np.ndarray:
    """(H, W) depth -> (3, H*W) world points (train_motion.py:220-222)."""
    H, W = depth.shape
    x, y = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    pix = np.stack([x * depth, y * depth, depth], 0).reshape(3, -1)
    pts_cam = np.linalg.inv(cam.K) @ pix
    if R0 is None:
        return pts_cam.astype(np.float32)
    R0inv = np.linalg.inv(R0)
    return (R0inv @ pts_cam - R0inv @ T0).astype(np.float32)


def compose_pose(render_poses, internal_poses, i: int, j: int):
    """(Rw2j (3,3), Tw2j (3,1)) for pose pair (i, j)
    (train_motion.py:271-277)."""
    Rw2i = render_poses[i, :3, :3]
    Tw2i = render_poses[i, :3, 3:4]
    Ri2j = internal_poses[j, :3, :3]
    Ti2j = internal_poses[j, :3, 3:4]
    Rw2j = Ri2j @ Rw2i
    Tw2j = Ri2j @ Tw2i + Ti2j
    return Rw2j, Tw2j


def c2w_export(Rw2j, Tw2j) -> np.ndarray:
    """The yz-flipped camera-to-world stored in train_data
    (train_motion.py:279-283)."""
    Rj2w = (YZ_REVERSE @ Rw2j).T
    Tj2w = -Rj2w @ (YZ_REVERSE @ Tw2j)
    P = np.concatenate([Rj2w, Tj2w], axis=1)
    return np.concatenate([P, np.array([[0, 0, 0, 1.0]])], axis=0)


def project(points: jnp.ndarray, K: jnp.ndarray, Rw2j: jnp.ndarray,
            Tw2j: jnp.ndarray, width: int, height: int):
    """(3, N) world points -> (pix (2, N), z (N,), valid (N,))
    (train_motion.py:285-297)."""
    cam = Rw2j @ points + Tw2j
    hom = K @ cam
    z = hom[2]
    u = hom[0] / z
    v = hom[1] / z
    valid = (z > 0) & (u >= 0) & (u <= width - 1) & (v >= 0) & (v <= height - 1)
    return jnp.stack([u, v]), z, valid


def _box_filter(x: jnp.ndarray, size: int, op: str) -> jnp.ndarray:
    """maximum_filter / minimum_filter over (H, W) (scipy semantics:
    reflect-ish borders; the reference masks interiors so border mode is
    immaterial — we use the identity element padding)."""
    if op == "max":
        init, fn = -jnp.inf, jax.lax.max
    else:
        init, fn = jnp.inf, jax.lax.min
    return jax.lax.reduce_window(x, init, fn, (size, size), (1, 1), "SAME")


def make_view_renderer(width: int, height: int):
    """Builds the jitted single-view splat renderer (shapes static)."""

    @jax.jit
    def render_view(points, colors, mask_colors, K, Rw2j, Tw2j):
        """points (3, N) world; colors/mask_colors (N, 3) in [0,1].
        Returns (rgb (H,W,3), mask_img (H,W,3), none_flag)."""
        pix, z, valid = project(points, K, Rw2j, Tw2j, width, height)
        u, v = pix[0], pix[1]

        # z-weighted bilinear forward splat (soft visibility: nearer points
        # dominate; the reference's griddata has no visibility at all)
        wz = jnp.where(valid, 1.0 / jnp.maximum(z, 1e-3) ** 2, 0.0)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = u - u0
        fv = v - v0

        flat_acc_rgb = jnp.zeros((height * width, 3))
        flat_acc_msk = jnp.zeros((height * width, 3))
        flat_w = jnp.zeros(height * width)
        hit = jnp.zeros(height * width)

        for du, dv, wgt in ((0, 0, (1 - fu) * (1 - fv)),
                            (1, 0, fu * (1 - fv)),
                            (0, 1, (1 - fu) * fv),
                            (1, 1, fu * fv)):
            uu = jnp.clip(u0 + du, 0, width - 1).astype(jnp.int32)
            vv = jnp.clip(v0 + dv, 0, height - 1).astype(jnp.int32)
            idx = vv * width + uu
            w = wgt * wz
            flat_acc_rgb = flat_acc_rgb.at[idx].add(w[:, None] * colors)
            flat_acc_msk = flat_acc_msk.at[idx].add(w[:, None] * mask_colors)
            flat_w = flat_w.at[idx].add(w)

        # nearest-pixel hit map (reference: round + maximum_filter 9x9,
        # train_motion.py:310-312)
        ur = jnp.clip(jnp.round(u), 0, width - 1).astype(jnp.int32)
        vr = jnp.clip(jnp.round(v), 0, height - 1).astype(jnp.int32)
        hit = hit.at[vr * width + ur].add(jnp.where(valid, 1.0, 0.0))

        wsafe = jnp.maximum(flat_w, 1e-8)
        rgb = (flat_acc_rgb / wsafe[:, None]).reshape(height, width, 3)
        msk = (flat_acc_msk / wsafe[:, None]).reshape(height, width, 3)
        covered = (flat_w > 1e-6).reshape(height, width)

        # hole filling: iterative neighborhood averaging of uncovered pixels
        def fill(carry, _):
            img, cov = carry
            covf = cov.astype(jnp.float32)
            num = _box_sum(img * covf[..., None], 3)
            den = _box_sum(covf, 3)
            filled = jnp.where((cov[..., None]) | (den[..., None] < 1e-6),
                               img, num / jnp.maximum(den, 1e-6)[..., None])
            return (filled, cov | (den > 1e-6)), None

        (rgb, _), _ = jax.lax.scan(fill, (rgb, covered), None, length=6)
        (msk, _), _ = jax.lax.scan(fill, (msk, covered), None, length=6)

        # reference mask morphology: 9x9 dilation of the hit map, content
        # where dilated; then 11x11 erosion of the coverage
        hitmap = (hit.reshape(height, width) > 0).astype(jnp.float32)
        dil = _box_filter(hitmap, 9, "max")
        rgb = jnp.where(dil[..., None] > 0, rgb, -1.0)
        interior = _box_filter((rgb.sum(-1) != -3.0).astype(jnp.float32),
                               11, "min")
        rgb = jnp.where(interior[..., None] > 0, rgb, 0.0)

        mskm = jnp.where(dil[..., None] > 0, msk, -1.0)
        interior_m = _box_filter((mskm.sum(-1) != -3.0).astype(jnp.float32),
                                 11, "min")
        mskm = jnp.where(interior_m[..., None] > 0, mskm, 0.0)

        none_flag = jnp.sum(valid) == 0
        return jnp.clip(rgb, 0, 1), jnp.clip(mskm, 0, 1), none_flag

    return render_view


def _box_sum(x: jnp.ndarray, size: int) -> jnp.ndarray:
    pads = "SAME"
    if x.ndim == 2:
        return jax.lax.reduce_window(x, 0.0, jax.lax.add, (size, size),
                                     (1, 1), pads)
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (size, size, 1),
                                 (1, 1, 1), pads)
