"""PLY IO with the exact reference attribute order — a north-star
compatibility requirement (gaussian_model.py:300-312, 342-360):

  x, y, z, nx, ny, nz, f_dc_0..2, f_rest_0..44, opacity,
  scale_0..2, rot_0..3   (all float32, binary_little_endian)

f_dc/f_rest are channel-major flattenings of the (N, K, 3) coefficient
arrays after transpose(1, 2) (gaussian_model.py:347-348).

Written with a direct numpy structured array (no plyfile dependency on the
write path; read supports both our files and reference-written ones)."""

from __future__ import annotations

import io
import os

import numpy as np


def attribute_names(n_rest: int = 45):
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(n_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_gaussian_ply(path: str, xyz: np.ndarray, features_dc: np.ndarray,
                      features_rest: np.ndarray, opacity: np.ndarray,
                      scaling: np.ndarray, rotation: np.ndarray):
    """All arrays are raw (pre-activation) parameters of the N alive points.
    features_dc (N, 1, 3), features_rest (N, K, 3)."""
    n = xyz.shape[0]
    f_dc = np.transpose(features_dc, (0, 2, 1)).reshape(n, -1)
    f_rest = np.transpose(features_rest, (0, 2, 1)).reshape(n, -1)
    normals = np.zeros_like(xyz)
    attrs = np.concatenate(
        [xyz, normals, f_dc, f_rest, opacity.reshape(n, -1), scaling,
         rotation], axis=1).astype("<f4")
    names = attribute_names(f_rest.shape[1])
    assert attrs.shape[1] == len(names), (attrs.shape, len(names))

    os.makedirs(os.path.dirname(path), exist_ok=True)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header"]
    rec = np.core.records.fromarrays(attrs.T, names=",".join(names),
                                     formats=",".join(["<f4"] * len(names)))
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        rec.tofile(f)


def load_gaussian_ply(path: str, max_sh_degree: int = 3):
    """Returns dict with xyz (N,3), features_dc (N,1,3), features_rest
    (N,K,3), opacity (N,1), scaling (N,3), rotation (N,4) — mirror of
    load_ply (gaussian_model.py:367-407).  Uses plyfile for robustness to
    reference-written files."""
    from plyfile import PlyData
    plydata = PlyData.read(path)
    v = plydata.elements[0]
    xyz = np.stack([np.asarray(v["x"]), np.asarray(v["y"]),
                    np.asarray(v["z"])], axis=1)
    n = xyz.shape[0]
    opacity = np.asarray(v["opacity"])[:, None]

    f_dc = np.zeros((n, 3, 1), np.float32)
    for i in range(3):
        f_dc[:, i, 0] = np.asarray(v[f"f_dc_{i}"])

    rest_names = sorted((p.name for p in v.properties
                         if p.name.startswith("f_rest_")),
                        key=lambda x: int(x.split("_")[-1]))
    assert len(rest_names) == 3 * (max_sh_degree + 1) ** 2 - 3
    f_rest = np.zeros((n, len(rest_names)), np.float32)
    for i, name in enumerate(rest_names):
        f_rest[:, i] = np.asarray(v[name])
    f_rest = f_rest.reshape(n, 3, (max_sh_degree + 1) ** 2 - 1)

    scale_names = sorted((p.name for p in v.properties
                          if p.name.startswith("scale_")),
                         key=lambda x: int(x.split("_")[-1]))
    scaling = np.stack([np.asarray(v[name]) for name in scale_names], axis=1)
    rot_names = sorted((p.name for p in v.properties
                        if p.name.startswith("rot")),
                       key=lambda x: int(x.split("_")[-1]))
    rotation = np.stack([np.asarray(v[name]) for name in rot_names], axis=1)

    return {
        "xyz": xyz.astype(np.float32),
        "features_dc": np.transpose(f_dc, (0, 2, 1)).astype(np.float32),
        "features_rest": np.transpose(f_rest, (0, 2, 1)).astype(np.float32),
        "opacity": opacity.astype(np.float32),
        "scaling": scaling.astype(np.float32),
        "rotation": rotation.astype(np.float32),
    }
