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
    header_str = "\n".join(header) + "\n"
    # contiguous float32 rows are already the exact binary vertex layout;
    # prefer the buffered native writer for the multi-hundred-MB artifacts
    from .. import native
    if not native.ply_write(path, header_str, attrs):
        with open(path, "wb") as f:
            f.write(header_str.encode("ascii"))
            f.write(np.ascontiguousarray(attrs).tobytes())


_PLY_TYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}


def read_ply_vertices(path: str):
    """Minimal binary_little_endian PLY vertex reader (no plyfile
    dependency).  Returns a numpy structured array."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l for l in header if l.startswith("format")).split()[1]
        assert fmt == "binary_little_endian", fmt
        n = int(next(l for l in header
                     if l.startswith("element vertex")).split()[-1])
        props = []
        in_vertex = False
        for line in header:
            if line.startswith("element"):
                in_vertex = line.startswith("element vertex")
            elif line.startswith("property") and in_vertex:
                _, ptype, name = line.split()
                props.append((name, _PLY_TYPES[ptype]))
        dtype = np.dtype(props)
        return np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)


def load_gaussian_ply(path: str, max_sh_degree: int = 3):
    """Returns dict with xyz (N,3), features_dc (N,1,3), features_rest
    (N,K,3), opacity (N,1), scaling (N,3), rotation (N,4) — mirror of
    load_ply (gaussian_model.py:367-407)."""
    v = read_ply_vertices(path)
    names = v.dtype.names
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1)
    n = xyz.shape[0]
    opacity = np.asarray(v["opacity"])[:, None]

    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)[..., None]

    rest_names = sorted((name for name in names
                         if name.startswith("f_rest_")),
                        key=lambda x: int(x.split("_")[-1]))
    assert len(rest_names) == 3 * (max_sh_degree + 1) ** 2 - 3
    f_rest = np.stack([v[name] for name in rest_names], axis=1)
    f_rest = f_rest.reshape(n, 3, (max_sh_degree + 1) ** 2 - 1)

    scale_names = sorted((name for name in names if name.startswith("scale_")),
                         key=lambda x: int(x.split("_")[-1]))
    scaling = np.stack([v[name] for name in scale_names], axis=1)
    rot_names = sorted((name for name in names if name.startswith("rot")),
                       key=lambda x: int(x.split("_")[-1]))
    rotation = np.stack([v[name] for name in rot_names], axis=1)

    return {
        "xyz": xyz.astype(np.float32),
        "features_dc": np.transpose(f_dc, (0, 2, 1)).astype(np.float32),
        "features_rest": np.transpose(f_rest, (0, 2, 1)).astype(np.float32),
        "opacity": opacity.astype(np.float32),
        "scaling": scaling.astype(np.float32),
        "rotation": rotation.astype(np.float32),
    }
