"""Checkpoint IO.

Two families, mirroring the reference (SURVEY.md §5 checkpoint/resume):

1. Inference artifacts under point_cloud/iteration_N/ — cross-compatible
   with the reference loaders:
   - point_cloud.ply          (data/ply.py, exact attribute order)
   - deformation.pth          torch state dict with the reference's key
                              names (deform_network, scene/deformation.py)
   - deformation_table.pth / deformation_accum.pth / scene_flow.pth
2. Fast native training checkpoints (chkpnt_{stage}_{iter}.npz) holding the
   full TrainState for exact resume (replaces gaussians.capture(),
   gaussian_model.py:72-91; also used by the NaN-rewind guard that replaces
   the reference's os.execv restart, train_4DGS.py:224-226).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch-compatible deformation state dict

def _torch():
    import torch
    return torch


def deformation_to_torch_state(deform_params: dict, deform_cfg) -> dict:
    """Our pytree -> reference deform_network state_dict keys.  Linear
    weights transpose to torch's (out, in) layout."""
    torch = _torch()
    t = lambda x: torch.tensor(np.asarray(x))
    sd = {}

    def put_linear(prefix, lin):
        sd[f"{prefix}.weight"] = t(np.asarray(lin["w"]).T)
        sd[f"{prefix}.bias"] = t(lin["b"])

    # timenet = Sequential(Linear@0, ReLU@1, Linear@2)
    put_linear("timenet.0", deform_params["timenet"][0])
    put_linear("timenet.2", deform_params["timenet"][1])

    # buffers registered on deform_network (deformation.py:183-186)
    sd["time_poc"] = t([2.0 ** i for i in range(4)])
    sd["pos_poc"] = t([2.0 ** i for i in range(10)])
    sd["rotation_scaling_poc"] = t([2.0 ** i for i in range(2)])
    sd["opacity_poc"] = t([2.0 ** i for i in range(2)])

    # grids: ModuleList of ParameterLists -> grids.{scale}.{plane}
    grid = deform_params["grid"]
    for si, planes in enumerate(grid["grids"]):
        for pi, plane in enumerate(planes):
            sd[f"deformation_net.grid.grids.{si}.{pi}"] = t(
                np.asarray(plane)[None])        # reference keeps a leading 1
    sd["deformation_net.grid.aabb"] = t(grid["aabb"])

    # feature_out Linears at even indices
    for i, lin in enumerate(deform_params["feature_out"]):
        put_linear(f"deformation_net.feature_out.{2 * i}", lin)

    # heads: Sequential(ReLU@0, Linear@1, ReLU@2, Linear@3)
    for name in ("pos_deform", "scales_deform", "rotations_deform",
                 "opacity_deform", "shs_deform"):
        put_linear(f"deformation_net.{name}.1", deform_params[name][0])
        put_linear(f"deformation_net.{name}.3", deform_params[name][1])
    # optional branches (scene/deformation.py:30-33)
    if "empty_voxel" in deform_params:
        ev = deform_params["empty_voxel"]
        sd["deformation_net.empty_voxel.grid"] = t(np.asarray(ev["grid"])[None])
        sd["deformation_net.empty_voxel.xyz_min"] = t(ev["xyz_min"])
        sd["deformation_net.empty_voxel.xyz_max"] = t(ev["xyz_max"])
    if "static_mlp" in deform_params:
        put_linear("deformation_net.static_mlp.1",
                   deform_params["static_mlp"][0])
        put_linear("deformation_net.static_mlp.3",
                   deform_params["static_mlp"][1])
    return sd


def deformation_from_torch_state(sd: dict, deform_params_template: dict) -> dict:
    """Reference state dict -> our pytree (shapes validated against the
    template built by init_deformation)."""
    a = lambda x: jnp.asarray(np.asarray(x), jnp.float32)

    def get_linear(prefix):
        return {"w": a(sd[f"{prefix}.weight"]).T, "b": a(sd[f"{prefix}.bias"])}

    out = dict(deform_params_template)
    out["timenet"] = [get_linear("timenet.0"), get_linear("timenet.2")]
    grids = []
    si = 0
    while f"deformation_net.grid.grids.{si}.0" in sd:
        planes = []
        pi = 0
        while f"deformation_net.grid.grids.{si}.{pi}" in sd:
            planes.append(a(sd[f"deformation_net.grid.grids.{si}.{pi}"])[0])
            pi += 1
        grids.append(planes)
        si += 1
    out["grid"] = {"grids": grids,
                   "aabb": a(sd["deformation_net.grid.aabb"])}
    out["feature_out"] = [
        get_linear(f"deformation_net.feature_out.{2 * i}")
        for i in range(len(deform_params_template["feature_out"]))]
    for name in ("pos_deform", "scales_deform", "rotations_deform",
                 "opacity_deform", "shs_deform"):
        out[name] = [get_linear(f"deformation_net.{name}.1"),
                     get_linear(f"deformation_net.{name}.3")]
    if "deformation_net.empty_voxel.grid" in sd:
        out["empty_voxel"] = {
            "grid": a(sd["deformation_net.empty_voxel.grid"])[0],
            "xyz_min": a(sd["deformation_net.empty_voxel.xyz_min"]),
            "xyz_max": a(sd["deformation_net.empty_voxel.xyz_max"]),
        }
    if "deformation_net.static_mlp.1.weight" in sd:
        out["static_mlp"] = [get_linear("deformation_net.static_mlp.1"),
                             get_linear("deformation_net.static_mlp.3")]
    return out


# ---------------------------------------------------------------------------
# inference artifact save/load (scene/__init__.py:91-94, gaussian_model.py
# save_deformation :336-340 / load_model :321-334)

def save_point_cloud_dir(dirpath: str, gauss_state, deform_params,
                         deform_cfg):
    from .ply import save_gaussian_ply
    torch = _torch()
    os.makedirs(dirpath, exist_ok=True)
    alive = np.asarray(gauss_state.aux.alive)
    p = chunked_device_get(gauss_state.params)
    save_gaussian_ply(
        os.path.join(dirpath, "point_cloud.ply"),
        p.xyz[alive], p.features_dc[alive],
        p.features_rest[alive], p.opacity[alive],
        p.scaling[alive], p.rotation[alive])
    torch.save(deformation_to_torch_state(deform_params, deform_cfg),
               os.path.join(dirpath, "deformation.pth"))
    torch.save(torch.tensor(np.asarray(gauss_state.aux.deformation_table)[alive]),
               os.path.join(dirpath, "deformation_table.pth"))
    torch.save(torch.tensor(np.asarray(gauss_state.aux.deformation_accum)[alive]),
               os.path.join(dirpath, "deformation_accum.pth"))
    torch.save(torch.tensor(np.asarray(gauss_state.aux.scene_flow)[alive]),
               os.path.join(dirpath, "scene_flow.pth"))


def load_point_cloud_dir(dirpath: str, capacity: int,
                         deform_params_template: dict):
    """Returns (GaussianState, deform_params)."""
    from .ply import load_gaussian_ply
    from ..models import gaussians as G
    torch = _torch()
    d = load_gaussian_ply(os.path.join(dirpath, "point_cloud.ply"))
    n = d["xyz"].shape[0]
    assert n <= capacity, (n, capacity)

    def padded(x, fill):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = G.GaussianParams(
        xyz=padded(d["xyz"], G.DEAD_XYZ),
        features_dc=padded(d["features_dc"], 0.0),
        features_rest=padded(d["features_rest"], 0.0),
        scaling=padded(d["scaling"], G.DEAD_SCALE),
        rotation=padded(d["rotation"], 0.0).at[n:, 0].set(1.0),
        opacity=padded(d["opacity"], G.DEAD_OPACITY),
    )
    sf = torch.load(os.path.join(dirpath, "scene_flow.pth"),
                    map_location="cpu", weights_only=False)
    sf = np.asarray(sf.detach() if hasattr(sf, "detach") else sf, np.float32)
    if sf.shape[0] == 3 and sf.shape[0] != n:
        sf = sf.T
    aux = G.GaussianAux(
        alive=jnp.zeros(capacity, bool).at[:n].set(True),
        scene_flow=padded(sf[:n], 0.0),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        deformation_accum=jnp.zeros((capacity, 3), jnp.float32),
        deformation_table=jnp.ones(capacity, bool),
    )
    sd = torch.load(os.path.join(dirpath, "deformation.pth"),
                    map_location="cpu", weights_only=False)
    deform = deformation_from_torch_state(sd, deform_params_template)
    return G.GaussianState(params=params, aux=aux), deform


# ---------------------------------------------------------------------------
# native full-state checkpoints

_PULL_CHUNK_BYTES = 32 * 1024 * 1024


def chunked_device_get(tree):
    """device->host pull in <=32MB slices.  Monolithic ~GB transfers can
    wedge this machine's remote-TPU tunnel indefinitely; slicing bounds each
    transfer message (and each slice is an independent device op)."""
    def fetch(thunk):
        # each slice is a small device allocation; under transient HBM
        # pressure (e.g. a concurrent warm compile's workspace) it can
        # raise RESOURCE_EXHAUSTED — back off and retry instead of killing
        # the snapshot worker
        for attempt in range(6):
            try:
                return np.asarray(thunk())
            except Exception as e:                            # noqa: BLE001
                if "RESOURCE_EXHAUSTED" not in str(e) or attempt == 5:
                    raise
                import time as _t
                _t.sleep(5.0 * (attempt + 1))

    def pull(x):
        if not hasattr(x, "nbytes") or x.nbytes <= _PULL_CHUNK_BYTES \
                or x.ndim == 0:
            return fetch(lambda: x)
        rows_per = max(int(_PULL_CHUNK_BYTES
                           // max(x.nbytes // x.shape[0], 1)), 1)
        out = np.empty(x.shape, np.dtype(x.dtype))
        for i in range(0, x.shape[0], rows_per):
            out[i:i + rows_per] = fetch(
                lambda i=i: x[i:i + rows_per])
        return out

    return jax.tree.map(pull, tree)


def save_train_state(path: str, state, extra: dict | None = None):
    """Accepts device OR host (numpy) leaves; written atomically (tmp +
    rename) so a kill mid-write can never leave a truncated checkpoint the
    watchdog would then try to resume from."""
    flat, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": x for i, x in enumerate(chunked_device_get(flat))}
    if extra:
        arrays.update({f"extra_{k}": np.asarray(v) for k, v in extra.items()})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # dot-prefixed tmp name so the watchdog's chkpnt_*_*.npz resume glob
    # can never pick up a half-written file
    d, base = os.path.split(path)
    tmp = os.path.join(d, "." + base + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_train_state(path: str, state_template):
    """Returns (state with HOST numpy leaves, extra).  Leaves stay on the
    host so the caller can free the template's device buffers BEFORE any
    upload (halves peak HBM on resume); jitted entry points upload numpy
    inputs on first use."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree.flatten(state_template)
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    extra = {k[len("extra_"):]: data[k] for k in data.files
             if k.startswith("extra_")}
    return jax.tree.unflatten(treedef, leaves), extra


_POINT_GROUPS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


def compact_train_state(state, headroom: float = 2.5,
                        min_capacity: int = 65_536, align: int = 1024):
    """Shrink a (host-leaf) TrainState's point capacity to
    ~``headroom * num_alive`` by gathering the alive rows to the front.

    The fixed-capacity design (models/gaussians.py) keeps every per-point
    buffer at the stage-entry high-water mark so jitted shapes never change
    — but after a big prune (e.g. the reference's iteration-8000 pruning,
    train_4DGS.py:279: 921k -> 96k alive on the demo scene) that makes
    every sort/gather/deform/Adam pass do ~10x dead work.  The reference
    reallocates its torch tensors instead (gaussian_model.py:424-509).
    Re-basing capacity at RESUME time is the jit-native equivalent: all
    programs compile at the new static shapes after this returns, and the
    ``headroom`` keeps free slots for densification regrowth (a saturated
    densify is a graceful no-op for the extra candidates).

    Row order is preserved, Adam moments and densification stats follow
    their rows, deformation-field groups are untouched.  Returns
    ``(state, compacted: bool)``; no-op when the shrink would not at least
    halve the capacity (hysteresis — a recompile costs minutes through a
    remote-TPU tunnel)."""
    gauss = state.gauss
    C = int(gauss.capacity)
    alive = np.asarray(gauss.aux.alive)
    n = int(alive.sum())
    new_cap = max(int(n * headroom), min_capacity)
    new_cap = ((new_cap + align - 1) // align) * align
    if new_cap >= C // 2:
        return state, False
    idx = np.flatnonzero(alive)

    def take(x):
        x = np.asarray(x)
        assert x.ndim >= 1 and x.shape[0] == C, (x.shape, C)
        out = np.zeros((new_cap,) + x.shape[1:], x.dtype)
        out[:n] = x[idx]
        return out

    new_gauss = jax.tree.map(take, gauss)
    # dead-slot fills match create_from_pcd (invisible even if a mask slips)
    from ..models.gaussians import DEAD_SCALE, DEAD_OPACITY
    p = new_gauss.params
    p.scaling[n:] = DEAD_SCALE
    p.opacity[n:] = DEAD_OPACITY
    adam = state.adam
    new_m = {g: (jax.tree.map(take, v) if g in _POINT_GROUPS else v)
             for g, v in adam.m.items()}
    new_v = {g: (jax.tree.map(take, v) if g in _POINT_GROUPS else v)
             for g, v in adam.v.items()}
    return (state._replace(gauss=new_gauss,
                           adam=adam._replace(m=new_m, v=new_v)),
            True)


def free_device_tree(tree):
    """Explicitly delete every jax.Array buffer in a pytree (the python
    references may be kept alive by closures; .delete() frees HBM now)."""
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                leaf.delete()
            except Exception:
                pass
