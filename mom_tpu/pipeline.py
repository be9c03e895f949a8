"""High-level training / rendering pipeline — the orchestration equivalent of
train_4DGS.py (training(), scene_reconstruction()) and render_4DGS.py
(render_sets()), driving the jitted step functions in train/loop.py."""

from __future__ import annotations

import math
import os
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import config as C
from .cameras import Camera, pack_cameras
from .data.scene import SceneData
from .data import checkpoints as ckpt
from .models import gaussians as G
from .models import deformation as D
from .models.hexplane import HexPlaneConfig
from .render import render as render_fn
from .train import optim
from .train.loop import (TrainState, make_train_step, make_chunked_steps,
                         densify_op, prune_op, reset_opacity_op, Schedule,
                         ViewpointSampler, _params_by_group)
from .utils.timer import Timer


def deform_config_from_hidden(hidden: C.ModelHiddenParams) -> D.DeformConfig:
    kc = hidden.kplanes_config
    grid = HexPlaneConfig(out_dim=kc["output_coordinate_dim"],
                          resolution=tuple(kc["resolution"]),
                          multires=tuple(hidden.multires))
    return D.DeformConfig(
        net_width=hidden.net_width, defor_depth=hidden.defor_depth,
        timebase_pe=hidden.timebase_pe, timenet_width=hidden.timenet_width,
        timenet_output=hidden.timenet_output, grid=grid,
        bounds=hidden.bounds, no_dx=hidden.no_dx, no_ds=hidden.no_ds,
        no_dr=hidden.no_dr, no_do=hidden.no_do, no_dshs=hidden.no_dshs,
        apply_rotation=hidden.apply_rotation,
        empty_voxel=hidden.empty_voxel, static_mlp=hidden.static_mlp)


def pick_capacity(n_init: int, opt_cfg: C.OptimizationParams) -> int:
    cap = max(int(n_init * 1.25), int(opt_cfg.max_gaussians * 1.15))
    return ((cap + 1023) // 1024) * 1024


def _chunk() -> int:
    from .ops.rasterize import CHUNK
    return CHUNK


def default_key_cap_for(n: int, width: int, height: int) -> int:
    # ~4 tiles per gaussian average headroom (binning cost scales with the
    # cap); overflow is monitored and reported every log interval.
    # CHUNK-aligned, not hardcoded 128: bin_gaussians asserts cap % CHUNK
    # (the MOM_TPU_CHUNK=256 sweep configuration trips a 128-only round)
    from .ops.rasterize import CHUNK
    cap = n * 4
    return ((cap + CHUNK - 1) // CHUNK) * CHUNK


class _KeyCapController:
    """Adaptive instance-budget (key_cap) control.

    The CUDA reference sizes its key buffer to each view's EXACT demand
    every iteration (resizeFunctional in rasterize_points.cu — no instance
    is ever dropped).  A static-shape XLA program cannot reallocate per
    step, so the cap adapts on sustained pressure instead; every change
    recompiles the step programs (minutes through the device tunnel — the
    hysteresis keeps changes rare).

    Motivation (round 4, runlogs/full_r4.log): a watchdog restart right
    after the fine-8000 prune recomputed key_cap from the shrunken alive
    count (143k x 4 = 573k) while real demand was ~1.2M and rising; 50-87%
    of instances were depth-dropped every step, train PSNR fell 43 -> 19
    and never recovered.  Conversely the pre-prune segment ran at demand
    8.9M against a 3.69M cap (test PSNR 21 at fine 7000), and the
    post-prune segment binned a 3.69M cap for ~0.7M of demand (5x wasted
    binning work).  Growth fixes the first two; shrink fixes the third.

    grow:   overflow > 5% of cap at 2 consecutive log intervals
            -> cap = 1.3 x demand
    shrink: demand < cap/4 at 8 consecutive log intervals
            -> cap = 1.6 x demand
    (post-change occupancy ~77% / ~62% — both sit far from either
    trigger, so the controller cannot oscillate)
    """

    GROW_N, SHRINK_N = 2, 8
    GROW_MARGIN, SHRINK_MARGIN = 1.3, 1.6

    def __init__(self, cap: int):
        self.cap = int(cap)
        self.max_cap = int(os.environ.get("MOM_TPU_MAX_KEY_CAP",
                                          16_777_216))
        self._grow = self._shrink = 0

    def update(self, instances: int, overflow: int) -> bool:
        """Feed one log-interval observation; True = cap changed (the
        caller must rebuild its jitted step programs)."""
        demand = int(instances) + int(overflow)
        self._grow = self._grow + 1 if overflow > 0.05 * self.cap else 0
        self._shrink = self._shrink + 1 if demand * 4 < self.cap else 0
        new = None
        if self._grow >= self.GROW_N:
            # clamp to a 128-aligned max so the round-up below can't
            # exceed max_cap
            new = min(int(demand * self.GROW_MARGIN),
                      (self.max_cap // _chunk()) * _chunk())
            if new <= self.cap:          # pinned at max_cap
                new = None
                self._grow = 0
        elif self._shrink >= self.SHRINK_N:
            new = int(demand * self.SHRINK_MARGIN)
        if new is None:
            return False
        c = _chunk()
        new = max(((new + c - 1) // c) * c, 1024)
        self._grow = self._shrink = 0
        if new == self.cap:
            return False
        self.cap = new
        return True


def build_initial_state(scene: SceneData, hidden: C.ModelHiddenParams,
                        opt_cfg: C.OptimizationParams, flow_scale: float,
                        seed: int = 6666):
    deform_cfg = deform_config_from_hidden(hidden)
    capacity = pick_capacity(scene.point_cloud.points.shape[0], opt_cfg)
    gauss = G.create_from_pcd(scene.point_cloud.points,
                              scene.point_cloud.colors,
                              scene.scene_flow, flow_scale, capacity)
    deform = D.init_deformation(jax.random.PRNGKey(seed), deform_cfg)
    deform = D.set_deform_aabb(deform, scene.xyz_max, scene.xyz_min)
    groups = _params_by_group(gauss.params, deform)
    adam = optim.init_adam(groups)
    state = TrainState(gauss=gauss, deform=deform, adam=adam,
                       rng=jax.random.PRNGKey(seed))
    return state, deform_cfg, capacity


def stage_cameras(scene: SceneData, stage: str):
    return scene.train_cams if stage == "coarse" else scene.train2_cams


def _gt_stack(cams) -> np.ndarray:
    return np.stack([c.image for c in cams])          # (N, H, W, 3) uint8


class _AsyncSnapshots:
    """Background device->host state pulls for checkpoints and the NaN
    rewind target.

    A full-capacity pull is ~900MB and this machine's device tunnel drains
    it at ~2MB/s: done synchronously (as before) every checkpoint/snapshot
    blocked the training loop for ~8 minutes of device idle.  Instead the
    state is copied ON DEVICE (a cheap HBM copy — the training step donates
    its input buffers, so the copy is what keeps the snapshot stable) and a
    worker thread streams the copy to the host while the main thread keeps
    dispatching training steps; the tunnel's bandwidth drains in parallel
    with compute.  MOM_TPU_SYNC_CKPT=1 restores the synchronous behavior."""

    def __init__(self):
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._last_good = None
        self.sync = os.environ.get("MOM_TPU_SYNC_CKPT") == "1"

    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def join(self):
        if self._thread is not None:
            self._thread.join()

    def submit(self, state, path: str | None = None,
               extra: dict | None = None):
        """Snapshot ``state`` (and write a checkpoint when ``path`` is
        given).  If a previous pull is still draining: plain snapshots are
        skipped (the rewind target just stays a little older), checkpoint
        writes wait for the drain first (the watchdog depends on the file
        existing)."""
        if self.busy():
            if path is None:
                return False
            self.join()

        def _work(snap):
            host = ckpt.chunked_device_get(snap)
            with self._lock:
                self._last_good = host
            if path is not None:
                ckpt.save_train_state(path, host, extra)

        if self.sync:
            _work(state)
            return True
        snap = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
        self._thread = threading.Thread(target=_work, args=(snap,),
                                        daemon=True)
        self._thread.start()
        return True

    def last_good(self):
        """The newest fully-pulled snapshot (blocks for an in-flight pull
        only when there is no completed one yet)."""
        with self._lock:
            if self._last_good is not None:
                return self._last_good
        self.join()
        with self._lock:
            return self._last_good


def scene_reconstruction(state: TrainState, deform_cfg, scene: SceneData,
                         opt_cfg, hidden, pipe, stage: str, final_iter: int,
                         model_path: str, save_iterations=(),
                         video_iterations=(), checkpoint_iterations=(),
                         bg=(0, 0, 0), timer: Timer | None = None,
                         backend: str = "tiled", log_every: int = 100,
                         seed: int = 6666, key_cap: int | None = None,
                         progress=True, test_iterations=(), logger=None,
                         render_process: bool = False, gui=None,
                         first_iter: int = 0):
    """One training stage (train_4DGS.py:48-301).  ``first_iter`` resumes
    mid-stage (iteration-accurate restart for the stall watchdog)."""
    cams = stage_cameras(scene, stage)
    packed = pack_cameras(cams)
    gts = _gt_stack(cams)
    W, H = scene.width, scene.height
    if key_cap is None:
        # base the instance budget on live points, not buffer capacity
        key_cap = default_key_cap_for(int(state.gauss.num_alive), W, H)

    # reference batching: nb views per iteration, loss over the stacked
    # batch, radii max / viewspace-grad sum (train_4DGS.py:172-205)
    nb = max(1, int(getattr(opt_cfg, "batch_size", 1)))
    # non-event iterations run K at a time as one lax.scan program — ~4
    # dispatches per century instead of 100 (make_chunked_steps docstring)
    K = 33

    def _build_steps(cap: int):
        s = make_train_step(opt_cfg, hidden, deform_cfg, W, H, stage,
                            spatial_lr_scale=scene.cameras_extent, bg=bg,
                            key_cap=cap, backend=backend, batch_size=nb)
        return make_chunked_steps(s, K, batch_size=nb)

    # Device-resident training set: upload every packed camera and GT image
    # ONCE; iterations slice their view on device (see the loop below — a
    # per-step ~2.7MB GT upload and a round-trip per dispatch were the
    # production-scale rate limiters on the device tunnel, not compute).
    packed_dev = {k: jnp.asarray(v) for k, v in packed.items()}
    gts_dev = jnp.asarray(gts)
    multistep, step1 = _build_steps(key_cap)
    capctl = _KeyCapController(key_cap)

    def _draw():
        """One iteration's view pick: a scalar at nb=1 (keeps the original
        jit signature), an (nb,) vector otherwise."""
        if nb == 1:
            return sampler.next()
        return np.asarray([sampler.next() for _ in range(nb)], np.int32)
    sched = Schedule(opt_cfg, stage)
    if getattr(opt_cfg, "dataloader", False) and opt_cfg.custom_sampler is not None:
        # FineSampler temporal curriculum (utils/loader_utils.py:20-52,
        # active when opt.dataloader is on)
        from .data.sampler import FineSampler
        n_poses = max(len(scene.train_cams), 1)
        order = list(FineSampler(len(cams), min(n_poses, len(cams)),
                                 seed=seed))

        class _OrderSampler:
            def __init__(self, order):
                self.order = order
                self.i = 0

            def next(self):
                v = self.order[self.i % len(self.order)]
                self.i += 1
                return v

        sampler = _OrderSampler(order)
    else:
        sampler = ViewpointSampler(len(cams), seed=seed)
    timer = timer or Timer()
    timer.start()

    if first_iter == 0:
        # fresh optimizer per stage (training_setup is called per stage,
        # train_4DGS.py:54)
        groups = _params_by_group(state.gauss.params, state.deform)
        state = state._replace(adam=optim.init_adam(groups))
    # else: mid-stage resume — keep the checkpoint's Adam moments (the
    # reference's restore() reloads opt_dict, gaussian_model.py:89-115;
    # re-initializing here caused a cold-Adam transient on every watchdog
    # restart)

    num_alive = int(state.gauss.num_alive)
    sh_degree = min(first_iter // 1000, 3)
    metrics = None
    history = []
    # NaN-rewind baseline: snapshot the stage-entry state so a blow-up before
    # the first periodic snapshot can still rewind.  Pulls stream to the
    # host on a worker thread while training dispatches (_AsyncSnapshots).
    # Submitted AFTER the warm block below: the snapshot's on-device copy
    # (~state-size) overlapping the warm compiles' workspace OOM'd the
    # fine stage at 921k capacity (observed at the coarse->fine
    # transition); warms run on throwaway copies and nothing mutates state
    # before the loop, so the rewind target is identical either way.
    snaps = _AsyncSnapshots()

    # Pre-compile every structural-iteration program this stage will need.
    # Their first use is mid-run (e.g. the fine-3000 opacity reset), and a
    # cold compile there goes out as a multi-minute device RPC; if the
    # tunnel wedges on it, the stall watchdog rewinds to the last
    # checkpoint and replays hundreds of iterations only to hit the same
    # cold compile again.  Warming here moves those compiles into the
    # startup window, where a watchdog restart is nearly free.  The step
    # and the ops donate their state argument, so each warms on a
    # throwaway device copy.
    first_dens = first_prune = first_reset = None
    for it in range(first_iter + 1, final_iter + 1):
        d, p, r = sched.structural_actions(it, num_alive)
        if d and first_dens is None:
            first_dens = it
        if p and first_prune is None:
            first_prune = it
        if r and first_reset is None:
            first_reset = it
        if first_dens and first_prune and first_reset:
            break
    def _warm(name, fn, *args):
        t0 = time.time()
        try:
            # copy only device arrays: wrapping non-array leaves would
            # change the jit signature vs the real call and waste the warm
            copy = jax.tree.map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
                state)
            out = fn(copy, *args)
            jax.block_until_ready(
                jax.tree.leaves(out)[0] if jax.tree.leaves(out) else out)
            del out
            print(f"warm: {name} compiled ({time.time() - t0:.0f}s)",
                  flush=True)
        except Exception as e:                            # noqa: BLE001
            print(f"warm: {name} failed ({e}); will compile lazily",
                  flush=True)

    it0 = jnp.asarray(float(first_iter + 1), jnp.float32)
    sh0 = jnp.asarray(sh_degree, jnp.int32)
    vi0 = jnp.asarray(0 if nb == 1 else np.zeros(nb, np.int32), jnp.int32)

    if (os.environ.get("MOM_TPU_NO_WARM_STRUCTURAL") != "1"
            and first_iter < final_iter):
        # (an already-complete stage — e.g. coarse on a fine-stage resume —
        # must not burn minutes warming programs its loop will never run)
        _warm("multistep (scan x33)",
              lambda s: multistep(s, packed_dev, gts_dev,
                                  jnp.zeros(K if nb == 1 else (K, nb),
                                            jnp.int32), it0, sh0))
        _warm("step",
              lambda s: step1(s, packed_dev, gts_dev, vi0, it0, sh0))
        if first_dens or first_prune or first_reset:
            _warm("frozen step",
                  lambda s: step1(s, packed_dev, gts_dev, vi0, it0, sh0,
                                  freeze_points=True))
        if first_dens is not None:
            _warm("densify", densify_op, sched.thresholds(first_dens)[1],
                  opt_cfg.percent_dense, scene.cameras_extent)
        if first_prune is not None:
            st = sched.size_threshold(first_prune)
            _warm("prune", prune_op, sched.thresholds(first_prune)[0],
                  scene.cameras_extent, st if st is not None else 0.0,
                  st is not None)
        if first_reset is not None:
            _warm("opacity reset", reset_opacity_op)

    if first_iter < final_iter:
        # see the _AsyncSnapshots note above; a completed stage must not
        # stream a ~1GB rewind snapshot it will never use (the pull would
        # drain through the tunnel during the NEXT stage's startup and its
        # device copy would sit on HBM through the warms)
        snaps.submit(state)
    gui_rf = None
    # one-step-lagged NaN probe: the previous iteration's loss is fetched
    # after the current step is dispatched, so the host never blocks on the
    # in-flight step but a NaN is caught within one iteration (the reference
    # checks every iteration, train_4DGS.py:224-226)
    pending = []          # [(iteration, loss array)] awaiting readiness
    # keep the viewpoint sampler's draw sequence aligned on resume
    for _ in range(first_iter * nb):
        sampler.next()

    def _drain_pending(block: bool = False):
        """Check completed losses WITHOUT blocking the dispatch pipeline
        (arr.is_ready() polls); returns the iteration to rewind from, or
        None.  The reference checks synchronously every iteration
        (train_4DGS.py:224-226) — polling gives the same detection with
        zero added device-sync latency (a few iterations of lag at most)."""
        bad = None
        while pending:
            it0, arr = pending[0]
            try:
                ready = arr.is_ready()
            except Exception:
                ready = True
            if not ready and not block:
                break
            if not np.all(np.isfinite(np.asarray(arr))):
                bad = it0
            pending.pop(0)
        return bad

    # Device-resident training set: upload every packed camera and GT image
    # ONCE and slice per iteration ON DEVICE.  The previous per-iteration
    # jnp.asarray(gts[vi]) pushed ~2.7MB (1280x720x3) through the device
    # tunnel every step — on a degraded tunnel that upload, not compute,
    # set the step rate (observed: step time invariant to a 4.4x capacity
    # shrink).  The whole set is ~2.8MB/view * n_views (<250MB) of HBM.
    # Event iterations (logging, structural candidates, eval/save/video/
    # checkpoint, sh bumps, the final iteration) single-step through the
    # same body with the view picked on device; everything else scans.
    def _special(j):
        return (j % log_every == 0 or j % 1000 == 0
                or j % opt_cfg.densification_interval == 0
                or j % opt_cfg.pruning_interval == 0
                or j % opt_cfg.opacity_reset_interval == 0
                or j in test_iterations or j in save_iterations
                or j in video_iterations or j in checkpoint_iterations
                or j >= final_iter)

    def _rewind(bad_iter):
        lg = snaps.last_good()
        if lg is None:
            raise FloatingPointError("non-finite loss with no checkpoint")
        print(f"[{stage} {bad_iter}] loss is non-finite — "
              "rewinding to last good state")
        pending.clear()
        return jax.device_put(lg)

    iteration = first_iter
    while iteration < final_iter:
        if (not render_process and gui is None
                and iteration + K < final_iter
                and not any(_special(j)
                            for j in range(iteration + 1, iteration + K + 1))):
            vis = np.asarray([_draw() for _ in range(K)], np.int32)
            state, losses = multistep(
                state, packed_dev, gts_dev, jnp.asarray(vis),
                jnp.asarray(float(iteration + 1), jnp.float32),
                jnp.asarray(sh_degree, jnp.int32))
            iteration += K
            pending.append((iteration, losses))
            bad_iter = _drain_pending()
            if bad_iter is not None:
                state = _rewind(bad_iter)
            continue

        iteration += 1
        if iteration % 1000 == 0 and sh_degree < 3:
            sh_degree += 1

        vi = _draw()

        candidate = (iteration < opt_cfg.densify_until_iter
                     and (iteration % opt_cfg.densification_interval == 0
                          or iteration % opt_cfg.pruning_interval == 0
                          or iteration % opt_cfg.opacity_reset_interval == 0))
        if candidate:
            num_alive = int(state.gauss.num_alive)
        do_densify, do_prune, do_reset = sched.structural_actions(
            iteration, num_alive)
        structural = do_densify or do_prune or do_reset

        state, metrics = step1(state, packed_dev, gts_dev,
                               jnp.asarray(vi, jnp.int32),
                               jnp.asarray(iteration, jnp.float32),
                               jnp.asarray(sh_degree, jnp.int32),
                               freeze_points=structural)

        pending.append((iteration, metrics["loss"]))
        bad_iter = _drain_pending()
        if bad_iter is not None:
            state = _rewind(bad_iter)
            continue

        if gui is not None:
            if gui_rf is None:
                gui_rf = make_render_jit(state, deform_cfg, W, H, bg,
                                         stage=stage, backend=backend,
                                         key_cap=key_cap)
            _st = state

            def _gui_render(cam, w, h):
                camj = {k: jnp.asarray(v) for k, v in cam.items()}
                return np.asarray(gui_rf(_st.gauss.params, _st.gauss.aux,
                                         _st.deform, camj))
            gui.poll(_gui_render, model_path)

        if iteration % log_every == 0 or iteration == final_iter:
            m = {k: float(v) for k, v in metrics.items()}
            history.append({"iter": iteration, **m})
            if logger is not None:
                from .train.report import training_report
                training_report(logger, iteration, stage,
                                {k: v for k, v in m.items()
                                 if k in ("loss", "l1", "psnr")},
                                num_points=int(m["points"]))
            if progress:
                print(f"[{stage} {iteration}/{final_iter}] "
                      f"loss={m['loss']:.5f} psnr={m['psnr']:.2f} "
                      f"points={int(m['points'])} "
                      f"inst={int(m.get('instances', 0))} "
                      f"overflow={int(m['overflow'])}",
                      flush=True)
            # non-finite losses rewind within a few iterations via the
            # polled probe above (replaces the reference's os.execv restart,
            # train_4DGS.py:224-226); before refreshing the rewind target,
            # drain every outstanding loss (blocking is fine — the log fetch
            # just synced anyway)
            bad_iter = _drain_pending(block=True)
            if bad_iter is not None or not math.isfinite(m["loss"]):
                state = _rewind(bad_iter or iteration)
            elif iteration % 2000 == 0 and not (
                    iteration in checkpoint_iterations
                    or (checkpoint_iterations and iteration == final_iter)):
                # refresh the rewind target (skipped if the previous pull
                # is still draining, and when this iteration's checkpoint
                # write below refreshes it anyway; the NaN probe still
                # detects within a few iterations and rewinds to the older
                # snapshot)
                snaps.submit(state)
            if (bad_iter is None and math.isfinite(m["loss"])
                    and iteration != final_iter  # no steps left to run the
                    # rebuilt programs — skip the minutes-long recompile
                    and capctl.update(int(m.get("instances", 0)),
                                      int(m["overflow"]))):
                demand = int(m.get("instances", 0)) + int(m["overflow"])
                print(f"[{stage} {iteration}] key_cap {key_cap} -> "
                      f"{capctl.cap} (instance demand {demand}) — "
                      "rebuilding step programs", flush=True)
                key_cap = capctl.cap
                multistep, step1 = _build_steps(key_cap)
                gui_rf = None
                # compile NOW (watchdog sees the warm prints + CPU heat)
                # instead of lazily inside the next dispatch
                _warm("multistep (recap)",
                      lambda s: multistep(s, packed_dev, gts_dev,
                                          jnp.zeros(K if nb == 1 else (K, nb),
                                                    jnp.int32), it0, sh0))
                _warm("step (recap)",
                      lambda s: step1(s, packed_dev, gts_dev, vi0, it0, sh0))
                _warm("frozen step (recap)",
                      lambda s: step1(s, packed_dev, gts_dev, vi0, it0, sh0,
                                      freeze_points=True))

        if iteration in test_iterations:
            timer.pause()
            from .train.report import training_report
            test_cams = scene.test_cams
            test_packed = pack_cameras(test_cams)
            test_gts = _gt_stack(test_cams)
            # ONE dispatched program renders + scores every test view
            # (25 views x 4 dispatches each through a remote tunnel would
            # otherwise dominate eval wall-time)
            ev = make_eval_scan(deform_cfg, W, H, bg, stage=stage,
                                backend=backend, key_cap=key_cap)
            l1s, psnrs, ssims, ovfs, insts, brights = ev(
                state.gauss.params, state.gauss.aux, state.deform,
                {k: jnp.asarray(v) for k, v in test_packed.items()},
                jnp.asarray(test_gts))
            result = {"l1": float(jnp.mean(l1s)),
                      "psnr": float(jnp.mean(psnrs)),
                      "ssim": float(jnp.mean(ssims)),
                      "n_views": len(test_cams),
                      "max_overflow": int(jnp.max(ovfs)),
                      "max_instances": int(jnp.max(insts)),
                      "mean_brightness": float(jnp.mean(brights) * 255.0)}
            if logger is not None:
                training_report(logger, iteration, stage, {},
                                eval_result=result)
            else:
                print(f"\n[ITER {iteration}] Evaluating test: "
                      f"L1 {result['l1']:.5f} PSNR {result['psnr']:.2f} "
                      f"SSIM {result['ssim']:.4f}")
            timer.start()

        if render_process and (
                (iteration < 1000 and iteration % 10 == 9)
                or (iteration < 3000 and iteration % 50 == 49)
                or (iteration < 60000 and iteration % 100 == 99)):
            from .utils.snapshots import render_training_image as snap
            from .render import render as render_full
            vi_s = iteration % len(cams)
            camj = {k: jnp.asarray(v[vi_s]) for k, v in packed.items()}
            out = render_full(state.gauss.params, state.gauss.aux,
                              state.deform, deform_cfg, camj, W, H,
                              jnp.asarray(bg, jnp.float32), stage=stage,
                              active_sh_degree=sh_degree, key_cap=key_cap,
                              backend=backend)
            snap(model_path, stage, iteration, timer.get_elapsed_time(),
                 gts[vi_s].astype(np.float32) / 255.0,
                 np.asarray(jnp.clip(out.color, 0, 1)),
                 np.asarray(out.depth), tag="train")

        if iteration in video_iterations:
            timer.pause()
            render_training_videos(model_path, iteration, state, deform_cfg,
                                   scene, stage, bg, backend, key_cap)
            timer.start()

        if iteration in save_iterations:
            timer.pause()
            save_scene(model_path, iteration, state, deform_cfg)
            timer.start()

        # structural ops AFTER logging/eval/saving — the reference saves at
        # saving_iterations (train_4DGS.py:249-251) before the densification
        # block (:264-290), so an iteration-3000 save must capture the
        # pre-opacity-reset state
        if structural:
            opac_th, dens_th = sched.thresholds(iteration)
            size_th = sched.size_threshold(iteration)
            if do_densify:
                state = densify_op(state, dens_th, opt_cfg.percent_dense,
                                   scene.cameras_extent)
            if do_prune:
                state = prune_op(state, opac_th, scene.cameras_extent,
                                 size_th if size_th is not None else 0.0,
                                 size_th is not None)
            if do_reset:
                state = reset_opacity_op(state)
        if (iteration in checkpoint_iterations
                or (checkpoint_iterations and iteration == final_iter)):
            # the stage end always checkpoints when checkpointing is on, so
            # a watchdog restart never replays a completed stage; written
            # by the snapshot worker while training continues (also
            # refreshes the rewind target)
            snaps.submit(
                state,
                os.path.join(model_path, f"chkpnt_{stage}_{iteration}.npz"),
                # key_cap rides along so a watchdog restart can never
                # shrink the instance budget below what the run had
                # established (train_4DGS.py resume path)
                {"iteration": iteration, "key_cap": key_cap})

    # the last checkpoint may still be draining to disk — finish it before
    # the stage returns (the next stage or process exit must see the file)
    snaps.join()
    return state, history


def save_scene(model_path: str, iteration: int, state: TrainState,
               deform_cfg):
    out = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
    print(f"\n[ITER {iteration}] Saving Gaussians to {out}")
    ckpt.save_point_cloud_dir(out, state.gauss, state.deform, deform_cfg)


def make_render_jit(state: TrainState, deform_cfg, W, H, bg, stage="fine",
                    backend="tiled", key_cap=None, uint8=False):
    @jax.jit
    def rf(params, aux, deform, cam):
        out = render_fn(params, aux, deform, deform_cfg, cam, W, H,
                        jnp.asarray(bg, jnp.float32), stage=stage,
                        active_sh_degree=3, delta_scale=1.0,
                        key_cap=key_cap, backend=backend)
        img = jnp.clip(out.color, 0.0, 1.0)
        if uint8:
            # quantize on device: 3x less device->host traffic per frame
            return (img * 255.0 + 0.5).astype(jnp.uint8)
        return img
    return rf


def make_render_scan(deform_cfg, W, H, bg, stage="fine", backend="tiled",
                     key_cap=None, with_stats=False):
    """CHUNK frames per dispatched program: a ``lax.scan`` over a packed
    camera batch returns the whole (K,H,W,3) uint8 stack in one execution.
    Stage-3 rendering then pays one host->device dispatch round-trip per
    chunk instead of per frame — the same cure as the scan-batched training
    loop (through a remote device tunnel the per-dispatch tax, not render
    compute, bounds the delivered FPS).

    with_stats=True additionally returns per-frame (overflow, instances)
    scalars — the round-4 postmortem's missing signal: key_cap overflow
    silently drops the FARTHEST gaussians (ops/rasterize.py bin_gaussians),
    so a saturated render loses its far field with rc=0 unless someone looks
    at these counters."""
    @jax.jit
    def rs(params, aux, deform, packed_cams):
        def body(carry, cam):
            out = render_fn(params, aux, deform, deform_cfg, cam, W, H,
                            jnp.asarray(bg, jnp.float32), stage=stage,
                            active_sh_degree=3, delta_scale=1.0,
                            key_cap=key_cap, backend=backend)
            img = jnp.clip(out.color, 0.0, 1.0)
            img8 = (img * 255.0 + 0.5).astype(jnp.uint8)
            if with_stats:
                return carry, (img8, out.overflow, out.instances)
            return carry, img8
        _, frames = jax.lax.scan(body, 0, packed_cams)
        return frames
    return rs


def make_eval_scan(deform_cfg, W, H, bg, stage="fine", backend="tiled",
                   key_cap=None):
    """One dispatched program renders and scores (L1/PSNR/SSIM) every test
    view via lax.scan; returns per-view metric arrays (same per-view values
    as train.report.evaluate, which remains the per-frame API).

    Also returns per-view (overflow, instances, mean_brightness) health
    counters — eval numbers without them are unauditable (round-4 shipped
    PSNR 13.1 from silently saturated renders)."""
    from .train import losses as L

    @jax.jit
    def ev(params, aux, deform, packed_cams, gts_u8):
        def body(carry, xs):
            cam, gt8 = xs
            out = render_fn(params, aux, deform, deform_cfg, cam, W, H,
                            jnp.asarray(bg, jnp.float32), stage=stage,
                            active_sh_degree=3, delta_scale=1.0,
                            key_cap=key_cap, backend=backend)
            img = jnp.clip(out.color, 0.0, 1.0)
            gt = jnp.clip(gt8.astype(jnp.float32) / 255.0, 0.0, 1.0)
            return carry, (L.l1_loss(img, gt), L.psnr(img, gt),
                           L.ssim(img, gt), out.overflow, out.instances,
                           jnp.mean(img))
        _, ms = jax.lax.scan(body, 0, (packed_cams, gts_u8))
        return ms
    return ev


def render_trajectory(state: TrainState, deform_cfg, cams: list[Camera],
                      W, H, bg, backend="tiled", key_cap=None,
                      rf=None, rs=None, chunk=30, stage="fine",
                      stats=None):
    """Renders a camera list; returns (frames uint8 list, fps).

    Default path: scan-batched (``make_render_scan``), ``chunk`` frames per
    dispatch.  Passing ``rf`` (a per-frame render fn) selects the legacy
    frame-at-a-time path instead (used by the GUI, which renders single
    interactive frames).

    Passing a dict as ``stats`` selects a with_stats scan (the caller must
    NOT also pass a stats-less ``rs``) and fills it with per-frame
    "overflow" / "instances" int arrays plus "mean_brightness" — the health
    counters stage-3 export gates on."""
    if rf is not None:
        return _render_trajectory_per_frame(state, cams, rf)
    chunk = max(1, min(chunk, len(cams)))
    if rs is None:
        rs = make_render_scan(deform_cfg, W, H, bg, stage=stage,
                              backend=backend, key_cap=key_cap,
                              with_stats=stats is not None)
    packed = pack_cameras(cams)
    n = len(cams)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:   # edge-repeat the last camera; extra frames are dropped below
        packed = {k: np.concatenate([v] + [v[-1:]] * pad) for k, v in
                  packed.items()}
    parts = [{k: jnp.asarray(v[j * chunk:(j + 1) * chunk])
              for k, v in packed.items()} for j in range(n_chunks)]
    # warm-up on the first chunk (compile excluded from FPS, matching the
    # reference's warm (len-1)/(t2-t1) timing, render_4DGS.py:61-71)
    jax.block_until_ready(rs(state.gauss.params, state.gauss.aux,
                             state.deform, parts[0]))
    t1 = time.time()
    outs = [rs(state.gauss.params, state.gauss.aux, state.deform, p)
            for p in parts]
    jax.block_until_ready(outs[-1])   # in-order execution: all chunks done
    fps = (n_chunks * chunk) / max(time.time() - t1, 1e-9)
    if stats is not None:
        frames_arr = np.concatenate([np.asarray(o[0]) for o in outs])[:n]
        stats["overflow"] = np.concatenate(
            [np.asarray(o[1]) for o in outs])[:n]
        stats["instances"] = np.concatenate(
            [np.asarray(o[2]) for o in outs])[:n]
        stats["mean_brightness"] = float(frames_arr.mean())
    else:
        frames_arr = np.concatenate([np.asarray(o) for o in outs])[:n]
    return list(frames_arr), fps


def _render_trajectory_per_frame(state, cams, rf):
    """Frame-at-a-time path (explicit ``rf``): async dispatch, renders and
    device->host copies overlap."""
    device_frames = []
    t1 = None
    for i, cam in enumerate(cams):
        camj = {k: jnp.asarray(v) for k, v in cam.pack().items()}
        img = rf(state.gauss.params, state.gauss.aux, state.deform, camj)
        if i == 0:
            img.block_until_ready()
            t1 = time.time()   # exclude frame-0 compile, like a warm run
        device_frames.append(img)
    # FPS is render compute only (the reference synchronizes the stream and
    # prints (len-1)/(t2-t1) before any host save, render_4DGS.py:61-71):
    # block on the LAST queued render — in-order execution means all prior
    # frames are done — then pull to host outside the timed window.
    if device_frames:
        device_frames[-1].block_until_ready()
    t2 = time.time()
    fps = (len(cams) - 1) / max(t2 - t1, 1e-9)
    frames = [np.asarray(f) for f in device_frames]
    if frames and frames[0].dtype != np.uint8:
        # a float rf was passed in: quantize on host (never truncate —
        # round-2's stage-3 export wrote all-black PNGs through this seam)
        frames = [(np.clip(f, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
                  for f in frames]
    return frames, fps


def make_demand_scan(deform_cfg, W, H, stage="fine", bands: int = 1):
    """One dispatched program returns per-frame exact instance demand for a
    packed camera batch (render.instance_demand scanned over frames).  No
    sort, no compositing — deform + preprocess only, so it is cheap to run
    over every frame of every trajectory before any render program is
    compiled."""
    from .render import instance_demand

    @jax.jit
    def ds(params, aux, deform, packed_cams):
        def body(carry, cam):
            return carry, instance_demand(params, aux, deform, deform_cfg,
                                          cam, W, H, stage=stage,
                                          active_sh_degree=3,
                                          delta_scale=1.0, bands=bands)
        _, d = jax.lax.scan(body, 0, packed_cams)
        return d
    return ds


def size_key_cap(max_demand: int, margin: float = 1.15,
                 bucket: float = 1.3) -> int:
    """Round (demand * margin) UP to a coarse geometric bucket of CHUNK
    multiples, so trajectories with similar demand land on the same cap and
    share one compiled render program (each distinct cap is a distinct
    program shape — a multi-minute compile through the device tunnel)."""
    from .ops.rasterize import CHUNK
    need = max(int(max_demand * margin), CHUNK)
    cap = CHUNK
    while cap < need:
        cap = int(cap * bucket)
    return ((cap + CHUNK - 1) // CHUNK) * CHUNK


def trajectory_key_caps(state: TrainState, deform_cfg, scene: SceneData,
                        stage="fine", margin: float = 1.15,
                        bands: int = 1):
    """Exact per-trajectory key_caps: {traj_name: (key_cap, max_demand)}.

    Replaces the blanket alive*mult guess (round-4: mult too small silently
    dropped the far field on out-of-distribution trajectory cameras; large
    enough for the worst trajectory made every other trajectory pay its
    compositing grid).

    ``bands > 1``: key_cap is a TUPLE of per-tile-row-band caps (each sized
    from that band's own measured demand) selecting the banded render path
    (ops/rasterize.py:_rasterize_banded) — smaller per-band grouping sorts
    and packed single-uint32 sort keys at caps where the whole-image key
    no longer fits 32 bits."""
    ds = make_demand_scan(deform_cfg, scene.width, scene.height, stage=stage,
                          bands=bands)
    out = {}
    for name, cams in scene.video_cams.items():
        packed = {k: jnp.asarray(v) for k, v in pack_cameras(cams).items()}
        d = np.asarray(ds(state.gauss.params, state.gauss.aux, state.deform,
                          packed))
        if bands > 1:                                       # d: (K, bands)
            cap = tuple(size_key_cap(int(d[:, b].max()), margin)
                        for b in range(bands))
            out[name] = (cap, int(d.sum(axis=1).max()))
        else:
            out[name] = (size_key_cap(int(d.max()), margin), int(d.max()))
    return out


def render_training_videos(model_path, iteration, state, deform_cfg, scene,
                           stage, bg, backend, key_cap, crop=32):
    """render_video during training (train_4DGS.py:335-352)."""
    from .utils.videoio import write_mp4
    outdir = os.path.join(model_path, "video", f"itrs_{iteration}")
    os.makedirs(outdir, exist_ok=True)
    rs = make_render_scan(deform_cfg, scene.width, scene.height, bg,
                          stage=stage, backend=backend, key_cap=key_cap)
    name_map = {"up-down": "up_down", "side": "side", "zoom-in": "zoom_in",
                "circle": "circle"}
    for name, cams in scene.video_cams.items():
        frames, _ = render_trajectory(state, deform_cfg, cams, scene.width,
                                      scene.height, bg, rs=rs)
        frames = [f[crop:-crop, crop:-crop] for f in frames]
        write_mp4(os.path.join(outdir, name_map[name] + ".mp4"), frames,
                  fps=30, quality=8)


def render_sets(model_path: str, state: TrainState, deform_cfg,
                scene: SceneData, bg=(0, 0, 0), backend="tiled",
                key_cap=None, crop=32):
    """Stage-3 rendering (render_4DGS.py:50-90): 4 trajectories -> PNG frames
    + mp4s, printing FPS."""
    from PIL import Image
    from .utils.videoio import write_mp4
    name_map = {"up-down": "up_down", "side": "side", "zoom-in": "zoom",
                "circle": "circle"}
    # per-trajectory demand-sized key_caps (one cheap demand scan per
    # trajectory, then one render program per distinct cap bucket) unless
    # the caller pinned a cap explicitly
    caps = {}
    if key_cap is None and backend == "tiled":
        from .ops.rasterize import TILE
        bands = int(os.environ.get("MOM_TPU_RENDER_BANDS", "1") or 1)
        bands = max(1, min(bands, (scene.height + TILE - 1) // TILE))
        caps = trajectory_key_caps(state, deform_cfg, scene, bands=bands)
        print("trajectory key_caps:",
              {name_map[k]: v for k, v in caps.items()}, flush=True)
    # scan-batched + device-side uint8 quantization: one dispatch per 30
    # frames, 4x less device->host traffic, and the dtype png_write_batch
    # expects.  Program cache: one make_render_scan per distinct cap.
    rs_cache = {}

    def rs_for(cap):
        if cap not in rs_cache:
            rs_cache[cap] = make_render_scan(
                deform_cfg, scene.width, scene.height, bg, backend=backend,
                key_cap=cap, with_stats=True)
        return rs_cache[cap]

    fps_all = {}
    health_all = {}
    for name, cams in scene.video_cams.items():
        out_name = name_map[name]
        frame_dir = os.path.join(model_path, "frame_result", out_name)
        os.makedirs(frame_dir, exist_ok=True)
        stats = {}
        cap = caps.get(name, (key_cap, None))[0]
        frames, fps = render_trajectory(state, deform_cfg, cams, scene.width,
                                        scene.height, bg, rs=rs_for(cap),
                                        stats=stats)
        print(f"FPS: {fps}")
        fps_all[out_name] = fps
        # health counters (round-4 postmortem: overflow silently blacks out
        # the far field with rc=0 — never ship a trajectory without these)
        h = {"max_overflow": int(stats["overflow"].max()),
             "frames_overflowed": int((stats["overflow"] > 0).sum()),
             "max_instances": int(stats["instances"].max()),
             "key_cap": cap,
             "mean_brightness": stats["mean_brightness"]}
        health_all[out_name] = h
        print(f"HEALTH {out_name}: {h}")
        # threaded native PNG writer (replaces the reference's python
        # ThreadPool, render_4DGS.py:32-47); PIL fallback
        from . import native
        paths = [os.path.join(frame_dir, f"{i:05d}.png")
                 for i in range(len(frames))]
        if not native.png_write_batch(paths, np.stack(frames)):
            for pth, f in zip(paths, frames):
                Image.fromarray(f).save(pth)
        cropped = [f[crop:-crop, crop:-crop] for f in frames]
        vid_dir = os.path.join(model_path, "vid_result")
        os.makedirs(vid_dir, exist_ok=True)
        write_mp4(os.path.join(vid_dir, out_name + ".mp4"), cropped, fps=30)
    return fps_all, health_all
