"""Production tile-binned differentiable Gaussian rasterizer (TPU-native).

The TPU redesign of the reference CUDA pipeline
(cuda_rasterizer/rasterizer_impl.cu:198-444):

  CUDA                                   here
  ----                                   ----
  preprocessCUDA (1 thread/gaussian)     vmapped XLA preprocess (preprocess.py)
  cub InclusiveSum of tiles_touched      jnp.cumsum over rect areas
  duplicateWithKeys + cub RadixSort      depth-rank the gaussians (P-length
                                         sort), expand rects front-to-back
                                         into fixed-capacity slots (scatter
                                         segment starts + cummax fill-forward
                                         + one packed-row gather), then ONE
                                         stable single-key lax.sort on
                                         tile_id (slot order = depth order)
  identifyTileRanges                     searchsorted over the sorted tile ids
                                         (tiny) + CHUNK-aligned re-layout
  renderCUDA (16x16 block, shared mem)   Pallas kernel: one grid step per tile,
                                         chunks of 128 gaussians DMA'd HBM->VMEM,
                                         alpha as a [256 pixel, 128 gaussian]
                                         VPU block, transmittance as a log-space
                                         cumulative sum, contributions as an MXU
                                         contraction; early exit on T < 1e-4
  BACKWARD::render (atomicAdd)           second Pallas kernel replaying the walk
                                         and emitting per-instance grads; the
                                         per-gaussian reduction is the autodiff
                                         of the (differentiable) gather, i.e. a
                                         deterministic XLA scatter-add

Compositing semantics are shared bit-for-bit with the oracle
(rasterize_ref.py) — see its docstring for the 1e-4-bounded deviation from
the CUDA recurrence.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import Preprocessed, preprocess
from .rasterize_ref import tile_rect, TILE, ALPHA_MIN, ALPHA_MAX, T_EPS

import numpy as np

# gaussian instances per inner step (lane dimension).  128 is the MXU
# native width; 256 halves the chunk count (grid steps + per-tile padding
# waste) at the cost of doubling the triangular-cumsum FLOPs — which wins
# depends on whether the kernel is overhead- or MXU-bound, so it is
# env-tunable for on-chip A/B (read once at import; compiled shapes).
CHUNK = int(os.environ.get("MOM_TPU_CHUNK", "128"))
assert CHUNK % 128 == 0, CHUNK
NFEAT = 16           # padded feature rows (sublane dimension)
LOG_T_EPS = float(np.log(T_EPS))

# feature row layout in the packed [NFEAT, key_cap] array
R_MX, R_MY, R_CA, R_CB, R_CC, R_OP, R_R, R_G, R_B, R_D = range(10)


def _interpret() -> bool:
    env = os.environ.get("MOM_TPU_INTERPRET")
    if env is not None:
        return env == "1"
    # no TPU -> run the kernels in the pallas interpreter automatically
    return jax.default_backend() != "tpu"


def _lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along the lane axis (axis 1) as an MXU
    contraction with a triangular ones matrix — Pallas TPU has no cumsum
    lowering, and a [*, 128] x [128, 128] matmul is effectively free.

    MOM_TPU_MXU_SPLIT=k (k=2,3): run the contraction as k bf16 passes
    instead of one fp32 matmul (Mosaic lowers fp32 MXU contractions to
    multiple bf16 passes internally).  The triangular mask is 0/1 — exactly
    bf16-representable — so splitting only x into k bf16 magnitude terms
    loses just the last term's rounding: abs error <= 2^-9k * |x| per
    element (k=3 passes the 1e-5 rasterizer parity bar; k=2 is ~1e-4)."""
    n = x.shape[1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    k = int(os.environ.get("MOM_TPU_MXU_SPLIT", "0") or 0)
    if k >= 2:
        tri = (ii <= jj).astype(jnp.bfloat16)
        out = None
        resid = x
        for _ in range(k):
            term = resid.astype(jnp.bfloat16)
            resid = resid - term.astype(jnp.float32)
            part = jax.lax.dot_general(term, tri, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            out = part if out is None else out + part
        return out
    tri = (ii <= jj).astype(x.dtype)
    return jax.lax.dot_general(x, tri, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


class Binning(NamedTuple):
    gid_sorted: jnp.ndarray    # (padded_cap,) int32 gaussian id per instance
    tile_starts: jnp.ndarray   # (num_tiles,) int32 — CHUNK-aligned
    tile_ends: jnp.ndarray     # (num_tiles,) int32 — starts + real counts
    slot_valid: jnp.ndarray    # (padded_cap,) bool — real (non-pad) instance
    slot_origin: jnp.ndarray   # (padded_cap,) int32 pre-sort (depth-ranked)
                               #   slot (key_cap sentinel for pads) — per-
                               #   gaussian slots are CONTIGUOUS in this space
    g_offsets: jnp.ndarray     # (P,) int32 ranked-slot range start, indexed
                               #   by ORIGINAL gaussian id
    g_areas: jnp.ndarray       # (P,) int32 slot range size (original order)
    chunk_tile: jnp.ndarray    # (padded_cap // CHUNK,) int32 owning tile
    num_keys: jnp.ndarray      # () int32 — real instances before capping
    overflow: jnp.ndarray      # () int32 — instances dropped by key_cap


def padded_cap(key_cap: int, width: int, height: int,
               row_tiles=None) -> int:
    geom = _geom(width, height, row_tiles)
    return key_cap + geom.grid_x * geom.grid_y * CHUNK


def _segment_ids(offsets: jnp.ndarray, sizes: jnp.ndarray,
                 cap: int) -> jnp.ndarray:
    """Per-slot owning-segment index for ascending segment ranges
    [offsets[i], offsets[i]+sizes[i]): scatter each segment's index at its
    range start, fill-forward with the cummax primitive (single HLO op — an
    unrolled associative_scan at millions of slots blows up compile)."""
    n_seg = offsets.shape[0]
    tgt = jnp.where(sizes > 0, offsets, cap)           # empty segments drop
    seg0 = jnp.full(cap, -1, jnp.int32).at[tgt].set(
        jnp.arange(n_seg, dtype=jnp.int32), mode="drop")
    return jnp.maximum(jax.lax.cummax(seg0), 0)


def _gather_packed_rows(cols: list, seg: jnp.ndarray) -> list:
    """Gather several per-segment columns at the slot->segment map with ONE
    row gather: scalar gathers at millions of indices are HBM-latency bound
    on TPU (~35x slower than the same data as one packed row gather).
    Floats ride along bitcast to int32."""
    packed = []
    isfloat = []
    for c in cols:
        if jnp.issubdtype(c.dtype, jnp.floating):
            packed.append(jax.lax.bitcast_convert_type(c, jnp.int32))
            isfloat.append(True)
        else:
            packed.append(c.astype(jnp.int32))
            isfloat.append(False)
    table = jnp.stack(packed, axis=1)                  # (n_seg, k)
    rows = table[seg]                                  # (cap, k)
    out = []
    for i, f in enumerate(isfloat):
        col = rows[:, i]
        out.append(jax.lax.bitcast_convert_type(col, jnp.float32)
                   if f else col)
    return out


# MXU counting-sort rank (shared with the segment-sum VJPs) — the
# replacement for O(n log^2 n) comparison-sort networks at small digit
# domains; see scanprims.py for the formulation.
from .scanprims import blocked_cumsum, rank_by_digit as _rank_by_digit


def _radix_sort_tiles(tile_id: jnp.ndarray, grid_x: int, num_tiles: int):
    """Stable sort of ``tile_id`` (pads hold ``num_tiles``) via two
    counting-sort passes over the (tx, ty) digits; returns
    (tile_sorted, slot_of_sorted) exactly like the lax.sort path."""
    n = tile_id.shape[0]
    gy = num_tiles // grid_x
    iota = jax.lax.iota(jnp.int32, n)
    # pass 1: tx digit (pads use gx-1; any fixed digit works — pass 2's
    # ty=gy sends them after every real instance, stably)
    tx = jnp.where(tile_id >= num_tiles, grid_x - 1, tile_id % grid_x)
    r1 = _rank_by_digit(tx, grid_x)
    src1 = jnp.zeros(n, jnp.int32).at[r1].set(iota, unique_indices=True)
    t1 = tile_id[src1]
    # pass 2: ty digit (gy+1 values; pads land at ty=gy)
    ty = jnp.minimum(t1 // grid_x, gy)
    r2 = _rank_by_digit(ty, gy + 1)
    src2 = jnp.zeros(n, jnp.int32).at[r2].set(iota, unique_indices=True)
    return t1[src2], src1[src2]


LANE = 512   # tile-id column chunk width inside the counting-layout kernels


def _bin_v2_block(key_cap: int) -> int:
    for c in (1024, 512, 256, 128):
        if key_cap % c == 0:
            return c
    raise ValueError(f"key_cap {key_cap} not 128-aligned")


def _hist_kernel(C: int, n_lane_chunks: int):
    """Per-block tile histogram: for each block of C instance slots, counts
    per tile id (including the pad sentinel column).  Pure int32 VPU work —
    one [C, LANE] one-hot compare + sublane reduce per lane chunk, never
    materializing the one-hot in HBM (the round-3 radix path's failure
    mode: rank_by_digit's (N, D) HBM one-hots OOM'd every 720p combo)."""

    def kernel(tcol_ref, hist_ref):
        # hist_ref block is (1, 1, tp_pad): the histogram row lives in the
        # LAST TWO dims (1, tp_pad) so Mosaic's (8, 128) block-divisibility
        # rule is satisfied by whole-dimension blocks (a 2D (nblk, tp_pad)
        # layout with (1, tp_pad) blocks fails to lower on real TPU: 1 is
        # neither a multiple of 8 nor the full nblk — found by the first
        # hardware run; interpret-mode tests don't check lowering)
        t = tcol_ref[...]                                  # (C, 1) int32
        for k in range(n_lane_chunks):
            lo = k * LANE
            # 2D iota directly: Mosaic rejects broadcasting a (1, LANE) row
            # across C sublanes ("Invalid input layout" on vector.broadcast
            # 1x512 -> 1024x512); a full-shape iota needs no broadcast, and
            # the (C, 1) column operand broadcasts along LANES, which is
            # supported
            lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1) + lo
            onehot = (t == lane).astype(jnp.int32)         # (C, LANE)
            hist_ref[0, :, lo:lo + LANE] = jnp.sum(onehot, axis=0,
                                                   keepdims=True)

    return kernel


def _dest_kernel(C: int, n_lane_chunks: int, num_tiles: int, pcap: int):
    """Per-instance destination slot in the CHUNK-padded tile-grouped
    layout: dest = pstart[tile] + (#earlier blocks' instances on this tile)
    + (#earlier same-tile instances within this block).

    The within-block rank is a [C, C] equality x strict-lower-triangle
    compare-reduce; the per-tile destination base is gathered from the
    prefetched (combined pstart + cross-block-prefix) row with a masked
    int32 max — exact for any capacity (no float round-trip), no MXU."""

    def kernel(tcol_ref, trow_ref, db_ref, dest_ref):
        # trow/db blocks are (1, 1, C) / (1, 1, tp_pad): same whole-row-in-
        # last-two-dims layout as _hist_kernel (Mosaic divisibility rule).
        # Row -> matrix "broadcasts" go through an MXU ones-matmul: Mosaic
        # cannot broadcast a 1-sublane vector across C sublanes, but a
        # (C,1)x(1,N) f32 matmul produces the same replicated matrix and is
        # EXACT for these int magnitudes (tile ids and layout offsets are
        # all < 2^24)
        t = tcol_ref[...]                                  # (C, 1)
        ones = jnp.ones((C, 1), jnp.float32)
        tr2 = jax.lax.dot_general(
            ones, trow_ref[0].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (C, C)
        tf = t.astype(jnp.float32)
        ii = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        eq = jnp.logical_and(tf == tr2, jj < ii)
        within = jnp.sum(eq.astype(jnp.int32), axis=1,
                         keepdims=True)                    # (C, 1)
        db_g = jnp.full((C, 1), -1.0, jnp.float32)
        for k in range(n_lane_chunks):
            lo = k * LANE
            lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANE), 1) + lo
            db2 = jax.lax.dot_general(
                ones, db_ref[0][:, lo:lo + LANE].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (C, LANE)
            m = jnp.where(t == lane, db2, -1.0)            # (C, LANE)
            db_g = jnp.maximum(db_g, jnp.max(m, axis=1, keepdims=True))
        dest_ref[...] = jnp.where(t >= num_tiles, pcap,
                                  db_g.astype(jnp.int32) + within)

    return kernel


def _bin_layout_counting(tile_id: jnp.ndarray, gid_f: jnp.ndarray,
                         num_tiles: int, key_cap: int, pcap: int):
    """Counting-sort replacement for (stable tile sort + CHUNK relayout):
    two tiny Pallas passes over the instance tile ids + one scatter write
    the padded layout DIRECTLY — O(K) data movement instead of the
    O(K log^2 K) lax.sort network (the round-3 profile's largest single
    phase: 67 ms at 512^2 / 236 ms at 720p vs a ~10 ms HBM floor).
    Output is bit-identical to the sort path on valid slots (within a
    tile, instances stay in ascending pre-sort slot = depth order)."""
    # the _dest_kernel's MXU ones-matmul replication is exact only while
    # every layout offset fits f32's 2^24 integer range (review finding:
    # MOM_TPU_MAX_KEY_CAP defaults to exactly 2^24) — fail loudly rather
    # than silently corrupt destination slots
    assert pcap < (1 << 24), (
        f"BIN_V2 counting layout needs pcap < 2^24 for exact f32 "
        f"offsets; got {pcap}")
    C = _bin_v2_block(key_cap)
    nblk = key_cap // C
    tp_pad = -(-(num_tiles + 1) // LANE) * LANE
    nlc = tp_pad // LANE
    tcol = tile_id.reshape(key_cap, 1)

    hist = pl.pallas_call(
        _hist_kernel(C, nlc),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((C, 1), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((1, 1, tp_pad), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk, 1, tp_pad), jnp.int32),
        interpret=_interpret())(tcol)
    hist = hist.reshape(nblk, tp_pad)

    base = jnp.cumsum(hist, axis=0) - hist                 # exclusive
    counts = (base[-1] + hist[-1])[:num_tiles]
    padded = jnp.maximum((counts + CHUNK - 1) // CHUNK, 1) * CHUNK
    pstarts_inc = jnp.cumsum(padded)
    pstarts = pstarts_inc - padded
    db_row = jnp.zeros(tp_pad, jnp.int32).at[:num_tiles].set(pstarts)
    db = base + db_row[None, :]

    dest = pl.pallas_call(
        _dest_kernel(C, nlc, num_tiles, pcap),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((C, 1), lambda b: (b, 0)),
                  pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, 1, tp_pad), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((C, 1), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((key_cap, 1), jnp.int32),
        interpret=_interpret())(tcol, tile_id.reshape(nblk, 1, C),
                                db.reshape(nblk, 1, tp_pad))
    dest = dest.reshape(key_cap)

    slots = jnp.arange(key_cap, dtype=jnp.int32)
    packed = jnp.stack([gid_f, slots], axis=1)             # (key_cap, 2)
    init = jnp.stack([jnp.zeros(pcap, jnp.int32),
                      jnp.full(pcap, key_cap, jnp.int32)], axis=1)
    # pad instances all come out of _dest_kernel as dest == pcap; spread
    # them to pcap + slot so the indices really are unique (mode="drop"
    # discards them either way, but unique_indices=True on duplicated
    # indices is documented UB — round-4 advisor finding)
    dest = jnp.where(dest >= pcap, pcap + slots, dest)
    out = init.at[dest].set(packed, mode="drop", unique_indices=True)
    gid_padded, slot_origin = out[:, 0], out[:, 1]
    slot_valid = slot_origin < key_cap

    cstarts = jnp.arange(pcap // CHUNK, dtype=jnp.int32) * CHUNK
    chunk_tile = jnp.minimum(
        jnp.searchsorted(pstarts_inc, cstarts, side="right"),
        num_tiles - 1).astype(jnp.int32)
    return (gid_padded, slot_origin, slot_valid, chunk_tile,
            pstarts, pstarts + counts)


def bin_gaussians(pre: Preprocessed, width: int, height: int,
                  key_cap: int, row_tiles=None, perm=None) -> Binning:
    """Exact duplicate-key expansion with a static capacity.

    Instances expand in GLOBAL FRONT-TO-BACK order: gaussians are first
    ranked by view depth (one P-length sort), then their tile rects expand
    into the fixed key_cap slot space in rank order.  Two properties follow:

    - key_cap overflow drops the FARTHEST gaussians' instances (the
      reference never drops — it reallocates, rasterizer_impl.cu:278-315 —
      but the farthest instances are exactly the ones the T<1e-4 early-exit
      would have ignored, so a bounded overflow is visually/gradient-wise
      benign even right after an opacity reset floods every tile);
    - within any tile, slot order IS depth order, so grouping instances by
      tile needs only a single-key stable sort on tile_id carrying the slot
      index (vs the previous (tile, depth) 2-key sort over 4 operands —
      half the data movement through the O(log^2 n) sorting network).

    Each tile's run is then re-laid-out to a CHUNK-aligned segment
    (scatter + cummax fill-forward) so the compositing kernel's DMA offsets
    are provably 128-aligned and tiles never share a chunk."""
    # a non-CHUNK-multiple cap silently drifts the padded layout's chunk
    # count between the sort and counting paths (found by the CHUNK=256
    # parity sweep); all production cap producers align, so enforce it
    assert key_cap % CHUNK == 0, (key_cap, CHUNK)
    geom = _geom(width, height, row_tiles)
    grid_x, grid_y = geom.grid_x, geom.grid_y
    num_tiles = grid_x * grid_y
    P = pre.depths.shape[0]

    alive = pre.valid & (pre.radii > 0)
    rmn, rmx = tile_rect(pre.means2d, pre.radii, width, height)
    # image-row sharding: clamp each rect to this shard's tile-row band and
    # work in band-local tile rows
    ty0 = geom.row0
    mny = jnp.clip(rmn[:, 1], ty0, ty0 + grid_y) - ty0
    mxy = jnp.clip(rmx[:, 1], ty0, ty0 + grid_y) - ty0
    rmn = jnp.stack([rmn[:, 0], mny], axis=1)
    rmx = jnp.stack([rmx[:, 0], mxy], axis=1)
    rw = (rmx[:, 0] - rmn[:, 0]).astype(jnp.int32)
    rh = (rmx[:, 1] - rmn[:, 1]).astype(jnp.int32)
    areas = jnp.where(alive, rw * rh, 0).astype(jnp.int32)

    # global depth ranking (dead gaussians sort last; their areas are 0).
    # The ranking is band-independent: a banded render (see
    # rasterize_preprocessed) computes it ONCE and passes it in, so B bands
    # cost one P-sort, not B
    if perm is None:
        depth_key = jnp.where(alive, pre.depths, jnp.float32(3.4e38))
        _, perm = jax.lax.sort((depth_key, jnp.arange(P, dtype=jnp.int32)),
                               num_keys=1)
    areas_r = areas[perm]

    offsets_inc = jnp.cumsum(areas_r)
    total = offsets_inc[-1]
    offsets_r = offsets_inc - areas_r                  # exclusive, ranked

    rank_f = _segment_ids(offsets_r, areas_r, key_cap)
    (off_f, rw_f, mnx_f, mny_f, gid_f) = _gather_packed_rows(
        [offsets_r, jnp.maximum(rw, 1)[perm], rmn[:, 0][perm],
         rmn[:, 1][perm], perm], rank_f)

    slots = jnp.arange(key_cap, dtype=jnp.int32)
    in_range = slots < total
    local = slots - off_f
    tx = mnx_f + local % rw_f
    ty = mny_f + local // rw_f
    tile_id = jnp.where(in_range, ty * grid_x + tx, num_tiles).astype(jnp.int32)

    # within a tile, slots must stay ascending = depth ascending (front to
    # back).  Three grouping strategies with identical valid-slot output:
    #  - MOM_TPU_BIN_V2=1: counting layout (_bin_layout_counting) — two
    #    Pallas histogram/rank passes + one scatter write the padded
    #    layout directly, O(K) data movement, no comparison sort at all
    #  - default: lax.sort on (tile, slot) as TWO explicit keys (no hidden
    #    stability iota; slots are unique so the composite key is total)
    #  - MOM_TPU_BIN_RADIX=1: stable two-pass MXU counting sort over the
    #    (tx, ty) digits (_radix_sort_tiles) — O(n*digits) matmuls instead
    #    of an O(n log^2 n) comparison network
    if os.environ.get("MOM_TPU_BIN_V2") == "1":
        pcap = key_cap + num_tiles * CHUNK
        (gid_padded, slot_origin, slot_valid, chunk_tile, tstarts,
         tends) = _bin_layout_counting(tile_id, gid_f, num_tiles, key_cap,
                                       pcap)
        g_offsets = jnp.zeros(P, jnp.int32).at[perm].set(offsets_r)
        return Binning(gid_sorted=gid_padded, tile_starts=tstarts,
                       tile_ends=tends, slot_valid=slot_valid,
                       slot_origin=slot_origin, g_offsets=g_offsets,
                       g_areas=areas, chunk_tile=chunk_tile,
                       num_keys=jnp.minimum(total, key_cap),
                       overflow=jnp.maximum(total - key_cap, 0))
    if os.environ.get("MOM_TPU_BIN_RADIX") == "1":
        tile_sorted, slot_of_sorted = _radix_sort_tiles(tile_id, grid_x,
                                                        num_tiles)
    else:
        # single-operand packed sort when (tile, slot) fits in 32 bits:
        # tile_id in the high bits, slot in the low ceil(log2(key_cap))
        # bits — lexicographically identical to the (tile, slot) 2-key
        # sort (slots are unique and ascending within a tile), but the
        # comparison network moves HALF the data.  uint32 keeps the
        # sentinel row (num_tiles << slot_bits) in range where int32
        # would wrap.  MOM_TPU_BIN_PACK=0 restores the 2-key sort; the
        # fallback also triggers automatically at render-scale key_caps
        # whose slot bits no longer fit (e.g. 2.7M slots x 3601 tiles).
        slot_bits = max(int(key_cap - 1).bit_length(), 1)
        fits = (num_tiles + 1) * (1 << slot_bits) <= (1 << 32)
        if fits and os.environ.get("MOM_TPU_BIN_PACK", "1") != "0":
            packed32 = ((tile_id.astype(jnp.uint32) << slot_bits)
                        | slots.astype(jnp.uint32))
            packed32 = jax.lax.sort(packed32)
            tile_sorted = (packed32 >> slot_bits).astype(jnp.int32)
            slot_of_sorted = (
                packed32 & jnp.uint32((1 << slot_bits) - 1)).astype(jnp.int32)
        else:
            tile_sorted, slot_of_sorted = jax.lax.sort((tile_id, slots),
                                                       num_keys=2)
    gid_sorted = gid_f[slot_of_sorted]

    # per-tile counts via one-sided diff of first-occurrence positions:
    # searchsorted over 1024 tile ids is cheap (the array is tiny)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts_raw = jnp.searchsorted(tile_sorted, tids, side="left").astype(jnp.int32)
    ends_raw = jnp.searchsorted(tile_sorted, tids + 1, side="left").astype(jnp.int32)
    counts = ends_raw - starts_raw

    # every tile owns >= 1 chunk so the chunk-grid kernels initialize every
    # output block (empty tiles produce one fully-gated chunk)
    padded = jnp.maximum((counts + CHUNK - 1) // CHUNK, 1) * CHUNK
    pstarts_inc = jnp.cumsum(padded)
    pstarts = pstarts_inc - padded

    pcap = key_cap + num_tiles * CHUNK
    u_f = _segment_ids(pstarts, padded, pcap)
    # the per-tile tables are tiny (num_tiles entries) — scalar gathers fine
    sr_f = starts_raw[u_f]
    ps_f = pstarts[u_f]
    cnt_f = counts[u_f]
    s = jnp.arange(pcap, dtype=jnp.int32)
    l = s - ps_f
    slot_valid = (l < cnt_f) & (s < pstarts_inc[-1])
    src = jnp.where(slot_valid, sr_f + l, 0)
    gid_padded, origin = _gather_packed_rows(
        [gid_sorted, slot_of_sorted], src)
    slot_origin = jnp.where(slot_valid, origin, key_cap)

    # per-chunk owning tile (the chunk-grid kernels' block router)
    chunk_tile = u_f[::CHUNK]

    # slot-range starts in ORIGINAL gaussian order (the backward segment-sum
    # indexes ranges by gaussian id; ranges live in the ranked slot space)
    g_offsets = jnp.zeros(P, jnp.int32).at[perm].set(offsets_r)

    return Binning(gid_sorted=gid_padded, tile_starts=pstarts,
                   tile_ends=pstarts + counts, slot_valid=slot_valid,
                   slot_origin=slot_origin, g_offsets=g_offsets,
                   g_areas=areas, chunk_tile=chunk_tile,
                   num_keys=jnp.minimum(total, key_cap),
                   overflow=jnp.maximum(total - key_cap, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _expand_rows(key_cap, table, gid_padded, slot_origin, g_offsets, g_areas):
    return table[gid_padded].T                             # (NFEAT, padded_cap)


def _expand_rows_fwd(key_cap, table, gid_padded, slot_origin, g_offsets,
                     g_areas):
    return table[gid_padded].T, (slot_origin, g_offsets, g_areas)


def _expand_rows_bwd(key_cap, res, gfeat):
    """Per-gaussian gradient reduction WITHOUT a giant scatter-add (241ms at
    3M instances): un-permute instance grads to the pre-sort slot space —
    where each gaussian's instances are contiguous — with one int scatter +
    one row gather, then reduce segments with a cumsum and two boundary
    gathers (all throughput-bound primitives)."""
    slot_origin, g_offsets, g_areas = res
    pcap = slot_origin.shape[0]
    g_inst = gfeat.T                                        # (pcap, NFEAT)
    # forward map: pre-sort slot -> padded slot (unique for valid slots;
    # pad slots carry the key_cap sentinel and are dropped)
    pad_of_pre = jnp.full(key_cap, pcap, jnp.int32).at[slot_origin].set(
        jnp.arange(pcap, dtype=jnp.int32), mode="drop")
    g_pre = jnp.take(g_inst, pad_of_pre, axis=0, mode="fill",
                     fill_value=0.0)                        # (key_cap, NFEAT)
    if os.environ.get("MOM_TPU_BLOCK_CUMSUM", "1") != "0":
        # one-pass MXU prefix sum vs jnp.cumsum's ~log2(n) HBM passes.
        # DEFAULT ON since the first hardware gate sweep measured the
        # bwd-gate set at +7.3% step rate (runlogs/gate_sweep_r5.json);
        # MOM_TPU_BLOCK_CUMSUM=0 restores the jnp.cumsum path
        inc = blocked_cumsum(g_pre)
    else:
        inc = jnp.cumsum(g_pre, axis=0)
    csum = jnp.concatenate([jnp.zeros((1, g_pre.shape[1]), g_pre.dtype),
                            inc], axis=0)
    # clamp segment bounds: under key_cap overflow the last gaussians' slot
    # ranges extend past the buffer (their dropped instances contributed
    # nothing, so clipping gives the exact surviving-instance sum); jnp.take
    # would otherwise FILL out-of-bounds rows with NaN
    hi = jnp.take(csum, jnp.minimum(g_offsets + g_areas, key_cap), axis=0)
    lo = jnp.take(csum, jnp.minimum(g_offsets, key_cap), axis=0)
    d_table = hi - lo                                       # (P, NFEAT)
    return d_table, None, None, None, None


_expand_rows.defvjp(_expand_rows_fwd, _expand_rows_bwd)


def _pack_features(pre: Preprocessed, binning: Binning,
                   key_cap: int) -> jnp.ndarray:
    """Differentiable gather into the kernel's [NFEAT, padded_cap] layout
    with a segment-sum backward (see _expand_rows_bwd)."""
    zeros = jnp.zeros_like(pre.depths)
    table = jnp.stack([
        pre.means2d[:, 0], pre.means2d[:, 1],
        pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2],
        pre.opacities,
        pre.colors[:, 0], pre.colors[:, 1], pre.colors[:, 2],
        pre.depths,
    ] + [zeros] * (NFEAT - 10), axis=1)                   # (P, NFEAT)
    return _expand_rows(key_cap, table, binning.gid_sorted,
                        binning.slot_origin, binning.g_offsets,
                        binning.g_areas)


class _TileGeom(NamedTuple):
    grid_x: int
    grid_y: int
    hpad: int
    wpad: int
    row0: int = 0          # first tile row (global) — image-row sharding


def _geom(width: int, height: int, row_tiles=None) -> _TileGeom:
    gx = (width + TILE - 1) // TILE
    gy_full = (height + TILE - 1) // TILE
    ty0, ty1 = (0, gy_full) if row_tiles is None else row_tiles
    gy = ty1 - ty0
    return _TileGeom(grid_x=gx, grid_y=gy, hpad=gy * TILE, wpad=gx * TILE,
                     row0=ty0)


def tiles_to_image(x: jnp.ndarray, geom: _TileGeom) -> jnp.ndarray:
    """(num_tiles, TILE*TILE, C) -> (hpad, wpad, C).  The kernel works in a
    tile-major layout because TPU blocks must be (8,128)-aligned or
    full-dimension; the relayout is a cheap fused XLA transpose."""
    gy, gx = geom.grid_y, geom.grid_x
    c = x.shape[-1]
    return (x.reshape(gy, gx, TILE, TILE, c).transpose(0, 2, 1, 3, 4)
            .reshape(geom.hpad, geom.wpad, c))


def image_to_tiles(x: jnp.ndarray, geom: _TileGeom) -> jnp.ndarray:
    """(hpad, wpad, C) -> (num_tiles, TILE*TILE, C)."""
    gy, gx = geom.grid_y, geom.grid_x
    c = x.shape[-1]
    return (x.reshape(gy, TILE, gx, TILE, c).transpose(0, 2, 1, 3, 4)
            .reshape(gy * gx, TILE * TILE, c))


def _forward_kernel(geom: _TileGeom):
    """Chunk-grid forward compositing kernel: one grid step per 128-instance
    chunk, routed to its tile's output block via a scalar-prefetched
    chunk->tile map.  Pallas pipelines the blocked feature input (double
    buffering for free); transmittance carries across a tile's consecutive
    chunks in persistent VMEM scratch; early-exited chunks skip compute."""
    gx = geom.grid_x
    row0 = geom.row0

    def kernel(ct_ref, ts_ref, te_ref, feat_blk, acc_out, logt_out,
               logt_ref):
        c = pl.program_id(0)
        t = ct_ref[c]
        cstart = c * CHUNK
        first = cstart == ts_ref[t]
        n = te_ref[t] - cstart            # valid lanes in this chunk (<=0 ok)

        @pl.when(first)
        def _():
            logt_ref[...] = jnp.zeros_like(logt_ref)
            acc_out[...] = jnp.zeros_like(acc_out)

        done = jnp.max(logt_ref[...]) < LOG_T_EPS

        @pl.when(jnp.logical_and(jnp.logical_not(done), n > 0))
        def _():
            ty = t // gx + row0
            tx = t - (t // gx) * gx
            pix = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)
            px = (tx * TILE + pix % TILE).astype(jnp.float32)   # [256, 1]
            py = (ty * TILE + pix // TILE).astype(jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

            fv = feat_blk[...]                                  # [NFEAT, CHUNK]
            dx = fv[R_MX:R_MX + 1, :] - px                      # [256, CHUNK]
            dy = fv[R_MY:R_MY + 1, :] - py
            a = fv[R_CA:R_CA + 1, :]
            b = fv[R_CB:R_CB + 1, :]
            cc = fv[R_CC:R_CC + 1, :]
            op = fv[R_OP:R_OP + 1, :]
            power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            gate = (alpha >= ALPHA_MIN) & (power <= 0.0) & (lane < n)
            alpha = jnp.where(gate, alpha, 0.0)

            u = jnp.log1p(-alpha)
            cum = _lane_cumsum(u)
            logT = logt_ref[...] + (cum - u)                    # exclusive
            w = jnp.where(gate & (logT >= LOG_T_EPS),
                          alpha * jnp.exp(logT), 0.0)           # [256, CHUNK]

            contrib = jax.lax.dot_general(
                w, fv[R_R:R_D + 1, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [256, 4]
            acc_out[...] = acc_out[...] + contrib[None]
            logt_ref[...] = logt_ref[...] + cum[:, -1:]

        logt_out[...] = logt_ref[...][None]

    return kernel


def _backward_kernel(geom: _TileGeom):
    """Chunk-grid backward kernel: replays the forward walk and writes this
    chunk's per-instance gradients to its own output block.

    Per pixel p and instance j (see rasterize_ref.py for notation):
      L depends on w_j = gate_j * [T_j >= eps] * alpha_j * T_j and on
      logT_total.  With phi_j = g4 . feat4_j and S_j = sum_{k>j} w_k phi_k
      = S_total - P_j (P_j inclusive prefix, S_total = g4 . acc4):
        dL/dalpha_j = gate_j * (T_j phi_j - (S_j + g_logT) / (1 - alpha_j))
        dL/dcolor_j = w_j * g_rgb ;  dL/ddepth_j = w_j * g_d
      then the alpha -> (power, opacity) -> (conic, mean2d) chain.
    """
    gx = geom.grid_x
    row0 = geom.row0

    def kernel(ct_ref, ts_ref, te_ref, feat_blk, g4_in, stotal_in, glogt_in,
               gfeat_out, logt_ref, pref_ref):
        c = pl.program_id(0)
        t = ct_ref[c]
        cstart = c * CHUNK
        first = cstart == ts_ref[t]
        n = te_ref[t] - cstart

        @pl.when(first)
        def _():
            logt_ref[...] = jnp.zeros_like(logt_ref)
            pref_ref[...] = jnp.zeros_like(pref_ref)

        done = jnp.max(logt_ref[...]) < LOG_T_EPS
        active = jnp.logical_and(jnp.logical_not(done), n > 0)

        @pl.when(active)
        def _():
            ty = t // gx + row0
            tx = t - (t // gx) * gx
            pix = jax.lax.broadcasted_iota(jnp.int32, (TILE * TILE, 1), 0)
            px = (tx * TILE + pix % TILE).astype(jnp.float32)
            py = (ty * TILE + pix // TILE).astype(jnp.float32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

            g4 = g4_in[0]                                       # [256, 4]
            s_total = stotal_in[0]                              # [256, 1]
            g_logt = glogt_in[0]                                # [256, 1]

            fv = feat_blk[...]
            dx = fv[R_MX:R_MX + 1, :] - px
            dy = fv[R_MY:R_MY + 1, :] - py
            a = fv[R_CA:R_CA + 1, :]
            b = fv[R_CB:R_CB + 1, :]
            cc = fv[R_CC:R_CC + 1, :]
            op = fv[R_OP:R_OP + 1, :]
            power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
            expp = jnp.exp(power)
            v = op * expp
            alpha = jnp.minimum(ALPHA_MAX, v)
            gate = (alpha >= ALPHA_MIN) & (power <= 0.0) & (lane < n)
            alpha_g = jnp.where(gate, alpha, 0.0)

            u = jnp.log1p(-alpha_g)
            cum = _lane_cumsum(u)
            logT = logt_ref[...] + (cum - u)
            T = jnp.exp(logT)
            live = gate & (logT >= LOG_T_EPS)
            w = jnp.where(live, alpha * T, 0.0)

            feat4 = fv[R_R:R_D + 1, :]                          # [4, CHUNK]
            phi = jax.lax.dot_general(
                g4, feat4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [256, CHUNK]

            wphi = w * phi
            pref = pref_ref[...] + _lane_cumsum(wphi)           # inclusive
            S = s_total - pref                                  # [256, CHUNK]

            dalpha = jnp.where(live, T * phi, 0.0) - jnp.where(
                gate, (S + g_logt) / (1.0 - alpha_g), 0.0)
            clamp_ok = (v < ALPHA_MAX)
            dpow = jnp.where(clamp_ok, dalpha * alpha, 0.0)     # dv/dpower = v
            dop_pix = jnp.where(clamp_ok, dalpha * expp, 0.0)

            dmx = jnp.sum(dpow * (-(a * dx + b * dy)), axis=0, keepdims=True)
            dmy = jnp.sum(dpow * (-(cc * dy + b * dx)), axis=0, keepdims=True)
            dca = jnp.sum(dpow * (-0.5 * dx * dx), axis=0, keepdims=True)
            dcb = jnp.sum(dpow * (-dx * dy), axis=0, keepdims=True)
            dcc = jnp.sum(dpow * (-0.5 * dy * dy), axis=0, keepdims=True)
            dop = jnp.sum(dop_pix, axis=0, keepdims=True)

            dfeat4 = jax.lax.dot_general(
                g4, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [4, CHUNK]

            zeros6 = jnp.zeros((NFEAT - 10, CHUNK), jnp.float32)
            gfeat_out[...] = jnp.concatenate(
                [dmx, dmy, dca, dcb, dcc, dop, dfeat4, zeros6], axis=0)

            logt_ref[...] = logt_ref[...] + cum[:, -1:]
            pref_ref[...] = pref[:, -1:]

        @pl.when(jnp.logical_not(active))
        def _():
            gfeat_out[...] = jnp.zeros_like(gfeat_out)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _composite(feat, chunk_tile, starts, ends, slot_valid, width, height,
               row_tiles=None):
    return _composite_fwd_impl(feat, chunk_tile, starts, ends, width, height,
                               row_tiles)


def _composite_fwd_impl(feat, chunk_tile, starts, ends, width, height,
                        row_tiles=None):
    geom = _geom(width, height, row_tiles)
    num_tiles = geom.grid_x * geom.grid_y
    n_chunks = feat.shape[1] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((NFEAT, CHUNK), lambda c, ct, ts, te: (0, c))],
        out_specs=[
            pl.BlockSpec((1, TILE * TILE, 4),
                         lambda c, ct, ts, te: (ct[c], 0, 0)),
            pl.BlockSpec((1, TILE * TILE, 1),
                         lambda c, ct, ts, te: (ct[c], 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE * TILE, 1), jnp.float32),
        ],
    )
    acc, logt = pl.pallas_call(
        _forward_kernel(geom),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, TILE * TILE, 4), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, TILE * TILE, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(chunk_tile, starts, ends, feat)
    return acc, logt


def _composite_fwd(feat, chunk_tile, starts, ends, slot_valid, width,
                   height, row_tiles=None):
    acc, logt = _composite_fwd_impl(feat, chunk_tile, starts, ends, width,
                                    height, row_tiles)
    return (acc, logt), (feat, chunk_tile, starts, ends, slot_valid, acc)


def _composite_bwd(width, height, row_tiles, res, cts):
    feat, chunk_tile, starts, ends, slot_valid, acc = res
    g_acc, g_logt = cts
    geom = _geom(width, height, row_tiles)
    n_chunks = feat.shape[1] // CHUNK
    s_total = jnp.sum(g_acc * acc, axis=-1, keepdims=True)   # (T, 256, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((NFEAT, CHUNK), lambda c, ct, ts, te: (0, c)),
            pl.BlockSpec((1, TILE * TILE, 4),
                         lambda c, ct, ts, te: (ct[c], 0, 0)),
            pl.BlockSpec((1, TILE * TILE, 1),
                         lambda c, ct, ts, te: (ct[c], 0, 0)),
            pl.BlockSpec((1, TILE * TILE, 1),
                         lambda c, ct, ts, te: (ct[c], 0, 0)),
        ],
        out_specs=[pl.BlockSpec((NFEAT, CHUNK), lambda c, ct, ts, te: (0, c))],
        scratch_shapes=[
            pltpu.VMEM((TILE * TILE, 1), jnp.float32),
            pltpu.VMEM((TILE * TILE, 1), jnp.float32),
        ],
    )
    gfeat = pl.pallas_call(
        _backward_kernel(geom),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(feat.shape, jnp.float32)],
        interpret=_interpret(),
    )(chunk_tile, starts, ends, feat, g_acc, s_total, g_logt)[0]
    # pad slots carry no gradient
    gfeat = jnp.where(slot_valid[None, :], gfeat, 0.0)
    return gfeat, None, None, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


class TiledRenderOutput(NamedTuple):
    color: jnp.ndarray     # (H, W, 3)
    depth: jnp.ndarray     # (H, W)
    final_T: jnp.ndarray   # (H, W)
    radii: jnp.ndarray     # (P,)
    overflow: jnp.ndarray  # () int32 dropped instances (monitor; should be 0)
    num_keys: jnp.ndarray = None  # () int32 surviving instances (<= key_cap)


def default_key_cap(num_points: int, avg_tiles: float = 4.0) -> int:
    cap = int(num_points * avg_tiles)
    return ((cap + CHUNK - 1) // CHUNK) * CHUNK


def rasterize_tiled(means3d, scales, rotations, opacities, shs,
                    viewmatrix, projmatrix, campos, tanfovx, tanfovy,
                    width: int, height: int, bg,
                    active_sh_degree=3, scale_modifier: float = 1.0,
                    colors_precomp=None, means2d_offset=None,
                    alive_mask=None, key_cap: int | None = None,
                    row_tiles: tuple | None = None) -> TiledRenderOutput:
    """Drop-in equivalent of rasterize_reference with the Pallas fast path.

    ``row_tiles=(ty0, ty1)`` composites only the tile rows
    [ty0*16, ty1*16) — the image-sharded path for point-sharded multi-chip
    rendering (each device renders its row band of the globally gathered
    gaussians); outputs then cover that band only."""
    pre = preprocess(means3d, scales, rotations, opacities, shs,
                     viewmatrix, projmatrix, campos, tanfovx, tanfovy,
                     width, height, active_sh_degree, scale_modifier,
                     colors_precomp=colors_precomp,
                     means2d_offset=means2d_offset, alive_mask=alive_mask)
    if key_cap is None:
        key_cap = default_key_cap(means3d.shape[0])
    return rasterize_preprocessed(pre, width, height, bg, key_cap,
                                  row_tiles=row_tiles)


def rasterize_preprocessed(pre: Preprocessed, width: int, height: int, bg,
                           key_cap: int,
                           row_tiles: tuple | None = None
                           ) -> TiledRenderOutput:
    """Binning + compositing over an already-preprocessed SoA — the entry
    point for point-sharded multi-chip rendering, where each device
    all-gathers the (cheap, ~11 floats/point) preprocessed arrays and
    composites its own image shard (SURVEY.md §2.5).

    ``key_cap`` may be a TUPLE of per-band caps: the image then splits into
    ``len(key_cap)`` tile-row bands rendered sequentially, each with its
    own (much smaller) grouping sort — the sort network is O(n log^2 n) in
    its operand length AND a band's (tile, slot) key fits the packed
    single-uint32 path at render-scale caps where the whole-image key
    cannot (bin_gaussians).  The depth ranking is computed once and shared
    across bands.  Single-chip stage-3 rendering uses this; the caller
    sizes per-band caps from a banded demand scan."""
    if isinstance(key_cap, (tuple, list)):
        return _rasterize_banded(pre, width, height, bg, tuple(key_cap))
    binning = bin_gaussians(jax.tree.map(jax.lax.stop_gradient, pre),
                            width, height, key_cap, row_tiles=row_tiles)
    feat = _pack_features(pre, binning, key_cap)
    acc_t, logt_t = _composite(feat, binning.chunk_tile, binning.tile_starts,
                               binning.tile_ends, binning.slot_valid,
                               width, height, row_tiles)
    geom = _geom(width, height, row_tiles)
    band_h = height - geom.row0 * TILE if row_tiles is None else \
        min(height - geom.row0 * TILE, geom.grid_y * TILE)
    acc = tiles_to_image(acc_t, geom)[:band_h, :width]
    logt = tiles_to_image(logt_t, geom)[:band_h, :width, 0]
    final_T = jnp.exp(logt)
    color = acc[..., :3] + final_T[..., None] * jnp.asarray(bg, acc.dtype)
    return TiledRenderOutput(color=color, depth=acc[..., 3], final_T=final_T,
                             radii=pre.radii, overflow=binning.overflow,
                             num_keys=binning.num_keys)


def _rasterize_banded(pre: Preprocessed, width: int, height: int, bg,
                      band_caps: tuple) -> TiledRenderOutput:
    """Sequential tile-row-band rendering with one shared depth ranking
    (see rasterize_preprocessed).  Bands concatenate to the exact same
    image as a single whole-image pass: a gaussian's instances in a band
    are exactly its rect rows clamped to that band (bin_gaussians'
    row_tiles clamp), and compositing never crosses tile rows."""
    B = len(band_caps)
    gy_full = (height + TILE - 1) // TILE
    assert B <= gy_full, (
        f"{B} bands over {gy_full} tile rows would create empty bands; "
        f"callers clamp bands to the tile-row count")
    bounds = [round(b * gy_full / B) for b in range(B + 1)]

    spre = jax.tree.map(jax.lax.stop_gradient, pre)
    alive = spre.valid & (spre.radii > 0)
    P = spre.depths.shape[0]
    depth_key = jnp.where(alive, spre.depths, jnp.float32(3.4e38))
    _, perm = jax.lax.sort((depth_key, jnp.arange(P, dtype=jnp.int32)),
                           num_keys=1)

    colors, depths, fts = [], [], []
    overflow = jnp.zeros((), jnp.int32)
    num_keys = jnp.zeros((), jnp.int32)
    bgj = jnp.asarray(bg, jnp.float32)
    for b in range(B):
        rt = (bounds[b], bounds[b + 1])
        binning = bin_gaussians(spre, width, height, band_caps[b],
                                row_tiles=rt, perm=perm)
        feat = _pack_features(pre, binning, band_caps[b])
        acc_t, logt_t = _composite(feat, binning.chunk_tile,
                                   binning.tile_starts, binning.tile_ends,
                                   binning.slot_valid, width, height, rt)
        geom = _geom(width, height, rt)
        band_h = min(height - geom.row0 * TILE, geom.grid_y * TILE)
        acc = tiles_to_image(acc_t, geom)[:band_h, :width]
        logt = tiles_to_image(logt_t, geom)[:band_h, :width, 0]
        ft = jnp.exp(logt)
        colors.append(acc[..., :3] + ft[..., None] * bgj)
        depths.append(acc[..., 3])
        fts.append(ft)
        overflow = overflow + binning.overflow
        num_keys = num_keys + binning.num_keys
    return TiledRenderOutput(color=jnp.concatenate(colors, axis=0),
                             depth=jnp.concatenate(depths, axis=0),
                             final_T=jnp.concatenate(fts, axis=0),
                             radii=pre.radii, overflow=overflow,
                             num_keys=num_keys)
