"""MXU-native scan/sort primitives for the training hot path.

Two structural costs dominate the measured backward pass at production
scale (RESULTS.md round-3 profile: 814 ms of the 1271 ms step):

- ``jnp.cumsum`` over a long axis lowers to ~log2(n) shifted-add passes,
  each a full read+write of the array through HBM: a (1.15M, 128) fp32
  cumsum moves ~24 GB.  ``blocked_cumsum`` computes the same inclusive
  prefix sum with ONE pass over the data: per 256-row block a triangular
  MXU contraction (the rasterizer's lane-cumsum trick, rasterize.py:74,
  rotated to the sublane axis) plus a tiny cross-block carry.

- ``lax.sort`` is an O(n log^2 n) comparison network (~log2(n)^2 data
  passes).  The segment-sum VJPs only ever sort small-domain integer keys
  (grid-cell ids), where a 2-pass MXU counting sort (rasterize.py's
  ``rank_by_digit``) is an order of magnitude less data movement.
  ``counting_argsort`` is the stable argsort built from it.

Both are exact in their integer paths; ``blocked_cumsum`` reassociates the
float summation (block-major order), which changes results within normal
fp32 reduction tolerance vs ``jnp.cumsum``'s shift-add order.

Used by the segment-sum backward passes in ``ops/gridsample.py`` and
``ops/rasterize.py`` (gated by MOM_TPU_BLOCK_CUMSUM / MOM_TPU_SEG_RADIX
until the on-chip A/B flips the defaults).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rank_by_digit(digits: jnp.ndarray, n_digits: int,
                  block: int = 256) -> jnp.ndarray:
    """Stable counting-sort rank: position of each element in the array
    stably sorted by ``digits`` (values in [0, n_digits)).

    MXU formulation: per ``block``-element block, a one-hot (block, D)
    matrix against a triangular matmul gives every element's inclusive
    prefix count among equal digits; block histograms cumsum across blocks
    and digit totals cumsum across digits supply the bases.  All integer
    counts stay <= block in bf16 (exact to 256) and <= 16.7M in fp32."""
    N = digits.shape[0]
    if N % block:
        block = 128                      # capacities are always 128-aligned
    assert N % block == 0, (N, block)
    nb = N // block
    d = digits.reshape(nb, block)
    onehot = (d[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, n_digits), 2)).astype(jnp.bfloat16)
    tril = jnp.tril(jnp.ones((block, block), jnp.bfloat16))
    incl = jax.lax.dot_general(
        tril, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (block, nb, D)
    incl = incl.transpose(1, 0, 2)                     # (nb, block, D)
    rank_in_block = jnp.sum(incl * (onehot != 0), axis=-1) - 1.0
    hist = incl[:, -1, :]                              # (nb, D)
    block_base = jnp.cumsum(hist, axis=0) - hist       # (nb, D) exclusive
    counts = jnp.sum(hist, axis=0)                     # (D,)
    digit_base = jnp.cumsum(counts) - counts           # (D,)
    base = jnp.take_along_axis(digit_base[None] + block_base, d, axis=1)
    return (base + rank_in_block).astype(jnp.int32).reshape(N)


def _apply_rank(rank: jnp.ndarray, *cols: jnp.ndarray):
    """src[p] = index whose rank is p, then gather every column at src with
    ONE packed row gather (scalar gathers at millions of indices are
    HBM-latency bound — same lesson as rasterize._gather_packed_rows)."""
    n = rank.shape[0]
    src = jnp.zeros(n, jnp.int32).at[rank].set(
        jax.lax.iota(jnp.int32, n), unique_indices=True)
    if len(cols) == 1:
        return src, (cols[0][src],)
    table = jnp.stack(cols, axis=1)
    rows = table[src]
    return src, tuple(rows[:, i] for i in range(len(cols)))


def counting_argsort(idx: jnp.ndarray, n_vals: int,
                     radix: int = 128) -> jnp.ndarray:
    """Stable argsort of int32 ``idx`` with values in [0, n_vals): returns
    ``order`` s.t. idx[order] is sorted and equal values keep input order —
    exactly ``lax.sort((idx, iota), num_keys=1)[1]``.

    LSD counting sort: one rank pass on the low ``radix`` digit, one on the
    high digit (so at most radix^2 distinct values per 2 passes; n_vals up
    to 16,384 covers every hexplane resolution at radix=128).  Lengths not
    128-aligned are padded with a sentinel that stably sorts last."""
    n = idx.shape[0]
    npad = (-n) % 128
    hi_digits = (n_vals + radix - 1) // radix
    if npad:
        idx = jnp.concatenate(
            [idx, jnp.full(npad, radix * hi_digits - 1, jnp.int32)])
    order = jax.lax.iota(jnp.int32, n + npad)
    if n_vals <= radix:                    # single pass suffices
        r = rank_by_digit(jnp.minimum(idx, radix - 1), radix)
        _, (order,) = _apply_rank(r, order)
        return order[:n]
    r1 = rank_by_digit(idx % radix, radix)
    _, (idx1, order) = _apply_rank(r1, idx, order)
    # pad sentinel = radix*hi_digits - 1, whose high digit is hi_digits - 1:
    # pads sort last among the max-value class by stability
    r2 = rank_by_digit(idx1 // radix, hi_digits)
    _, (order,) = _apply_rank(r2, order)
    return order[:n]


def blocked_cumsum(x: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Inclusive cumulative sum of a 2D (N, C) array along axis 0 in ONE
    data pass: per-block prefix sums as a triangular MXU contraction plus a
    cheap cross-block carry — vs jnp.cumsum's ~log2(N) full HBM passes.

    fp32 inputs contract in fp32 (preferred_element_type) so per-block
    partials carry full precision; the result differs from jnp.cumsum only
    by fp32 reassociation.  Falls back to jnp.cumsum when N is not
    128-aligned (production capacities always are)."""
    N, C = x.shape
    if N % block:
        block = 128
    if N % block or N < 2 * block:
        return jnp.cumsum(x, axis=0)
    nb = N // block
    xb = x.reshape(nb, block, C)
    ii = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tril = (ii >= jj).astype(x.dtype)
    within = jax.lax.dot_general(
        tril, xb, (((1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST)           # (block, nb, C)
    within = within.transpose(1, 0, 2)                 # (nb, block, C)
    totals = within[:, -1, :]                          # (nb, C)
    carry = jnp.cumsum(totals, axis=0) - totals        # exclusive, tiny
    return (within + carry[:, None, :]).reshape(N, C)
