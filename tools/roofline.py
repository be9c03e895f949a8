#!/usr/bin/env python
"""Analytic speed-of-light model for the 4DGS training-step phases.

For a given problem scale this prints, per phase, the dominant FLOP count
and HBM traffic plus the corresponding v5e roofline floor (max of the
MXU-bound and bandwidth-bound times).  Pair with bench.py's measured
``breakdown_ms`` to see how far each phase sits from speed-of-light and
which resource it ought to be bound by.

The numbers model the DEFAULT code paths (lax.sort binning, fp32
composite); they are estimates for orientation, not guarantees.

Usage: python tools/roofline.py [--pts 921600] [--res 1280x720]
       [--points-alive N] [--chunk 128]
"""

from __future__ import annotations

import argparse
import math

V5E_BF16 = 197e12        # MXU peak, bf16 FLOP/s
V5E_FP32 = V5E_BF16 / 4  # fp32 passes through the MXU at ~1/4 rate
V5E_HBM = 819e9          # HBM bandwidth, bytes/s
TILE = 16
NFEAT = 16


def phase(name, flops, bytes_, fp32=True, note=""):
    peak = V5E_FP32 if fp32 else V5E_BF16
    t_mxu = flops / peak * 1e3
    t_hbm = bytes_ / V5E_HBM * 1e3
    floor = max(t_mxu, t_hbm)
    bound = "MXU" if t_mxu > t_hbm else "HBM"
    print(f"{name:26} {flops/1e9:9.1f} GF {bytes_/1e6:9.0f} MB "
          f"floor {floor:7.2f} ms ({bound}-bound) {note}")
    return floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=921_600)
    ap.add_argument("--res", default="1280x720")
    ap.add_argument("--alive", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--key-cap-mult", type=float, default=4.0)
    args = ap.parse_args()
    W, H = ([int(v) for v in args.res.split("x")] * 2)[:2]
    P = args.pts                      # buffer capacity rows in flight
    A = args.alive or P               # alive points
    K = int(P * args.key_cap_mult)    # key_cap instances
    CH = args.chunk
    ntiles = math.ceil(W / TILE) * math.ceil(H / TILE)
    pcap = K + ntiles * CH
    nchunks = pcap // CH
    pix = TILE * TILE

    print(f"scale: {P} pts ({A} alive), {W}x{H}, key_cap {K}, "
          f"chunk {CH}, {ntiles} tiles, padded_cap {pcap}\n")
    total = 0.0

    # deformation: 12 plane samples/pt (2 scales x 6 planes), one 128-lane
    # patch row (512B) per sample, plus the head MLPs (64-wide)
    gat = 12 * A * 512
    mlp = 2 * A * 64 * (64 + 64 * 5 + 3 + 3 + 4 + 1 + 48)
    total += phase("deform fwd", mlp, gat + A * 4 * 60, fp32=True,
                   note="12 patch gathers/pt dominate latency, not BW")
    total += phase("deform bwd", 2 * mlp, 2 * gat + 12 * A * 8,
                   note="VJP sorts 12x(A) cell ids + segment-sum")

    # preprocess: cov2d/SH per point, ~500 flops/pt
    total += phase("preprocess fwd", 500 * A, A * 60 * 4)

    # binning: depth sort (P rows, ~log2(P)^2/2 compare passes of 8B),
    # expansion scatters/gathers over key_cap, tile sort over key_cap
    lg = math.log2(max(P, 2))
    sort_passes = lg * (lg + 1) / 2
    bin_bytes = (sort_passes * P * 8            # depth sort network
                 + 6 * K * 4 * 3                # expand/relayout gathers
                 + sort_passes * K * 8)         # tile sort (2 operands)
    total += phase("binning (lax.sort)", 0, bin_bytes,
                   note=f"~{sort_passes:.0f} sort passes; counting sort "
                        f"cuts the K-sized term ~{sort_passes/4:.0f}x")

    # pack: one NFEAT-row gather per padded slot
    total += phase("pack fwd", 0, pcap * NFEAT * 4 * 2)

    # composite fwd: tri-matmul cumsum per chunk + contribution matmul
    mm = 2 * pix * CH * CH
    contrib = 2 * pix * CH * 4
    total += phase("composite fwd", nchunks * (mm + contrib),
                   pcap * NFEAT * 4 + ntiles * pix * 5 * 4,
                   note=f"{nchunks} grid steps; ~1-2us/step overhead "
                        f"adds ~{nchunks * 1.5e-3:.0f} ms")
    total += phase("composite bwd", nchunks * (2 * mm + 4 * contrib),
                   pcap * NFEAT * 4 * 2 + ntiles * pix * 9 * 4,
                   note="replays fwd walk + 3 matmuls")

    # expand_rows bwd: un-permute + cumsum over key_cap x NFEAT
    total += phase("pack bwd (segsum)", 0, K * NFEAT * 4 * 4)

    # SSIM fwd+bwd: separable 11-tap depthwise conv, ~4 conv passes each way
    total += phase("ssim fwd+bwd", 8 * 22 * W * H * 3, 8 * W * H * 3 * 4)

    # Adam: 59 trainables/row, m+v+param read+write
    total += phase("adam", 10 * P * 59, P * 59 * 4 * 6)

    print(f"\nspeed-of-light step floor ~ {total:.0f} ms "
          f"({1e3 / total:.1f} it/s) at this scale on one v5e chip")


if __name__ == "__main__":
    main()
