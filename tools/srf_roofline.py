#!/usr/bin/env python
"""SRF flagship roofline closure (VERDICT r4 weak #5).

Reproduces for the headline SRF train step what ``dense_block_apply``'s
docstring did for IRN: per-matmul MXU tile-quantization (padded-FLOP)
accounting plus an im2col/activation HBM-traffic estimate, so the measured
~45 ms step (~29% MFU on REAL FLOPs) can be attributed instead of
hand-waved as "fusion/HBM-bound".

Model (per conv, following the ops/subnet.py conventions):
  * a matmul costs ceil(K/128)*ceil(N/128) MXU tile passes streaming M
    rows => padded FLOPs = 2*M*pad128(K)*pad128(N);
  * the jitted train step back-props BOTH INN passes, so each conv runs
    three matmuls: fwd (M, k^2*cin, cout), dgrad (M, k^2*cout, cin) and
    wgrad (k^2*cin, M, cout) — wgrad's contraction dim is M (no 128-pad),
    its output tile is (k^2*cin x cout);
  * traffic: per conv read M*cin + write M*cout values; 3x3 convs add an
    im2col patch buffer M*9*cin on the forward AND the wgrad (the IRN
    im2col record); elementwise coupling glue (exp/atan chains) reads and
    writes the full (M, c) activation a handful of times unless fused.

Run anywhere (pure arithmetic — no devices needed):

    python tools/srf_roofline.py [--batch 8] [--height 360] [--width 640]
"""

from __future__ import annotations

import argparse
import json


def pad128(v: int) -> int:
    return (v + 127) // 128 * 128


def conv_cost(M: int, k: int, cin: int, cout: int):
    """(real, padded) FLOPs for fwd+dgrad+wgrad of one conv."""
    K = k * k * cin
    real_fwd = 2.0 * M * K * cout
    pad_fwd = 2.0 * M * pad128(K) * pad128(cout)
    # dgrad: cotangent (M, cout) x kernel^T -> (M, cin); K = k^2*cout
    real_dgrad = 2.0 * M * (k * k * cout) * cin
    pad_dgrad = 2.0 * M * pad128(k * k * cout) * pad128(cin)
    # wgrad: im2col^T (k^2*cin, M) @ cotangent (M, cout); contraction = M
    real_wgrad = 2.0 * (k * k * cin) * M * cout
    pad_wgrad = 2.0 * pad128(k * k * cin) * M * pad128(cout)
    return (real_fwd + real_dgrad + real_wgrad,
            pad_fwd + pad_dgrad + pad_wgrad,
            real_fwd, pad_fwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--num-coupling", type=int, default=4)
    ap.add_argument("--peak-tflops", type=float, default=151.0,
                    help="measured bf16 matmul peak (CLAUDE.md)")
    ap.add_argument("--hbm-gbps", type=float, default=819.0,
                    help="v5e HBM bandwidth")
    ap.add_argument("--measured-step-ms", type=float, default=45.0)
    args = ap.parse_args()

    b, h, w = args.batch, args.height, args.width
    hidden, nc = args.hidden, args.num_coupling

    rows = []
    tot = {"real": 0.0, "pad": 0.0, "traffic": 0.0}
    # flagship scale-4 SRF: initial squeeze then two octaves
    # (models/inn.py build_srf_spec; c: 3 -> 12 -> 48 -> 192)
    c = 12
    hh, ww = h // 2, w // 2
    for octi in range(2):
        c *= 4
        hh //= 2
        ww //= 2
        M = b * hh * ww
        len1 = c // 2
        for kk in range(nc):
            k = 3 if kk % 2 == 0 else 1
            # two subnets per GLOW coupling, each two convs; each pass
            # (fwd INN + inv INN) evaluates both subnets once -> x2 passes
            real = pad = fwd_real = fwd_pad = 0.0
            for (cin, cout) in ((len1, hidden), (hidden, 2 * (c - len1)),
                                (c - len1, hidden), (hidden, 2 * len1)):
                r, p, rf, pf = conv_cost(M, k, cin, cout)
                real += 2 * r            # both INN passes
                pad += 2 * p
                fwd_real += 2 * rf
                fwd_pad += 2 * pf
            # traffic (f32 bytes): per conv in/out + im2col on 3x3s (fwd
            # and wgrad), both passes; coupling glue ~4 extra (M, c) rw
            tr = 0.0
            for (cin, cout) in ((len1, hidden), (hidden, 2 * (c - len1)),
                                (c - len1, hidden), (hidden, 2 * len1)):
                tr += M * (cin + cout) * 4 * 3          # fwd+dgrad+wgrad io
                if k == 3:
                    tr += 2 * M * 9 * cin * 4           # im2col fwd + wgrad
            tr += 4 * M * c * 4 * 2
            tr *= 2                                      # both INN passes
            rows.append({"oct": octi + 1, "k": k, "c": c, "M": M,
                         "real_GF": round(real / 1e9, 1),
                         "pad_GF": round(pad / 1e9, 1),
                         "pad_over_real": round(pad / real, 2),
                         "traffic_GB": round(tr / 1e9, 2)})
            tot["real"] += real
            tot["pad"] += pad
            tot["traffic"] += tr

    for r in rows:
        print(json.dumps(r))
    t_flops_pad = tot["pad"] / (args.peak_tflops * 1e12) * 1e3
    t_traffic = tot["traffic"] / (args.hbm_gbps * 1e9) * 1e3
    summary = {
        "total_real_TF": round(tot["real"] / 1e12, 3),
        "total_padded_TF": round(tot["pad"] / 1e12, 3),
        "padded_over_real": round(tot["pad"] / tot["real"], 2),
        "min_ms_at_padded_peak": round(t_flops_pad, 1),
        "traffic_GB": round(tot["traffic"] / 1e9, 2),
        "min_ms_at_hbm_bw": round(t_traffic, 1),
        "roofline_ms": round(max(t_flops_pad, t_traffic), 1),
        "measured_ms": args.measured_step_ms,
        "measured_over_roofline": round(
            args.measured_step_ms / max(t_flops_pad, t_traffic), 2),
        "achieved_padded_TFLOPs": round(
            tot["pad"] / (args.measured_step_ms * 1e-3) / 1e12, 1),
        "achieved_real_TFLOPs": round(
            tot["real"] / (args.measured_step_ms * 1e-3) / 1e12, 1),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
