#!/usr/bin/env python
"""One-command fidelity check against REAL upstream artifacts.

The RAFT port and the FrEIA/IRN importers are pinned in-suite against torch
replicas and committed goldens (tests/goldens/), but the actual upstream
files never existed in this environment (zero egress). The moment someone
drops one, this tool converts the open caveat (VERDICT r3 missing #1/#2)
into a pass/fail:

RAFT (official princeton-vl/RAFT release weights):

    python tools/upstream_diff.py raft --ckpt raft-things.pth
    python tools/upstream_diff.py raft --ckpt raft-small.pth \
        --official /path/to/RAFT   # clone of github.com/princeton-vl/RAFT

  Without --official: loud schema validation + a port run on deterministic
  inputs (prints flow stats + the file's sha256 for the record).
  With --official: runs the official torch model on the same inputs and
  reports the endpoint error between port and official — PASS iff
  mean EPE < --tol (default 0.05 px at 20 iters).

  Expected artifacts (from the official models.zip): raft-things.pth,
  raft-small.pth, raft-sintel.pth, raft-kitti.pth, raft-chairs.pth.
  Record the sha256 printed here alongside the result.

SR INN (a reference training checkpoint — Lightning .ckpt or state_dict):

    python tools/upstream_diff.py sr --ckpt last.ckpt --arch SRF \
        --scale 4 --num-coupling 4 --lr-window 10

  Imports through the production path (schema-validated), exports back,
  and verifies the round-trip reproduces every consumed key BIT-FOR-BIT —
  the proof a reference-side `load_state_dict(strict=True)` needs. If the
  export differs only by a constant module_list shift, says so and points
  at torch_import.renumber_module_list (the one documented unknown: FrEIA's
  graph-slot numbering, torch_import.py module docstring).
"""

from __future__ import annotations

import argparse
import hashlib
import sys

import numpy as np


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def run_raft(args) -> int:
    import jax.numpy as jnp

    from sin_inn_tpu.models import raft

    print(f"artifact: {args.ckpt}\nsha256:   {_sha256(args.ckpt)}")
    params = raft.load_torch_weights(args.ckpt)     # loud schema validation
    variant = raft.detect_variant(params)
    print(f"schema:   OK ({len(params)} tensors, variant={variant})")

    sys.path.insert(0, "tools")
    import goldens as G

    img1, img2 = G.raft_golden_inputs(variant)
    # fidelity diff: the matmul lookup at HIGHEST precision is ulp-exact vs
    # the take form (tests/test_raft.py pins it) at ~9x the take speed —
    # default-precision matmul would spend ~0.045 px of the 0.05 px budget
    # on its own bf16-pass noise at 20 iters (round-5 review). On a CPU
    # backend everything is f32-exact either way.
    import jax

    flow = np.asarray(raft.raft_flow(
        params, jnp.asarray(img1), jnp.asarray(img2), iters=args.iters,
        variant=variant, lookup_precision=jax.lax.Precision.HIGHEST))
    print(f"port flow @ {img1.shape[1]}x{img1.shape[2]}, {args.iters} iters:"
          f" mean |f| = {np.abs(flow).mean():.4f}, max |f| ="
          f" {np.abs(flow).max():.4f}")

    if not args.official:
        print("no --official RAFT repo given: schema + run validated; for "
              "the full numeric diff pass --official /path/to/RAFT")
        return 0

    import torch

    sys.path.insert(0, args.official)
    sys.path.insert(0, f"{args.official}/core")
    from raft import RAFT as OfficialRAFT  # type: ignore

    ns = argparse.Namespace(small=variant == "small", mixed_precision=False,
                            alternate_corr=False, dropout=0)
    model = torch.nn.DataParallel(OfficialRAFT(ns))
    model.load_state_dict(torch.load(args.ckpt, map_location="cpu"))
    model = model.module.eval()
    with torch.no_grad():
        _, ref = model(torch.from_numpy(img1).permute(0, 3, 1, 2),
                       torch.from_numpy(img2).permute(0, 3, 1, 2),
                       iters=args.iters, test_mode=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    epe = np.sqrt(((flow - ref) ** 2).sum(-1)).mean()
    print(f"EPE(port, official) = {epe:.5f} px (tol {args.tol})")
    print("PASS" if epe < args.tol else "FAIL")
    return 0 if epe < args.tol else 1


def run_sr(args) -> int:
    import jax.numpy as jnp

    from sin_inn_tpu.core.config import SRConfig
    from sin_inn_tpu.models import torch_import as TI
    from sin_inn_tpu.models.inn import inn_apply

    print(f"artifact: {args.ckpt}\nsha256:   {_sha256(args.ckpt)}")
    cfg = SRConfig(architecture=args.arch, scale=args.scale,
                   num_coupling=args.num_coupling, lr_window=args.lr_window,
                   hidden_channels=args.hidden_channels,
                   dense_gc=args.dense_gc)
    spec, params = TI.load_reference_checkpoint(args.ckpt, cfg)
    print(f"schema:   OK ({sum(p is not None for p in params)} param layers)")

    ckpt = TI._torch_load(args.ckpt)
    original = TI.flatten_checkpoint(ckpt)
    exported = TI.export_state_dict(spec, params)
    mismatch = bit_exact = 0
    covered = set()
    for k, v in exported.items():
        kk = k[len("inn."):]
        src_key = k if k in original else kk
        src = original.get(src_key)
        if src is None:
            print(f"  exported key missing upstream: {k}")
            mismatch += 1
            continue
        covered.add(src_key)
        if np.array_equal(np.asarray(v), np.asarray(src)):
            bit_exact += 1
        else:
            print(f"  value mismatch: {k}")
            mismatch += 1
    # the REVERSE direction: TRAINABLE upstream keys the export failed to
    # reproduce would make a reference-side strict load reject the exported
    # file even when every produced key matches — they are mismatches too.
    # Parameter-free buffer keys (PermuteRandom permutations, Haar banks)
    # are deliberately NOT exported — they are reconstructed from seeds and
    # the reference reload itself needs strict=False for them
    # (main.py:128-136; the contract is torch_import._check_leftovers) —
    # so they are reported, not counted as failures.
    buffers = 0
    for k in sorted(set(original) - covered):
        if k.endswith(".weight") or k.endswith(".bias"):
            print(f"  upstream trainable key not reproduced by export: {k}")
            mismatch += 1
        else:
            buffers += 1
    print(f"round-trip: {bit_exact} keys bit-exact, {mismatch} mismatched; "
          f"{buffers} parameter-free buffer keys not exported (reference "
          f"loads them with strict=False)")
    if mismatch and args.arch == "SRF":
        print("if EVERY module_list key mismatched by a constant index "
              "shift, fix with torch_import.renumber_module_list (FrEIA "
              "slot-numbering caveat, torch_import.py docstring)")

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    y = np.asarray(inn_apply(spec, params, x))
    print(f"forward OK: out {y.shape}, sha256 "
          f"{hashlib.sha256(y.tobytes()).hexdigest()[:16]}")
    return 0 if mismatch == 0 else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("raft")
    r.add_argument("--ckpt", required=True)
    r.add_argument("--official", default="",
                   help="path to a clone of github.com/princeton-vl/RAFT")
    r.add_argument("--iters", type=int, default=20)
    r.add_argument("--tol", type=float, default=0.05)
    s = sub.add_parser("sr")
    s.add_argument("--ckpt", required=True)
    s.add_argument("--arch", choices=["SRF", "IRN"], default="SRF")
    s.add_argument("--scale", type=int, default=4)
    s.add_argument("--num-coupling", type=int, default=4)
    s.add_argument("--lr-window", type=int, default=10)
    s.add_argument("--hidden-channels", type=int, default=256)
    s.add_argument("--dense-gc", type=int, default=32)
    args = ap.parse_args()
    return run_raft(args) if args.cmd == "raft" else run_sr(args)


if __name__ == "__main__":
    sys.exit(main())
