"""Golden fidelity packs for the torch importers (VERDICT r3 → r4 item 4).

The RAFT port and the FrEIA/IRN checkpoint importers are validated in-suite
against in-house torch replicas built in the same process — which cannot
catch a convention drift shared by replica and port over time. The goldens
freeze today's replica behavior into committed artifacts:

  * ``tests/goldens/raft_{basic,small}.npz`` — fixed inputs + the torch
    REPLICA's flow output for a deterministic official-schema checkpoint.
    The checkpoint itself is regenerated from :func:`raft_state_dict_np`
    (pure numpy ``RandomState`` — stable across numpy versions, unlike
    torch RNG streams) rather than committed (~21 MB of random floats).
  * ``tests/goldens/inn_{srf,irn}.npz`` — a tiny reference-schema
    state_dict (stored verbatim), a fixed input, and the torch replica's
    forward output.

``tools/make_goldens.py`` regenerates them (imports the tests replicas);
``tests/test_goldens.py`` verifies the live importers/ports against them.
For validation against REAL upstream artifacts (raft-things.pth, a FrEIA
checkpoint) see ``tools/upstream_diff.py``.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

RAFT_SEED = {"basic": 5, "small": 7}
# H/8 must be >= 16 so the 4th corr-pyramid level stays >= 2x2 (the
# replica's (W-1) normalization divides by zero on 1-px levels)
RAFT_GOLDEN_SHAPE = (1, 128, 160, 3)
RAFT_GOLDEN_ITERS = 3


def raft_state_dict_np(variant: str = "basic") -> Dict[str, np.ndarray]:
    """Deterministic checkpoint in the OFFICIAL release schema: ``module.``
    DataParallel prefix, OIHW conv layout, ``num_batches_tracked`` counters
    (princeton-vl/RAFT `raft-things.pth` / `raft-small.pth` shape-for-shape;
    reference consumes them at video-interpolation/data.py:32-62).

    Weights use the replica tests' well-conditioned scaling (small recurrent
    gain) so 3 GRU iterations stay numerically tame.
    """
    from sin_inn_tpu.models.raft import param_schema

    rng = np.random.RandomState(RAFT_SEED[variant])
    sd: Dict[str, np.ndarray] = {}
    for name, shape in sorted(param_schema(variant).items()):
        if name.endswith("running_var"):
            arr = (rng.rand(*shape) + 0.5)
        elif name.endswith("running_mean"):
            arr = 0.1 * rng.randn(*shape)
        elif name.endswith("bias"):
            arr = 0.1 * rng.randn(*shape)
        elif len(shape) == 1:               # batch-norm weight
            arr = rng.rand(*shape) + 0.5
        else:                               # conv kernel, schema HWIO
            kh, kw, cin, _ = shape
            arr = 0.3 * rng.randn(*shape) / np.sqrt(max(kh * kw * cin, 1))
            arr = arr.transpose(3, 2, 0, 1)             # -> OIHW
        sd[f"module.{name}"] = np.asarray(arr, np.float32)
        if name.endswith("running_mean"):
            base = name[: -len("running_mean")]
            sd[f"module.{base}num_batches_tracked"] = np.asarray(
                100, np.int64)
    return sd


def raft_golden_inputs(variant: str = "basic"):
    rng = np.random.RandomState(RAFT_SEED[variant] + 100)
    img1 = (rng.rand(*RAFT_GOLDEN_SHAPE) * 255).astype(np.float32)
    img2 = (rng.rand(*RAFT_GOLDEN_SHAPE) * 255).astype(np.float32)
    return img1, img2


def save_raft_golden(variant: str, flow: np.ndarray, path: str = ""):
    path = path or os.path.join(GOLDEN_DIR, f"raft_{variant}.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img1, img2 = raft_golden_inputs(variant)
    np.savez_compressed(path, flow=np.asarray(flow, np.float32),
                        img1=img1, img2=img2,
                        iters=RAFT_GOLDEN_ITERS, variant=variant)
    return path


def save_inn_golden(arch: str, sd: Dict[str, np.ndarray], x: np.ndarray,
                    y: np.ndarray, cfg_fields: Dict, path: str = ""):
    path = path or os.path.join(GOLDEN_DIR, f"inn_{arch.lower()}.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import json

    payload = {f"sd:{k}": np.asarray(v, np.float32) for k, v in sd.items()}
    np.savez_compressed(path, x=np.asarray(x, np.float32),
                        y=np.asarray(y, np.float32),
                        cfg=json.dumps(cfg_fields), **payload)
    return path


def load_inn_golden(path: str):
    import json

    z = np.load(path)
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd:")}
    return sd, z["x"], z["y"], json.loads(str(z["cfg"]))
