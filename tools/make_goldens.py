#!/usr/bin/env python
"""Regenerate the committed golden fidelity packs (tests/goldens/*.npz).

Expected outputs come from the in-house TORCH replicas (tests/test_raft.py,
tests/parity_torch_ref.py) fed deterministic reference-schema checkpoints —
see tools/goldens.py for why these are committed. Run from the repo root:

    python tools/make_goldens.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, os.path.join(_ROOT, "tools"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

import goldens as G  # noqa: E402


def gen_raft(variant: str) -> str:
    import test_raft as TR

    sd_np = G.raft_state_dict_np(variant)
    model = (TR.TorchRAFT() if variant == "basic"
             else TR.TorchRAFTSmall()).eval()
    sd_t = {k[len("module."):]: torch.tensor(v) for k, v in sd_np.items()}
    # the official ResidualBlock registers the downsample norm both as
    # `norm3` and inside the Sequential as `downsample.1` (one shared
    # module, two state_dict entries); the schema/checkpoint carries the
    # downsample.1 name — alias it for strict loading into the replica
    for k in list(sd_t):
        if ".downsample.1." in k:
            sd_t[k.replace(".downsample.1.", ".norm3.")] = sd_t[k]
    model.load_state_dict(sd_t, strict=True)
    img1, img2 = G.raft_golden_inputs(variant)
    with torch.no_grad():
        flow = model(torch.from_numpy(img1).permute(0, 3, 1, 2),
                     torch.from_numpy(img2).permute(0, 3, 1, 2),
                     iters=G.RAFT_GOLDEN_ITERS)
    return G.save_raft_golden(variant,
                              flow.permute(0, 2, 3, 1).numpy())


def gen_inn(arch: str) -> str:
    import test_torch_import as TT
    import parity_torch_ref as T

    cfg_fields = dict(architecture=arch, scale=2, num_coupling=2,
                      lr_window=1, hidden_channels=16, dense_gc=8)
    cfg = TT._cfg(arch, **{k: v for k, v in cfg_fields.items()
                           if k != "architecture"})
    from sin_inn_tpu.models.inn import build_inn_spec, init_inn

    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.PRNGKey(3), spec)
    params = jax.tree_util.tree_map(
        lambda l: l + 0.05 * np.random.default_rng(0).standard_normal(
            l.shape).astype(np.float32), params)
    family = "irn" if arch == "IRN" else "srf"
    sd = (TT.make_irn_sd if arch == "IRN" else TT.make_srf_sd)(spec, params)
    x = np.random.default_rng(1).standard_normal((2, 3, 8, 8)).astype(
        np.float32)
    with torch.no_grad():
        y = T.t_inn_apply(spec, TT._replica_params_from_sd(spec, sd, family),
                          torch.tensor(x))
    sd_np = {k: v.numpy() for k, v in sd.items()}
    return G.save_inn_golden(arch, sd_np, x, y.numpy(), cfg_fields)


if __name__ == "__main__":
    for v in ("basic", "small"):
        print(gen_raft(v))
    for a in ("SRF", "IRN"):
        print(gen_inn(a))
