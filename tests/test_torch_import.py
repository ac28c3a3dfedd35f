"""Reference torch-checkpoint importer (models/torch_import.py).

Builds state_dicts with the reference's exact key schemas —
``operations.{i}.{F,G,H}.conv{1..5}`` for InvRescaleNet
(/root/reference/archs.py:201-233) and ``module_list.{i}.s{1,2}.{0,2}`` for
the FrEIA UncondSRFlow graph (/root/reference/archs.py:19-71) — and checks

* round-trip: params -> reference state_dict -> import == original params;
* semantics: the imported params run through ``inn_apply`` agree with the
  independent torch replica (``parity_torch_ref``) fed the SAME state_dict
  through its own test-local adapter — catching transpose, ordering, octave,
  and role-assignment errors, not just naming;
* the Lightning wrapper format (``inn.`` prefix, ``state_dict`` +
  ``hyper_parameters``) through a real ``torch.save`` file, including the
  hyperparameter cross-check;
* loud failures on schema mismatches (wrong arch size, foreign trainable
  keys, corrupted Haar banks).
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import parity_torch_ref as T
from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.models import torch_import as TI
from sin_inn_tpu.models.inn import build_inn_spec, init_inn, inn_apply
from sin_inn_tpu.train import sr as SR


def _cfg(arch, **kw):
    kw.setdefault("scale", 2)
    kw.setdefault("num_coupling", 2)
    kw.setdefault("lr_window", 1)
    kw.setdefault("hidden_channels", 16)
    kw.setdefault("dense_gc", 8)
    return SRConfig(architecture=arch, **kw)


def _oihw(p):
    return torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))


def _haar_bank(c):
    f = np.ones((4, 1, 2, 2), np.float32)
    f[1, 0, 0, 1] = f[1, 0, 1, 1] = -1.0
    f[2, 0, 1, 0] = f[2, 0, 1, 1] = -1.0
    f[3, 0, 1, 0] = f[3, 0, 0, 1] = -1.0
    return np.concatenate([f] * c, axis=0)


def make_irn_sd(spec, params, c_in=3):
    """Reference-schema state_dict from a params pytree (archs.py naming:
    operations.{i} in op order, F/G/H DenseBlocks with conv1..conv5)."""
    sd = {}
    c = c_in
    for i, (layer, p) in enumerate(zip(spec, params)):
        if layer.kind == "haar":
            sd[f"operations.{i}.haar_weights"] = torch.tensor(_haar_bank(c))
            c *= 4
            continue
        for sub in ("F", "G", "H"):
            for ci in range(1, 6):
                sd[f"operations.{i}.{sub}.conv{ci}.weight"] = _oihw(
                    p[sub][f"conv{ci}"])
                sd[f"operations.{i}.{sub}.conv{ci}.bias"] = torch.tensor(
                    np.asarray(p[sub][f"conv{ci}"]["b"]))
    return sd


def make_srf_sd(spec, params):
    """FrEIA-schema state_dict (module_list.{i}.s{1,2}.{0,2}). Uses sparse
    module_list indices — squeezes/permutes occupy graph slots without
    parameters — to exercise the index-robust coupling grouping."""
    sd = {}
    mi = 0
    for layer, p in zip(spec, params):
        if layer.kind != "glow":
            mi += 1  # param-less module occupies a graph slot
            continue
        for sub in ("s1", "s2"):
            for cname, si in (("conv1", 0), ("conv2", 2)):
                sd[f"module_list.{mi}.{sub}.{si}.weight"] = _oihw(
                    p[sub][cname])
                sd[f"module_list.{mi}.{sub}.{si}.bias"] = torch.tensor(
                    np.asarray(p[sub][cname]["b"]))
        mi += 1
    return sd


def _replica_params_from_sd(spec, sd, family):
    """Test-local adapter: reference state_dict -> parity_torch_ref param
    format (torch OIHW dicts), written directly against the reference's
    attribute semantics — independent of the importer under test."""
    out = []
    op_i = 0
    mi = 0
    for layer in spec:
        if family == "irn":
            if layer.kind == "haar":
                out.append(None)
                op_i += 1
                continue
            p = {}
            for sub in ("F", "G", "H"):
                p[sub] = {f"conv{ci}": {
                    "w": sd[f"operations.{op_i}.{sub}.conv{ci}.weight"],
                    "b": sd[f"operations.{op_i}.{sub}.conv{ci}.bias"]}
                    for ci in range(1, 6)}
            out.append(p)
            op_i += 1
        else:
            if layer.kind != "glow":
                out.append(None)
                mi += 1
                continue
            p = {}
            for sub in ("s1", "s2"):
                p[sub] = {cname: {
                    "w": sd[f"module_list.{mi}.{sub}.{si}.weight"],
                    "b": sd[f"module_list.{mi}.{sub}.{si}.bias"]}
                    for cname, si in (("conv1", 0), ("conv2", 2))}
            out.append(p)
            mi += 1
    return out


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0,
                                   atol=0)


@pytest.mark.parametrize("arch", ["IRN", "SRF"])
def test_roundtrip_and_semantics(arch):
    cfg = _cfg(arch)
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.PRNGKey(3), spec)
    # zero-init conv5s make the IRN forward ~identity; randomize everything
    params = jax.tree_util.tree_map(
        lambda l: l + 0.05 * np.random.default_rng(0).standard_normal(
            l.shape).astype(np.float32), params)

    family = "irn" if arch == "IRN" else "srf"
    sd = (make_irn_sd if arch == "IRN" else
          lambda s, p: make_srf_sd(s, p))(spec, params)
    imported = TI.import_state_dict(spec, dict(sd))
    _tree_allclose(imported, params)

    # semantic parity: same state_dict through the independent torch replica
    x = np.random.default_rng(1).standard_normal((2, 3, 8, 8)).astype(
        np.float32)
    ours = inn_apply(spec, imported, jnp.asarray(x.transpose(0, 2, 3, 1)))
    theirs = T.t_inn_apply(spec, _replica_params_from_sd(spec, sd, family),
                           torch.tensor(x))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy().transpose(0, 2, 3, 1),
        atol=2e-5)
    # and back through the inverse
    inv = inn_apply(spec, imported, ours, rev=True)
    np.testing.assert_allclose(np.asarray(inv), x.transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_lightning_checkpoint_file(tmp_path):
    cfg = _cfg("IRN")
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.PRNGKey(5), spec)
    sd = {f"inn.{k}": v for k, v in make_irn_sd(spec, params).items()}
    opt = argparse.Namespace(architecture="IRN", scale=cfg.scale,
                             num_coupling=cfg.num_coupling)
    ckpt = {"state_dict": sd, "hyper_parameters": {"opt": opt},
            "epoch": 7}
    path = tmp_path / "ref.ckpt"
    torch.save(ckpt, path)

    spec2, imported = TI.load_reference_checkpoint(str(path), cfg)
    _tree_allclose(imported, params)

    # hyperparameter cross-check: wrong num_coupling for this checkpoint
    with pytest.raises(TI.TorchImportError, match="num_coupling"):
        TI.load_reference_checkpoint(str(path),
                                     cfg.replace(num_coupling=1))


def test_create_train_state_imports(tmp_path):
    cfg = _cfg("IRN")
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.PRNGKey(5), spec)
    path = tmp_path / "ref.ckpt"
    torch.save({"state_dict": {f"inn.{k}": v for k, v in
                               make_irn_sd(spec, params).items()}}, path)
    _, state, _ = SR.create_train_state(
        jax.random.PRNGKey(0), cfg.replace(import_torch=str(path)))
    _tree_allclose(state.params, params)


def test_schema_mismatches_fail_loudly():
    cfg = _cfg("IRN")
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.PRNGKey(1), spec)
    sd = make_irn_sd(spec, params)

    # wrong arch size: a num_coupling=1 spec can't take this checkpoint
    spec1, _ = build_inn_spec(cfg.replace(num_coupling=1), c=3)
    with pytest.raises(TI.TorchImportError, match="sequence"):
        TI.import_state_dict(spec1, dict(sd))

    # a trainable key the mapping didn't consume
    bad = dict(sd)
    bad["operations.9.extra.weight"] = torch.zeros(1, 1, 1, 1)
    with pytest.raises(TI.TorchImportError):
        TI.import_state_dict(spec, bad)

    # corrupted fixed Haar bank
    bad = dict(sd)
    bad["operations.0.haar_weights"] = torch.zeros_like(
        bad["operations.0.haar_weights"])
    with pytest.raises(TI.TorchImportError, match="Haar"):
        TI.import_state_dict(spec, bad)

    # SRF: wrong kernel alternation is caught by shape validation
    cfg_s = _cfg("SRF")
    spec_s, _ = build_inn_spec(cfg_s, c=3)
    params_s = init_inn(jax.random.PRNGKey(2), spec_s)
    sd_s = make_srf_sd(spec_s, params_s)
    k = "module_list.2.s1.0.weight"
    assert k in sd_s
    bad = dict(sd_s)
    bad[k] = bad[k][:, :, :1, :1]  # 3x3 coupling handed a 1x1 kernel
    with pytest.raises(TI.TorchImportError):
        TI.import_state_dict(spec_s, bad)


# ===========================================================================
# Flow pipeline (INR + controller) checkpoints
# ===========================================================================

from sin_inn_tpu.core.config import FlowConfig
from sin_inn_tpu.models import controllers as ctrl
from sin_inn_tpu.models.inr import inr_apply
from sin_inn_tpu.train import flow as FT

# reverse of torch_import._ENC_BUFFERS: our (pytree, name) -> reference buffer
_ENC_REV = {
    "rbf": [("consts", "centres", "centres"), ("consts", "sigma", "sigma")],
    "gaussian_ff": [("consts", "frequencies", "frequencies")],
    "rotated_ff": [("params", "frequencies", "frequencies"),
                   ("consts", "magnitudes", "magnitudes")],
    "positional": [("consts", "freqs", "freqs")],
    "rbf_grid_uniform": [("consts", "offsets", "offsets"),
                         ("consts", "sigma", "sigma")],
    "piecewise_uniform": [("consts", "frequencies", "frequencies")],
}


def _flow_cfg(**kw):
    kw.setdefault("net", "RBF")
    kw.setdefault("num_frequencies", 8)
    kw.setdefault("hidden_dim", 16)
    kw.setdefault("num_layers", 2)
    kw.setdefault("epochs", 40)
    return FlowConfig(**kw)


def make_flow_sd(spec, params, consts, counts=None, spatial_extra=None):
    """Reference-schema flow state_dict (trainer.py self.net +
    progressive_controller/model.py naming) from our pytrees."""
    sd = {}
    mp = "net.model." if counts is not None else "net."
    for j, lin in enumerate(params["mlp"]):
        if spec.kind == "siren":
            bare = j == len(params["mlp"]) - 1
            prefix = f"{mp}model.{j}" if bare else f"{mp}model.{j}.linear"
        else:
            prefix = f"{mp}model.model.{2 * j}"
        sd[f"{prefix}.weight"] = torch.tensor(np.asarray(lin["w"]).T)
        sd[f"{prefix}.bias"] = torch.tensor(np.asarray(lin["b"]))
    if spec.kind == "encoded":
        for tree, ours, ref in _ENC_REV[spec.encoding]:
            src = params["enc"] if tree == "params" else consts["enc"]
            sd[f"{mp}encode.{ref}"] = torch.tensor(np.asarray(src[ours]))
    if counts is not None:
        sd["net.mask_stashed"] = torch.tensor(
            np.asarray(counts, np.float32))
        for k, v in (spatial_extra or {}).items():
            sd[f"net.{k}"] = torch.tensor(np.asarray(v, np.float32))
    return sd


def test_mask_from_counts_matches_reference_rule():
    """mask_from_counts vs a direct torch transcription of load_mask
    (progressive_controller.py:57-67)."""
    e = 9
    counts = torch.tensor([0.0, 0.5, 3.0, 6.7, 9.0])
    mask = torch.zeros(counts.shape[0], e)
    arange = torch.arange(e).unsqueeze(0).repeat(counts.shape[0], 1)
    fill_a = arange.lt(torch.floor(counts[:, None]))
    fill_b = ~fill_a * arange.le(counts[:, None])
    mask[fill_a] = 1
    mask[fill_b] = counts[counts.lt(e)] % 1
    ours = TI.mask_from_counts(counts.numpy(), e)
    np.testing.assert_allclose(ours, mask.numpy(), atol=0)


@pytest.mark.parametrize("net", ["RBF", "FFN", "RFF", "PE", "RBFG", "siren",
                                 "base"])
def test_flow_nonprogressive_roundtrip(net):
    cfg = _flow_cfg(net=net)
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(0), cfg)
    assert ctrl_state is None
    sd = make_flow_sd(spec, params, consts)
    p2, c2, s2 = TI.import_flow_state_dict(spec, ctrl_cfg, ctrl_state,
                                           params, consts, sd)
    _tree_allclose(p2, params)
    _tree_allclose(c2, consts)
    # imported model reproduces the original forward exactly
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (32, spec.domain_dim)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(inr_apply(spec, p2, c2, x)),
                               np.asarray(inr_apply(spec, params, consts, x)),
                               atol=0)


@pytest.mark.parametrize("net", ["PFF", "PRBF", "MPFF", "PRFF"])
def test_flow_progressive_roundtrip(net):
    cfg = _flow_cfg(net=net)
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(1), cfg)
    sd = make_flow_sd(spec, params, consts, counts=[7.3])
    p2, c2, s2 = TI.import_flow_state_dict(spec, ctrl_cfg, ctrl_state,
                                           params, consts, sd)
    _tree_allclose(p2, params)
    mask = np.asarray(s2.mask)
    assert mask.shape == (spec.encoding_dim,)
    np.testing.assert_allclose(mask[:7], 1.0)
    np.testing.assert_allclose(mask[7], 0.3, rtol=1e-6)
    np.testing.assert_allclose(mask[8:], 0.0)


def test_flow_spatial_roundtrip():
    cfg = _flow_cfg(net="PFF", spatially_adaptive=True, spatial_res=3)
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(2), cfg)
    cells = ctrl_cfg.cells
    rng = np.random.default_rng(3)
    counts = rng.uniform(0, spec.encoding_dim, (cells,)).astype(np.float32)
    extra = {"in_progress": rng.integers(0, 2, (cells,)),
             "log_buffer": rng.standard_normal((cells,)),
             "log_counter": rng.uniform(0, 5, (cells,))}
    sd = make_flow_sd(spec, params, consts, counts=counts,
                      spatial_extra=extra)
    p2, c2, s2 = TI.import_flow_state_dict(spec, ctrl_cfg, ctrl_state,
                                           params, consts, sd)
    assert isinstance(s2, ctrl.SpatialState)
    np.testing.assert_allclose(np.asarray(s2.mask),
                               TI.mask_from_counts(counts,
                                                   spec.encoding_dim))
    np.testing.assert_allclose(np.asarray(s2.log_buffer),
                               extra["log_buffer"].astype(np.float32),
                               rtol=1e-6)
    assert np.array_equal(np.asarray(s2.in_progress),
                          extra["in_progress"].astype(bool))


def test_flow_schema_mismatches():
    cfg = _flow_cfg(net="PFF")
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(0), cfg)
    sd = make_flow_sd(spec, params, consts, counts=[3.0])

    # progressive config, non-progressive checkpoint
    sd_nomask = {k: v for k, v in sd.items() if k != "net.mask_stashed"}
    with pytest.raises(TI.TorchImportError, match="no\ncontroller mask"
                       .replace("\n", " ")):
        TI.import_flow_state_dict(spec, ctrl_cfg, ctrl_state, params,
                                  consts, sd_nomask)

    # non-progressive config, controller checkpoint
    cfg_np = _flow_cfg(net="FFN")
    spec_np, params_np, consts_np, cc_np, cs_np = FT.build_flow_model(
        jax.random.PRNGKey(0), cfg_np)
    with pytest.raises(TI.TorchImportError, match="not progressive"):
        TI.import_flow_state_dict(spec_np, cc_np, cs_np, params_np,
                                  consts_np, sd)

    # wrong num_frequencies shows up as a loud shape error
    cfg_big = _flow_cfg(net="PFF", num_frequencies=16)
    spec_b, params_b, consts_b, cc_b, cs_b = FT.build_flow_model(
        jax.random.PRNGKey(0), cfg_big)
    with pytest.raises(TI.TorchImportError, match="shape"):
        TI.import_flow_state_dict(spec_b, cc_b, cs_b, params_b, consts_b,
                                  sd)

    # spatial checkpoint into a vector controller config
    cells = 27
    sd_sp = make_flow_sd(spec, params, consts,
                         counts=np.full((cells,), 3.0, np.float32))
    with pytest.raises(TI.TorchImportError, match="spatial"):
        TI.import_flow_state_dict(spec, ctrl_cfg, ctrl_state, params,
                                  consts, sd_sp)


# ===========================================================================
# Export (reverse direction): framework -> reference-loadable state_dict
# ===========================================================================

@pytest.mark.parametrize("arch", ["IRN", "SRF"])
def test_sr_export_roundtrip(arch, tmp_path):
    cfg = _cfg(arch)
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.PRNGKey(7), spec)
    sd = TI.export_state_dict(spec, params)
    assert all(k.startswith("inn.") for k in sd)
    p = tmp_path / "export.ckpt"
    TI.save_reference_checkpoint(str(p), sd)
    _, imported = TI.load_reference_checkpoint(str(p), cfg)
    _tree_allclose(imported, params)


@pytest.mark.parametrize("net,spatial", [("RBF", False), ("PFF", False),
                                         ("PFF", True), ("siren", False)])
def test_flow_export_roundtrip(net, spatial, tmp_path):
    cfg = _flow_cfg(net=net, spatially_adaptive=spatial, spatial_res=3)
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(8), cfg)
    # canonical masks (prefix-of-ones + fraction) survive the reference's
    # lossy count serialization exactly
    if ctrl_state is not None:
        if spatial:
            counts = np.linspace(0.5, spec.encoding_dim,
                                 ctrl_cfg.cells).astype(np.float32)
            ctrl_state = ctrl_state._replace(
                mask=jnp.asarray(TI.mask_from_counts(counts,
                                                     spec.encoding_dim)),
                log_buffer=jnp.arange(ctrl_cfg.cells, dtype=jnp.float32))
        else:
            ctrl_state = ctrl_state._replace(
                mask=jnp.asarray(TI.mask_from_counts(
                    [7.25], spec.encoding_dim)[0]))
    sd = TI.export_flow_state_dict(spec, ctrl_state, params, consts)
    p = tmp_path / "export.ckpt"
    TI.save_reference_checkpoint(str(p), sd)
    p2, c2, s2 = TI.load_flow_reference_checkpoint(
        str(p), spec, ctrl_cfg,
        FT.build_flow_model(jax.random.PRNGKey(9), cfg)[4], params, consts)
    _tree_allclose(p2, params)
    _tree_allclose(c2, consts)
    if ctrl_state is not None:
        np.testing.assert_allclose(np.asarray(s2.mask),
                                   np.asarray(ctrl_state.mask), atol=1e-6)
        if spatial:
            np.testing.assert_allclose(np.asarray(s2.log_buffer),
                                       np.asarray(ctrl_state.log_buffer))


# ===========================================================================
# Driver precedence + consts persistence (train/loop.py restore helpers)
# ===========================================================================

def test_sr_checkpoint_wins_over_import_and_skips_torch_load(tmp_path, caplog):
    """One precedence rule everywhere: an on-disk framework checkpoint beats
    --import-torch, loudly, and the torch.load/schema validation are skipped
    entirely — proven by pointing import_torch at a nonexistent file."""
    import logging
    import os.path as path

    from sin_inn_tpu.core.checkpoint import CheckpointStore
    from sin_inn_tpu.train.loop import _sr_create_and_restore, sr_dirs

    cfg = _cfg("IRN", working_dir=str(tmp_path))
    spec, state, _ = SR.create_train_state(jax.random.PRNGKey(3), cfg)
    marked = state._replace(step=jnp.asarray(7, jnp.int32))
    CheckpointStore(path.join(sr_dirs(cfg, "train"), "checkpoints")).save(
        1, marked)
    with caplog.at_level(logging.WARNING):
        _, s2, _, _, start = _sr_create_and_restore(
            cfg.replace(import_torch=str(tmp_path / "missing.ckpt")),
            jax.random.PRNGKey(0))
    assert start == 1 and int(s2.step) == 7
    assert "takes precedence" in caplog.text


def test_flow_imported_consts_survive_checkpoint_roundtrip(tmp_path):
    """Regression: flow --import-torch replaces the encoding consts; a later
    test/export WITHOUT the flag must restore those consts from the
    framework checkpoint, never rebuild seed-random ones (checkpoints carry
    {"state", "consts"} since round 3)."""
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import (_flow_create_and_restore,
                                        run_flow_train)

    cfg = _flow_cfg(net="RBF", epochs=1,
                    checkpoints_dir=str(tmp_path / "ck"),
                    results_dir=str(tmp_path / "res"))
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(0), cfg)
    # a reference checkpoint whose buffers no seed would reproduce
    mod = jax.tree_util.tree_map(lambda a: np.asarray(a) * 1.5 + 0.25, consts)
    sd = make_flow_sd(spec, params, mod)
    ref = tmp_path / "ref.ckpt"
    torch.save({"state_dict": sd}, ref)

    video = np.random.RandomState(0).rand(3, 12, 16, 3).astype(np.float32)
    run_flow_train(cfg.replace(import_torch=str(ref)),
                   media=FlowMedia(video), scene="sc")
    _, _, c2, _, _, _, step = _flow_create_and_restore(
        cfg, jax.random.PRNGKey(1), "sc")
    assert step >= 1
    np.testing.assert_allclose(np.asarray(c2["enc"]["centres"]),
                               np.asarray(mod["enc"]["centres"]), atol=0)
    np.testing.assert_allclose(np.asarray(c2["enc"]["sigma"]),
                               np.asarray(mod["enc"]["sigma"]), atol=0)


def test_flow_legacy_bare_state_checkpoint_restores(tmp_path):
    """Pre-round-3 flow checkpoints (bare FlowTrainState, no consts) still
    restore, with the config-derived consts they were trained against."""
    from sin_inn_tpu.core.checkpoint import CheckpointStore
    from sin_inn_tpu.train.loop import _flow_create_and_restore, flow_ckpt_dir

    cfg = _flow_cfg(net="RBF", checkpoints_dir=str(tmp_path / "ck"))
    spec, state, consts, ctrl_cfg, _ = FT.create_flow_state(
        jax.random.PRNGKey(0), cfg)
    CheckpointStore(flow_ckpt_dir(cfg, "sc")).save(3, state)
    _, s2, c2, _, _, _, step = _flow_create_and_restore(
        cfg, jax.random.PRNGKey(0), "sc")
    assert step == 3
    _tree_allclose(c2, consts)
    _tree_allclose(s2.params, state.params)


def test_renumber_module_list_shifts_only_indices():
    sd = {"inn.module_list.0.s1.0.weight": np.zeros(1),
          "module_list.12.s2.2.bias": np.ones(1),
          "other.key": np.ones(2)}
    out = TI.renumber_module_list(sd, 1)
    assert set(out) == {"inn.module_list.1.s1.0.weight",
                        "module_list.13.s2.2.bias", "other.key"}


def test_sr_explicit_resume_state_miss_raises(tmp_path):
    """A typo'd --resume_state must fail loudly, never silently restart
    training from scratch."""
    from sin_inn_tpu.train.loop import _sr_create_and_restore

    cfg = _cfg("IRN", working_dir=str(tmp_path),
               resume_state=str(tmp_path / "no_such_ckpts"))
    with pytest.raises(FileNotFoundError, match="resume_state"):
        _sr_create_and_restore(cfg, jax.random.PRNGKey(0))


def test_flow_sintel_renders_from_import(tmp_path):
    """`flow sintel --import-torch` renders scenes that have no framework
    checkpoint from the imported weights (same precedence as every other
    flow driver)."""
    import imageio.v2 as io

    from sin_inn_tpu.data.synthetic import moving_texture_video
    from sin_inn_tpu.train.loop import run_flow_sintel

    root = tmp_path / "final"
    d = root / "alley_7"
    d.mkdir(parents=True)
    frames = (moving_texture_video(3, 10, 14, seed=7) * 255).astype(np.uint8)
    for i, f in enumerate(frames):
        io.imwrite(str(d / f"frame_{i+1:04d}.png"), f)

    cfg = _flow_cfg(net="RBF", epochs=4,
                    input_video=str(root / "alley_7"), name="final",
                    size=10, test_size=10,
                    checkpoints_dir=str(tmp_path / "ck"),
                    results_dir=str(tmp_path / "res"))
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(0), cfg)
    ref = tmp_path / "ref.ckpt"
    torch.save({"state_dict": make_flow_sd(spec, params, consts)}, ref)

    run_flow_sintel(cfg.replace(import_torch=str(ref)),
                    outroot=str(tmp_path / "sub"))
    out = tmp_path / "sub" / "final" / "alley_7"
    import os
    assert sorted(os.listdir(out)) == ["frame_0001.flo", "frame_0002.flo"]
