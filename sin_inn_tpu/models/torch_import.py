"""Import reference (torch / PyTorch-Lightning) SR checkpoints.

The reference trains ``SingleVideoINN`` Lightning modules
(/root/reference/lit_wrapper.py:12-27, attribute ``self.inn``) and reloads
them with ``torch.load`` + ``load_state_dict``
(/root/reference/main.py:120-137). This module lets a user of the reference
bring those trained checkpoints straight into this framework: it maps the
torch ``state_dict`` onto the ``init_inn`` params pytree for the matching
:func:`sin_inn_tpu.models.inn.build_inn_spec` spec, so ``sin-inn sr test
--import-torch ckpt.ckpt`` renders with reference-trained weights and
``sr train --import-torch`` fine-tunes from them.

Two checkpoint families:

* **IRN** (``InvRescaleNet``, /root/reference/archs.py:201-233). The schema
  is fully derived from the reference source: ``operations.{i}.haar_weights``
  for each parameter-free ``HaarDownsampling`` (validated against the fixed
  bank built at archs.py:167-178) and
  ``operations.{i}.{F,G,H}.conv{1..5}.{weight,bias}`` for each
  ``InvBlockExp``'s DenseBlocks (archs.py:74-146).
* **SRF** (``UncondSRFlow``, /root/reference/archs.py:19-71) — a FrEIA
  ``ReversibleGraphNet``. Expected keys
  ``module_list.{i}.s{1,2}.{0,2}.{weight,bias}``: FrEIA v0.2's
  ``GLOWCouplingBlock`` holds ``s1 = subnet(len1, 2*len2)`` /
  ``s2 = subnet(len2, 2*len1)`` and the reference subnets are
  ``nn.Sequential(Conv2d, ReLU, Conv2d)`` (archs.py:11-17), so the convs sit
  at sequential indices 0 and 2. **Caveat:** FrEIA is not installed in this
  environment, so the SRF mapping is enforced structurally (coupling count,
  shape of every tensor, 3x3/1x1 kernel alternation) but has not been
  exercised against a file produced by a real FrEIA install; the importer
  fails loudly on any key/shape mismatch rather than guessing. (The
  reference itself needs ``strict=False`` to reload FrEIA checkpoints —
  main.py:128-136 — because of exactly this kind of buffer-key drift;
  parameter-free buffer keys such as the ``PermuteRandom`` permutation are
  ignored here, and the permutations are reconstructed from their seeds as
  the spec already does, matching ``np.random.RandomState(seed)``.)

Weight conversion is a pure transpose (torch OIHW -> JAX HWIO); role
assignment rides the reference's own attribute names (``F``/``G``/``H``,
``s1``/``s2``), whose semantics this framework's coupling ops replicate and
pin in ``tests/test_parity_torch.py``.

Precedence in the train loop: an on-disk framework checkpoint (resume)
overrides ``--import-torch`` — the import seeds a run, resume continues one.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.models.inn import LayerSpec, build_inn_spec, init_inn


class TorchImportError(ValueError):
    """A reference checkpoint did not match the expected schema."""


def _to_np(v) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def flatten_checkpoint(ckpt) -> Dict[str, np.ndarray]:
    """Accept a raw ``state_dict`` or a full Lightning checkpoint dict and
    return a flat ``{key: float32 numpy}`` with the ``inn.`` prefix stripped
    (the reference module holds the network at ``self.inn``,
    lit_wrapper.py:19)."""
    if not isinstance(ckpt, dict):
        raise TorchImportError(f"expected a dict checkpoint, got {type(ckpt)}")
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if k.startswith("inn."):
            k = k[len("inn."):]
        out[k] = _to_np(v)
    return out


def _conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """One torch conv at ``prefix`` -> {'w': HWIO, 'b': (O,)}."""
    wk, bk = f"{prefix}.weight", f"{prefix}.bias"
    for k in (wk, bk):
        if k not in sd:
            raise TorchImportError(f"missing key {k!r}")
    w = sd[wk]
    if w.ndim != 4:
        raise TorchImportError(f"{wk}: expected a 4-D conv weight, got "
                               f"shape {w.shape}")
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": sd[bk]}


def _expected_haar_bank(c: int) -> np.ndarray:
    """The fixed grouped-conv bank HaarDownsampling builds
    (archs.py:167-178): 4 filters [ll, lh, hl, hh] of +-1, tiled per input
    channel; shape (4*c, 1, 2, 2)."""
    f = np.ones((4, 1, 2, 2), np.float32)
    f[1, 0, 0, 1] = f[1, 0, 1, 1] = -1.0
    f[2, 0, 1, 0] = f[2, 0, 1, 1] = -1.0
    f[3, 0, 1, 0] = f[3, 0, 0, 1] = -1.0
    return np.concatenate([f] * c, axis=0)


def _param_shapes(spec: Sequence[LayerSpec], c_in: int):
    """Expected params pytree (shapes only) via eval_shape of init_inn."""
    return jax.eval_shape(
        lambda k: init_inn(k, spec, c_in=c_in), jax.random.PRNGKey(0))


def _check_shapes(layer_idx: int, got: Dict, want: Dict) -> None:
    gl = jax.tree_util.tree_leaves_with_path(got)
    wl = jax.tree_util.tree_leaves_with_path(want)
    if len(gl) != len(wl):
        raise TorchImportError(
            f"layer {layer_idx}: {len(gl)} tensors imported, expected "
            f"{len(wl)}")
    for (pg, g), (pw, w) in zip(gl, wl):
        if pg != pw or tuple(g.shape) != tuple(w.shape):
            raise TorchImportError(
                f"layer {layer_idx}: param {jax.tree_util.keystr(pg)} has "
                f"shape {tuple(g.shape)}, expected "
                f"{jax.tree_util.keystr(pw)} {tuple(w.shape)}")


def _group_indices(sd: Dict[str, np.ndarray], root: str) -> List[int]:
    pat = re.compile(rf"^{re.escape(root)}\.(\d+)\.")
    return sorted({int(m.group(1)) for k in sd if (m := pat.match(k))})


def import_irn_state_dict(spec: Sequence[LayerSpec],
                          sd: Dict[str, np.ndarray],
                          c_in: int = 3) -> List[Optional[Dict]]:
    """Map an ``InvRescaleNet`` state_dict onto the IRN spec's params list.

    The reference op list is [Haar, (Haar, InvBlockExp x k) per octave]
    (archs.py:206-221) — exactly the layer order :func:`build_irn_spec`
    emits, so ops and spec entries pair 1:1; the kind of each op is read off
    its keys and the full sequence is validated against the spec.
    """
    idxs = _group_indices(sd, "operations")
    if not idxs:
        raise TorchImportError(
            "no 'operations.{i}.*' keys — not an InvRescaleNet state_dict")
    kinds = []
    for i in idxs:
        if f"operations.{i}.haar_weights" in sd:
            kinds.append("haar")
        elif f"operations.{i}.F.conv1.weight" in sd:
            kinds.append("invblock")
        else:
            raise TorchImportError(
                f"operations.{i}: neither HaarDownsampling nor InvBlockExp "
                f"keys found")
    spec_kinds = [l.kind for l in spec]
    if kinds != spec_kinds:
        raise TorchImportError(
            f"checkpoint op sequence {kinds} != spec {spec_kinds} — "
            f"wrong --scale/--num_coupling for this checkpoint?")

    shapes = _param_shapes(spec, c_in)
    params: List[Optional[Dict]] = []
    consumed = set()
    c = c_in
    for li, (i, layer) in enumerate(zip(idxs, spec)):
        if layer.kind == "haar":
            c *= 4
            hk = f"operations.{i}.haar_weights"
            bank = sd[hk]
            want = _expected_haar_bank(c // 4)
            if bank.shape != want.shape or not np.array_equal(bank, want):
                raise TorchImportError(
                    f"{hk}: fixed Haar bank differs from the reference "
                    f"construction (shape {bank.shape}, expected "
                    f"{want.shape}) — corrupted or incompatible checkpoint")
            consumed.add(hk)
            params.append(None)
            continue
        p = {}
        for sub in ("F", "G", "H"):
            p[sub] = {}
            for ci in range(1, 6):
                prefix = f"operations.{i}.{sub}.conv{ci}"
                p[sub][f"conv{ci}"] = _conv(sd, prefix)
                consumed.update({f"{prefix}.weight", f"{prefix}.bias"})
        _check_shapes(li, p, shapes[li])
        params.append(p)
    _check_leftovers(sd, consumed)
    return params


def import_srf_state_dict(spec: Sequence[LayerSpec],
                          sd: Dict[str, np.ndarray],
                          c_in: int = 3) -> List[Optional[Dict]]:
    """Map a FrEIA ``ReversibleGraphNet`` state_dict onto the SRF spec.

    Coupling blocks are identified by their ``s1``/``s2`` subnet keys and
    taken in ascending ``module_list`` index order — node order in the
    reference graph (archs.py:26-70), which is the order
    :func:`build_srf_spec` emits glow layers in. Squeeze/permute modules are
    parameter-free; any buffer keys they contribute are ignored (the spec
    rebuilds the seeded permutations itself).
    """
    idxs = _group_indices(sd, "module_list")
    glow_idxs = [i for i in idxs
                 if f"module_list.{i}.s1.0.weight" in sd]
    n_glow = sum(1 for l in spec if l.kind == "glow")
    if not glow_idxs:
        raise TorchImportError(
            "no 'module_list.{i}.s1.0.weight' keys — not a FrEIA "
            "UncondSRFlow state_dict (or an unsupported FrEIA version; "
            "expected GLOWCouplingBlock subnets at s1/s2 as "
            "nn.Sequential(conv, relu, conv))")
    if len(glow_idxs) != n_glow:
        raise TorchImportError(
            f"{len(glow_idxs)} coupling blocks in the checkpoint, spec has "
            f"{n_glow} — wrong --scale/--num_coupling for this checkpoint?")

    shapes = _param_shapes(spec, c_in)
    params: List[Optional[Dict]] = []
    consumed = set()
    git = iter(glow_idxs)
    for li, layer in enumerate(spec):
        if layer.kind != "glow":
            params.append(None)
            continue
        i = next(git)
        p = {}
        for sub in ("s1", "s2"):
            p[sub] = {}
            for cname, si in (("conv1", 0), ("conv2", 2)):
                prefix = f"module_list.{i}.{sub}.{si}"
                p[sub][cname] = _conv(sd, prefix)
                consumed.update({f"{prefix}.weight", f"{prefix}.bias"})
        _check_shapes(li, p, shapes[li])
        kh = p["s1"]["conv1"]["w"].shape[0]
        if kh != layer.kernel:
            raise TorchImportError(
                f"layer {li}: checkpoint subnet kernel {kh}x{kh}, spec "
                f"expects {layer.kernel}x{layer.kernel} — the reference "
                f"alternates 3x3/1x1 subnets (archs.py:54-59)")
        params.append(p)
    _check_leftovers(sd, consumed)
    return params


def _check_leftovers(sd: Dict[str, np.ndarray], consumed: set) -> None:
    """Unconsumed '.weight'/'.bias' keys mean the mapping missed trainable
    parameters — refuse rather than silently drop them. Parameter-free
    buffers (permutations, fixed Haar banks already validated) are fine."""
    left = [k for k in sd
            if k not in consumed and (k.endswith(".weight")
                                      or k.endswith(".bias"))]
    if left:
        raise TorchImportError(
            f"{len(left)} trainable keys not consumed by the import "
            f"(first few: {left[:4]}) — unsupported checkpoint layout")


def import_state_dict(spec: Sequence[LayerSpec], ckpt,
                      c_in: int = 3) -> List[Optional[Dict]]:
    """Auto-detect the family (IRN vs SRF) and import."""
    sd = flatten_checkpoint(ckpt)
    if any(k.startswith("operations.") for k in sd):
        return import_irn_state_dict(spec, sd, c_in=c_in)
    return import_srf_state_dict(spec, sd, c_in=c_in)


def _check_hyperparams(ckpt, cfg: SRConfig) -> None:
    """Lightning checkpoints carry the reference CLI args
    (save_hyperparameters(), lit_wrapper.py:16: keys c/h/w/opt). When
    present, cross-check the fields that change the layer stack."""
    hp = ckpt.get("hyper_parameters") or ckpt.get("hparams") or {}
    opt = hp.get("opt") if isinstance(hp, dict) else None
    if opt is None:
        return
    for ours, theirs in (("architecture", "architecture"), ("scale", "scale"),
                         ("num_coupling", "num_coupling")):
        want = getattr(opt, theirs, None)
        if want is not None and getattr(cfg, ours) != want:
            raise TorchImportError(
                f"checkpoint was trained with {theirs}={want}, config has "
                f"{ours}={getattr(cfg, ours)}")


def _torch_load(path: str):
    import pickle

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # Lightning checkpoints pickle the argparse Namespace in
        # hyper_parameters, which weights_only refuses (UnpicklingError);
        # those — and only those — take the full-unpickle path. Any other
        # failure (truncated/corrupt file raises RuntimeError) re-raises
        # the original diagnostic instead of being masked by a retry.
        return torch.load(path, map_location="cpu", weights_only=False)


def load_reference_checkpoint(path: str, cfg: SRConfig, c_in: int = 3
                              ) -> Tuple[List[LayerSpec],
                                         List[Optional[Dict]]]:
    """torch.load a reference checkpoint file and import it for ``cfg``."""
    ckpt = _torch_load(path)
    if isinstance(ckpt, dict):
        _check_hyperparams(ckpt, cfg)
    spec, _ = build_inn_spec(cfg, c=c_in)
    return spec, import_state_dict(spec, ckpt, c_in=c_in)


# ===========================================================================
# Flow pipeline (INR + progressive controller) checkpoints
# ===========================================================================
#
# The reference FlowTrainer holds the (optionally controller-wrapped) INR at
# ``self.net`` (video-interpolation/trainer.py:19; wiring main.py:136-143),
# so Lightning state_dict keys are
#   net.mask_stashed                      controller mask as per-cell float
#                                         channel-counts (save_mask,
#                                         progressive_controller.py:75-81)
#   net.{in_progress,log_buffer,log_counter}   StashedSpatial buffers
#   net.model.<model keys>                when controller-wrapped, else
#   net.<model keys>                      for non-progressive nets
# and within a model (model.py):
#   encode.<buffer>                       encoding buffers/params
#   model.model.{2j}.{weight,bias}        MLP Sequential linears
#   model.{i}.linear.* / model.{n}.*      SIREN sine layers + final linear
#
# The dense mask is rebuilt from the stashed counts with the reference's
# load_mask rule (progressive_controller.py:57-67): ones below
# floor(count), the fractional part at channel floor(count). The reference
# does not persist the controller's iteration/block pointers (plain python
# attributes, not buffers), so — exactly like a reference reload — a
# fine-tune continues with freshly initialized schedule pointers and the
# imported mask.

# spec.encoding -> [(reference buffer name, ours, trainable?), ...]
_ENC_BUFFERS = {
    "gaussian_ff": [("frequencies", "frequencies", False)],
    "uniform_ff": [("frequencies", "frequencies", False)],
    "rotated_ff": [("frequencies", "frequencies", True),
                   ("magnitudes", "magnitudes", False)],
    "positional": [("freqs", "freqs", False)],
    "rbf": [("centres", "centres", False), ("sigma", "sigma", False)],
    "rbf_grid_random": [("offsets", "offsets", False),
                        ("sigma", "sigma", False)],
    "rbf_grid_uniform": [("offsets", "offsets", False),
                         ("sigma", "sigma", False)],
    "piecewise_gaussian": [("frequencies", "frequencies", False)],
    "piecewise_uniform": [("frequencies", "frequencies", False)],
}


def mask_from_counts(counts: np.ndarray, encoding_dim: int) -> np.ndarray:
    """Reference load_mask (progressive_controller.py:57-67): counts (cells,)
    -> dense soft mask (cells, encoding_dim)."""
    counts = np.asarray(counts, np.float32).reshape(-1)
    idx = np.arange(encoding_dim)[None, :]
    fl = np.floor(counts)[:, None]
    mask = (idx < fl).astype(np.float32)
    boundary = (idx == fl) & (counts[:, None] < encoding_dim)
    return np.where(boundary, (counts % 1.0)[:, None], mask)


def _linear(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear at ``prefix`` -> {'w': (in, out), 'b': (out,)}."""
    wk, bk = f"{prefix}.weight", f"{prefix}.bias"
    for k in (wk, bk):
        if k not in sd:
            raise TorchImportError(f"missing key {k!r}")
    w = sd[wk]
    if w.ndim != 2:
        raise TorchImportError(f"{wk}: expected a 2-D linear weight, got "
                               f"shape {w.shape}")
    return {"w": w.T, "b": sd[bk]}


def import_flow_state_dict(spec, ctrl_cfg, ctrl_state, params, consts, ckpt):
    """Import a reference flow checkpoint onto (params, consts, ctrl_state).

    ``spec``/``ctrl_cfg`` and the template pytrees come from
    :func:`sin_inn_tpu.train.flow.build_flow_model`; every imported tensor is
    shape-checked against its template leaf. Returns the updated
    (params, consts, ctrl_state).
    """
    import copy

    from sin_inn_tpu.models import controllers as ctrl

    sd = {}
    for k, v in flatten_checkpoint(ckpt).items():
        sd[k[len("net."):] if k.startswith("net.") else k] = v

    wrapped = "mask_stashed" in sd
    if wrapped and not spec.is_progressive:
        raise TorchImportError(
            f"checkpoint is controller-wrapped (mask_stashed present) but "
            f"--net {spec.name} is not progressive")
    if spec.is_progressive and not wrapped:
        raise TorchImportError(
            f"--net {spec.name} is progressive but the checkpoint has no "
            f"controller mask — was it trained with a non-progressive net?")
    mp = "model." if wrapped else ""
    consumed = set()

    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    consts = copy.deepcopy(jax.tree_util.tree_map(
        lambda l: np.asarray(l) if hasattr(l, "shape") else l, consts))

    def take(dst, dst_key, src_key, trainable_note=""):
        if src_key not in sd:
            raise TorchImportError(f"missing key {src_key!r}{trainable_note}")
        v = sd[src_key]
        want = dst[dst_key]
        if tuple(v.shape) != tuple(np.shape(want)):
            raise TorchImportError(
                f"{src_key}: shape {tuple(v.shape)}, expected "
                f"{tuple(np.shape(want))} — wrong --num-frequencies/"
                f"--hidden-dim/--num-layers for this checkpoint?")
        dst[dst_key] = v
        consumed.add(src_key)

    # ---- MLP / SIREN stack ----
    mlp = params["mlp"]
    if spec.kind == "siren":
        # SineLayers wrap their linear (model.py:123-147); the final linear
        # sits bare at the last Sequential slot (model.py:163-171)
        for j in range(len(mlp)):
            bare = j == len(mlp) - 1
            prefix = (f"{mp}model.{j}" if bare
                      else f"{mp}model.{j}.linear")
            lin = _linear(sd, prefix)
            _check_shapes(j, lin, jax.tree_util.tree_map(np.asarray, mlp[j]))
            mlp[j] = lin
            consumed.update({f"{prefix}.weight", f"{prefix}.bias"})
    else:
        for j in range(len(mlp)):
            prefix = f"{mp}model.model.{2 * j}"
            lin = _linear(sd, prefix)
            _check_shapes(j, lin, jax.tree_util.tree_map(np.asarray, mlp[j]))
            mlp[j] = lin
            consumed.update({f"{prefix}.weight", f"{prefix}.bias"})

    # ---- encoding buffers ----
    if spec.kind == "encoded":
        for ref_name, ours, trainable in _ENC_BUFFERS[spec.encoding]:
            key = f"{mp}encode.{ref_name}"
            dst = params["enc"] if trainable else consts["enc"]
            take(dst, ours, key)

    # ---- controller mask + spatial buffers ----
    if wrapped:
        counts = sd["mask_stashed"]
        consumed.add("mask_stashed")
        mask = mask_from_counts(counts, spec.encoding_dim)
        if isinstance(ctrl_state, ctrl.SpatialState):
            if mask.shape[0] != ctrl_cfg.cells:
                raise TorchImportError(
                    f"spatial mask has {mask.shape[0]} cells, config grid "
                    f"has {ctrl_cfg.cells} (res {ctrl_cfg.res}^"
                    f"{ctrl_cfg.mask_dim}) — wrong --spatial-res?")
            repl = {"mask": jnp.asarray(mask)}
            for name in ("in_progress", "log_buffer", "log_counter"):
                if name in sd:
                    v = sd[name]
                    tmpl = getattr(ctrl_state, name)
                    if tuple(v.shape) != tuple(tmpl.shape):
                        raise TorchImportError(
                            f"{name}: shape {tuple(v.shape)}, expected "
                            f"{tuple(tmpl.shape)}")
                    repl[name] = jnp.asarray(v).astype(tmpl.dtype)
                    consumed.add(name)
            ctrl_state = ctrl_state._replace(**repl)
        else:
            if mask.shape[0] != 1:
                raise TorchImportError(
                    f"checkpoint mask is spatial ({mask.shape[0]} cells) but "
                    f"--spatially-adaptive is off")
            ctrl_state = ctrl_state._replace(mask=jnp.asarray(mask[0]))

    _check_leftovers(sd, consumed)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    consts = jax.tree_util.tree_map(
        lambda l: jnp.asarray(l) if hasattr(l, "shape") else l, consts)
    return params, consts, ctrl_state


def load_flow_reference_checkpoint(path: str, spec, ctrl_cfg, ctrl_state,
                                   params, consts):
    """torch.load a reference flow checkpoint and import it onto the
    templates from build_flow_model."""
    return import_flow_state_dict(spec, ctrl_cfg, ctrl_state, params, consts,
                                  _torch_load(path))


# ===========================================================================
# Export: framework params -> reference-loadable state_dicts
# ===========================================================================
#
# The migration path in the other direction: train fast here, keep using
# reference-side torch tooling. Keys carry the Lightning module prefixes the
# reference loaders expect (``inn.`` for SingleVideoINN, ``net.`` for
# FlowTrainer). The SRF export shares the FrEIA-layout caveat of the
# importer (module-level docstring); IRN and flow schemas are exact. The
# flow controller mask exports as the reference's own lossy stashed counts
# (``mask.sum(-1)``, save_mask progressive_controller.py:75-81) — identical
# information to a reference-side save.

def _oihw(p: Dict) -> np.ndarray:
    return np.ascontiguousarray(
        np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1))


def export_state_dict(spec: Sequence[LayerSpec], params: Sequence,
                      c_in: int = 3) -> Dict[str, np.ndarray]:
    """INN params -> reference SingleVideoINN state_dict (keys ``inn.*``)."""
    sd: Dict[str, np.ndarray] = {}
    if any(l.kind == "invblock" for l in spec):
        c = c_in
        for i, (layer, p) in enumerate(zip(spec, params)):
            if layer.kind == "haar":
                sd[f"inn.operations.{i}.haar_weights"] = \
                    _expected_haar_bank(c)
                c *= 4
                continue
            for sub in ("F", "G", "H"):
                for ci in range(1, 6):
                    cv = p[sub][f"conv{ci}"]
                    sd[f"inn.operations.{i}.{sub}.conv{ci}.weight"] = \
                        _oihw(cv)
                    sd[f"inn.operations.{i}.{sub}.conv{ci}.bias"] = \
                        np.asarray(cv["b"], np.float32)
        return sd
    # SRF: one module_list slot per graph node module, in node order —
    # squeeze_init, then per octave squeeze + (glow, permute)*k, exactly the
    # spec order, so the slot index is the spec position.
    #
    # CAVEAT (shared with the importer, module docstring): FrEIA is not
    # installed here, so whether ReversibleGraphNet's module_list numbering
    # includes extra nodes (e.g. the InputNode) is unverified. Our importer
    # is deliberately index-robust (it sorts whatever glow indices exist),
    # so a framework round-trip cannot detect a constant offset. If a
    # reference-side load reports EVERY module_list key as unexpected, do
    # NOT accept its strict=False fallback (that loads nothing): the
    # numbering differs by a constant shift — fix the file with
    # :func:`renumber_module_list` and reload strictly.
    for mi, (layer, p) in enumerate(zip(spec, params)):
        if layer.kind != "glow":
            continue
        for sub in ("s1", "s2"):
            for cname, si in (("conv1", 0), ("conv2", 2)):
                cv = p[sub][cname]
                sd[f"inn.module_list.{mi}.{sub}.{si}.weight"] = _oihw(cv)
                sd[f"inn.module_list.{mi}.{sub}.{si}.bias"] = \
                    np.asarray(cv["b"], np.float32)
    return sd


def renumber_module_list(sd: Dict[str, np.ndarray],
                         offset: int) -> Dict[str, np.ndarray]:
    """Shift every ``[inn.]module_list.{i}`` index by ``offset`` — the
    one-line repair if a real FrEIA install numbers its module_list with a
    constant shift relative to this export (see export_state_dict caveat)."""
    pat = re.compile(r"^(inn\.)?module_list\.(\d+)\.(.*)$")
    out = {}
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            k = f"{m.group(1) or ''}module_list.{int(m.group(2)) + offset}." \
                f"{m.group(3)}"
        out[k] = v
    return out


def export_flow_state_dict(spec, ctrl_state, params,
                           consts) -> Dict[str, np.ndarray]:
    """Flow INR (+controller) -> reference FlowTrainer state_dict
    (keys ``net.*``)."""
    from sin_inn_tpu.models import controllers as ctrl

    sd: Dict[str, np.ndarray] = {}
    mp = "net.model." if ctrl_state is not None else "net."
    for j, lin in enumerate(params["mlp"]):
        if spec.kind == "siren":
            bare = j == len(params["mlp"]) - 1
            prefix = f"{mp}model.{j}" if bare else f"{mp}model.{j}.linear"
        else:
            prefix = f"{mp}model.model.{2 * j}"
        sd[f"{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(lin["w"], np.float32).T)
        sd[f"{prefix}.bias"] = np.asarray(lin["b"], np.float32)
    if spec.kind == "encoded":
        for ref_name, ours, trainable in _ENC_BUFFERS[spec.encoding]:
            src = params["enc"] if trainable else consts["enc"]
            sd[f"{mp}encode.{ref_name}"] = np.asarray(src[ours], np.float32)
    if ctrl_state is not None:
        mask = np.asarray(ctrl_state.mask, np.float32)
        counts = mask.sum(-1)
        sd["net.mask_stashed"] = np.atleast_1d(counts)
        if isinstance(ctrl_state, ctrl.SpatialState):
            for name in ("in_progress", "log_buffer", "log_counter"):
                sd[f"net.{name}"] = np.asarray(
                    getattr(ctrl_state, name), np.float32)
    return sd


def save_reference_checkpoint(path: str, sd: Dict[str, np.ndarray]) -> str:
    """Write a torch-loadable Lightning-style checkpoint file."""
    import torch

    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               path)
    return path
