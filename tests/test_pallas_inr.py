"""Parity tests for the fused Pallas INR kernel (ops/pallas/inr.py).

On CPU the kernel runs in interpreter mode; the reference is the XLA
path through models.inr.inr_apply (itself parity-pinned against the
torch re-derivation of /root/reference/video-interpolation/model.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.core.config import FlowConfig
from sin_inn_tpu.models.inr import alpha_mask, build_inr, inr_apply
from sin_inn_tpu.ops.pallas.inr import (fused_inr_apply, fused_inr_supported)

INTERPRET = jax.default_backend() == "cpu"


def _cfg(**kw):
    kw.setdefault("num_frequencies", 64)
    kw.setdefault("hidden_dim", 128)
    kw.setdefault("num_layers", 2)
    return FlowConfig(**kw)


def _points(key, n, d=3):
    return jax.random.uniform(key, (n, d), jnp.float32, -1.0, 1.0)


@pytest.mark.parametrize("net,mask_kind", [
    ("RBF", None), ("FFN", None), ("UFF", None),
    ("PFF", "alpha"), ("PFF", "vector"), ("PRBF", "vector"),
])
def test_fused_matches_xla_forward(net, mask_kind):
    key = jax.random.PRNGKey(3)
    spec, params, consts = build_inr(key, net, _cfg())
    x = _points(jax.random.PRNGKey(5), 384)
    mask = None
    if mask_kind == "alpha":
        mask = alpha_mask(spec, 0.37)
    elif mask_kind == "vector":
        mask = jax.random.uniform(jax.random.PRNGKey(7),
                                  (spec.encoding_dim,))
    assert fused_inr_supported(spec, params, consts, x, mask)
    ref = inr_apply(spec, params, consts, x, override_mask=mask)
    out = fused_inr_apply(spec, params, consts, x, mask,
                          precise=True, tn=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("net,masked", [("RBF", False), ("PFF", True)])
def test_fused_backward_matches_autodiff(net, masked):
    key = jax.random.PRNGKey(11)
    spec, params, consts = build_inr(key, net, _cfg())
    x = _points(jax.random.PRNGKey(13), 384)
    mask = (jax.random.uniform(jax.random.PRNGKey(17),
                               (spec.encoding_dim,)) if masked else None)
    tgt = jax.random.normal(jax.random.PRNGKey(19), (384, 4))

    def loss_ref(p):
        out = inr_apply(spec, p, consts, x, override_mask=mask)
        return jnp.mean((out - tgt) ** 2)

    def loss_fused(p):
        out = fused_inr_apply(spec, p, consts, x, mask,
                              precise=True, tn=128, interpret=INTERPRET)
        return jnp.mean((out - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_fus = jax.grad(loss_fused)(params)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_fus)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_r, flat_f):
        # rtol covers the bulk; atol the f32 accumulation-order noise on
        # near-zero gradient entries
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=3e-4)


def test_fused_bf16_operands_close():
    # precise=False is the TPU path: bf16 matmul operands, f32 accumulate
    key = jax.random.PRNGKey(23)
    spec, params, consts = build_inr(key, "RBF", _cfg())
    x = _points(jax.random.PRNGKey(29), 256)
    ref = inr_apply(spec, params, consts, x)
    out = fused_inr_apply(spec, params, consts, x, None,
                          precise=False, tn=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.02)


def test_fused_pads_nonaligned_rows():
    key = jax.random.PRNGKey(31)
    spec, params, consts = build_inr(key, "RBF", _cfg())
    x = _points(jax.random.PRNGKey(37), 301)     # not a multiple of tn
    ref = inr_apply(spec, params, consts, x)
    out = fused_inr_apply(spec, params, consts, x, None,
                          precise=True, tn=128, interpret=INTERPRET)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_eligibility_gates():
    key = jax.random.PRNGKey(41)
    spec, params, consts = build_inr(key, "RBF", _cfg())
    x = _points(key, 64)
    assert fused_inr_supported(spec, params, consts, x, None)
    # per-point masks (spatial controller) fall back
    assert not fused_inr_supported(spec, params, consts, x,
                                   jnp.ones((64, spec.encoding_dim)))
    # strict-f32 parity runs fall back
    s2 = dataclasses.replace(spec, compute_dtype="float32_highest")
    assert not fused_inr_supported(s2, params, consts, x, None)
    # trainable encodings (RFF) fall back
    spec3, params3, consts3 = build_inr(key, "RFF", _cfg())
    assert not fused_inr_supported(spec3, params3, consts3, x, None)
    # non-128-multiple widths fall back
    spec4, params4, consts4 = build_inr(key, "RBF", _cfg(hidden_dim=96))
    assert not fused_inr_supported(spec4, params4, consts4, x, None)


def test_inr_apply_routes_through_fused():
    # use_pallas='on' forces the fused path (interpret mode on CPU)
    cfg = _cfg(use_pallas="on")
    spec, params, consts = build_inr(jax.random.PRNGKey(43), "PFF", cfg)
    assert spec.use_pallas == "on"
    cfg_off = dataclasses.replace(cfg, use_pallas="off")
    spec_off, _, _ = build_inr(jax.random.PRNGKey(43), "PFF", cfg_off)
    x = _points(jax.random.PRNGKey(47), 200)
    mask = alpha_mask(spec, 0.6)
    out = inr_apply(spec, params, consts, x, override_mask=mask)
    ref = inr_apply(spec_off, params, consts, x, override_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.02)
