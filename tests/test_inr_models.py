"""INR zoo + encodings tests: registry coverage, shapes, progressive masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.core.config import FlowConfig
from sin_inn_tpu.models.inr import (MODEL_REGISTRY, alpha_mask, build_inr,
                                    inr_apply)
from sin_inn_tpu.ops import encodings as E


def small_cfg(**kw):
    return FlowConfig(num_frequencies=8, num_frequencies_pe=3, hidden_dim=16,
                      num_layers=2, **kw)


REFERENCE_MODEL_DICT = ["siren", "FFN", "UFF", "PFF", "RBF", "PRBF", "RBFG",
                        "PRBFG", "PE", "PPE", "RFF", "PRFF", "PUFF"]


def test_registry_covers_reference_model_dict():
    """All 13 reference model_dict entries exist (model.py:681-684)."""
    for name in REFERENCE_MODEL_DICT:
        assert name in MODEL_REGISTRY


@pytest.mark.parametrize("name", REFERENCE_MODEL_DICT)
def test_models_forward_shapes(key, rng, name):
    cfg = small_cfg()
    spec, params, consts = build_inr(key, name, cfg)
    x = jnp.asarray(rng.rand(17, 3).astype(np.float32) * 2 - 1)
    out = inr_apply(spec, params, consts, x)
    assert out.shape == (17, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_progressive_flag_matches_reference():
    cfg = small_cfg()
    k = jax.random.key(0)
    for name in ["PFF", "PRBF", "PRBFG", "PPE", "PRFF", "PUFF"]:
        spec, _, _ = build_inr(k, name, cfg)
        assert spec.is_progressive
        # progressive encoding concatenates raw coords
        assert spec.encoding_dim > 3
    for name in ["FFN", "RBF", "siren", "PE"]:
        spec, _, _ = build_inr(k, name, cfg)
        assert not spec.is_progressive


def test_alpha_mask_monotone(key):
    cfg = small_cfg()
    spec, _, _ = build_inr(key, "PFF", cfg)
    m0 = np.asarray(alpha_mask(spec, 0.0))
    m5 = np.asarray(alpha_mask(spec, 0.5))
    m1 = np.asarray(alpha_mask(spec, 1.0))
    assert m0.sum() == 0
    assert 0 < m5.sum() < m1.sum()
    assert (m5 <= m1 + 1e-6).all()


def test_override_mask_zeroes_features(key, rng):
    cfg = small_cfg()
    spec, params, consts = build_inr(key, "PFF", cfg)
    x = jnp.asarray(rng.rand(5, 3).astype(np.float32))
    zero_mask = jnp.zeros((spec.encoding_dim,))
    out = inr_apply(spec, params, consts, x, override_mask=zero_mask)
    # all-masked encoding -> constant output (bias propagation only)
    assert np.allclose(np.asarray(out), np.asarray(out)[0:1], atol=1e-6)


def test_ff_frequencies_sorted_low_to_high(key):
    params, consts = E.gaussian_ff_init(key, 3, 16, std=10.0)
    mags = np.linalg.norm(np.asarray(consts["frequencies"]), axis=0)
    assert (np.diff(mags) >= -1e-5).all()


def test_rbf_sigma_sorted(key):
    _, consts = E.rbf_init(key, 3, 8, std=5.0)
    sig = np.asarray(consts["sigma"])
    assert sig.shape == (16,)          # reference doubles num_frequencies
    assert (np.diff(sig) >= 0).all()


def test_rotated_ff_trainable_directions(key, rng):
    params, consts = E.rotated_ff_init(key, 3, 8, std=5.0)
    assert "frequencies" in params     # trainable
    assert "magnitudes" in consts      # fixed
    x = jnp.asarray(rng.rand(4, 3).astype(np.float32))
    out = E.rotated_ff_apply(params, consts, x)
    assert out.shape == (4, 16)


def test_piecewise_encoding_range(key, rng):
    _, consts = E.piecewise_uniform_init(key, 3, 8, std=5.0)
    x = jnp.asarray(rng.rand(100, 3).astype(np.float32) * 2 - 1)
    out = np.asarray(E.piecewise_apply({}, consts, x))
    assert out.shape == (100, 16)
    assert out.min() >= -1 - 1e-5 and out.max() <= 1 + 1e-5


def test_polynomial_kernel_counts():
    # d=2, power=2: monomials of degree 2: x0^2, x0x1, x1^2 -> 3
    kern = E.polynomial_kernel(2, 2)
    assert len(kern) == 3
    x = jnp.asarray([[2.0, 3.0]])
    out = np.asarray(E.polynomial_apply({}, {"kernel": tuple(kern)}, x))
    assert sorted(out[0].tolist()) == [4.0, 6.0, 9.0]


def test_mlp_compute_dtype_modes(key, rng):
    """FlowConfig.compute_dtype now reaches the INR MLP: bf16 chain stays
    close to f32, 'float32_highest' matches default f32 closely, and the
    spec carries the mode."""
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.models.inr import build_inr, inr_apply

    x = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 2 - 1)
    outs = {}
    for cd in ("float32", "bfloat16", "float32_highest"):
        cfg = FlowConfig(net="RBF", num_frequencies=8, hidden_dim=16,
                         num_layers=2, compute_dtype=cd)
        spec, params, consts = build_inr(key, "RBF", cfg)
        assert spec.compute_dtype == cd
        outs[cd] = np.asarray(inr_apply(spec, params, consts, x))
        assert outs[cd].dtype == np.float32
    np.testing.assert_allclose(outs["float32"], outs["float32_highest"],
                               atol=1e-5)
    np.testing.assert_allclose(outs["float32"], outs["bfloat16"],
                               atol=0.05, rtol=0.1)


def test_flow_step_bf16_descends(key, rng):
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.train import flow as F

    cfg = FlowConfig(net="RBF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=50, compute_dtype="bfloat16")
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    base = rng.rand(14, 18, 3).astype(np.float32)
    batch = {"frame1": jnp.asarray(np.stack([base[:12, :16]] * 2)),
             "frame2": jnp.asarray(np.stack([base[:12, 1:17]] * 2)),
             "times": jnp.linspace(-1, 1, 2),
             "scale": jnp.asarray(np.float32(16 / 5))}
    losses = []
    for _ in range(8):
        state, m = step(state, consts, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
