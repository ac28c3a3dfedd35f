"""End-to-end INN model tests: both architectures, bijectivity, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.models.inn import (build_inn_spec, init_inn, inn_apply,
                                    param_count)


def tiny_cfg(arch):
    # lr_window=1 -> lr_dims=12; scale=2 -> total=3*4^2=48 channels, z=36
    return SRConfig(architecture=arch, scale=2, num_coupling=2, lr_window=1,
                    hidden_channels=16, dense_gc=8)


@pytest.mark.parametrize("arch", ["SRF", "IRN"])
def test_inn_shapes_and_roundtrip(key, rng, arch):
    cfg = tiny_cfg(arch)
    spec, c_out = build_inn_spec(cfg, c=3)
    assert c_out == cfg.total_dims == 48
    params = init_inn(key, spec, c_in=3)

    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    y = inn_apply(spec, params, x)
    assert y.shape == (2, 2, 2, 48)   # two squeezes: /4 spatial, x16 channels
    x_rec = inn_apply(spec, params, y, rev=True)
    np.testing.assert_allclose(x_rec, x, atol=1e-4)


@pytest.mark.parametrize("arch", ["SRF", "IRN"])
def test_inn_jit_fwd_inv_one_program(key, rng, arch):
    """Forward and inverse trace into a single jitted program."""
    cfg = tiny_cfg(arch)
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(key, spec, c_in=3)
    x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))

    @jax.jit
    def both(p, x):
        y = inn_apply(spec, p, x)
        return inn_apply(spec, p, y, rev=True)

    np.testing.assert_allclose(both(params, x), x, atol=1e-4)


def test_inn_scale4_channel_math(key):
    cfg = SRConfig(architecture="IRN", scale=4, num_coupling=1, lr_window=10,
                   dense_gc=8)
    spec, c_out = build_inn_spec(cfg, c=3)
    # scale=4: 3 squeezes -> 192 channels; lr_dims=84, z=108 (SURVEY §2.1)
    assert c_out == 192
    assert cfg.lr_dims == 84
    assert cfg.z_dims == 108


def test_inn_has_params(key):
    cfg = tiny_cfg("SRF")
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(key, spec, c_in=3)
    assert param_count(params) > 1000


def test_irn_split_respects_lr_dims(key):
    cfg = SRConfig(architecture="IRN", scale=2, num_coupling=1, lr_window=1,
                   dense_gc=8)
    spec, _ = build_inn_spec(cfg, c=3)
    couplings = [l for l in spec if l.kind == "invblock"]
    assert couplings and all(l.split_len1 == min(cfg.lr_dims, 48 // 2)
                             for l in couplings)


def test_log_det_real_on_pallas_spec(key, rng):
    """with_log_det=True must return the true log-det even when the spec
    enables the fused Pallas couplings (round-1 footgun: silently zero).
    The glow layers fall back to the XLA math for the log-det request."""
    cfg_off = tiny_cfg("SRF").replace(use_pallas="off")
    cfg_on = tiny_cfg("SRF").replace(use_pallas="on")
    spec_off, _ = build_inn_spec(cfg_off, c=3)
    spec_on, _ = build_inn_spec(cfg_on, c=3)
    params = init_inn(key, spec_off, c_in=3)

    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    y_off, ld_off = inn_apply(spec_off, params, x, with_log_det=True)
    y_on, ld_on = inn_apply(spec_on, params, x, with_log_det=True)
    np.testing.assert_allclose(np.asarray(ld_on), np.asarray(ld_off),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(ld_on)))


def test_irn_log_det_includes_haar(key, rng):
    """IRN log-det = sum of Haar jacobians (reference archs.py:184-185) plus
    the coupling log-scales; at zero-init the couplings contribute ~0, so the
    total must equal the analytic Haar constant, not zero."""
    from sin_inn_tpu.ops.haar import haar_log_det

    cfg = tiny_cfg("IRN")
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(key, spec, c_in=3)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    _, ld = inn_apply(spec, params, x, with_log_det=True)
    expected = haar_log_det(8, 8, 3) + haar_log_det(4, 4, 12)
    # couplings at init: H-subnet last layer zero-init => s = clamp*(2*sigmoid(0)-1) = 0
    np.testing.assert_allclose(np.asarray(ld), expected, rtol=1e-4)


@pytest.mark.parametrize("arch", ["SRF", "IRN"])
def test_inverse_log_det_negates_forward(key, rng, arch):
    """log|det| of the inverse pass = -(forward log|det|) — couplings AND
    haar terms included (round-2 review fix: the inverse used to return
    only the negated haar terms)."""
    cfg = tiny_cfg(arch).replace(use_pallas="off")
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(key, spec, c_in=3)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    y, ld_f = inn_apply(spec, params, x, with_log_det=True)
    _, ld_r = inn_apply(spec, params, y, rev=True, with_log_det=True)
    np.testing.assert_allclose(np.asarray(ld_f + ld_r), 0.0, atol=1e-3)
    if arch == "SRF":
        assert float(jnp.abs(ld_f).sum()) > 0.0
