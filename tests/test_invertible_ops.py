"""Invertibility + golden-value tests for the INN op library.

Strategy per SURVEY.md §4: property-test `inv(fwd(x)) == x` for every
bijective op, and golden-test the Haar math against an independent numpy
derivation of the reference equations (archs.py:162-199).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.ops.haar import haar_squeeze, haar_unsqueeze
from sin_inn_tpu.ops.squeeze import depth_to_space, space_to_depth
from sin_inn_tpu.ops.permute import (invert_permutation, make_permutation,
                                     permute_channels)
from sin_inn_tpu.ops import coupling as C
from sin_inn_tpu.ops import subnet as S


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    y = space_to_depth(x)
    assert y.shape == (2, 4, 6, 12)
    np.testing.assert_array_equal(depth_to_space(y), x)


def test_space_to_depth_volume_preserving(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    y = space_to_depth(x)
    np.testing.assert_allclose(np.sort(np.ravel(y)), np.sort(np.ravel(x)))


def test_haar_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    y = haar_squeeze(x)
    assert y.shape == (2, 4, 6, 12)
    np.testing.assert_allclose(haar_unsqueeze(y), x, atol=1e-6)


def test_haar_golden_values(rng):
    """Check each component against the hand-derived 2x2 Haar equations.

    Forward output (component-major, /4 normalization, signs from reference
    archs.py:167-187): LL=(a+b+c+d)/4, LH=(a-b+c-d)/4, HL=(a+b-c-d)/4,
    HH=(a-b-c+d)/4 for block [[a,b],[c,d]].
    """
    x = rng.randn(1, 2, 2, 2).astype(np.float32)
    y = np.asarray(haar_squeeze(jnp.asarray(x)))
    a, b, c, d = x[0, 0, 0], x[0, 0, 1], x[0, 1, 0], x[0, 1, 1]  # each (2,)
    expect = np.concatenate([(a + b + c + d) / 4,
                             (a - b + c - d) / 4,
                             (a + b - c - d) / 4,
                             (a - b - c + d) / 4])
    np.testing.assert_allclose(y[0, 0, 0], expect, atol=1e-6)


def test_haar_channel_order_component_major(rng):
    """LL block of channel c must land at output channel c (not 4c)."""
    x = np.zeros((1, 2, 2, 3), np.float32)
    x[0, :, :, 1] = 1.0  # constant image in channel 1
    y = np.asarray(haar_squeeze(jnp.asarray(x)))
    assert y[0, 0, 0, 1] == pytest.approx(1.0)   # LL of channel 1
    assert np.count_nonzero(y) == 1


def test_permutation_roundtrip(rng):
    perm = make_permutation(16, seed=3)
    inv = invert_permutation(perm)
    x = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
    y = permute_channels(x, perm)
    np.testing.assert_array_equal(permute_channels(y, inv), x)
    # determinism
    np.testing.assert_array_equal(perm, make_permutation(16, seed=3))


@pytest.mark.parametrize("c,len1", [(8, 4), (12, 5)])
def test_glow_coupling_roundtrip(key, rng, c, len1):
    k1, k2 = jax.random.split(key)
    len2 = c - len1
    params = {
        "s1": S.conv_subnet_init(k1, len1, 2 * len2, 3, hidden=16),
        "s2": S.conv_subnet_init(k2, len2, 2 * len1, 3, hidden=16),
    }
    x = jnp.asarray(rng.randn(2, 6, 6, c).astype(np.float32))
    y, log_det = C.glow_coupling_forward(params, x, S.conv_subnet_apply, 1.2, len1)
    x_rec = C.glow_coupling_inverse(params, y, S.conv_subnet_apply, 1.2, len1)
    np.testing.assert_allclose(x_rec, x, atol=1e-4)
    assert log_det.shape == (2,)
    # soft clamp bounds the per-element log-scale to (-clamp, clamp)
    assert np.all(np.abs(np.asarray(log_det)) < 1.2 * 6 * 6 * c)


def test_glow_log_e_clamp():
    s = jnp.asarray([-1e6, 0.0, 1e6])
    le = np.asarray(C.glow_log_e(s, 1.2))
    assert le[1] == pytest.approx(0.0)
    assert le[0] == pytest.approx(-1.2, rel=1e-3)
    assert le[2] == pytest.approx(1.2, rel=1e-3)


def test_inv_block_roundtrip(key, rng):
    c, len1 = 12, 4
    len2 = c - len1
    kf, kg, kh = jax.random.split(key, 3)
    params = {
        "F": S.dense_block_init(kf, len2, len1, gc=8),
        "G": S.dense_block_init(kg, len1, len2, gc=8),
        "H": S.dense_block_init(kh, len1, len2, gc=8),
    }
    x = jnp.asarray(rng.randn(2, 6, 6, c).astype(np.float32))
    y, _ = C.inv_block_forward(params, x, S.dense_block_apply, 1.0, len1)
    x_rec = C.inv_block_inverse(params, y, S.dense_block_apply, 1.0, len1)
    np.testing.assert_allclose(x_rec, x, atol=1e-5)


def test_inv_block_identity_at_init(key, rng):
    """Zero-init last conv makes each coupling the identity at init
    (reference archs.py:86 DenseBlock conv5 zero-init)."""
    c, len1 = 8, 4
    kf, kg, kh = jax.random.split(key, 3)
    params = {
        "F": S.dense_block_init(kf, c - len1, len1, gc=8),
        "G": S.dense_block_init(kg, len1, c - len1, gc=8),
        "H": S.dense_block_init(kh, len1, c - len1, gc=8),
    }
    x = jnp.asarray(rng.randn(1, 4, 4, c).astype(np.float32))
    y, log_det = C.inv_block_forward(params, x, S.dense_block_apply, 1.0, len1)
    np.testing.assert_allclose(y, x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(log_det), 0.0, atol=1e-6)


def test_dense_block_fused_matches_concat_chain(key, rng):
    """The lower-triangular piece-form DenseBlock (subnet.py fused=True)
    == the reference's concat chain (archs.py:88-95) bit-for-near."""
    from sin_inn_tpu.ops import subnet as S

    for c_in, c_out in ((36, 12), (12, 36)):
        p = S.dense_block_init(key, c_in, c_out)
        x = jnp.asarray(rng.randn(2, 8, 10, c_in).astype(np.float32))
        ref = S.dense_block_apply(p, x, fused=False)
        got = S.dense_block_apply(p, x, fused=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # zero-init conv5 => identity-start: fused path must preserve it
        assert float(jnp.abs(S.dense_block_apply(p, x)).max()) < 10.0


def test_conv2d_shift_matches_conv2d(key, rng):
    """The 9-shifted-matmul conv form (subnet.conv2d_shift) == lax.conv
    up to f32 summation order, including the bias."""
    from sin_inn_tpu.ops import subnet as S

    for cin, cout in ((24, 32), (7, 5)):
        kk, key = jax.random.split(key)
        p = S._torch_default_conv(kk, 3, 3, cin, cout)
        x = jnp.asarray(rng.randn(2, 9, 11, cin).astype(np.float32))
        ref = S.conv2d(x, p["w"], p["b"])
        got = S.conv2d_shift(x, p["w"], p["b"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    # dense block in shift mode == concat-chain mode
    p = S.dense_block_init(key, 24, 24)
    x = jnp.asarray(rng.randn(2, 8, 10, 24).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(S.dense_block_apply(p, x, shift=True)),
        np.asarray(S.dense_block_apply(p, x)), rtol=2e-5, atol=2e-5)
