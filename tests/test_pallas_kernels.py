"""Pallas fused-coupling kernel vs the XLA reference implementation.

On CPU the kernels run in interpreter mode; on TPU they compile via Mosaic.
Either way the fused math must match ops.coupling bit-for-bit (same op
ordering) and stay exactly invertible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.ops import coupling as C
from sin_inn_tpu.ops import subnet as S
from sin_inn_tpu.ops.pallas.coupling import (fused_glow_forward_1x1,
                                             fused_glow_inverse_1x1)

INTERPRET = jax.default_backend() == "cpu"


@pytest.fixture
def coupling_setup(key, rng):
    c, len1 = 16, 8
    len2 = c - len1
    k1, k2 = jax.random.split(key)
    params = {
        "s1": S.conv_subnet_init(k1, len1, 2 * len2, kernel=1, hidden=32),
        "s2": S.conv_subnet_init(k2, len2, 2 * len1, kernel=1, hidden=32),
    }
    x = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
    return params, x, len1


def test_fused_forward_matches_xla(coupling_setup):
    params, x, len1 = coupling_setup
    ref, _ = C.glow_coupling_forward(params, x, S.conv_subnet_apply, 1.2, len1)
    fused = fused_glow_forward_1x1(params, x, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_inverse_matches_xla(coupling_setup):
    params, x, len1 = coupling_setup
    y, _ = C.glow_coupling_forward(params, x, S.conv_subnet_apply, 1.2, len1)
    ref = C.glow_coupling_inverse(params, y, S.conv_subnet_apply, 1.2, len1)
    fused = fused_glow_inverse_1x1(params, y, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_roundtrip_exact(coupling_setup):
    params, x, len1 = coupling_setup
    y = fused_glow_forward_1x1(params, x, 1.2, len1, interpret=INTERPRET)
    x_rec = fused_glow_inverse_1x1(params, y, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_fused_handles_nonaligned_rows(key, rng):
    """Row counts that are not multiples of the 256-row tile are padded."""
    c, len1 = 12, 6
    k1, k2 = jax.random.split(key)
    params = {
        "s1": S.conv_subnet_init(k1, len1, 2 * (c - len1), kernel=1, hidden=16),
        "s2": S.conv_subnet_init(k2, c - len1, 2 * len1, kernel=1, hidden=16),
    }
    x = jnp.asarray(rng.randn(1, 5, 7, c).astype(np.float32))  # 35 rows
    ref, _ = C.glow_coupling_forward(params, x, S.conv_subnet_apply, 1.2, len1)
    fused = fused_glow_forward_1x1(params, x, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_backward_matches_autodiff(coupling_setup):
    """Hand-derived backward kernel vs jax.grad of the XLA coupling."""
    from sin_inn_tpu.ops.pallas.coupling import fused_glow_backward_1x1

    params, x, len1 = coupling_setup
    g = jnp.ones_like(x)

    def xla_loss(p, v):
        y, _ = C.glow_coupling_forward(p, v, S.conv_subnet_apply, 1.2, len1)
        return jnp.sum(y * g)

    ref_dp, ref_dx = jax.grad(xla_loss, argnums=(0, 1))(params, x)
    dp, dx = fused_glow_backward_1x1(params, x, g, 1.2, len1,
                                     interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx),
                               atol=2e-4, rtol=2e-4)
    for sub in ("s1", "s2"):
        for conv in ("conv1", "conv2"):
            for leaf in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(dp[sub][conv][leaf]),
                    np.asarray(ref_dp[sub][conv][leaf]),
                    atol=2e-3, rtol=2e-3,
                    err_msg=f"{sub}.{conv}.{leaf}")


def test_fused_full_coupling_grad(coupling_setup):
    """End-to-end custom-vjp op: value + grads flow through jax.grad."""
    from sin_inn_tpu.ops.pallas.coupling import make_fused_coupling_full

    params, x, len1 = coupling_setup
    op = make_fused_coupling_full(1.2, len1, interpret=INTERPRET)

    def loss(p, v):
        return jnp.sum(op(p, v) ** 2)

    val = float(loss(params, x))
    assert np.isfinite(val)
    dp, dx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert np.isfinite(np.asarray(dx)).all()
    assert float(jnp.abs(dp["s1"]["conv1"]["w"]).sum()) > 0


@pytest.fixture
def coupling3_setup(key, rng):
    c, len1 = 16, 8
    len2 = c - len1
    k1, k2 = jax.random.split(key)
    params = {
        "s1": S.conv_subnet_init(k1, len1, 2 * len2, kernel=3, hidden=32),
        "s2": S.conv_subnet_init(k2, len2, 2 * len1, kernel=3, hidden=32),
    }
    x = jnp.asarray(rng.randn(2, 6, 10, c).astype(np.float32))
    return params, x, len1


def test_fused3x3_forward_matches_xla(coupling3_setup):
    from sin_inn_tpu.ops.pallas.coupling3x3 import fused_glow3_forward

    params, x, len1 = coupling3_setup
    ref, _ = C.glow_coupling_forward(params, x, S.conv_subnet_apply, 1.2, len1)
    fused = fused_glow3_forward(params, x, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused3x3_roundtrip(coupling3_setup):
    from sin_inn_tpu.ops.pallas.coupling3x3 import (fused_glow3_forward,
                                                    fused_glow3_inverse)

    params, x, len1 = coupling3_setup
    y = fused_glow3_forward(params, x, 1.2, len1, interpret=INTERPRET)
    x_rec = fused_glow3_inverse(params, y, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_fused3x3_grad(coupling3_setup):
    from sin_inn_tpu.ops.pallas.coupling3x3 import make_fused_coupling3

    params, x, len1 = coupling3_setup
    fwd, inv = make_fused_coupling3(1.2, len1, interpret=INTERPRET)

    def loss(p, v):
        return jnp.sum(fwd(p, v) ** 2) + jnp.sum(inv(p, v) ** 2)

    dp, dx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert np.isfinite(np.asarray(dx)).all()
    assert float(jnp.abs(dp["s2"]["conv1"]["w"]).sum()) > 0


def test_fused_inverse_backward_matches_autodiff(coupling_setup):
    from sin_inn_tpu.ops.pallas.coupling import fused_glow_inverse_backward_1x1

    params, x, len1 = coupling_setup
    y = x  # any tensor works as an "output" to invert
    g = jnp.asarray(np.random.RandomState(3).randn(*x.shape).astype(np.float32))

    def xla_loss(p, v):
        out = C.glow_coupling_inverse(p, v, S.conv_subnet_apply, 1.2, len1)
        return jnp.sum(out * g)

    ref_dp, ref_dy = jax.grad(xla_loss, argnums=(0, 1))(params, y)
    dp, dy = fused_glow_inverse_backward_1x1(params, y, g, 1.2, len1,
                                             interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(ref_dy),
                               atol=2e-4, rtol=2e-4)
    for sub in ("s1", "s2"):
        for conv in ("conv1", "conv2"):
            for leaf in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(dp[sub][conv][leaf]),
                    np.asarray(ref_dp[sub][conv][leaf]),
                    atol=2e-3, rtol=2e-3, err_msg=f"{sub}.{conv}.{leaf}")


def test_half_coupling_3x3_matches_xla(coupling3_setup):
    from sin_inn_tpu.ops.pallas.coupling3x3 import (glow3_forward_halves,
                                                    glow3_inverse_halves)

    params, x, len1 = coupling3_setup
    ref, _ = C.glow_coupling_forward(params, x, S.conv_subnet_apply, 1.2, len1)
    fused = glow3_forward_halves(params, x, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    back = glow3_inverse_halves(params, fused, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_banded_3x3_coupling_matches_xla():
    """Row-band tiled 3x3 coupling (fwd, inv, fused bwd) == XLA reference.
    Interpret mode on CPU; uses the exact-atan check tolerance (the kernel's
    A&S polynomial differs from XLA atan by ~1e-7)."""
    import jax
    import jax.numpy as jnp

    from sin_inn_tpu.ops import coupling as C
    from sin_inn_tpu.ops import subnet as S
    from sin_inn_tpu.ops.pallas.coupling3x3 import make_fused_coupling3_banded

    clamp, len1 = 1.2, 8
    c = 20
    key = jax.random.key(0)
    k1, k2, kx = jax.random.split(key, 3)
    params = {
        "s1": S.conv_subnet_init(k1, len1, 2 * (c - len1), 3, hidden=16),
        "s2": S.conv_subnet_init(k2, c - len1, 2 * len1, 3, hidden=16),
    }
    # H=11 deliberately not a band multiple (band=8) to cover row padding
    x = jax.random.normal(kx, (2, 11, 16, c), jnp.float32) * 0.5

    fwd, inv = make_fused_coupling3_banded(clamp, len1, interpret=True)

    y_ref, _ = C.glow_coupling_forward(params, x, S.conv_subnet_apply,
                                       clamp, len1)
    y_pal = fwd(params, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    x_rec = inv(params, y_pal)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)

    # gradients: fused bwd kernel vs autodiff of the XLA coupling
    def loss_ref(p, xx):
        y, _ = C.glow_coupling_forward(p, xx, S.conv_subnet_apply, clamp, len1)
        return jnp.sum(jnp.sin(y))

    def loss_pal(p, xx):
        return jnp.sum(jnp.sin(fwd(p, xx)))

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_p, gp_x = jax.grad(loss_pal, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gr_x),
                               rtol=5e-4, atol=5e-5)
    for sub in ("s1", "s2"):
        for conv in ("conv1", "conv2"):
            for leaf in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(gp_p[sub][conv][leaf]),
                    np.asarray(gr_p[sub][conv][leaf]),
                    rtol=5e-4, atol=5e-5,
                    err_msg=f"{sub}.{conv}.{leaf}")

    # inverse-direction gradients
    def loss_ref_inv(p, yy):
        return jnp.sum(jnp.sin(C.glow_coupling_inverse(
            p, yy, S.conv_subnet_apply, clamp, len1)))

    def loss_pal_inv(p, yy):
        return jnp.sum(jnp.sin(inv(p, yy)))

    gr_p, gr_y = jax.grad(loss_ref_inv, argnums=(0, 1))(params, y_ref)
    gp_p, gp_y = jax.grad(loss_pal_inv, argnums=(0, 1))(params, y_ref)
    np.testing.assert_allclose(np.asarray(gp_y), np.asarray(gr_y),
                               rtol=5e-4, atol=5e-5)
    for sub in ("s1", "s2"):
        for conv in ("conv1", "conv2"):
            np.testing.assert_allclose(
                np.asarray(gp_p[sub][conv]["w"]),
                np.asarray(gr_p[sub][conv]["w"]),
                rtol=5e-4, atol=5e-5, err_msg=f"inv {sub}.{conv}.w")


# ---------------------------------------------------------------------------
# Region-scatter splat kernel (ops/pallas/splat.py)
# ---------------------------------------------------------------------------

def test_splat_region_matches_exact_scatter(rng):
    """Pallas region-scatter forward == the exact scatter for in-window
    flows (|fy| <= dy-1, |fx| <= dx-1)."""
    from sin_inn_tpu.ops.splat import splat_scatter
    from sin_inn_tpu.ops.pallas.splat import _splat_region_call

    n, h, w, c = 2, 40, 50, 5
    v = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    fl = jnp.asarray((rng.rand(n, h, w, 2) * 10 - 5).astype(np.float32))
    ref = splat_scatter(v, fl)
    got = _splat_region_call(v, fl, 8, 8, INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_splat_region_gradients_match_exact(rng):
    """custom_vjp (4-tap gather adjoint with tile-anchored masks) == autodiff
    of the exact scatter for in-window flows."""
    from sin_inn_tpu.ops.splat import splat_scatter
    from sin_inn_tpu.ops.pallas.splat import splat_region

    n, h, w, c = 2, 40, 50, 3
    v = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    fl = jnp.asarray((rng.rand(n, h, w, 2) * 10 - 5).astype(np.float32))
    l_ref = lambda v_, f_: jnp.sum(jnp.sin(splat_scatter(v_, f_) * 3))
    l_pal = lambda v_, f_: jnp.sum(jnp.sin(
        splat_region(8, 8, INTERPRET, v_, f_) * 3))
    gr = jax.grad(l_ref, (0, 1))(v, fl)
    gp = jax.grad(l_pal, (0, 1))(v, fl)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_softsplat_region_with_coverage_matches_xla(rng):
    """softmax-mode packing + coverage on the region kernel == the scatter
    version (the train-step call shape)."""
    from sin_inn_tpu.ops.splat import softsplat_with_coverage
    from sin_inn_tpu.ops.pallas.splat import softsplat_region_with_coverage

    n, h, w = 2, 30, 40
    img = jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32))
    fl = jnp.asarray((rng.rand(n, h, w, 2) * 6 - 3).astype(np.float32))
    metric = jnp.asarray(-rng.rand(n, h, w, 1).astype(np.float32))
    ref, cov_ref = softsplat_with_coverage(img, fl, metric)
    got, cov = softsplat_region_with_coverage(img, fl, metric, 6, 6,
                                              interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), np.asarray(cov_ref),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Windowed gather kernel (ops/pallas/gather.py)
# ---------------------------------------------------------------------------

def test_resample_region_matches_resample2d(rng):
    """Pallas gather forward == the exact resample2d (incl. the (size-1)
    normalization quirk) for in-window flows."""
    from sin_inn_tpu.ops.warp import resample2d
    from sin_inn_tpu.ops.pallas.gather import resample2d_region

    n, h, w, c = 2, 40, 50, 3
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    fl = jnp.asarray((rng.rand(n, h, w, 2) * 10 - 5).astype(np.float32))
    ref = resample2d(img, fl)
    got = resample2d_region(8, 8, INTERPRET, img, fl)
    # the kernel computes p = (x+f)*s - 0.5 in one step vs the reference's
    # normalize/denormalize chain: f32 coordinate rounding, not kernel error
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_resample_region_gradients_match(rng):
    """Fused analytic backward (derivative one-hots + splat adjoint) ==
    autodiff of the exact resample2d, for BOTH img and flow."""
    from sin_inn_tpu.ops.warp import resample2d
    from sin_inn_tpu.ops.pallas.gather import resample2d_region

    n, h, w, c = 2, 40, 50, 3
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    fl = jnp.asarray((rng.rand(n, h, w, 2) * 10 - 5).astype(np.float32))
    l_ref = lambda im, f_: jnp.sum(jnp.sin(resample2d(im, f_) * 3))
    l_pal = lambda im, f_: jnp.sum(jnp.sin(
        resample2d_region(8, 8, INTERPRET, im, f_) * 3))
    gr = jax.grad(l_ref, (0, 1))(img, fl)
    gp = jax.grad(l_pal, (0, 1))(img, fl)
    for a, b in zip(gr, gp):
        # same f32 coordinate-path rounding as the forward (grads are O(10))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4)


def test_fused_coupling_bf16_inputs(coupling_setup):
    """bf16 activations through the fused kernels (the SR bf16 mode feeds the
    inverse chain in bfloat16): outputs keep the input dtype, matmul math
    stays f32-accumulated, and the backward returns f32 weight grads."""
    from sin_inn_tpu.ops.pallas.coupling import fused_glow_backward_1x1
    params, x, len1 = coupling_setup
    xb = x.astype(jnp.bfloat16)
    y = fused_glow_forward_1x1(params, xb, 1.2, len1, interpret=INTERPRET)
    assert y.dtype == jnp.bfloat16
    x_rec = fused_glow_inverse_1x1(params, y, 1.2, len1, interpret=INTERPRET)
    assert x_rec.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(x_rec, np.float32),
                               np.asarray(xb, np.float32), atol=0.1)
    ref = fused_glow_forward_1x1(params, x, 1.2, len1, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    g = jnp.ones_like(y)
    dparams, dx = fused_glow_backward_1x1(params, xb, g, 1.2, len1,
                                          interpret=INTERPRET)
    assert dx.dtype == jnp.bfloat16
    assert dparams["s1"]["conv1"]["w"].dtype == jnp.float32
    assert all(np.isfinite(np.asarray(l, np.float32)).all()
               for l in jax.tree_util.tree_leaves((dparams, dx)))


def test_splat_region_bf16_inputs(rng):
    """bf16 frames/flow through the region splat: the wrapper casts to f32
    for the VMEM scratch DMA (dtype-matched copies) and returns the input
    dtype. Values are bf16-quantized first so the f32 reference run sees
    the SAME numbers — the paths then differ only by the (f32) kernel
    internals."""
    from sin_inn_tpu.ops.pallas.splat import (_splat_region_call,
                                              softsplat_region_with_coverage)

    n, h, w, c = 1, 40, 50, 3
    v32 = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    fl32 = jnp.asarray((rng.rand(n, h, w, 2) * 10 - 5).astype(np.float32))
    v32 = v32.astype(jnp.bfloat16).astype(jnp.float32)
    fl32 = fl32.astype(jnp.bfloat16).astype(jnp.float32)

    got = _splat_region_call(v32.astype(jnp.bfloat16),
                             fl32.astype(jnp.bfloat16), 8, 8, INTERPRET)
    assert got.dtype == jnp.bfloat16
    ref = _splat_region_call(v32, fl32, 8, 8, INTERPRET)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.05)

    m32 = (jnp.asarray(rng.rand(n, h, w, 1).astype(np.float32))
           .astype(jnp.bfloat16).astype(jnp.float32))
    soft, cover = softsplat_region_with_coverage(
        v32.astype(jnp.bfloat16), fl32.astype(jnp.bfloat16),
        m32.astype(jnp.bfloat16), 8, 8, interpret=INTERPRET)
    assert soft.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(soft, np.float32)).all()


def test_splat_region_mixed_dtype_grads(rng):
    """bf16 values with f32 flow through the region splat's custom_vjp:
    cotangent dtypes must match the primals (the kernel outputs carry the
    values dtype; the flow cotangent is cast back)."""
    from sin_inn_tpu.ops.pallas.splat import splat_region

    n, h, w, c = 1, 24, 32, 3
    v = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32)
                    ).astype(jnp.bfloat16)
    fl = jnp.asarray((rng.rand(n, h, w, 2) * 6 - 3).astype(np.float32))

    def loss(v_, f_):
        return jnp.sum(splat_region(8, 8, INTERPRET, v_, f_)
                       .astype(jnp.float32))

    dv, dfl = jax.grad(loss, (0, 1))(v, fl)
    assert dv.dtype == jnp.bfloat16 and dfl.dtype == jnp.float32
    assert np.isfinite(np.asarray(dfl)).all()


def test_resample_region_bf16_flow_image_grad(rng):
    """bf16 flow through resample2d_region's backward: the image-grad splat
    builds its pixel coordinates in f32 (a bf16 arange cannot represent
    integers > 256), so with bf16-quantized flow the image gradient matches
    the f32-flow run."""
    from sin_inn_tpu.ops.pallas.gather import resample2d_region

    n, h, w, c = 1, 40, 50, 3
    img = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    fl32 = (jnp.asarray((rng.rand(n, h, w, 2) * 10 - 5).astype(np.float32))
            .astype(jnp.bfloat16).astype(jnp.float32))

    def loss(im, f_):
        return jnp.sum(jnp.sin(
            resample2d_region(8, 8, INTERPRET, im, f_) * 3))

    d_ref = jax.grad(loss, 0)(img, fl32)
    d_b16 = jax.grad(loss, 0)(img, fl32.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(d_b16), np.asarray(d_ref),
                               atol=2e-4)


# ---------------------------------------------------------------------------
# LOCAL-window kernels: per-tile mean-flow row offsets (ops/pallas/offsets.py)
# ---------------------------------------------------------------------------

def _smooth_large_flow(n, h, w):
    """Globally smooth flow with LARGE y-magnitude (far beyond any local
    row bound) but small deviation from every 128px-neighborhood mean; the
    0.0371/0.71234 irrational-ish constants keep targets off exact
    integers (at integer targets the relu-hat kernels and the unclamped
    scatter disagree on a measure-zero subgradient tie)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base_y = 19.0371 + 3.0 * yy / h
    base_x = -15.0371 + 6.0 * xx / w
    dev = 0.71234 * np.stack([np.cos(xx / 17.0 + yy / 21.0),
                              np.sin(xx / 19.0 - yy / 15.0)], axis=-1)
    flow = np.stack([base_x, base_y], axis=-1)[None] + dev[None]
    return np.repeat(flow, n, axis=0).astype(np.float32)


# row offsets absorb the ~20px mean y-motion; x keeps a static bound that
# must cover |fx| <= ~15.8
_LDY, _LDX, _CAPY = 8, 18, 24


def _local_setup(rng, n=2, h=136, w=160, c=2):
    from sin_inn_tpu.ops.pallas.offsets import tile_flow_offsets

    fl = jnp.asarray(_smooth_large_flow(n, h, w))
    v = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    offs = tile_flow_offsets(fl, 128, 128, _CAPY, 0)
    return v, fl, offs


def test_tile_flow_offsets_means_and_devs():
    """Row offsets are the per-tile means quantized to the sublane tiling;
    x offsets are disabled (cap 0); deviations measure the in-contract
    margin against the offsets actually used (both tiling criteria)."""
    from sin_inn_tpu.ops.pallas.offsets import tile_flow_offsets

    h, w = 136, 160
    fl = jnp.asarray(_smooth_large_flow(1, h, w))
    offs = tile_flow_offsets(fl, 128, 128, _CAPY, 0)
    assert offs.off_src.shape == (1, 2, 2, 2)
    # hand-check tile (0, 0): mean over rows 0:128, cols 0:128, y to 8s
    m = np.asarray(fl)[0, :128, :128].mean(axis=(0, 1))
    assert float(offs.off_src[0, 0, 0, 1]) == np.rint(m[1] / 8) * 8
    assert float(jnp.abs(offs.off_src[..., 0]).max()) == 0.0  # x disabled
    # y deviates < 4 px from the fine mean + <= 4 px quantization
    assert float(offs.dev_src[1]) < 8.0
    assert float(offs.dev_out[1]) < 8.0
    # with x offsets off, dev_x is the plain |fx| magnitude
    assert abs(float(offs.dev_src[0]) - float(jnp.abs(fl[..., 0]).max())) < 1e-5
    # offsets are clipped to the cap (and stay quantized)
    big = tile_flow_offsets(fl * 10.0, 128, 128, _CAPY, 0)
    assert float(jnp.abs(big.off_src[..., 1]).max()) <= _CAPY
    assert float(jnp.abs(big.off_src[..., 1]).max()) % 8 == 0


def test_splat_region_local_matches_exact_scatter(rng):
    """LOCAL-window splat == exact scatter for flows whose y-magnitude
    (~20px) far exceeds the local row bound (ldy=8) — the per-tile row
    offsets absorb the mean motion."""
    from sin_inn_tpu.ops.splat import splat_scatter
    from sin_inn_tpu.ops.pallas.splat import _splat_region_call_local

    v, fl, offs = _local_setup(rng)
    ref = splat_scatter(v, fl)
    got = _splat_region_call_local(v, fl, offs.off_out, _LDY, _LDX, _CAPY,
                                   0, INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_splat_region_local_gradients_match_exact(rng):
    from sin_inn_tpu.ops.splat import splat_scatter
    from sin_inn_tpu.ops.pallas.splat import splat_region_local

    v, fl, offs = _local_setup(rng)
    l_ref = lambda v_, f_: jnp.sum(jnp.sin(splat_scatter(v_, f_) * 3))
    l_loc = lambda v_, f_: jnp.sum(jnp.sin(splat_region_local(
        _LDY, _LDX, _CAPY, 0, INTERPRET, v_, f_,
        offs.off_out, offs.off_src) * 3))
    gr = jax.grad(l_ref, (0, 1))(v, fl)
    gl = jax.grad(l_loc, (0, 1))(v, fl)
    for a, b in zip(gr, gl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_resample_region_local_matches_static(rng):
    """LOCAL-window resample == the static region kernel (wide bounds) in
    BOTH forward and gradients — identical coverage for in-contract
    flows — and == the plain 4-tap resample in forward."""
    from sin_inn_tpu.ops.warp import resample2d
    from sin_inn_tpu.ops.pallas.gather import (resample2d_region,
                                               resample2d_region_local)

    img_np = rng.rand(2, 136, 160, 2).astype(np.float32)
    img = jnp.asarray(img_np)
    _, fl, offs = _local_setup(rng)
    got = resample2d_region_local(_LDY, _LDX, _CAPY, 0, INTERPRET, img, fl,
                                  offs.off_src)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(resample2d(img, fl)), atol=2e-4)

    gct = jnp.asarray(rng.rand(*img_np.shape).astype(np.float32))
    _, vjp_loc = jax.vjp(lambda i_, f_: resample2d_region_local(
        _LDY, _LDX, _CAPY, 0, INTERPRET, i_, f_, offs.off_src), img, fl)
    _, vjp_sta = jax.vjp(lambda i_, f_: resample2d_region(
        32, 64, INTERPRET, i_, f_), img, fl)
    for a, b in zip(vjp_loc(gct), vjp_sta(gct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_splat_local_reaches_beyond_global_row_bound(rng):
    """A constant ~20px y-flow is EXACT under local row windows with ldy=8
    and cap=24 — 2.5x the |fy| <= ldy-1 = 7 a static window of the same
    compute cost GUARANTEES (the offset absorbs the constant motion)."""
    from sin_inn_tpu.ops.splat import splat_scatter
    from sin_inn_tpu.ops.pallas.offsets import tile_flow_offsets
    from sin_inn_tpu.ops.pallas.splat import _splat_region_call_local

    n, h, w, c = 1, 136, 160, 2
    v = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    fl = jnp.zeros((n, h, w, 2), jnp.float32)
    fl = fl.at[..., 0].set(3.3).at[..., 1].set(-19.6)
    offs = tile_flow_offsets(fl, 128, 128, _CAPY, 0)
    assert float(np.asarray(offs.dev_out)[1]) < 4.0
    ref = splat_scatter(v, fl)
    got = _splat_region_call_local(v, fl, offs.off_out, _LDY, _LDX, _CAPY,
                                   0, INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flow_loss_local_windows_close_to_exact(rng):
    """Full photometric loss on the LOCAL-window Pallas path (forced
    interpret off-TPU) == the exact-op loss, deviation monitor present."""
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.train.flow import photometric_flow_loss

    f1 = jnp.asarray(rng.rand(2, 12, 16, 3).astype(np.float32))
    f2 = jnp.asarray(rng.rand(2, 12, 16, 3).astype(np.float32))
    fl12 = jnp.asarray((rng.rand(2, 12, 16, 2) * 4 - 2).astype(np.float32))
    fl21 = jnp.asarray((rng.rand(2, 12, 16, 2) * 4 - 2).astype(np.float32))
    exact = FlowConfig(net="RBF", splat_max_dy="off")
    local = FlowConfig(net="RBF", splat_max_dy=16, splat_max_dx=8,
                       splat_local_dy=8, use_pallas="on")
    le, auxe = photometric_flow_loss(exact, f1, f2, fl12, fl21)
    ll, auxl = photometric_flow_loss(local, f1, f2, fl12, fl21)
    np.testing.assert_allclose(float(le), float(ll), rtol=2e-4)
    assert "flow_dev_x" in auxl and "flow_dev_y" in auxl
    assert float(auxl["flow_dev_y"]) <= 7.0


def test_local_config_resolution():
    """'auto' local row bound resolves to half the global dy (sublane
    multiples), engages only on the 2D-window path when it shrinks the
    window."""
    from sin_inn_tpu.core.config import FlowConfig

    cfg = FlowConfig(splat_local_dy="auto")
    r = cfg.resolve_splat_bounds(436, 1024)
    assert (r.splat_max_dy, r.splat_max_dx) == (64, 128)
    assert r.splat_local_dy == 32
    # tiny frames: global windows off -> local off
    r2 = cfg.resolve_splat_bounds(64, 64)
    assert r2.splat_local_dy is None
    # the default IS 'auto' (the fastest honest configuration ships on —
    # same contract as the global bounds; the train-loop probe re-derives
    # it from GT deviation when available)
    assert FlowConfig().resolve_splat_bounds(436, 1024).splat_local_dy == 32
    # explicit off stays off
    off = FlowConfig(splat_local_dy="off").resolve_splat_bounds(436, 1024)
    assert off.splat_local_dy is None
    # no shrink -> disabled
    r4 = FlowConfig(splat_local_dy=64).resolve_splat_bounds(436, 1024)
    assert r4.splat_local_dy is None


def test_local_bound_gt_probe():
    """The train-loop probe re-derives the 'auto' local bound from the
    measured per-tile GT-flow deviation (1.5x + 3 px margin, sublane
    multiples), and disables local mode when the probe reaches the
    global window."""
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.train.loop import _resolve_and_probe_splat_bounds

    class _M:
        gt_available = True

    h, w = 436, 1024
    m = _M()
    # smooth ~20px pan: deviation from the tile means (incl. the <=4 px
    # offset quantization) is a few px -> ldy probes well below auto's 32
    m.flow = _smooth_large_flow(2, h, w)
    cfg = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dy=64, splat_max_dx=128), m, h, w)
    assert cfg.splat_local_dy in (8, 16)
    # high-deviation flow (alternating bands) -> local mode disabled
    m2 = _M()
    band = (np.arange(h) // 8 % 2).astype(np.float32) * 80.0
    m2.flow = np.zeros((2, h, w, 2), np.float32)
    m2.flow[..., 1] = band[None, :, None]
    cfg2 = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dy=64, splat_max_dx=128), m2, h, w)
    assert cfg2.splat_local_dy is None
    # an explicit int pins (probe only touches 'auto')
    cfg3 = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dy=64, splat_max_dx=128,
                   splat_local_dy=24), m, h, w)
    assert cfg3.splat_local_dy == 24


# ---------------------------------------------------------------------------
# X-LOCAL windows: 128-lane-quantized column offsets (fast-pan scenes)
# ---------------------------------------------------------------------------

def _fast_pan_flow(n, h, w):
    """~135px horizontal pan + ~20px vertical drift, smooth: far beyond
    any same-cost static window, tiny per-tile deviation."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base_x = 134.0371 + 4.0 * xx / w
    base_y = -19.0371 + 3.0 * yy / h
    dev = 0.61234 * np.stack([np.cos(xx / 23.0 + yy / 17.0),
                              np.sin(xx / 13.0 - yy / 19.0)], axis=-1)
    flow = np.stack([base_x, base_y], axis=-1)[None] + dev[None]
    return np.repeat(flow, n, axis=0).astype(np.float32)


# x offsets absorb the ~135px pan (quantized to 128, residual ~7px eats
# the 64px budget); y offsets absorb the ~20px drift as before
_XLDY, _XLDX, _XCAPY, _XCAPX = 8, 64, 24, 256


def _xlocal_setup(rng, n=2, h=136, w=288, c=2):
    from sin_inn_tpu.ops.pallas.offsets import tile_flow_offsets

    fl = jnp.asarray(_fast_pan_flow(n, h, w))
    v = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    offs = tile_flow_offsets(fl, 128, 128, _XCAPY, _XCAPX)
    return v, fl, offs


def test_tile_flow_offsets_x_quantization(rng):
    """x offsets quantize to the lane tiling and the deviations are
    measured against the quantized offsets actually used."""
    from sin_inn_tpu.ops.pallas.offsets import (tile_deviation_fine,
                                                tile_flow_offsets)

    _, fl, offs = _xlocal_setup(rng)
    ox = np.asarray(offs.off_src[..., 0])
    assert (ox % 128 == 0).all() and (np.abs(ox) <= _XCAPX).all()
    assert ox.max() == 128.0  # the ~135px pan rounds to one lane tile
    # deviation vs the quantized offset: pan residual ~7-11px, not ~135
    assert 4.0 < float(offs.dev_src[0]) < 16.0
    assert float(offs.dev_out[0]) < 20.0
    # fine deviation (probe input) excludes the quantization part
    fine = tile_deviation_fine(fl, 128, 128)
    assert float(fine[0]) < 4.0 and float(fine[1]) < 4.0


def test_splat_region_xlocal_matches_exact_scatter(rng):
    from sin_inn_tpu.ops.splat import splat_scatter
    from sin_inn_tpu.ops.pallas.splat import _splat_region_call_local

    v, fl, offs = _xlocal_setup(rng)
    ref = splat_scatter(v, fl)
    got = _splat_region_call_local(v, fl, offs.off_out, _XLDY, _XLDX,
                                   _XCAPY, _XCAPX, INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_xlocal_full_pipeline_gradients_match_exact(rng):
    """splat fwd+bwd and resample fwd+bwd on the x+y-local kernels match
    the exact ops for a ~135px pan no same-cost static window reaches."""
    from sin_inn_tpu.ops.splat import splat_scatter
    from sin_inn_tpu.ops.warp import resample2d
    from sin_inn_tpu.ops.pallas.splat import splat_region_local
    from sin_inn_tpu.ops.pallas.gather import (resample2d_region,
                                               resample2d_region_local)

    v, fl, offs = _xlocal_setup(rng)
    l_ref = lambda v_, f_: jnp.sum(jnp.sin(splat_scatter(v_, f_) * 3))
    l_loc = lambda v_, f_: jnp.sum(jnp.sin(splat_region_local(
        _XLDY, _XLDX, _XCAPY, _XCAPX, INTERPRET, v_, f_,
        offs.off_out, offs.off_src) * 3))
    gr = jax.grad(l_ref, (0, 1))(v, fl)
    gl = jax.grad(l_loc, (0, 1))(v, fl)
    for a, b in zip(gr, gl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    got = resample2d_region_local(_XLDY, _XLDX, _XCAPY, _XCAPX, INTERPRET,
                                  v, fl, offs.off_src)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(resample2d(v, fl)), atol=2e-4)
    # gradients vs the STATIC region kernel at bounds wide enough to
    # cover the pan (same coverage, no local offsets)
    r_sta = lambda i_, f_: jnp.sum(jnp.cos(resample2d_region(
        32, 192, INTERPRET, i_, f_) * 2))
    r_loc = lambda i_, f_: jnp.sum(jnp.cos(resample2d_region_local(
        _XLDY, _XLDX, _XCAPY, _XCAPX, INTERPRET, i_, f_, offs.off_src) * 2))
    gr2 = jax.grad(r_sta, (0, 1))(v, fl)
    gl2 = jax.grad(r_loc, (0, 1))(v, fl)
    for a, b in zip(gr2, gl2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_xlocal_config_resolution_and_probe():
    """'auto' local dx resolves OFF (probe-only); a pinned int engages
    only with the row-local path and a lane-granular window shrink. The
    GT probe widens fast-pan global bounds for coverage and engages the
    local bounds to keep deviation-scale FLOPs."""
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.train.loop import _resolve_and_probe_splat_bounds

    r = FlowConfig().resolve_splat_bounds(436, 1024)
    assert r.splat_local_dx is None
    # pinned: needs a shrink at lane granularity (dx=128: 64 shrinks
    # 384->256 lanes, 96 does not)
    r2 = FlowConfig(splat_local_dx=64).resolve_splat_bounds(436, 1024)
    assert r2.splat_local_dx == 64
    r3 = FlowConfig(splat_local_dx=96).resolve_splat_bounds(436, 1024)
    assert r3.splat_local_dx is None
    r4 = FlowConfig(splat_local_dy="off",
                    splat_local_dx=64).resolve_splat_bounds(436, 1024)
    assert r4.splat_local_dx is None  # requires the row-local path

    class _M:
        gt_available = True

    h, w = 436, 1024
    m = _M()
    m.flow = _fast_pan_flow(2, h, w)
    cfg = _resolve_and_probe_splat_bounds(FlowConfig(), m, h, w)
    # coverage: the probe WIDENS the size-scaled dx (128) past the pan
    # (and tightens dy to the probed drift)
    assert cfg.splat_max_dx >= 208 and cfg.splat_max_dy == 32
    # speed: both local bounds engage at deviation scale
    assert cfg.splat_local_dy in (8, 16)
    assert cfg.splat_local_dx == 128  # 64 quant + 64 (1.5*dev+3 rounded)
    # a probe at half the frame disables windowing entirely (exact ops)
    m2 = _M()
    m2.flow = np.zeros((2, h, w, 2), np.float32)
    m2.flow[..., 1] = 300.0
    cfg2 = _resolve_and_probe_splat_bounds(FlowConfig(), m2, h, w)
    assert cfg2.splat_max_dy is None and cfg2.splat_max_dx is None
    assert cfg2.splat_local_dy is None and cfg2.splat_local_dx is None
