"""Tests for warp/splat/occlusion/photometric ops.

Splat fwd is golden-tested against an independent numpy scatter loop
(SURVEY §4: "splat fwd/vjp vs dense scatter reference").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.ops.splat import softsplat, splat_scatter
from sin_inn_tpu.ops.warp import flow_warp, grid_sample, resample2d, warp_affine, rotation_matrix_2d
from sin_inn_tpu.ops.occlusion import occlusion_brox, occlusion_unity, occlusion_wang
from sin_inn_tpu.ops import photometric as P


def numpy_splat(values, flow):
    """Independent dense reference: bilinear scatter-add, borders dropped."""
    n, h, w, c = values.shape
    out = np.zeros_like(values)
    for ni in range(n):
        for y in range(h):
            for x in range(w):
                ox = x + flow[ni, y, x, 0]
                oy = y + flow[ni, y, x, 1]
                x0, y0 = int(np.floor(ox)), int(np.floor(oy))
                for dx in (0, 1):
                    for dy in (0, 1):
                        xi, yi = x0 + dx, y0 + dy
                        if 0 <= xi < w and 0 <= yi < h:
                            wgt = (1 - abs(ox - xi)) * (1 - abs(oy - yi))
                            out[ni, yi, xi] += values[ni, y, x] * wgt
    return out


def test_splat_matches_numpy(rng):
    values = rng.rand(2, 5, 6, 3).astype(np.float32)
    flow = (rng.rand(2, 5, 6, 2).astype(np.float32) * 4 - 2)
    out = np.asarray(splat_scatter(jnp.asarray(values), jnp.asarray(flow)))
    ref = numpy_splat(values, flow)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_splat_zero_flow_identity(rng):
    values = rng.rand(1, 4, 4, 2).astype(np.float32)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    out = np.asarray(splat_scatter(jnp.asarray(values), jnp.asarray(flow)))
    np.testing.assert_allclose(out, values, atol=1e-6)


def test_softsplat_softmax_zero_flow(rng):
    """With zero flow, softmax splatting must reproduce the input."""
    inp = rng.rand(1, 4, 4, 3).astype(np.float32)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    metric = rng.rand(1, 4, 4, 1).astype(np.float32)
    out = np.asarray(softsplat(jnp.asarray(inp), jnp.asarray(flow),
                               jnp.asarray(metric), "softmax"))
    np.testing.assert_allclose(out, inp, atol=1e-5)


def test_softsplat_grad_exists(rng):
    """Autodiff through the scatter: both input and flow gradients flow."""
    inp = jnp.asarray(rng.rand(1, 4, 4, 1).astype(np.float32))
    flow = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32))

    def f(i, fl):
        return jnp.sum(softsplat(i, fl, -i[..., :1], "softmax") ** 2)

    gi, gf = jax.grad(f, argnums=(0, 1))(inp, flow)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).sum()) > 0


def test_resample2d_zero_flow_identity(rng):
    img = rng.rand(1, 6, 6, 3).astype(np.float32)
    flow = np.zeros((1, 6, 6, 2), np.float32)
    out = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow)))
    # the reference's align_corners quirk introduces sub-pixel shift at
    # borders only; interior must match closely
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], img[:, 2:-2, 2:-2], atol=0.15)


def test_flow_warp_integer_shift(rng):
    img = rng.rand(1, 6, 6, 1).astype(np.float32)
    flow = np.zeros((1, 6, 6, 2), np.float32)
    flow[..., 0] = 1.0   # sample from x+1
    out = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0], atol=1e-5)


def test_grid_sample_align_corners_identity(rng):
    img = rng.rand(1, 5, 7, 2).astype(np.float32)
    h, w = 5, 7
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    grid = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    out = np.asarray(grid_sample(jnp.asarray(img), grid, align_corners=True))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_occlusion_wang_zero_flow():
    flow = jnp.zeros((1, 5, 5, 2))
    mask = np.asarray(occlusion_wang(flow, flow, 0.7))
    np.testing.assert_array_equal(mask, np.ones((1, 5, 5, 1)))


def test_occlusion_wang_detects_vacated_region():
    # all pixels shift right by 3: left columns lose coverage
    flow = jnp.zeros((1, 6, 6, 2)).at[..., 0].set(3.0)
    mask = np.asarray(occlusion_wang(flow, flow, 0.7))[0, :, :, 0]
    assert mask[:, :3].sum() == 0       # vacated: occluded
    assert mask[:, 3:].sum() > 0


def test_occlusion_brox_consistent_flow():
    fw = jnp.zeros((1, 5, 5, 2))
    out = np.asarray(occlusion_brox(fw, fw, None))
    np.testing.assert_array_equal(out, np.zeros((1, 5, 5, 1)))


def test_occlusion_unity():
    flow = jnp.zeros((2, 3, 4, 2))
    np.testing.assert_array_equal(np.asarray(occlusion_unity(flow)),
                                  np.ones((2, 3, 4, 1)))


def test_masked_l1_matches_reference_formula(rng):
    im1 = jnp.asarray(rng.rand(1, 4, 4, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(1, 4, 4, 3).astype(np.float32))
    mask = jnp.ones((1, 4, 4, 1))
    got = float(P.masked_l1(im1, im2, mask, weight=2.0))
    # m.sum()=16, m.numel()=16 -> plain mean|diff| * weight
    expect = float(np.mean(np.abs(np.asarray(im1) - np.asarray(im2))) * 2.0)
    assert got == pytest.approx(expect, rel=1e-5)


def test_zero_weight_losses_are_zero(rng):
    im = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 1))
    flow = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    assert float(P.masked_l1(im, im, mask, 0.0)) == 0.0
    assert float(P.census_loss(im, im, mask, 0.0)) == 0.0
    assert float(P.ssim_loss(im, im, mask, 0.0)) == 0.0
    assert float(P.bilateral_smooth(im, flow, 0.0)) == 0.0


def test_census_identical_images_zero(rng):
    im = jnp.asarray(rng.rand(1, 10, 10, 3).astype(np.float32))
    mask = jnp.ones((1, 10, 10, 1))
    assert float(P.census_loss(im, im, mask, 1.0, 3)) == pytest.approx(0.0, abs=1e-6)


def test_ssim_identical_images_zero(rng):
    im = jnp.asarray(rng.rand(1, 10, 10, 3).astype(np.float32))
    mask = jnp.ones((1, 10, 10, 1))
    assert float(P.ssim_loss(im, im, mask, 1.0)) == pytest.approx(0.0, abs=1e-5)


def test_bilateral_smooth_constant_flow_zero(rng):
    im = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    flow = jnp.ones((1, 8, 8, 2)) * 3.0
    # robust_l1(0) = 0.001, so "zero" here is the epsilon floor
    val = float(P.bilateral_smooth(im, flow, 1.0))
    assert val < 0.002


def test_warp_affine_identity(rng):
    img = jnp.asarray(rng.rand(1, 6, 6, 3).astype(np.float32))
    center = jnp.asarray([[3.0, 3.0]])
    mat = rotation_matrix_2d(center, jnp.asarray([0.0]), jnp.asarray([1.0]))
    out = np.asarray(warp_affine(img, mat))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_affine_translation(rng):
    img = jnp.asarray(rng.rand(1, 6, 6, 1).astype(np.float32))
    center = jnp.asarray([[2.5, 2.5]])
    mat = rotation_matrix_2d(center, jnp.asarray([0.0]), jnp.asarray([1.0]))
    mat = mat.at[:, 0, 2].add(1.0)   # shift dst right by 1
    out = np.asarray(warp_affine(img, mat))
    np.testing.assert_allclose(out[0, :, 1:, 0], np.asarray(img)[0, :, :-1, 0],
                               atol=1e-5)


def test_splat_windowed_matches_scatter(rng):
    """Dense matmul splat == exact scatter for in-window flows."""
    from sin_inn_tpu.ops.splat import splat_windowed

    values = rng.rand(2, 11, 10, 3).astype(np.float32)
    flow = (rng.rand(2, 11, 10, 2).astype(np.float32) * 6 - 3)
    ref = np.asarray(splat_scatter(jnp.asarray(values), jnp.asarray(flow)))
    out = np.asarray(splat_windowed(jnp.asarray(values), jnp.asarray(flow),
                                    max_dy=4, chunk=4))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_splat_windowed_grads_match(rng):
    from sin_inn_tpu.ops.splat import splat_windowed

    values = jnp.asarray(rng.rand(1, 8, 10, 2).astype(np.float32))
    flow = jnp.asarray((rng.rand(1, 8, 10, 2) * 4 - 2).astype(np.float32))
    g1 = jax.grad(lambda f: jnp.sum(splat_scatter(values, f) ** 2))(flow)
    g2 = jax.grad(lambda f: jnp.sum(
        splat_windowed(values, f, 4, 4) ** 2))(flow)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-4)


def test_flow_loss_with_windowed_splat_close_to_exact(key, rng):
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.train import flow as F

    base = rng.rand(14, 20, 3).astype(np.float32)
    f1 = np.stack([base[:12, :16]] * 2)
    f2 = np.stack([base[:12, 1:17]] * 2)
    batch = {"frame1": jnp.asarray(f1), "frame2": jnp.asarray(f2),
             "times": jnp.asarray([-1.0, 1.0]),
             "scale": jnp.asarray(np.float32(3.2))}
    cfg_exact = FlowConfig(net="RBF", num_frequencies=8, hidden_dim=16,
                           num_layers=2, epochs=10)
    cfg_win = cfg_exact.replace(splat_max_dy=6, splat_chunk=4)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg_exact)
    l1, _ = F.flow_loss(spec, cfg_exact, state.params, consts, ctrl_cfg,
                        None, batch)
    l2, _ = F.flow_loss(spec, cfg_win, state.params, consts, ctrl_cfg,
                        None, batch)
    assert float(l1) == pytest.approx(float(l2), rel=1e-3)


def test_splat_windowed_fused_backward_matches_autodiff():
    """Hand-derived gather backward == autodiff through the dense scan."""
    import jax
    import jax.numpy as jnp
    from sin_inn_tpu.ops.splat import _splat_windowed_impl, splat_windowed

    rng = np.random.RandomState(11)
    n, h, w, c = 2, 12, 16, 3
    max_dy, chunk = 4, 4
    values = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    flow = jnp.asarray((rng.rand(n, h, w, 2).astype(np.float32) - 0.5) * 5.0)

    def loss_ref(v, f):
        out = _splat_windowed_impl(v, f, max_dy, chunk)
        return jnp.sum(jnp.sin(out * 3.0))

    def loss_fused(v, f):
        out = splat_windowed(v, f, max_dy, chunk, fused_backward=True)
        return jnp.sum(jnp.sin(out * 3.0))

    # forwards identical
    np.testing.assert_allclose(
        np.asarray(_splat_windowed_impl(values, flow, max_dy, chunk)),
        np.asarray(splat_windowed(values, flow, max_dy, chunk)),
        atol=1e-6)

    gv_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(values, flow)
    gv_f, gf_f = jax.grad(loss_fused, argnums=(0, 1))(values, flow)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_r),
                               rtol=1e-4, atol=1e-5)


def test_splat_windowed_2d_matches_scatter(rng):
    """Column-windowed splat == exact scatter for in-window flows, incl.
    non-divisible widths and the fused backward."""
    from sin_inn_tpu.ops.splat import splat_scatter, splat_windowed

    v = jnp.asarray(rng.rand(2, 14, 21, 3).astype(np.float32))
    fl = jnp.asarray((rng.rand(2, 14, 21, 2) * 8 - 4).astype(np.float32))
    ref = splat_scatter(v, fl)
    for (mdx, cc, ch) in ((6, 8, 4), (6, 16, 2), (6, 64, 4)):
        got = splat_windowed(v, fl, max_dy=6, chunk=ch, max_dx=mdx,
                             col_chunk=cc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
    l_f = lambda v, f: jnp.sum(jnp.sin(splat_windowed(v, f, 6, 4, True, 6, 8)))
    l_a = lambda v, f: jnp.sum(jnp.sin(splat_windowed(v, f, 6, 4, False, 6, 8)))
    for gf, ga in zip(jax.grad(l_f, (0, 1))(v, fl),
                      jax.grad(l_a, (0, 1))(v, fl)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ga), atol=2e-5)


def test_resample2d_windowed_matches_plain(rng):
    """Windowed matmul resample == plain gather warp (incl. the reference
    normalization quirk) for in-window flows; fused backward == autodiff of
    the plain op for BOTH operands (flow and image)."""
    from sin_inn_tpu.ops.warp import resample2d, resample2d_windowed

    img = jnp.asarray(rng.rand(2, 15, 22, 3).astype(np.float32))
    fl = jnp.asarray((rng.rand(2, 15, 22, 2) * 8 - 4).astype(np.float32))
    ref = resample2d(img, fl)
    for (mdx, cc, ch) in ((None, 0, 4), (6, 8, 4), (6, 16, 2), (6, 64, 8)):
        got = resample2d_windowed(img, fl, max_dy=7, chunk=ch, max_dx=mdx,
                                  col_chunk=cc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
    l_w = lambda im, f: jnp.sum(
        jnp.sin(resample2d_windowed(im, f, 7, 4, 6, 8)))
    l_p = lambda im, f: jnp.sum(jnp.sin(resample2d(im, f)))
    for gw, gp in zip(jax.grad(l_w, (0, 1))(img, fl),
                      jax.grad(l_p, (0, 1))(img, fl)):
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gp), atol=5e-5)


def test_flow_loss_with_windowed_warps_close_to_exact(key, rng):
    """Full photometric loss with BOTH window bounds (splat + metric-warp
    windowing) matches the exact-op loss for small flows."""
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.train.flow import photometric_flow_loss

    f1 = jnp.asarray(rng.rand(2, 12, 16, 3).astype(np.float32))
    f2 = jnp.asarray(rng.rand(2, 12, 16, 3).astype(np.float32))
    fl12 = jnp.asarray((rng.rand(2, 12, 16, 2) * 4 - 2).astype(np.float32))
    fl21 = jnp.asarray((rng.rand(2, 12, 16, 2) * 4 - 2).astype(np.float32))
    exact = FlowConfig(net="RBF")
    windowed = exact.replace(splat_max_dy=5, splat_chunk=2, splat_max_dx=4,
                             splat_col_chunk=8, resample_chunk=4)
    le, _ = photometric_flow_loss(exact, f1, f2, fl12, fl21)
    lw, _ = photometric_flow_loss(windowed, f1, f2, fl12, fl21)
    np.testing.assert_allclose(float(le), float(lw), rtol=1e-4)
