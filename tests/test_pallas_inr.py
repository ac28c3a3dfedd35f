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


def test_fused_spatial_mask_format_contract():
    """The one shared gate (flow_forward's mask format must agree with
    inr_apply's dispatch — a drift is a silent perf cliff)."""
    from sin_inn_tpu.ops.pallas.inr import (fused_inr_eligible,
                                            fused_spatial_mask_format)
    key = jax.random.PRNGKey(43)
    x = _points(key, 64)
    # forced 'on': eligible regardless of TPU availability; slab for
    # row-aligned widths, pre-split otherwise
    spec, params, consts = build_inr(key, "RBF", _cfg(use_pallas="on"))
    assert fused_inr_eligible(spec, params, consts, x, None)
    assert fused_spatial_mask_format(spec, params, consts, x, 256) == "slabs"
    assert fused_spatial_mask_format(spec, params, consts, x, 250) == "split"
    # 'auto' on CPU (no TPU): XLA path, dense mask
    s_auto = dataclasses.replace(spec, use_pallas="auto")
    assert not fused_inr_eligible(s_auto, params, consts, x, None)
    assert (fused_spatial_mask_format(s_auto, params, consts, x, 256)
            == "dense")
    # ineligible spec (non-128 hidden): dense even when forced
    s96, p96, c96 = build_inr(key, "RBF", _cfg(hidden_dim=96,
                                               use_pallas="on"))
    assert fused_spatial_mask_format(s96, p96, c96, x, 256) == "dense"


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


# ---------------------------------------------------------------------------
# per-point spatial masks (pre-split, controllers.spatial_grid_mask_split)
# ---------------------------------------------------------------------------

def _spatial_setup(net="PFF", nf=64, hidden=128):
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.train.flow import pose_grid

    cfg_f = _cfg(net=net, num_frequencies=nf, hidden_dim=hidden,
                 spatially_adaptive=True)
    spec, params, consts = build_inr(jax.random.PRNGKey(51), net, cfg_f)
    cfg = C.SpatialConfig.create(spec, res=5, block_iterations=4)
    state = C.spatial_init(cfg)
    state = state._replace(mask=state.mask.at[:, :].set(
        jnp.linspace(0, 1, cfg.cells)[:, None]
        * jnp.linspace(1, 0.5, cfg.encoding_dim)[None, :]))
    b, h, w = 2, 7, 9
    times = jnp.linspace(-1.0, 1.0, b)
    pts = pose_grid(times, h, w).reshape(-1, 3)
    return spec, params, consts, cfg, state, times, h, w, pts


def test_split_mask_matches_joint():
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.ops.pallas.inr import inr_mask_perm

    spec, _, _, cfg, state, times, h, w, _ = _spatial_setup()
    joint = C.spatial_grid_mask(cfg, state, times, h, w)
    mc, me = C.spatial_grid_mask_split(cfg, state, times, h, w)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(joint[:, :3].T),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(me), np.asarray(joint[:, 3:]),
                               rtol=1e-6, atol=1e-6)
    perm = inr_mask_perm(spec)
    assert perm is not None
    _, me_p = C.spatial_grid_mask_split(cfg, state, times, h, w,
                                        enc_perm=perm)
    np.testing.assert_allclose(np.asarray(me_p),
                               np.asarray(joint[:, 3:][:, perm]),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("net", ["PFF", "PRBF"])
def test_fused_per_point_mask_matches_xla(net):
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.ops.pallas.inr import inr_mask_perm

    (spec, params, consts, cfg, state, times, h, w,
     pts) = _spatial_setup(net=net)
    joint = C.spatial_grid_mask(cfg, state, times, h, w)
    split = C.spatial_grid_mask_split(cfg, state, times, h, w,
                                      enc_perm=inr_mask_perm(spec))
    assert fused_inr_supported(spec, params, consts, pts, split)
    ref = inr_apply(spec, params, consts, pts, override_mask=joint)
    out = fused_inr_apply(spec, params, consts, pts, split,
                          precise=True, tn=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # gradients through the fused per-point path
    tgt = jax.random.normal(jax.random.PRNGKey(53), ref.shape)

    def loss_ref(p):
        return jnp.mean((inr_apply(spec, p, consts, pts,
                                   override_mask=joint) - tgt) ** 2)

    def loss_fused(p):
        return jnp.mean((fused_inr_apply(spec, p, consts, pts, split,
                                         precise=True, tn=128,
                                         interpret=INTERPRET) - tgt) ** 2)

    g_ref = jax.tree_util.tree_leaves(jax.grad(loss_ref)(params))
    g_fus = jax.tree_util.tree_leaves(jax.grad(loss_fused)(params))
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=3e-4)


def test_inr_apply_xla_fallback_accepts_split_mask():
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.ops.pallas.inr import inr_mask_perm

    (spec, params, consts, cfg, state, times, h, w,
     pts) = _spatial_setup()
    joint = C.spatial_grid_mask(cfg, state, times, h, w)
    split = C.spatial_grid_mask_split(cfg, state, times, h, w,
                                      enc_perm=inr_mask_perm(spec))
    ref = inr_apply(spec, params, consts, pts, override_mask=joint)
    out = inr_apply(spec, params, consts, pts, override_mask=split)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_spatial_flow_forward_routes_fused():
    """flow_forward with a spatial controller and spec.use_pallas='on'
    (interpret on CPU) must match the XLA path."""
    import dataclasses as dc

    from sin_inn_tpu.train import flow as FT

    cfg_f = _cfg(net="PFF", spatially_adaptive=True)
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(57), cfg_f)
    times = jnp.linspace(-1.0, 1.0, 2)
    scale = jnp.float32(3.0)
    f12, f21, _ = FT.flow_forward(dc.replace(spec, use_pallas="on"),
                                  params, consts, ctrl_cfg, ctrl_state,
                                  times, 7, 9, scale)
    r12, r21, _ = FT.flow_forward(dc.replace(spec, use_pallas="off"),
                                  params, consts, ctrl_cfg, ctrl_state,
                                  times, 7, 9, scale)
    np.testing.assert_allclose(np.asarray(f12), np.asarray(r12),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(f21), np.asarray(r21),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# row-slab spatial masks (controllers.spatial_grid_mask_slabs)
# ---------------------------------------------------------------------------

def test_slab_mask_matches_joint():
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.ops.pallas.inr import inr_mask_perm

    spec, _, _, cfg, state, times, h, w, _ = _spatial_setup()
    joint = C.spatial_grid_mask(cfg, state, times, h, w)
    enc, coord, wx = C.spatial_grid_mask_slabs(cfg, state, times, h, w)
    me = jnp.einsum("wr,SrE->SwE", wx, enc).reshape(-1, enc.shape[-1])
    mc = jnp.einsum("wr,SrD->SwD", wx, coord).reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(joint[:, :3]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(me), np.asarray(joint[:, 3:]),
                               rtol=1e-5, atol=1e-6)
    perm = inr_mask_perm(spec)
    enc_p, _, _ = C.spatial_grid_mask_slabs(cfg, state, times, h, w,
                                            enc_perm=perm)
    me_p = jnp.einsum("wr,SrE->SwE", wx, enc_p).reshape(-1, enc.shape[-1])
    np.testing.assert_allclose(np.asarray(me_p),
                               np.asarray(joint[:, 3:][:, perm]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("net", ["PFF", "PRBF"])
def test_fused_slab_mask_matches_xla(net):
    """Slab mode: per-row t/y-contracted slabs + in-VMEM x contraction
    must match the XLA path with the dense joint mask, fwd and grads."""
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.ops.pallas.inr import inr_mask_perm
    from sin_inn_tpu.train.flow import pose_grid

    (spec, params, consts, cfg, state, times, _, _,
     _) = _spatial_setup(net=net)
    h, w = 7, 128                       # slab mode needs w % 128 == 0
    pts = pose_grid(times, h, w).reshape(-1, 3)
    joint = C.spatial_grid_mask(cfg, state, times, h, w)
    slabs = C.spatial_grid_mask_slabs(cfg, state, times, h, w,
                                      enc_perm=inr_mask_perm(spec))
    assert fused_inr_supported(spec, params, consts, pts, slabs)
    ref = inr_apply(spec, params, consts, pts, override_mask=joint)
    out = fused_inr_apply(spec, params, consts, pts, slabs,
                          precise=True, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    tgt = jax.random.normal(jax.random.PRNGKey(61), ref.shape)

    def loss_ref(p):
        return jnp.mean((inr_apply(spec, p, consts, pts,
                                   override_mask=joint) - tgt) ** 2)

    def loss_fused(p):
        return jnp.mean((fused_inr_apply(spec, p, consts, pts, slabs,
                                         precise=True,
                                         interpret=INTERPRET) - tgt) ** 2)

    g_ref = jax.tree_util.tree_leaves(jax.grad(loss_ref)(params))
    g_fus = jax.tree_util.tree_leaves(jax.grad(loss_fused)(params))
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=3e-4)


def test_inr_apply_xla_fallback_accepts_slab_mask():
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.ops.pallas.inr import inr_mask_perm
    from sin_inn_tpu.train.flow import pose_grid

    (spec, params, consts, cfg, state, times, h, w,
     pts) = _spatial_setup()
    joint = C.spatial_grid_mask(cfg, state, times, h, w)
    slabs = C.spatial_grid_mask_slabs(cfg, state, times, h, w,
                                      enc_perm=inr_mask_perm(spec))
    ref = inr_apply(spec, params, consts, pts, override_mask=joint)
    out = inr_apply(spec, params, consts, pts, override_mask=slabs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_spatial_flow_forward_routes_slab():
    """flow_forward with a spatial controller, w % 128 == 0 and
    use_pallas='on' (interpret on CPU) must route slabs and match XLA."""
    import dataclasses as dc

    from sin_inn_tpu.train import flow as FT

    cfg_f = _cfg(net="PFF", spatially_adaptive=True)
    spec, params, consts, ctrl_cfg, ctrl_state = FT.build_flow_model(
        jax.random.PRNGKey(67), cfg_f)
    times = jnp.linspace(-1.0, 1.0, 2)
    scale = jnp.float32(3.0)
    f12, f21, _ = FT.flow_forward(dc.replace(spec, use_pallas="on"),
                                  params, consts, ctrl_cfg, ctrl_state,
                                  times, 5, 128, scale)
    r12, r21, _ = FT.flow_forward(dc.replace(spec, use_pallas="off"),
                                  params, consts, ctrl_cfg, ctrl_state,
                                  times, 5, 128, scale)
    np.testing.assert_allclose(np.asarray(f12), np.asarray(r12),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(f21), np.asarray(r21),
                               rtol=2e-3, atol=2e-3)
