"""Numeric parity harness vs an independent torch re-derivation.

Proves the BASELINE.json fidelity north star ("PSNR within 0.1 dB of the
reference") constructively: the framework's specs/params are ported into
``parity_torch_ref`` — a from-the-formulas torch implementation of the
reference math (FrEIA clamp coupling, InvBlockExp, Haar/iRevNet squeezes,
loss.py losses, the full flow photometric stack) — and per-step outputs,
losses, GRADIENTS, and a short end-to-end training run are asserted to agree.
Any op drifting from the reference math fails here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import parity_torch_ref as T
from sin_inn_tpu.core.config import FlowConfig, SRConfig
from sin_inn_tpu.models.inn import build_inn_spec, init_inn, inn_apply
from sin_inn_tpu.ops import losses as L
from sin_inn_tpu.train import sr as SR


def nchw(x):
    return torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))


def nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def srf_cfg(**kw):
    # num_coupling=2 covers both the 3x3 and the 1x1 subnet kernels
    kw.setdefault("architecture", "SRF")
    return SRConfig(scale=2, num_coupling=2, lr_window=1, fps=30,
                    hidden_channels=16, dense_gc=8, use_pallas="off", **kw)


@pytest.fixture(scope="module", params=["SRF", "IRN"])
def inn_setup(request):
    cfg = srf_cfg(architecture=request.param)
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.key(0), spec, c_in=3)
    tparams = T.port_params(params)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    return cfg, spec, params, tparams, x


def test_inn_forward_matches_torch(inn_setup):
    cfg, spec, params, tparams, x = inn_setup
    y_jax = np.asarray(inn_apply(spec, params, jnp.asarray(x)))
    with torch.no_grad():
        y_t = T.t_inn_apply(spec, tparams, nchw(x))
    np.testing.assert_allclose(y_jax, y_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-5)


def test_inn_inverse_matches_torch(inn_setup):
    cfg, spec, params, tparams, x = inn_setup
    rng = np.random.RandomState(1)
    y = rng.rand(2, 4, 4, cfg.total_dims).astype(np.float32) * 0.5
    x_jax = np.asarray(inn_apply(spec, params, jnp.asarray(y), rev=True))
    with torch.no_grad():
        x_t = T.t_inn_apply(spec, tparams, nchw(y), rev=True)
    np.testing.assert_allclose(x_jax, x_t.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-5)


def test_mmd_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.rand(4, 50).astype(np.float32)
    y = rng.rand(4, 50).astype(np.float32)
    for rev in (False, True):
        m_jax = float(L.mmd(jnp.asarray(x), jnp.asarray(y), rev=rev))
        m_t = float(T.t_mmd(torch.tensor(x), torch.tensor(y), rev=rev))
        assert m_jax == pytest.approx(m_t, rel=1e-5)


def _sr_batch_and_z(cfg, key, b=2, h=16, w=16):
    rng = np.random.RandomState(3)
    hr = rng.randint(0, 255, (b, h, w, 3), dtype=np.uint8)
    lr_h, lr_w = h // (2 * cfg.scale), w // (2 * cfg.scale)
    lr = rng.randint(0, 255, (b, lr_h, lr_w, cfg.lr_dims), dtype=np.uint8)
    # replicate the z the jitted loss draws: k_z = split(key)[0]
    k_z, _ = jax.random.split(key)
    z = jax.random.normal(k_z, (b, lr.shape[1], lr.shape[2], cfg.z_dims),
                          jnp.float32)
    return {"hr": jnp.asarray(hr), "lr": jnp.asarray(lr)}, np.asarray(z)


@pytest.mark.parametrize("arch", ["SRF", "IRN"])
def test_sr_loss_and_grads_match_torch(arch):
    """Per-step loss AND gradients agree between the jitted sr_loss and the
    torch re-derivation with ported weights (incl. MMD + latent NLL terms)."""
    cfg = srf_cfg(architecture=arch, lambda_fwd_mmd=0.01, lambda_bwd_mmd=0.01,
                  lambda_latent_nll=0.01)
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(jax.random.key(0), spec, c_in=3)
    key = jax.random.key(11)
    batch, z = _sr_batch_and_z(cfg, key)

    loss_jax, _ = SR.sr_loss(params, spec, cfg, batch, None, key)
    grads_jax, _ = jax.grad(
        lambda p: SR.sr_loss(p, spec, cfg, batch, None, key),
        has_aux=True)(params)

    tparams = T.port_params(params, requires_grad=True)
    hr_t = nchw(np.asarray(batch["hr"], np.float32) / 255.0)
    lr_t = nchw(np.asarray(batch["lr"], np.float32) / 255.0)
    z_t = nchw(z)
    loss_t, _ = T.t_sr_loss(spec, tparams, cfg, hr_t, lr_t, z_t)
    loss_t.backward()

    assert float(loss_jax) == pytest.approx(float(loss_t.detach()), rel=1e-4)

    grads_t = T.unport_grads(tparams)
    checked = 0
    for gi, gt in zip(grads_jax, grads_t):
        if gi is None:
            continue
        for sub in gi:
            for cname in gi[sub]:
                for leaf in ("w", "b"):
                    a = np.asarray(gi[sub][cname][leaf])
                    btens = gt[sub][cname][leaf]
                    assert btens is not None
                    scale = max(np.abs(a).max(), 1e-8)
                    np.testing.assert_allclose(a, btens, rtol=2e-3,
                                               atol=2e-4 * scale)
                    checked += 1
    assert checked >= 8


def test_sr_end_to_end_psnr_parity():
    """Short end-to-end training: identical init, identical z sequence, same
    Adam(L2) hyperparams -> final PSNR within 0.1 dB (the north star bound).
    """
    cfg = srf_cfg(architecture="IRN", learning_rate=1e-3, weight_decay=1e-5,
                  donate_state=False)
    spec, state, tx = SR.create_train_state(jax.random.key(0), cfg)
    step = SR.make_train_step(spec, cfg, tx)
    base_key = jax.random.key(42)
    batch, _ = _sr_batch_and_z(cfg, base_key)

    n_steps = 20
    # ---- JAX side ----
    jstate = state
    for i in range(n_steps):
        jstate, aux = step(jstate, batch, None, base_key)

    # ---- torch side: same init, same z_i = normal(split(fold_in(key,i))[0])
    tparams = T.port_params(state.params, requires_grad=True)
    leaves = T.torch_leaves(tparams)
    opt = torch.optim.Adam(leaves, lr=cfg.learning_rate,
                           betas=cfg.adam_betas, eps=1e-8,
                           weight_decay=cfg.weight_decay)
    hr_t = nchw(np.asarray(batch["hr"], np.float32) / 255.0)
    lr_t = nchw(np.asarray(batch["lr"], np.float32) / 255.0)
    b, _, lh, lw = lr_t.shape
    for i in range(n_steps):
        ki = jax.random.fold_in(base_key, i)
        k_z, _ = jax.random.split(ki)
        z = np.asarray(jax.random.normal(k_z, (b, lh, lw, cfg.z_dims),
                                         jnp.float32))
        opt.zero_grad()
        loss_t, _ = T.t_sr_loss(spec, tparams, cfg, hr_t, lr_t, nchw(z))
        loss_t.backward()
        opt.step()

    # ---- compare reconstruction PSNR with one shared eval z ----
    k_eval = jax.random.key(77)
    z_eval = np.asarray(jax.random.normal(k_eval, (b, lh, lw, cfg.z_dims),
                                          jnp.float32))
    lr_jax = jnp.asarray(np.asarray(batch["lr"], np.float32) / 255.0)
    hr_jax = jnp.asarray(np.asarray(batch["hr"], np.float32) / 255.0)
    hr_hat_j = inn_apply(spec, jstate.params,
                         jnp.concatenate([lr_jax, jnp.asarray(z_eval)], -1),
                         rev=True)
    psnr_j = float(L.psnr(jnp.clip(hr_hat_j, 0, 1), hr_jax))
    with torch.no_grad():
        hr_hat_t = T.t_inn_apply(spec, tparams,
                                 torch.cat([lr_t, nchw(z_eval)], 1), rev=True)
    mse_t = float(((hr_hat_t.clamp(0, 1) - hr_t) ** 2).mean())
    psnr_t = 10.0 * np.log10(1.0 / max(mse_t, 1e-12))
    assert abs(psnr_j - psnr_t) < 0.1, (psnr_j, psnr_t)


def test_flow_photometric_loss_matches_torch():
    """Every term of the flow training loss (L1/census/SSIM/smooth + wang
    occlusion + softmax splat + warp metric) matches the torch re-derivation
    of trainer.py:47-87 for fixed flows."""
    from sin_inn_tpu.train.flow import photometric_flow_loss

    cfg = FlowConfig(loss_l1=1.0, loss_census=0.1, loss_ssim=0.05,
                     loss_smooth1=0.1, occl="wang", occl_thresh=0.7)
    rng = np.random.RandomState(5)
    b, h, w = 2, 16, 24
    frame1 = rng.rand(b, h, w, 3).astype(np.float32)
    frame2 = rng.rand(b, h, w, 3).astype(np.float32)
    flow12 = (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 4.0
    flow21 = (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 4.0

    loss_j, aux_j = jax.jit(
        lambda f1, f2, a, bq: photometric_flow_loss(cfg, f1, f2, a, bq))(
        jnp.asarray(frame1), jnp.asarray(frame2),
        jnp.asarray(flow12), jnp.asarray(flow21))

    loss_t, aux_t = T.t_photometric_flow_loss(
        cfg, nchw(frame1), nchw(frame2),
        nchw(flow12), nchw(flow21))

    for k in ("l1", "census", "ssim", "smooth"):
        assert float(aux_j[k]) == pytest.approx(float(aux_t[k]), rel=1e-4), k
    assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-4)


def test_flow_loss_gradients_match_torch():
    """d(loss)/d(flow) agrees with torch autograd through the whole stack —
    pins the splat/warp custom gradients to the reference kernels' math
    (softsplat.py:55-177 updateGradInput/updateGradFlow)."""
    from sin_inn_tpu.train.flow import photometric_flow_loss

    cfg = FlowConfig(loss_l1=1.0, loss_census=0.1, loss_ssim=0.0,
                     loss_smooth1=0.1, occl="wang")
    rng = np.random.RandomState(6)
    b, h, w = 1, 12, 16
    frame1 = rng.rand(b, h, w, 3).astype(np.float32)
    frame2 = rng.rand(b, h, w, 3).astype(np.float32)
    flow12 = (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 3.0
    flow21 = (rng.rand(b, h, w, 2).astype(np.float32) - 0.5) * 3.0

    g12_j, g21_j = jax.grad(
        lambda a, bq: photometric_flow_loss(
            cfg, jnp.asarray(frame1), jnp.asarray(frame2), a, bq)[0],
        argnums=(0, 1))(jnp.asarray(flow12), jnp.asarray(flow21))

    f12_t = nchw(flow12).requires_grad_()
    f21_t = nchw(flow21).requires_grad_()
    loss_t, _ = T.t_photometric_flow_loss(cfg, nchw(frame1), nchw(frame2),
                                          f12_t, f21_t)
    loss_t.backward()

    for gj, gt in ((g12_j, f12_t.grad), (g21_j, f21_t.grad)):
        a = np.asarray(gj)
        bt = gt.numpy().transpose(0, 2, 3, 1)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a, bt, rtol=2e-3, atol=1e-4 * scale)
