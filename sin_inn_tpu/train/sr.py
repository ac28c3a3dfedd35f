"""Jitted train/eval/infer steps for INN space-time SR.

Functional replacement of the Lightning module ``SingleVideoINN``
(/root/reference/lit_wrapper.py:12-138). Key TPU-first difference: the
reference issues three separate ``manual_backward`` calls (forward loss,
inverse loss, TCR loss — lit_wrapper.py:49,56,72) before one ``opt.step``;
since gradients simply accumulate, that is mathematically one
``jax.grad`` of the summed loss — so the entire bidirectional (+TCR) step,
both INN directions and the optimizer update, compiles into ONE XLA program
with no host round-trips.

Batches arrive as uint8 (see data/sr_video.py); normalization to [0,1]
happens on device.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.models.inn import build_inn_spec, init_inn, inn_apply
from sin_inn_tpu.ops import losses as L
from sin_inn_tpu.ops.tcr import tcr_transform
from sin_inn_tpu.train.optim import adam_l2


class SRTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _to_float(img: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    if img.dtype == jnp.uint8:
        return img.astype(dtype) / 255.0
    return img.astype(dtype)


def create_train_state(key: jax.Array, cfg: SRConfig):
    """Build (spec, state, optimizer). Spec is static; params the pytree.

    With the hand-derived fused backward kernel the Pallas couplings are a
    net win under grad as well (55.0 vs 56.6 ms/step on v5e), so 'auto'
    enables them for training on TPU too.
    """
    spec, _ = build_inn_spec(cfg, c=3)
    params = init_inn(key, spec, c_in=3)
    if cfg.import_torch:
        # seed from a reference torch/Lightning checkpoint; shapes are
        # validated against this spec inside the importer
        from sin_inn_tpu.models.torch_import import load_reference_checkpoint
        _, params = load_reference_checkpoint(cfg.import_torch, cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    tx = adam_l2(cfg.learning_rate, cfg.adam_betas,
                 weight_decay=cfg.weight_decay)
    state = SRTrainState(params=params, opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32))
    return spec, state, tx


def sr_loss(params, spec, cfg: SRConfig, sup: Dict, unsup: Optional[Dict],
            key: jax.Array) -> Tuple[jnp.ndarray, Dict]:
    """Total loss = fwd + bwd + tcr (reference lit_wrapper.py:29-77)."""
    hr = _to_float(sup["hr"])
    lr = _to_float(sup["lr"])
    b, h, w, _ = lr.shape

    k_z, k_tcr = jax.random.split(key)
    # in bf16 mode, sample z and build lr_z directly in bf16: the INN casts
    # its matmul inputs down anyway, and the f32 copies of these two
    # full-size buffers were exactly the ~7 MB that pushed the 1080p
    # north-star shape out of HBM (round-2 OOM, docs/PERF.md)
    zdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else hr.dtype
    z = jax.random.normal(k_z, (b, h, w, cfg.z_dims), zdt)
    lr_z = jnp.concatenate([lr.astype(zdt), z], axis=-1)

    # Forward pass: HR -> (LR || z). Like the inverse below, the bf16 mode
    # feeds the chain in bfloat16 so the activations (and the conv im2col
    # buffers that bound the IRN dense blocks) ride bf16 end to end;
    # losses reduce in f32 at the boundary.
    lr_z_hat = inn_apply(spec, params, hr.astype(zdt),
                         remat=cfg.remat).astype(hr.dtype)
    fwd_loss = cfg.lambda_fwd_rec * L.reconstruction(
        lr_z_hat[..., :cfg.lr_dims], lr)
    if cfg.lambda_fwd_mmd:
        fwd_loss = fwd_loss + cfg.lambda_fwd_mmd * L.mmd(
            lr_z_hat, lr_z.astype(hr.dtype))
    if cfg.lambda_latent_nll:
        fwd_loss = fwd_loss + cfg.lambda_latent_nll * L.latent_nll(
            lr_z_hat[..., cfg.lr_dims:])

    # Inverse pass: (LR || z) -> HR. In bf16 mode the activations ride
    # bfloat16 through the whole inverse chain (conv2d returns its input
    # dtype); losses are computed in f32 at the boundary.
    hr_hat = inn_apply(spec, params, lr_z, rev=True,
                       remat=cfg.remat).astype(hr.dtype)
    bwd_loss = cfg.lambda_bwd_rec * L.reconstruction(hr_hat, hr)
    if cfg.lambda_bwd_mmd:
        bwd_loss = bwd_loss + cfg.lambda_bwd_mmd * L.mmd(hr_hat, hr, rev=True)

    # TCR on the unsupervised batch (lit_wrapper.py:58-74)
    tcr_loss = jnp.zeros((), hr.dtype)
    if cfg.lambda_bwd_tcr > 0 and unsup is not None:
        lr_u = _to_float(unsup["lr"])

        def tcr_iter(carry, k):
            k_rand, k_zi = jax.random.split(k)
            rand = jax.random.uniform(k_rand, (b, 3), lr_u.dtype)
            zi = jax.random.normal(k_zi, (b, h, w, cfg.z_dims), zdt)
            lr_zi = jnp.concatenate([lr_u.astype(zdt), zi], axis=-1)
            tcr_lr = tcr_transform(lr_u, rand, cfg.rotation, cfg.translation,
                                   scale=1.0 / cfg.scale,
                                   stop_grad=cfg.tcr_stop_grad)
            tcr_lr_z = jnp.concatenate([tcr_lr.astype(zdt), zi], axis=-1)
            tcr_hr_hat = inn_apply(spec, params, tcr_lr_z, rev=True,
                                   remat=cfg.remat).astype(lr_u.dtype)
            hr_hat_tcr = tcr_transform(
                inn_apply(spec, params, lr_zi, rev=True,
                          remat=cfg.remat).astype(lr_u.dtype),
                rand, cfg.rotation, cfg.translation,
                stop_grad=cfg.tcr_stop_grad)
            li = L.reconstruction(tcr_hr_hat, hr_hat_tcr)
            return carry + li, None

        keys = jax.random.split(k_tcr, int(cfg.tcr_iters))
        total, _ = jax.lax.scan(tcr_iter, jnp.zeros((), hr.dtype), keys)
        tcr_loss = cfg.lambda_bwd_tcr / cfg.tcr_iters * total

    loss = fwd_loss + bwd_loss + tcr_loss
    aux = {"loss": loss, "fwd": fwd_loss, "bwd": bwd_loss, "tcr": tcr_loss}
    return loss, aux


def make_train_step(spec, cfg: SRConfig, tx: optax.GradientTransformation):
    """Returns the jitted train step fn(state, sup, unsup, key) -> (state, metrics)."""

    def step(state: SRTrainState, sup, unsup, key):
        key = jax.random.fold_in(key, state.step)
        grads, aux = jax.grad(
            lambda p: sr_loss(p, spec, cfg, sup, unsup, key),
            has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SRTrainState(params, opt_state, state.step + 1), aux

    donate = (0,) if cfg.donate_state else ()
    return jax.jit(step, donate_argnums=donate)


def make_eval_step(spec, cfg: SRConfig):
    """Validation metrics: lr_acc / hr_acc / z_nll (lit_wrapper.py:79-89)."""

    def step(params, batch, key):
        hr = _to_float(batch["hr"])
        lr = _to_float(batch["lr"])
        b, h, w, _ = lr.shape
        z = jax.random.normal(key, (b, h, w, cfg.z_dims), hr.dtype)
        lr_z = jnp.concatenate([lr, z], axis=-1)
        lr_z_hat = inn_apply(spec, params, hr)
        hr_hat = inn_apply(spec, params, lr_z, rev=True)
        return {
            "lr_acc": L.reconstruction(lr_z_hat[..., :cfg.lr_dims], lr),
            "hr_acc": L.reconstruction(hr_hat, hr),
            "z_nll": L.latent_nll(lr_z_hat[..., cfg.lr_dims:]),
            "hr_psnr": L.psnr(jnp.clip(hr_hat, 0, 1), hr),
        }

    return jax.jit(step)


def make_infer_step(spec, cfg: SRConfig):
    """Inference: sample z at temperature, run the inverse pass, return uint8
    HR frames (lit_wrapper.py:91-128 minus the host-side encode).

    Uses the passed-in ``spec`` as-is; Pallas fusion is resolved once from
    ``cfg.use_pallas`` at spec-build time ('auto' already enables the fused
    couplings on TPU for training and inference alike).
    """

    def step(params, lr, key):
        lr = _to_float(lr)
        b, h, w, _ = lr.shape
        z = cfg.temp * jax.random.normal(key, (b, h, w, cfg.z_dims), lr.dtype)
        lr_z = jnp.concatenate([lr, z], axis=-1)
        hr_hat = inn_apply(spec, params, lr_z, rev=True)
        return (jnp.clip(hr_hat, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return jax.jit(step)
