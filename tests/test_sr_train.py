"""End-to-end SR training tests: the minimum end-to-end slice of SURVEY §7
(tiny 2x spatial SR, CPU-runnable) plus TCR and checkpoint round-trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.core.checkpoint import CheckpointStore
from sin_inn_tpu.data.sr_video import SRDataset, make_datasets, train_indices
from sin_inn_tpu.data.synthetic import synthetic_sr_video
from sin_inn_tpu.train import sr as SR


def tiny_cfg(**kw):
    kw.setdefault("architecture", "IRN")
    return SRConfig(scale=2, num_coupling=1, lr_window=1, fps=30,
                    hidden_channels=16, dense_gc=8, learning_rate=1e-3, **kw)


@pytest.fixture(scope="module")
def sr_setup():
    cfg = tiny_cfg()
    video = synthetic_sr_video(cfg, h=16, w=16)
    sup, unsup, val = make_datasets(video, cfg)
    return cfg, video, sup, unsup, val


def test_dataset_shapes(sr_setup):
    cfg, video, sup, unsup, val = sr_setup
    batch = sup.gather(np.arange(min(2, len(sup))))
    b = batch["hr"].shape[0]
    assert batch["hr"].shape == (b, 16, 16, 3)
    # LR spatial is HR/(2*scale) = 4; channels = 3 frames * 4 RGGB = 12
    assert batch["lr"].shape == (b, 4, 4, 12)
    assert batch["lr"].dtype == np.uint8


def test_train_val_indices_disjoint(sr_setup):
    cfg, video, sup, unsup, val = sr_setup
    assert set(sup.indices).isdisjoint(set(val.indices))
    assert len(unsup) >= len(sup)


def test_sr_train_step_descends(key, sr_setup):
    cfg, video, sup, unsup, val = sr_setup
    spec, state, tx = SR.create_train_state(key, cfg)
    step = SR.make_train_step(spec, cfg, tx)
    batch = jax.device_put(sup.gather(np.arange(min(2, len(sup)))))
    losses = []
    for i in range(6):
        state, aux = step(state, batch, None, jax.random.key(i))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sr_train_step_with_tcr_and_mmd(key, sr_setup):
    cfg0, video, sup, unsup, val = sr_setup
    cfg = tiny_cfg(lambda_bwd_tcr=0.1, tcr_iters=2, lambda_fwd_mmd=0.01,
                   lambda_bwd_mmd=0.01, lambda_latent_nll=0.01)
    spec, state, tx = SR.create_train_state(key, cfg)
    step = SR.make_train_step(spec, cfg, tx)
    sup_b = jax.device_put(sup.gather(np.arange(min(2, len(sup)))))
    unsup_b = jax.device_put(unsup.random_batch(min(2, len(sup))))
    state, aux = step(state, sup_b, unsup_b, jax.random.key(0))
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["tcr"]) != 0.0


def test_sr_training_deterministic(key, sr_setup):
    """Two runs from the same seed produce bitwise-identical trajectories
    (SURVEY §5 determinism: sorted scatters, explicit key threading — no
    hidden host RNG in the step)."""
    cfg, video, sup, unsup, val = sr_setup
    sup_b = jax.device_put(sup.gather(np.arange(min(2, len(sup)))))
    unsup_b = jax.device_put(unsup.random_batch(2))

    def run():
        spec, state, tx = SR.create_train_state(jax.random.key(7), cfg)
        step = SR.make_train_step(spec, cfg, tx)
        losses = []
        for _ in range(3):
            state, aux = step(state, sup_b, unsup_b, jax.random.key(3))
            losses.append(np.asarray(aux["loss"]))
        return losses, state.params

    l1, p1 = run()
    l2, p2 = run()
    np.testing.assert_array_equal(np.stack(l1), np.stack(l2))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p1, p2)


def test_sr_eval_and_infer(key, sr_setup):
    cfg, video, sup, unsup, val = sr_setup
    spec, state, tx = SR.create_train_state(key, cfg)
    evalf = SR.make_eval_step(spec, cfg)
    batch = jax.device_put(val.gather(np.arange(min(2, len(val)))))
    m = evalf(state.params, batch, jax.random.key(1))
    for k in ("lr_acc", "hr_acc", "z_nll", "hr_psnr"):
        assert np.isfinite(float(m[k]))
    infer = SR.make_infer_step(spec, cfg)
    out = infer(state.params, batch["lr"], jax.random.key(2))
    assert out.shape == batch["hr"].shape
    assert out.dtype == jnp.uint8


def test_checkpoint_roundtrip(key, tmp_path, sr_setup):
    cfg, video, sup, unsup, val = sr_setup
    spec, state, tx = SR.create_train_state(key, cfg)
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save(3, state)
    store.save(7, state._replace(step=jnp.asarray(7, jnp.int32)))
    assert store.latest_step() == 7
    restored, step = store.restore(state)
    assert step == 7
    assert int(restored.step) == 7
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(r0))


def test_flow_state_checkpoint_roundtrip(key, tmp_path):
    """Controller state (explicit pytree) must survive save/restore —
    the reference needed mask re-derivation on load
    (progressive_controller.py:55-81); here it restores exactly."""
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.train import flow as FT

    cfg = FlowConfig(net="PFF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=40, spatially_adaptive=True,
                     spatial_res=3)
    spec, state, consts, ctrl_cfg, tx = FT.create_flow_state(key, cfg)
    # advance the controller so the mask is non-trivial
    import numpy as _np
    batch = {
        "frame1": jnp.asarray(_np.random.RandomState(0).rand(1, 8, 8, 3),
                              dtype=jnp.float32),
        "frame2": jnp.asarray(_np.random.RandomState(1).rand(1, 8, 8, 3),
                              dtype=jnp.float32),
        "times": jnp.zeros((1,)),
        "scale": jnp.asarray(1.6),
    }
    step = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    for _ in range(3):
        state, _ = step(state, consts, batch)

    store = CheckpointStore(str(tmp_path / "fck"))
    store.save(3, state)
    restored, s = store.restore(state)
    assert s == 3
    np.testing.assert_array_equal(np.asarray(restored.ctrl_state.mask),
                                  np.asarray(state.ctrl_state.mask))
    assert int(restored.ctrl_state.iteration) == int(state.ctrl_state.iteration)


def test_tcr_stop_grad_blocks_warp_gradient(key):
    """tcr_transform(stop_grad=True) reproduces the reference's gradient-free
    transform (lit_wrapper.py:61 TODO): no gradient flows to the image."""
    from sin_inn_tpu.ops.tcr import tcr_transform

    img = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3),
                      dtype=jnp.float32)
    rand = jnp.asarray(np.random.RandomState(1).rand(2, 3), dtype=jnp.float32)

    g_free = jax.grad(lambda im: tcr_transform(
        im, rand, 5.0, 2.0).sum())(img)
    g_stop = jax.grad(lambda im: tcr_transform(
        im, rand, 5.0, 2.0, stop_grad=True).sum())(img)
    assert float(jnp.abs(g_free).sum()) > 0.0
    np.testing.assert_array_equal(np.asarray(g_stop), 0.0)


def test_sr_train_step_tcr_stop_grad_mode(key, sr_setup):
    cfg0, video, sup, unsup, val = sr_setup
    cfg = tiny_cfg(lambda_bwd_tcr=0.1, tcr_iters=1, tcr_stop_grad=True)
    spec, state, tx = SR.create_train_state(key, cfg)
    step = SR.make_train_step(spec, cfg, tx)
    sup_b = jax.device_put(sup.gather(np.arange(min(2, len(sup)))))
    unsup_b = jax.device_put(unsup.random_batch(min(2, len(sup))))
    state, aux = step(state, sup_b, unsup_b, jax.random.key(0))
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["tcr"]) != 0.0


def test_sr_test_save_images_mode(key, tmp_path, sr_setup):
    """save_images inference mode (reference lit_wrapper.py:117-122, whose
    own save_path was an undefined-variable bug)."""
    from sin_inn_tpu.train import loop as L

    cfg0, video, sup, unsup, val = sr_setup
    cfg = cfg0.replace(working_dir=str(tmp_path / "exp"), val_batch_size=4)
    spec, state, tx = SR.create_train_state(key, cfg)
    out_dir = L.run_sr_test(cfg, video=video, state=state, spec=spec,
                            save_images=True)
    files = sorted(os.listdir(out_dir))
    assert files and all(f.endswith(".png") for f in files)
    assert len(files) == len(unsup)


def test_sr_train_auto_lr_and_batch(tmp_path):
    """--auto_lr/--auto_batch wire train/tuner.py into the production loop
    (reference main.py:108-109 auto_lr_find/auto_scale_batch_size)."""
    from sin_inn_tpu.core.config import SRConfig
    from sin_inn_tpu.data.synthetic import synthetic_sr_video
    from sin_inn_tpu.train import loop as L

    cfg = SRConfig(scale=2, num_coupling=1, lr_window=1, fps=30,
                   architecture="IRN", hidden_channels=8, dense_gc=8,
                   batch_size=2, val_batch_size=4, epochs=1, save_iter=10,
                   print_iter=1, auto_lr=True, auto_batch=True,
                   working_dir=str(tmp_path / "exp"), mesh_data=1)
    video = synthetic_sr_video(cfg, h=16, w=16)
    out = L.run_sr_train(cfg, video=video)
    assert np.isfinite(out["metrics"]["loss"])


@pytest.mark.parametrize("arch", ["IRN", "SRF"])
def test_remat_step_matches_no_remat(key, sr_setup, arch):
    """cfg.remat wraps couplings in jax.checkpoint — identical math, so one
    train step must produce the same loss and (near-)identical params.
    Covers both coupling kinds: invblock (IRN) and glow (SRF)."""
    cfg, video, sup, unsup, val = sr_setup
    batch = jax.device_put(sup.gather(np.arange(min(2, len(sup)))))
    out = {}
    for remat in (False, True):
        c = tiny_cfg(remat=remat, architecture=arch)
        spec, state, tx = SR.create_train_state(key, c)
        step = SR.make_train_step(spec, c, tx)
        state, aux = step(state, batch, None, jax.random.key(0))
        out[remat] = (float(aux["loss"]), state.params)
    assert out[False][0] == pytest.approx(out[True][0], rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        out[False][1], out[True][1])
