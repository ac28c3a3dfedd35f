"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY §4 consequence: run the same step on 1 device and on a sharded mesh
and assert the losses agree to tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sin_inn_tpu.core.config import FlowConfig, SRConfig
from sin_inn_tpu.parallel.mesh import make_mesh
from sin_inn_tpu.parallel.sharding import place_batch, place_state
from sin_inn_tpu.train import flow as FT
from sin_inn_tpu.train import sr as SR

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _sr_setup(hidden=16):
    cfg = SRConfig(architecture="SRF", scale=2, num_coupling=1, lr_window=1,
                   hidden_channels=hidden, donate_state=False)
    spec, state, tx = SR.create_train_state(jax.random.key(0), cfg)
    rng = np.random.RandomState(0)
    batch = {
        "hr": jnp.asarray(rng.randint(0, 255, (8, 8, 8, 3), dtype=np.uint8)),
        "lr": jnp.asarray(rng.randint(0, 255, (8, 2, 2, cfg.lr_dims),
                                      dtype=np.uint8)),
    }
    return cfg, spec, state, tx, batch


def _sr_loss(cfg, spec, state, batch):
    loss, _ = SR.sr_loss(state.params, spec, cfg, batch, None,
                         jax.random.key(7))
    return float(loss)


def test_sr_dp_matches_single_device():
    cfg, spec, state, tx, batch = _sr_setup()
    single = _sr_loss(cfg, spec, state, batch)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sstate = place_state(mesh, state)
        sbatch = place_batch(mesh, batch)
        loss = jax.jit(lambda p, b: SR.sr_loss(
            p, spec, cfg, b, None, jax.random.key(7))[0])(sstate.params, sbatch)
    assert float(loss) == pytest.approx(single, rel=1e-4)


def test_sr_dp_tp_train_step_runs():
    cfg, spec, state, tx, batch = _sr_setup(hidden=16)
    mesh = make_mesh(data=4, model=2)
    with mesh:
        sstate = place_state(mesh, state, model_parallel=True)
        sbatch = place_batch(mesh, batch)

        def step(state, b):
            grads, aux = jax.grad(
                lambda p: SR.sr_loss(p, spec, cfg, b, None, jax.random.key(3)),
                has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            return (SR.SRTrainState(optax.apply_updates(state.params, updates),
                                    opt_state, state.step + 1), aux)

        out_state, aux = jax.jit(step)(sstate, sbatch)
        assert np.isfinite(float(aux["loss"]))
        # TP placement: conv1 kernel of a glow subnet is actually sharded
        glow_params = [p for p in out_state.params if p is not None][0]
        w = glow_params["s1"]["conv1"]["w"]
        assert len(w.sharding.device_set) == 8 or \
            w.sharding.spec == jax.sharding.PartitionSpec(None, None, None, "model")


def test_sr_tp_grads_match_replicated():
    cfg, spec, state, tx, batch = _sr_setup(hidden=16)

    def loss_fn(p, b):
        return SR.sr_loss(p, spec, cfg, b, None, jax.random.key(3))[0]

    g_single = jax.grad(loss_fn)(state.params, batch)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sstate = place_state(mesh, state, model_parallel=True)
        sbatch = place_batch(mesh, batch)
        g_sharded = jax.jit(jax.grad(loss_fn))(sstate.params, sbatch)

    l1 = jax.tree_util.tree_leaves(g_single)
    l2 = jax.tree_util.tree_leaves(g_sharded)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_sr_tp4_grads_match_replicated():
    """TP at model_par=4 (VERDICT r3 weak #6: only 2 was exercised): the
    hidden-channel shards over 4 devices produce the same grads."""
    cfg, spec, state, tx, batch = _sr_setup(hidden=16)

    def loss_fn(p, b):
        return SR.sr_loss(p, spec, cfg, b, None, jax.random.key(3))[0]

    g_single = jax.grad(loss_fn)(state.params, batch)

    mesh = make_mesh(data=2, model=4)
    with mesh:
        sstate = place_state(mesh, state, model_parallel=True)
        sbatch = place_batch(mesh, batch)
        g_sharded = jax.jit(jax.grad(loss_fn))(sstate.params, sbatch)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_sr_tp_non_dividing_hidden_replicates(caplog):
    """The TP divisibility contract: hidden=18 over model=4 does not divide,
    so the affected leaves replicate (loud warning), the step still runs,
    and the loss matches the unsharded one."""
    import logging

    cfg, spec, state, tx, batch = _sr_setup(hidden=18)
    single = _sr_loss(cfg, spec, state, batch)

    mesh = make_mesh(data=2, model=4)
    from sin_inn_tpu.parallel.sharding import state_shardings
    with caplog.at_level(logging.WARNING, "sin_inn_tpu.parallel.sharding"):
        sh = state_shardings(mesh, state, model_parallel=True)
    assert any("not divisible" in r.getMessage() for r in caplog.records)
    # every 18-wide leaf fell back to replication
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    sh_flat = jax.tree_util.tree_leaves(
        sh, is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding))
    for (path, leaf), s in zip(flat, sh_flat):
        if hasattr(leaf, "shape") and 18 in getattr(leaf, "shape", ()):
            assert s.spec == jax.sharding.PartitionSpec()

    with mesh:
        sstate = place_state(mesh, state, model_parallel=True)
        sbatch = place_batch(mesh, batch)
        loss = jax.jit(lambda p, b: SR.sr_loss(
            p, spec, cfg, b, None, jax.random.key(7))[0])(
                sstate.params, sbatch)
    assert float(loss) == pytest.approx(single, rel=1e-4)


def test_flow_sp_matches_single_device():
    cfg = FlowConfig(net="RBF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=10)
    spec, state, consts, ctrl_cfg, tx = FT.create_flow_state(
        jax.random.key(0), cfg)
    rng = np.random.RandomState(1)
    batch = {
        "frame1": jnp.asarray(rng.rand(8, 8, 8, 3).astype(np.float32)),
        "frame2": jnp.asarray(rng.rand(8, 8, 8, 3).astype(np.float32)),
        "times": jnp.linspace(-1, 1, 8, dtype=jnp.float32),
        "scale": jnp.asarray(1.6, jnp.float32),
    }
    single, _ = FT.flow_loss(spec, cfg, state.params, consts, ctrl_cfg,
                             state.ctrl_state, batch)
    single = float(single)

    mesh = make_mesh(data=8, model=1)
    with mesh:
        sstate = place_state(mesh, state)
        sbatch = place_batch(mesh, batch)
        loss = jax.jit(lambda p, b: FT.flow_loss(
            spec, cfg, p, consts, ctrl_cfg, None, b)[0])(sstate.params, sbatch)
    assert float(loss) == pytest.approx(single, rel=1e-3)


def test_graft_dryrun_multichip():
    import __graft_entry__ as G
    G.dryrun_multichip(8)


def test_sr_train_loop_dp_matches_single(tmp_path):
    """The PRODUCTION loop (run_sr_train) trains DP-sharded on the mesh and
    matches the single-device loop's loss trajectory (round-1 gap: mesh was
    test-only; now mesh_data is a first-class config field)."""
    from sin_inn_tpu.core.config import SRConfig as C
    from sin_inn_tpu.data.synthetic import synthetic_sr_video
    from sin_inn_tpu.train import loop as L

    base = dict(scale=2, num_coupling=1, lr_window=1, fps=30,
                architecture="IRN", hidden_channels=8, dense_gc=8,
                batch_size=4, val_batch_size=4, epochs=2, save_iter=100,
                print_iter=1, donate_state=False)
    cfg1 = C(**base, working_dir=str(tmp_path / "one"), mesh_data=1)
    cfg4 = C(**base, working_dir=str(tmp_path / "four"), mesh_data=4)
    video = synthetic_sr_video(cfg1, h=16, w=16)

    out1 = L.run_sr_train(cfg1, video=video)
    out4 = L.run_sr_train(cfg4, video=video)
    assert out4["metrics"]["loss"] == pytest.approx(
        out1["metrics"]["loss"], rel=1e-3)
    # params actually live on 4 devices
    leaf = [p for p in jax.tree_util.tree_leaves(out4["state"].params)][0]
    assert len(leaf.sharding.device_set) == 4


def test_flow_train_loop_dp_with_val_epe(tmp_path):
    """run_flow_train on the mesh + held-out val/EPE at val_iter cadence
    (reference trainer.py:93-98 validation_step)."""
    from sin_inn_tpu.core.config import FlowConfig as FC
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.data.synthetic import moving_texture_video
    from sin_inn_tpu.train import loop as L

    frames = moving_texture_video(5, 8, 8)
    gt = np.zeros((4, 8, 8, 2), np.float32)
    media = FlowMedia(frames, flow=gt)
    cfg = FC(net="RBF", num_frequencies=8, hidden_dim=16, num_layers=2,
             epochs=2, batch=4, val_iter=1, test_batch=4,
             checkpoints_dir=str(tmp_path / "ck"),
             results_dir=str(tmp_path / "res"), mesh_data=4)
    out = L.run_flow_train(cfg, media=media, scene="s", val_media=media)
    assert np.isfinite(out["metrics"]["loss"])
    assert "val_epe" in out["metrics"]
    assert np.isfinite(out["metrics"]["val_epe"])
    leaf = jax.tree_util.tree_leaves(out["state"].params)[0]
    assert len(leaf.sharding.device_set) == 4


def test_resolve_mesh_auto_divisor_policy():
    from sin_inn_tpu.train.loop import resolve_mesh

    # batch 4 on 8 devices -> data axis shrinks to 4
    m = resolve_mesh(None, 1, batch_size=4)
    assert m is not None and m.shape["data"] == 4
    # batch 1 -> single device (None)
    assert resolve_mesh(None, 1, batch_size=1) is None
    # explicit indivisible mesh raises
    with pytest.raises(ValueError):
        resolve_mesh(8, 1, batch_size=4)
    # explicit 1x1 -> None
    assert resolve_mesh(1, 1, batch_size=4) is None


def test_sr_train_loop_dp_ragged_tcr(tmp_path):
    """Ragged final supervised batch + TCR on the mesh: the unsup batch of
    the ragged size must replicate instead of crashing device_put
    (round-2 review finding)."""
    from sin_inn_tpu.core.config import SRConfig as C
    from sin_inn_tpu.data.synthetic import synthetic_sr_video
    from sin_inn_tpu.train import loop as L

    cfg = C(scale=2, num_coupling=1, lr_window=1, fps=30,
            architecture="IRN", hidden_channels=8, dense_gc=8,
            batch_size=4, val_batch_size=4, epochs=1, save_iter=10,
            print_iter=1, lambda_bwd_tcr=0.1, tcr_iters=1,
            working_dir=str(tmp_path / "w"), mesh_data=4)
    # default synthetic length -> 18 sup samples -> 4+4+4+4+2 (ragged last)
    video = synthetic_sr_video(cfg, h=16, w=16)
    out = L.run_sr_train(cfg, video=video)
    assert np.isfinite(out["metrics"]["loss"])
    assert out["metrics"]["tcr"] != 0.0


def test_flow_spatial_controller_step_dp_matches_single():
    """The spatially-adaptive grid update (separable einsums over the
    sharded batch axis) must produce the same controller state and loss
    DP-sharded as on a single device."""
    cfg = FlowConfig(net="PFF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=64, spatially_adaptive=True,
                     spatial_res=4)
    spec, state, consts, ctrl_cfg, tx = FT.create_flow_state(
        jax.random.key(0), cfg)
    rng = np.random.RandomState(2)
    batch = {
        "frame1": jnp.asarray(rng.rand(8, 8, 8, 3).astype(np.float32)),
        "frame2": jnp.asarray(rng.rand(8, 8, 8, 3).astype(np.float32)),
        "times": jnp.linspace(-1, 1, 8, dtype=jnp.float32),
        "scale": jnp.asarray(1.6, jnp.float32),
    }
    step = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    sstate1, m1 = step(state, consts, batch)

    # the step donates its state: rebuild an identical one for the mesh run
    _, state_b, _, _, _ = FT.create_flow_state(jax.random.key(0), cfg)
    mesh = make_mesh(data=8, model=1)
    step2 = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    with mesh:
        pstate = place_state(mesh, state_b)
        pbatch = place_batch(mesh, batch)
        sstate2, m2 = step2(pstate, consts, pbatch)
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-3)
    np.testing.assert_allclose(np.asarray(sstate2.ctrl_state.log_buffer),
                               np.asarray(sstate1.ctrl_state.log_buffer),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sstate2.ctrl_state.mask),
                               np.asarray(sstate1.ctrl_state.mask),
                               atol=1e-5)


def test_sr_dp_remat_matches_single_device():
    """cfg.remat (jax.checkpoint'd couplings) under a DP mesh: same loss as
    the single-device non-remat step — remat must not change math or
    interfere with sharding propagation."""
    cfg, spec, state, tx, batch = _sr_setup()
    single = _sr_loss(cfg, spec, state, batch)

    import dataclasses
    rcfg = dataclasses.replace(cfg, remat=True)
    mesh = make_mesh(data=8, model=1)
    with mesh:
        sstate = place_state(mesh, state)
        sbatch = place_batch(mesh, batch)
        loss = jax.jit(lambda p, b: SR.sr_loss(
            p, spec, rcfg, b, None, jax.random.key(7))[0])(
                sstate.params, sbatch)
    assert float(loss) == pytest.approx(single, rel=1e-4)
