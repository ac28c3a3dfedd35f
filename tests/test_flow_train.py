"""End-to-end flow train-step tests on tiny synthetic videos."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.core.config import FlowConfig
from sin_inn_tpu.train import flow as F


def synthetic_batch(rng, b=2, h=12, w=16):
    """A texture shifted by constant flow between frames."""
    base = rng.rand(h + 4, w + 4, 3).astype(np.float32)
    f1 = np.stack([base[1:h + 1, 1:w + 1]] * b)
    f2 = np.stack([base[1:h + 1, 2:w + 2]] * b)   # shift x by 1
    times = np.linspace(-1, 1, b).astype(np.float32)
    return {
        "frame1": jnp.asarray(f1),
        "frame2": jnp.asarray(f2),
        "times": jnp.asarray(times),
        "scale": jnp.asarray(np.float32(w / 5)),
    }


def tiny_cfg(**kw):
    kw.setdefault("net", "RBF")
    return FlowConfig(num_frequencies=8, hidden_dim=16, num_layers=2,
                      epochs=50, loss_census=0.1, loss_smooth1=0.1, **kw)


@pytest.mark.parametrize("net", ["RBF", "PFF"])
def test_flow_step_runs_and_descends(key, rng, net):
    cfg = tiny_cfg(net=net)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    batch = synthetic_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, consts, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_flow_step_with_spatial_controller(key, rng):
    cfg = tiny_cfg(net="PFF", spatially_adaptive=True, spatial_res=3)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    assert state.ctrl_state is not None
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    batch = synthetic_batch(rng, b=1, h=8, w=8)
    for _ in range(3):
        state, metrics = step(state, consts, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.ctrl_state.iteration) >= 1


def test_flow_training_deterministic(key, rng):
    """Same seed => bitwise-identical flow trajectory (SURVEY §5: the
    deterministic-scatter + explicit-controller-state design)."""
    cfg = tiny_cfg(net="PFF")
    batch = synthetic_batch(rng)

    def run():
        spec, state, consts, ctrl_cfg, tx = F.create_flow_state(
            jax.random.key(11), cfg)
        step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
        losses = []
        for _ in range(3):
            state, metrics = step(state, consts, batch)
            losses.append(np.asarray(metrics["loss"]))
        return losses

    np.testing.assert_array_equal(np.stack(run()), np.stack(run()))


def test_flow_epe_against_gt(key, rng):
    cfg = tiny_cfg(net="RBF")
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    batch = synthetic_batch(rng)
    gt = jnp.zeros(batch["frame1"].shape[:3] + (2,)).at[..., 0].set(1.0)
    batch["gt_flow"] = gt
    state, metrics = step(state, consts, batch)
    assert "epe" in metrics and np.isfinite(float(metrics["epe"]))


def test_flow_infer_shapes(key, rng):
    cfg = tiny_cfg(net="RBF")
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    infer = F.make_flow_infer(spec, cfg, ctrl_cfg)
    times = jnp.asarray([0.0, 0.5])
    f12, f21 = infer(state.params, consts, state.ctrl_state, times,
                     jnp.asarray(2.0), 8, 10)
    assert f12.shape == (2, 8, 10, 2)
    assert f21.shape == (2, 8, 10, 2)


def test_flow_learns_true_flow_on_shift_sequence(key):
    """End-to-end convergence: a pure 1px/frame horizontal-shift sequence
    must drive EPE vs the analytic flow well below the initial error."""
    from sin_inn_tpu.data.synthetic import moving_texture_video

    h, w, n = 24, 32, 5
    base = moving_texture_video(1, h, w + n + 2, seed=3)[0]
    frames = np.stack([base[:, i:i + w] for i in range(n)])
    f1 = jnp.asarray(frames[:-1])
    f2 = jnp.asarray(frames[1:])
    bsz = f1.shape[0]
    gt = jnp.zeros((bsz, h, w, 2)).at[..., 0].set(-1.0)
    batch = {"frame1": f1, "frame2": f2,
             "times": jnp.linspace(-1, 1, bsz),
             "scale": jnp.asarray(np.float32(w / 5)),
             "gt_flow": gt}
    cfg = tiny_cfg(net="PFF", lr=3e-3).replace(epochs=300)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    state, m0 = step(state, consts, batch)
    epe0 = float(m0["epe"])
    for _ in range(300):
        state, m = step(state, consts, batch)
    assert float(m["epe"]) < epe0 * 0.5
    assert float(m["psnr"]) > float(m0["psnr"])


def test_flow_train_loop_with_pseudo_gt_producer(tmp_path, rng):
    """run_flow_train wires cfg.flow_producer through _maybe_pseudo_gt: a
    GT-less media gets producer flow attached (cached as .flo files under
    checkpoints/pseudo_gt) and the train metrics gain 'epe'."""
    import os

    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import run_flow_train

    video = rng.rand(3, 12, 16, 3).astype(np.float32)
    media = FlowMedia(video)
    assert not media.gt_available
    cfg = tiny_cfg(net="RBF").replace(
        epochs=2, flow_producer="py:flow_producer_helper:unit_flow",
        checkpoints_dir=str(tmp_path / "ckpt"),
        results_dir=str(tmp_path / "res"))
    out = run_flow_train(cfg, media=media, scene="prodscene")
    assert media.gt_available and media.flow.shape == (2, 12, 16, 2)
    assert np.allclose(media.flow[..., 0], 1.0)
    # producer flow is pixel-space: model output scaling drops to 1 like the
    # reference post-RAFT (data.py:64-65)
    assert media.flow_scale == 1.0
    assert "epe" in out["metrics"]
    # cache dir is keyed by scene, size, sampling AND producer spec
    import glob

    (flo_dir,) = glob.glob(str(tmp_path / "ckpt" / "pseudo_gt"
                               / "prodscene_h12_*"))
    assert sorted(os.listdir(flo_dir)) == ["frame_0001.flo", "frame_0002.flo"]
    # a different producer spec must NOT reuse the cache
    cfg2 = cfg.replace(flow_producer="py:flow_producer_helper:unit_flow",
                       step=3)
    from sin_inn_tpu.train.loop import _maybe_pseudo_gt

    media2 = FlowMedia(video.copy())
    _maybe_pseudo_gt(cfg2, media2, "prodscene")
    assert len(glob.glob(str(tmp_path / "ckpt" / "pseudo_gt"
                             / "prodscene_h12_*"))) == 2


def test_flow_config_rejects_dx_without_dy():
    with pytest.raises(ValueError, match="splat_max_dx"):
        FlowConfig(splat_max_dy="off", splat_max_dx=64)


def test_flow_config_splat_bounds_auto_resolution():
    """'auto' defaults (VERDICT r2 weak #1: tuned path out of the box):
    Sintel size resolves to the measured-fastest (dy=64, dx=128); tiny
    frames fall back to the exact scatter; ints pass through."""
    cfg = FlowConfig()
    assert cfg.splat_max_dy == "auto" and cfg.splat_max_dx == "auto"
    r = cfg.resolve_splat_bounds(436, 1024)
    assert r.splat_max_dy == 64 and r.splat_max_dx == 128
    r = cfg.resolve_splat_bounds(12, 16)            # tiny -> exact
    assert r.splat_max_dy is None and r.splat_max_dx is None
    r = cfg.resolve_splat_bounds(1080, 1920)
    assert r.splat_max_dy == 144 and r.splat_max_dx == 240
    # explicit ints are left alone; 'off' maps to None
    r = FlowConfig(splat_max_dy=32, splat_max_dx="off").resolve_splat_bounds(
        436, 1024)
    assert r.splat_max_dy == 32 and r.splat_max_dx is None
    r = FlowConfig(splat_max_dy="off").resolve_splat_bounds(436, 1024)
    assert r.splat_max_dy is None and r.splat_max_dx is None
    with pytest.raises(ValueError, match="splat_max_dy"):
        FlowConfig(splat_max_dy="sometimes")
    # a pinned dx is a request for the windowed path: the tiny-frame auto
    # fallback must not silently discard it (it would contradict the loud
    # ValueError the explicit dy-off + dx-int contradiction raises above)
    r = FlowConfig(splat_max_dx=64).resolve_splat_bounds(100, 120)
    assert r.splat_max_dx == 64 and isinstance(r.splat_max_dy, int)


def test_flow_gt_probe_respects_pinned_bounds():
    """The GT-flow magnitude probe only tightens axes left on 'auto' — an
    explicit int pins that axis (config.py contract)."""
    from sin_inn_tpu.train.loop import _resolve_and_probe_splat_bounds

    class _M:
        gt_available = True
        flow = np.zeros((2, 436, 1024, 2), np.float32)  # max |f| ~ 20 px
    _M.flow[..., 0] = 20.0
    _M.flow[..., 1] = 20.0

    # both auto: probe tightens both (1.5 * 20 -> 32)
    cfg = _resolve_and_probe_splat_bounds(FlowConfig(), _M(), 436, 1024)
    assert cfg.splat_max_dy == 32 and cfg.splat_max_dx == 32
    # pinned dx survives; auto dy still tightens
    cfg = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dx=96), _M(), 436, 1024)
    assert cfg.splat_max_dx == 96 and cfg.splat_max_dy == 32
    # pinned dy survives; auto dx still tightens
    cfg = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dy=80), _M(), 436, 1024)
    assert cfg.splat_max_dy == 80 and cfg.splat_max_dx == 32
    # both pinned: probe is a no-op
    cfg = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dy=80, splat_max_dx=96), _M(), 436, 1024)
    assert cfg.splat_max_dy == 80 and cfg.splat_max_dx == 96


def test_flow_loss_auto_bounds_self_resolve(key, rng):
    """photometric_flow_loss resolves string bounds itself (call sites that
    skip the driver, e.g. the parity harness) — tiny frames land on the
    exact path and match an explicitly-exact config."""
    from sin_inn_tpu.train.flow import photometric_flow_loss

    f1 = jnp.asarray(rng.rand(1, 12, 16, 3).astype(np.float32))
    f2 = jnp.asarray(rng.rand(1, 12, 16, 3).astype(np.float32))
    fl = jnp.asarray((rng.rand(1, 12, 16, 2) * 2 - 1).astype(np.float32))
    la, _ = photometric_flow_loss(FlowConfig(), f1, f2, fl, -fl)
    le, _ = photometric_flow_loss(
        FlowConfig(splat_max_dy="off"), f1, f2, fl, -fl)
    assert float(la) == pytest.approx(float(le), rel=1e-6)


def test_flow_loss_forced_pallas_matches_xla_windowed(key, rng):
    """--use-pallas on off-TPU dispatches the region kernels in interpret
    mode (train/flow.py's `interp` wiring); loss and flow-gradient match
    the XLA windowed path within the kernels' documented one-step
    coordinate-rounding tolerance (~2e-4)."""
    from sin_inn_tpu.train.flow import photometric_flow_loss

    f1 = jnp.asarray(rng.rand(1, 12, 16, 3).astype(np.float32))
    f2 = jnp.asarray(rng.rand(1, 12, 16, 3).astype(np.float32))
    fl = jnp.asarray((rng.rand(1, 12, 16, 2) * 2 - 1).astype(np.float32))

    cfg_pal = FlowConfig(splat_max_dy=8, splat_max_dx=8, use_pallas="on")
    cfg_xla = FlowConfig(splat_max_dy=8, splat_max_dx=8, use_pallas="off")

    def loss_fn(cfg):
        return lambda flow: photometric_flow_loss(cfg, f1, f2,
                                                  flow, -flow)[0]

    lp, gp = jax.value_and_grad(loss_fn(cfg_pal))(fl)
    lx, gx = jax.value_and_grad(loss_fn(cfg_xla))(fl)
    assert float(lp) == pytest.approx(float(lx), abs=2e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=2e-4)


def test_flow_step_2d_domain_pair(key, rng):
    """The reference pair_flow.py experiment config: domain_dim=2 nets
    train on a single pair (pose grid drops the time coordinate)."""
    cfg = FlowConfig(net="PRBF", domain_dim=2, num_frequencies=8,
                     hidden_dim=16, num_layers=2, epochs=40)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    assert spec.domain_dim == 2
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    batch = synthetic_batch(rng, b=1)
    losses = []
    for _ in range(6):
        state, m = step(state, consts, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_flow_step_2d_domain_spatial_controller(key, rng):
    """2-D domain + spatially-adaptive controller falls back to the
    generic per-point mask/stash path (mask grid is res^2)."""
    cfg = FlowConfig(net="PFF", domain_dim=2, num_frequencies=6,
                     hidden_dim=16, num_layers=2, epochs=40,
                     spatially_adaptive=True, spatial_res=4)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    assert ctrl_cfg.mask_dim == 2
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    batch = synthetic_batch(rng, b=1, h=8, w=8)
    for _ in range(3):
        state, m = step(state, consts, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(state.ctrl_state.iteration) >= 1


@pytest.mark.parametrize("net,spatial", [("RBF", False), ("PFF", True)])
def test_frame_interp_endpoints_exact(key, rng, net, spatial):
    """alpha=0 / alpha=1 reproduce the endpoint frames exactly (zero-flow
    softmax splat is the identity), for ANY params — no training needed.
    The spatial variant drives the controller-masked INR path."""
    cfg = tiny_cfg(net=net).replace(spatially_adaptive=spatial,
                                    spatial_res=3)
    spec, state, consts, ctrl_cfg, _ = F.create_flow_state(key, cfg)
    interp = F.make_frame_interp(spec, cfg, ctrl_cfg)
    batch = synthetic_batch(rng)
    frames2 = jnp.stack([batch["frame1"][0], batch["frame2"][0]])
    t0 = jnp.float32(-1.0)
    out0 = interp(state.params, consts, state.ctrl_state, t0, frames2,
                  jnp.float32(0.0), batch["scale"])
    np.testing.assert_allclose(np.asarray(out0), np.asarray(frames2[0]),
                               atol=1e-5)
    out1 = interp(state.params, consts, state.ctrl_state, t0, frames2,
                  jnp.float32(1.0), batch["scale"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(frames2[1]),
                               atol=1e-5)


def test_frame_interp_synthesizes_midframe(key):
    """On a 2px/frame shift sequence the alpha=0.5 synthesis must recover
    the analytic 1px-shifted mid-frame far better than the cross-fade
    (the hole-fill fallback) — i.e. the motion compensation is real."""
    from sin_inn_tpu.data.synthetic import moving_texture_video
    from sin_inn_tpu.ops import losses as L

    h, w, n = 24, 32, 5
    base = moving_texture_video(1, h, w + 2 * n + 2, seed=3)[0]
    frames = np.stack([base[:, 2 * i:2 * i + w] for i in range(n)])
    f1 = jnp.asarray(frames[:-1])
    f2 = jnp.asarray(frames[1:])
    bsz = f1.shape[0]
    times = jnp.linspace(-1, 1, bsz)
    gt = jnp.zeros((bsz, h, w, 2)).at[..., 0].set(-2.0)
    batch = {"frame1": f1, "frame2": f2, "times": times,
             "scale": jnp.asarray(np.float32(w / 5)), "gt_flow": gt}
    cfg = tiny_cfg(net="PFF", lr=3e-3).replace(epochs=300)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(key, cfg)
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    for _ in range(300):
        state, m = step(state, consts, batch)
    # the margin below is only meaningful if the flow actually converged
    assert float(m["epe"]) < 0.5, float(m["epe"])

    interp = F.make_frame_interp(spec, cfg, ctrl_cfg)
    i = 1                                     # middle pair
    frames2 = jnp.stack([f1[i], f2[i]])
    mid = interp(state.params, consts, state.ctrl_state, times[i], frames2,
                 jnp.float32(0.5), batch["scale"])
    gt_mid = jnp.asarray(base[:, 2 * i + 1:2 * i + 1 + w])
    fade = 0.5 * f1[i] + 0.5 * f2[i]
    psnr_mid = float(L.psnr(jnp.clip(mid, 0, 1), gt_mid))
    psnr_fade = float(L.psnr(jnp.clip(fade, 0, 1), gt_mid))
    # measured (CPU, seeded): mid 26.2 dB vs fade 24.9 — the margin is
    # modest because the blurred synthetic makes cross-fade a strong
    # baseline at a 1px half-shift; the claim pinned here is that motion
    # compensation strictly beats it AND reaches a high absolute bar
    assert psnr_mid > psnr_fade + 0.8, (psnr_mid, psnr_fade)
    assert psnr_mid > 25.5, psnr_mid


def test_run_flow_interpolate_writes_video(tmp_path, rng):
    """Driver e2e: train 2 epochs, then `flow interpolate` restores the
    checkpoint and writes the x2 upsampled video + metadata sidecar."""
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import run_flow_interpolate, run_flow_train

    video = rng.rand(3, 12, 16, 3).astype(np.float32)
    cfg = tiny_cfg(net="RBF").replace(
        epochs=2, checkpoints_dir=str(tmp_path / "ck"),
        results_dir=str(tmp_path / "res"))
    run_flow_train(cfg, media=FlowMedia(video.copy()), scene="isc")
    out = run_flow_interpolate(cfg, factor=2, media=FlowMedia(video.copy()),
                               scene="isc")
    assert out["num_frames"] == 2 * (len(video) - 1) + 1
    import os
    assert os.path.exists(out["path"])
    import json
    meta = json.load(open(str(tmp_path / "res" / "interp_isc_temp_x2.json")))
    assert meta["factor"] == 2 and meta["frames_out"] == out["num_frames"]


# ---------------------------------------------------------------------------
# Mid-training window-bound refit (FlowConfig.window_refit)
# ---------------------------------------------------------------------------

def _refit(cfg, since, hist=None, auto=None, fh=436, fw=2048,
           allow_tighten=True):
    from sin_inn_tpu.train.loop import _refit_window_bounds
    auto = auto or {"dy": True, "dx": True, "ldy": True, "ldx": True}
    return _refit_window_bounds(cfg, auto, fh, fw, since, hist or since,
                                allow_tighten)


def test_window_refit_widens_on_near_bound_flow():
    """Flow magnitude at the warn threshold WIDENS the auto global bounds
    (the monitor's warning becomes an action); local bounds widen on
    deviation; nothing moves for pinned axes."""
    cfg = FlowConfig(splat_max_dy=64, splat_max_dx=128, splat_local_dy=16,
                     splat_local_dx=None)
    s = {"fy": 63.5, "fx": 30.0, "dvy": 5.0, "dvx": 30.0}
    out = _refit(cfg, s, allow_tighten=False)
    assert out.splat_max_dy == 96 and out.splat_max_dx == 128  # 1.5x fy
    assert out.splat_local_dy == 16
    # deviation near the local bound widens ldy (1.5x + 3, sublane-rounded)
    s2 = {"fy": 30.0, "fx": 30.0, "dvy": 14.0, "dvx": 0.0}
    out = _refit(cfg, s2, allow_tighten=False)
    assert out.splat_local_dy == 24 and out.splat_max_dy == 64
    # pinned axis never moves (here: dy pinned, flow outgrows it -> None,
    # the loud warning keeps covering it)
    out = _refit(cfg, s, auto={"dy": False, "dx": True, "ldy": True,
                               "ldx": True}, allow_tighten=False)
    assert out is None


def test_window_refit_tightens_only_on_hist_and_slack():
    """Tightening uses the HISTORICAL max (no oscillation) and needs a
    full quantization quantum of slack; disabled before allow_tighten."""
    cfg = FlowConfig(splat_max_dy=64, splat_max_dx=128, splat_local_dy=32,
                     splat_local_dx=None)
    since = {"fy": 5.0, "fx": 5.0, "dvy": 4.0, "dvx": 4.0}
    hist = {"fy": 20.0, "fx": 90.0, "dvy": 8.0, "dvx": 8.0}
    out = _refit(cfg, since, hist)
    # dy: 1.5*20 -> 32 (tighten); dx: 1.5*90 -> 144 > 128 (no tighten,
    # and 90 < 127 so no widen); ldy: 1.5*8+3 -> 16
    assert out.splat_max_dy == 32 and out.splat_max_dx == 128
    assert out.splat_local_dy == 16
    assert _refit(cfg, since, hist, allow_tighten=False) is None
    # no-slack case: hist target equals the current bound -> no refit
    assert _refit(cfg, since, {"fy": 40.0, "fx": 90.0, "dvy": 20.0,
                               "dvx": 8.0}) is None


def test_window_refit_exact_fallback_and_local_drop():
    """A widened global bound at half the frame falls back to the exact
    scatter; a local bound driven to the global scale drops local mode."""
    cfg = FlowConfig(splat_max_dy=64, splat_max_dx=128, splat_local_dy=32,
                     splat_local_dx=None)
    out = _refit(cfg, {"fy": 250.0, "fx": 10.0, "dvy": 5.0, "dvx": 5.0},
                 allow_tighten=False)
    assert out.splat_max_dy is None and out.splat_max_dx is None
    assert out.splat_local_dy is None and out.splat_local_dx is None
    # deviation ~ global scale: local mode off, static windows stay
    out = _refit(cfg, {"fy": 40.0, "fx": 10.0, "dvy": 50.0, "dvx": 5.0},
                 allow_tighten=False)
    assert out.splat_local_dy is None and out.splat_max_dy == 64
    # exact config: nothing to refit
    assert _refit(FlowConfig(splat_max_dy=None, splat_max_dx=None,
                             splat_local_dy=None, splat_local_dx=None),
                  {"fy": 9.0, "fx": 9.0}) is None


def test_window_refit_local_dx_moves_but_never_engages():
    """An engaged x-local bound widens/tightens with the measured deviation
    (lane quantum, floor 128) but is dropped rather than kept without a
    lane-granular shrink; refit never ENGAGES x-local from row-only mode
    (the monitor's dev_x there is a magnitude, not a fine deviation)."""
    cfg = FlowConfig(splat_max_dy=32, splat_max_dx=512, splat_local_dy=8,
                     splat_local_dx=128)
    # widen: dvx near the bound (1.5x + 3, lane-rounded)
    out = _refit(cfg, {"fy": 10.0, "fx": 400.0, "dvy": 2.0, "dvx": 126.0},
                 allow_tighten=False)
    assert out.splat_local_dx == 192
    # tighten to the floor 128 needs a quantum of slack: from 256
    cfg2 = cfg.replace(splat_local_dx=256)
    out = _refit(cfg2, {"fy": 10.0, "fx": 400.0, "dvy": 2.0, "dvx": 10.0})
    assert out.splat_local_dx == 128
    # row-only mode: ldx stays off even with a huge global dx
    cfg3 = FlowConfig(splat_max_dy=32, splat_max_dx=512, splat_local_dy=8,
                      splat_local_dx=None)
    out = _refit(cfg3, {"fy": 10.0, "fx": 400.0, "dvy": 4.0, "dvx": 10.0},
                 allow_tighten=False)
    assert out is None


def test_window_refit_config_validation_and_cli():
    import argparse

    import pytest

    with pytest.raises(ValueError, match="window_refit"):
        FlowConfig(window_refit="always")
    from sin_inn_tpu import cli
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command", required=True)
    cli._flow_parser(sub)
    a = parser.parse_args(["flow", "train", "--window-refit", "off"])
    assert cli.flow_config_from_args(a).window_refit == "off"
    a = parser.parse_args(["flow", "train"])
    assert cli.flow_config_from_args(a).window_refit == "auto"


def test_window_refit_tightens_in_training_loop(tmp_path, rng):
    """Loop integration: with window_refit on (default) and near-zero
    training flows, the save-cadence refit tightens the auto global dy
    (32 -> 16 at 256x128) and rebuilds the step; the run completes and
    reports the effective config. With --window-refit off the bounds
    stay static."""
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import run_flow_train

    video = rng.rand(3, 256, 128, 3).astype(np.float32)
    base = tiny_cfg(net="RBF").replace(
        epochs=4, checkpoints_dir=str(tmp_path / "ck"),
        results_dir=str(tmp_path / "res"), val_iter=1000)
    assert base.resolve_splat_bounds(256, 128).splat_max_dy == 32
    out = run_flow_train(base, media=FlowMedia(video.copy()), scene="wr")
    assert out["cfg"].splat_max_dy == 16            # tightened by refit
    out2 = run_flow_train(
        base.replace(window_refit="off", name="static"),
        media=FlowMedia(video.copy()), scene="wr2")
    assert out2["cfg"].splat_max_dy == 32


# ---------------------------------------------------------------------------
# Round-3 review fixes: pin-respecting fallbacks, bound persistence,
# inference local-window gating, local-dy re-engagement
# ---------------------------------------------------------------------------

def test_gt_probe_half_frame_fallback_respects_pins():
    """When the probed auto bound reaches half the frame, the exact-scatter
    fallback engages only if no global axis is pinned — an explicit pin is
    a standing request for the windowed path (the same contract as
    resolve_splat_bounds' tiny-frame rule)."""
    from sin_inn_tpu.train.loop import _resolve_and_probe_splat_bounds

    class _M:
        gt_available = True
        flow = np.zeros((2, 436, 1024, 2), np.float32)
    _M.flow[..., 1] = 300.0                 # probe dy = 464 >= 436 // 2

    # both axes auto: full fallback to the exact scatter
    cfg = _resolve_and_probe_splat_bounds(FlowConfig(), _M(), 436, 1024)
    assert cfg.splat_max_dy is None and cfg.splat_max_dx is None
    assert cfg.splat_local_dy is None and cfg.splat_local_dx is None
    # dx pinned: keep the windowed path, dy widens to cover the probe
    cfg = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dx=128), _M(), 436, 1024)
    assert cfg.splat_max_dy == 464 and cfg.splat_max_dx == 128
    # dy pinned while auto dx crosses half the width
    class _M2:
        gt_available = True
        flow = np.zeros((2, 436, 1024, 2), np.float32)
    _M2.flow[..., 0] = 400.0                # probe dx = 608 >= 1024 // 2
    cfg = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_max_dy=64), _M2(), 436, 1024)
    assert cfg.splat_max_dy == 64 and cfg.splat_max_dx == 608


def test_gt_probe_pinned_local_dx_engages_after_widen():
    """A pinned splat_local_dx that offers no lane-granular shrink against
    the PRE-probe global dx must survive the first resolution and engage
    once the probe widens dx far enough (round-3 review: the pin was
    destroyed by the pre-probe resolve)."""
    from sin_inn_tpu.train.loop import _resolve_and_probe_splat_bounds

    class _M:
        gt_available = True
        flow = np.zeros((2, 436, 1024, 2), np.float32)
    _M.flow[..., 0] = 300.0                 # probe dx = 464 (auto was 128)

    cfg = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_local_dx=96), _M(), 436, 1024)
    # vs the widened dx=464: ceil((128+192)/128)=3 < ceil((128+928)/128)=9
    assert cfg.splat_max_dx == 464 and cfg.splat_local_dx == 96
    # and against the unchanged auto dx=128 the same pin stays disengaged
    class _M0:
        gt_available = True
        flow = np.zeros((2, 436, 1024, 2), np.float32)
    _M0.flow[..., 0] = 80.0                 # probe dx = 128 (no widen)
    cfg0 = _resolve_and_probe_splat_bounds(
        FlowConfig(splat_local_dx=96), _M0(), 436, 1024)
    assert cfg0.splat_local_dx is None


def test_window_refit_half_frame_fallback_respects_pins():
    """Refit's half-frame exact fallback mirrors the probe: a pinned
    global axis keeps the windowed path (the auto axis just widens)."""
    cfg = FlowConfig(splat_max_dy=64, splat_max_dx=128, splat_local_dy=32,
                     splat_local_dx=None)
    out = _refit(cfg, {"fy": 250.0, "fx": 10.0, "dvy": 5.0, "dvx": 5.0},
                 auto={"dy": True, "dx": False, "ldy": True, "ldx": True},
                 allow_tighten=False)
    assert out.splat_max_dy == 384 and out.splat_max_dx == 128


def test_window_refit_reengages_local_dy_from_history():
    """A row-local bound dropped by a transient global tighten re-engages
    from the historical deviation evidence once the global re-widens —
    without dvy history (local never ran) it stays off."""
    cfg = FlowConfig(splat_max_dy=64, splat_max_dx=128,
                     splat_local_dy=None, splat_local_dx=None)
    since = {"fy": 10.0, "fx": 10.0, "dvy": None, "dvx": None}
    out = _refit(cfg, since, hist={"fy": 40.0, "fx": 40.0, "dvy": 8.0,
                                   "dvx": 8.0}, allow_tighten=False)
    # 1.5*8+3 -> 16, plus one extra slack quantum (+8): deviation was
    # unmonitored while local mode was off, so hist may be stale-low
    assert out is not None and out.splat_local_dy == 24
    # no deviation history (e.g. the GT probe disabled local mode): off
    assert _refit(cfg, since, hist={"fy": 40.0, "fx": 40.0},
                  allow_tighten=False) is None


def test_window_bounds_sidecar_roundtrip(tmp_path):
    """Effective bounds persist next to the checkpoints and re-apply to
    'auto' axes only (a pin given at load time wins); a different frame
    size invalidates the sidecar."""
    from sin_inn_tpu.train.loop import (_load_window_bounds,
                                        _save_window_bounds)

    from sin_inn_tpu.train.loop import _load_window_hist

    d = str(tmp_path)
    trained = FlowConfig(splat_max_dy=96, splat_max_dx=160,
                         splat_local_dy=16, splat_local_dx=None)
    _save_window_bounds(d, trained, 436, 1024,
                        hist={"fy": 20.0, "fx": 30.0, "dvy": 8.0})
    # the refit-monitor maxima ride the sidecar (resume must not restart
    # the historical-max rule from scratch — round-4 oscillation fix) and
    # invalidate with it on a size mismatch
    assert _load_window_hist(d, 436, 1024) == {
        "fy": 20.0, "fx": 30.0, "dvy": 8.0}
    assert _load_window_hist(d, 128, 128) == {}
    cfg, found = _load_window_bounds(FlowConfig(), d, 436, 1024)
    assert found and cfg.splat_max_dy == 96 and cfg.splat_max_dx == 160
    assert cfg.splat_local_dy == 16 and cfg.splat_local_dx is None
    # a pinned axis wins over the sidecar
    cfg, found = _load_window_bounds(FlowConfig(splat_max_dy=48), d,
                                     436, 1024)
    assert found and cfg.splat_max_dy == 48 and cfg.splat_max_dx == 160
    # size mismatch: bounds are train-size pixels, do not apply
    cfg, found = _load_window_bounds(FlowConfig(), d, 218, 512)
    assert not found and cfg.splat_max_dy == "auto"
    # absent sidecar
    cfg, found = _load_window_bounds(FlowConfig(), str(tmp_path / "x"),
                                     436, 1024)
    assert not found


def test_fresh_train_ignores_stale_bounds_sidecar(tmp_path, rng):
    """A fresh run in a reused checkpoint dir (step_* gone, sidecar left
    behind) must re-probe, not inherit the dead run's bounds — the sidecar
    only applies on an ACTUAL resume (round-5 review)."""
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import (_save_window_bounds, flow_ckpt_dir,
                                        run_flow_train)

    video = rng.rand(3, 256, 128, 3).astype(np.float32)
    base = tiny_cfg().replace(
        epochs=4, checkpoints_dir=str(tmp_path / "ck"),
        results_dir=str(tmp_path / "res"), val_iter=1000)
    d = flow_ckpt_dir(base, "sc")
    os.makedirs(d, exist_ok=True)
    # a stale sidecar with bounds no probe of this video would derive
    _save_window_bounds(d, base.replace(splat_max_dy=192, splat_max_dx=96,
                                        splat_local_dy="off",
                                        splat_local_dx="off"),
                        256, 128)
    out = run_flow_train(base, media=FlowMedia(video.copy()), scene="sc")
    assert out["cfg"].splat_max_dy != 192    # re-derived, not inherited


def test_inference_bounds_never_engage_auto_locals():
    """Inference drivers resolve 'auto' LOCAL bounds OFF (no deviation
    evidence outside the train loop); pinned ints and globals pass
    through untouched."""
    from sin_inn_tpu.train.loop import _inference_bounds

    cfg = _inference_bounds(FlowConfig())
    assert cfg.splat_local_dy == "off" and cfg.splat_local_dx == "off"
    assert cfg.splat_max_dy == "auto"
    r = cfg.resolve_splat_bounds(436, 1024)
    assert r.splat_local_dy is None and isinstance(r.splat_max_dy, int)
    cfg = _inference_bounds(FlowConfig(splat_local_dy=16))
    assert cfg.splat_local_dy == 16


def test_flow_train_writes_bounds_sidecar(tmp_path, rng):
    """Loop integration: training persists the effective bounds sidecar in
    the scene checkpoint dir, and a fresh same-scene invocation restores
    them instead of re-deriving raw 'auto' markers."""
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import (_load_window_bounds, flow_ckpt_dir,
                                        run_flow_train)

    video = rng.rand(3, 256, 128, 3).astype(np.float32)
    base = tiny_cfg(net="RBF").replace(
        epochs=4, checkpoints_dir=str(tmp_path / "ck"),
        results_dir=str(tmp_path / "res"), val_iter=1000)
    out = run_flow_train(base, media=FlowMedia(video.copy()), scene="sc")
    eff = out["cfg"]
    cfg2, found = _load_window_bounds(base, flow_ckpt_dir(base, "sc"),
                                      256, 128)
    assert found
    for k in ("splat_max_dy", "splat_max_dx",
              "splat_local_dy", "splat_local_dx"):
        assert getattr(cfg2, k) == getattr(eff, k)
