"""Enforced convergence bounds on the harder synthetic fixtures.

VERDICT r3 #5: convergence evidence lived only in docs (CONVERGENCE.md) on
the easiest fixture (uniform shift); nothing asserted it, so a quality
regression would only be caught by a human rereading a doc. These tests
train the real jitted steps on analytic-GT fixtures with NON-constant flow
(rotation, zoom) and real motion discontinuities/occlusions, and FAIL on
explicit acceptance bands.

Bands were calibrated on the forced-CPU backend 2026-08-19 (this round) at
~3x the measured converged values:
  rotation 3deg/frame: EPE 2.58 -> 0.095 @400 steps   (band 0.30)
  zoom     4%/frame:   EPE 2.50 -> 0.110              (band 0.33)
  occlusion 2px wang:  EPE 2.35 -> 0.172              (band 0.50)
  occlusion 2px brox:  EPE 2.35 -> 0.340              (band 0.80)
  SR natural texture:  loss 13.1 -> 1.7 @60 epochs    (band 3.0),
                       val PSNR +0.97 dB              (band +0.4)

All slow-marked (each flow fixture trains ~45 s on the single CPU core).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin_inn_tpu.core.config import FlowConfig, SRConfig
from sin_inn_tpu.data.synthetic import (natural_texture_video,
                                        synthetic_flow_sequence,
                                        synthetic_sr_video)
from sin_inn_tpu.train import flow as F

pytestmark = pytest.mark.slow


def _train_flow(kind, magnitude, occl, steps=400, h=32, w=40):
    frames, flows = synthetic_flow_sequence(kind, 5, h, w, seed=0,
                                            magnitude=magnitude)
    f1, f2 = jnp.asarray(frames[:-1]), jnp.asarray(frames[1:])
    b = int(f1.shape[0])
    batch = {"frame1": f1, "frame2": f2, "times": jnp.linspace(-1, 1, b),
             "scale": jnp.asarray(np.float32(w / 5)),
             "gt_flow": jnp.asarray(flows)}
    cfg = FlowConfig(net="PFF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=steps, lr=3e-3, loss_census=0.1,
                     loss_smooth1=0.1, occl=occl)
    spec, state, consts, ctrl_cfg, tx = F.create_flow_state(
        jax.random.key(0), cfg)
    step = F.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    state, m0 = step(state, consts, batch)
    for _ in range(steps):
        state, m = step(state, consts, batch)
    return float(m0["epe"]), float(m["epe"])


@pytest.mark.parametrize("kind,magnitude,occl,band", [
    ("rotation", 3.0, "wang", 0.30),
    ("zoom", 4.0, "wang", 0.33),
    ("occlusion", 2.0, "wang", 0.50),
    ("occlusion", 2.0, "brox", 0.80),
])
def test_flow_converges_on_hard_fixture(kind, magnitude, occl, band):
    epe0, epe = _train_flow(kind, magnitude, occl)
    assert epe0 > 1.5, f"fixture degenerate: initial EPE {epe0}"
    assert epe < band, (f"{kind} (occl={occl}): EPE {epe:.4f} exceeds the "
                        f"acceptance band {band} (calibrated headroom 3x; "
                        f"see module docstring)")


def test_sr_converges_on_natural_texture():
    from sin_inn_tpu.core import rng as R
    from sin_inn_tpu.data.sr_video import make_datasets
    from sin_inn_tpu.train import sr as SR

    cfg = SRConfig(architecture="IRN", scale=2, num_coupling=1, lr_window=1,
                   fps=30, hidden_channels=16, dense_gc=8, batch_size=4,
                   val_batch_size=4, epochs=60, learning_rate=1e-3,
                   donate_state=False)
    video = synthetic_sr_video(cfg, h=24, w=24, texture="natural")
    spec, state, tx = SR.create_train_state(jax.random.key(0), cfg)
    step = SR.make_train_step(spec, cfg, tx)
    ev = SR.make_eval_step(spec, cfg)
    sup, _, val = make_datasets(video, cfg)
    cached = sup.device_cache(cfg.batch_size)
    vb = next(iter(val.batches(4)))
    key = R.named_fold(R.root_key(0), "t")
    psnr0 = float(ev(state.params, vb, jax.random.key(1))["hr_psnr"])
    for _ in range(cfg.epochs):
        for b in cached:
            state, aux = step(state, b, None, key)
    psnr = float(ev(state.params, vb, jax.random.key(1))["hr_psnr"])
    assert float(aux["loss"]) < 3.0, float(aux["loss"])
    assert psnr - psnr0 > 0.4, (psnr0, psnr)


def test_natural_texture_spectrum():
    """The natural fixture actually has ~1/f^alpha statistics (log-log
    radial power slope near -2*alpha), unlike the blurred-noise texture."""
    v = natural_texture_video(1, 64, 64, alpha=1.8)
    img = v[0, :, :, 0] - v[0, :, :, 0].mean()
    p = np.abs(np.fft.fft2(img)) ** 2
    fy = np.fft.fftfreq(64)[:, None]
    fx = np.fft.fftfreq(64)[None, :]
    r = np.sqrt(fy ** 2 + fx ** 2).ravel()
    keep = (r > 0.03) & (r < 0.4)
    slope = np.polyfit(np.log(r[keep]), np.log(p.ravel()[keep]), 1)[0]
    assert -4.6 < slope < -2.6, slope


@pytest.mark.parametrize("kind,magnitude", [
    ("rotation", 3.0), ("zoom", 4.0), ("shift", 6.0)])
def test_fixture_pad_covers_sampled_coords(kind, magnitude, monkeypatch):
    """The base-texture pad must cover the full sampled coordinate range at
    aggressive magnitude/horizon (the old degrees-as-pixels heuristic
    under-padded rotation/zoom: _sample_bilinear clips at the base border,
    edge-smearing frames while the returned 'analytic GT' stayed exact —
    a hidden EPE floor)."""
    import sin_inn_tpu.data.synthetic as S

    worst = {"v": -np.inf}
    orig = S._sample_bilinear

    def spy(base, yy, xx):
        hb, wb = base.shape[:2]
        worst["v"] = max(worst["v"], float(-yy.min()),
                         float(yy.max() - (hb - 1)),
                         float(-xx.min()), float(xx.max() - (wb - 1)))
        return orig(base, yy, xx)

    monkeypatch.setattr(S, "_sample_bilinear", spy)
    S.synthetic_flow_sequence(kind, 8, 120, 260, magnitude=magnitude)
    assert worst["v"] <= 0.0, (f"{kind}: sampled {worst['v']:.1f} px past "
                               f"the padded base — GT no longer analytic")


# ---------------------------------------------------------------------------
# Converged-quality parity vs the torch replica (round 5, VERDICT r4 #1):
# both stacks train to a plateau on the same fixture with identical init/
# batch schedule/z draws/optimizer math and the CONVERGED metric must agree.
# Bands from the doc-scale runs (docs/CONVERGENCE.md "Parity AT
# CONVERGENCE"): SR gap wanders +-0.04 dB along the trajectory; flow's
# converged gap is the size of each side's own near-minimum wobble.
# ---------------------------------------------------------------------------

def _parity_tool():
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from _load import load_script
    return load_script("tools", "convergence_parity.py")


def _parity_args(**kw):
    import argparse

    d = dict(jax_backend="default", h=48, w=80, steps=400, batch=2, lr=1e-3,
             arch="SRF", scale=2, couplings=2, lr_window=1, hidden=32, gc=8,
             nf=64)
    d.update(kw)
    return argparse.Namespace(**d)


def test_sr_converged_parity_vs_torch():
    s = _parity_tool().run_sr(_parity_args(steps=400))
    # the north-star band, at the plateau rather than at 20 steps
    assert abs(s["final_gap_db"]) < 0.1, s
    # convergence evidence: the tail checkpoint moved < the band
    assert s["tail_psnr_move_db"] < 0.5, s


def test_flow_converged_parity_vs_torch():
    s = _parity_tool().run_flow(_parity_args(h=32, w=48, steps=600,
                                             lr=3e-3, hidden=64))
    # both sides must actually converge (GT is a 2 px shift)...
    assert s["final_epe_jax"] < 0.2 and s["final_epe_torch"] < 0.2, s
    # ...and agree at convergence within the documented wobble band
    assert abs(s["final_gap_epe"]) < 0.1, s
