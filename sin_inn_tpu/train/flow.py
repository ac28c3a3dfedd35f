"""Jitted training/eval for unsupervised optical flow via INRs.

Functional replacement of ``FlowTrainer`` (/root/reference/
video-interpolation/trainer.py:15-135). One jitted step runs: coordinate-grid
build -> controller mask lookup -> INR -> occlusion masks -> backward warp ->
softmax splat (both directions) -> photometric losses -> grad -> LAMB update
-> controller state transition. The reference needed a CuPy-compiled CUDA
kernel launch mid-step (trainer.py:63,67) plus host-side controller mutation
(trainer.py:75) and a ``torch.cuda.empty_cache()`` per step (trainer.py:86);
here the whole step is one XLA program with zero host round-trips.

The (t, y, x) coordinate grid is built on device (trainer.py:37-45 built it
on host per step). The pixel/point axis shards trivially over a device mesh —
see parallel/.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from sin_inn_tpu.core.config import FlowConfig
from sin_inn_tpu.models import controllers as ctrl
from sin_inn_tpu.models.inr import INRSpec, build_inr, inr_apply
from sin_inn_tpu.ops.occlusion import occlusion_brox
from sin_inn_tpu.ops.photometric import (bilateral_smooth, census_loss,
                                         masked_l1, ssim_loss)
from sin_inn_tpu.ops.splat import (softsplat, softsplat_with_coverage,
                                   softsplat_windowed_with_coverage)
from sin_inn_tpu.ops.warp import resample2d, resample2d_windowed
from sin_inn_tpu.ops import losses as L
from sin_inn_tpu.train.optim import lamb


class FlowTrainState(NamedTuple):
    params: Any
    opt_state: Any
    ctrl_state: Any            # None | LinearState | SpatialState
    step: jnp.ndarray


def build_flow_model(key: jax.Array, cfg: FlowConfig):
    """Net + controller wiring (reference main.py:136-143)."""
    spec, params, consts = build_inr(key, cfg.net, cfg)
    ctrl_cfg = None
    ctrl_state = None
    if spec.is_progressive:
        if cfg.spatially_adaptive:
            ctrl_cfg = ctrl.SpatialConfig.create(
                spec, cfg.spatial_res, block_iterations=max(
                    3 * cfg.epochs // (4 * max(
                        (spec.encoding_dim - spec.domain_dim * 2)
                        // (spec.domain_dim * 2), 1)), 1),
                epsilon=cfg.controller_epsilon)
            ctrl_state = ctrl.spatial_init(ctrl_cfg)
        else:
            ctrl_cfg = ctrl.LinearConfig.create(
                spec, cfg.epochs, epsilon=cfg.controller_epsilon)
            ctrl_state = ctrl.linear_init(ctrl_cfg)
    return spec, params, consts, ctrl_cfg, ctrl_state


def pose_grid(times: jnp.ndarray, h: int, w: int,
              domain_dim: int = 3) -> jnp.ndarray:
    """(B,) frame times -> (B, H, W, d) of (t, y, x) in [-1,1]^3
    (trainer.py:37-43), or (y, x) for 2-D-domain nets (the reference
    pair_flow.py experiment trains single pairs with domain_dim=2)."""
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    b = times.shape[0]
    gy = jnp.broadcast_to(gy[None], (b, h, w))
    gx = jnp.broadcast_to(gx[None], (b, h, w))
    if domain_dim == 2:
        return jnp.stack([gy, gx], axis=-1)
    t = jnp.broadcast_to(times[:, None, None], (b, h, w))
    return jnp.stack([t, gy, gx], axis=-1)


def flow_forward(spec: INRSpec, params, consts, ctrl_cfg, ctrl_state,
                 times: jnp.ndarray, h: int, w: int, scale: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """INR -> (flow12, flow21) NHWC, each (B, H, W, 2) (trainer.py:37-45)."""
    pts = pose_grid(times, h, w, spec.domain_dim).reshape(
        -1, spec.domain_dim)
    stash = {}
    mask = None
    if ctrl_state is not None:
        if isinstance(ctrl_state, ctrl.SpatialState):
            if ctrl_cfg.mask_dim == 3:
                # the trainer's points are always the dense pose grid: use
                # the separable gather-free mask (353 -> ~10 ms at Sintel
                # scale; spatial_point_mask stays for arbitrary point sets).
                # In bf16 mode the (n, E) mask is emitted in bf16 directly —
                # inr_apply would otherwise round-trip the f32 version.
                mdt = (jnp.bfloat16 if spec.compute_dtype == "bfloat16"
                       else None)
                from sin_inn_tpu.ops.pallas.inr import (
                    fused_spatial_mask_format, inr_mask_perm)
                # one shared gate with inr_apply's kernel dispatch — see
                # fused_inr_eligible's docstring for why it must not be
                # re-derived here
                fmt = fused_spatial_mask_format(spec, params, consts,
                                                pts, w)
                if fmt == "slabs":
                    # fused Pallas INR path: the mask rides as per-row
                    # t/y-contracted slabs + constant x hat weights and
                    # is rebuilt in VMEM — the (n, E) mask never exists
                    # (the materialized stream variant below measured
                    # SLOWER than XLA: 169.6 vs 142.4 ms in-step)
                    mask = ctrl.spatial_grid_mask_slabs(
                        ctrl_cfg, ctrl_state, times, h, w,
                        enc_perm=inr_mask_perm(spec), dtype=mdt)
                elif fmt == "split":
                    # forced-pallas fallback for non-row-aligned widths:
                    # stream the pre-split (n, E) mask (measured slower
                    # than the XLA path at Sintel scale — kept only so
                    # 'on' honours the request on any shape)
                    mask = ctrl.spatial_grid_mask_split(
                        ctrl_cfg, ctrl_state, times, h, w,
                        enc_perm=inr_mask_perm(spec), dtype=mdt)
                else:
                    mask = ctrl.spatial_grid_mask(ctrl_cfg, ctrl_state,
                                                  times, h, w, dtype=mdt)
            else:   # 2-D domain (pair experiment): generic point path
                mask, inds, alphas = ctrl.spatial_point_mask(
                    ctrl_cfg, ctrl_state, pts)
                stash = {"inds": inds, "alphas": alphas}
            mask = jax.lax.stop_gradient(mask)
        else:
            mask = jax.lax.stop_gradient(ctrl.linear_mask(ctrl_state))
    out = inr_apply(spec, params, consts, pts, override_mask=mask)
    b = times.shape[0]
    flows = out.reshape(b, h, w, 4) * scale
    return flows[..., :2], flows[..., 2:], stash


def _splat_ops(cfg: FlowConfig):
    """(warp, splat_with_coverage, local_spec) per the config's
    window/Pallas routing — one dispatch shared by the training loss and
    the interpolation renderer. ``cfg`` must carry resolved (non-'auto')
    window bounds. Both closures take a trailing ``offs`` argument —
    a ``TileOffsets`` bundle when ``local_spec`` is not None (the caller
    computes it per flow via :func:`_flow_offsets`), ignored otherwise.

    With BOTH window bounds set, the metric warps use the column-windowed
    matmul resample with its hand-derived backward (48 -> 31 ms fwd+grad
    per direction at Sintel size; row-window-only was measured a wash —
    autodiff ~3.1x fwd — so it needs splat_max_dx to engage; the image-grad
    branch DCEs when frames are constants). On TPU (use_pallas 'auto'/'on')
    both ops ride the fused Pallas kernels; forced-'on' off-TPU runs them
    in interpret mode (same semantics as the fused INR path). With
    ``splat_local_dy/dx`` also resolved, the kernels run in LOCAL-window
    mode: per-tile windows recentered on the tile-mean flow
    (ops/pallas/offsets.py), bounds shrunk to the deviation bounds."""
    from sin_inn_tpu.ops.pallas.splat import (
        pallas_splat_available, softsplat_region_local_with_coverage,
        softsplat_region_with_coverage)
    use_pal = (cfg.use_pallas == "on"
               or (cfg.use_pallas == "auto" and pallas_splat_available()))
    interp = cfg.use_pallas == "on" and not pallas_splat_available()
    if (cfg.splat_max_dy and cfg.splat_max_dx and use_pal
            and cfg.splat_local_dy):
        from sin_inn_tpu.ops.pallas.gather import resample2d_region_local
        ldy = cfg.splat_local_dy
        capy = -(-cfg.splat_max_dy // 8) * 8   # sublane-tiled offset cap
        if cfg.splat_local_dx:
            # x-local (GT-probe-engaged): columns recenter on the
            # 128-quantized tile means; the cap is the lane-rounded
            # global bound
            ldx = cfg.splat_local_dx
            capx = -(-cfg.splat_max_dx // 128) * 128
        else:
            ldx = cfg.splat_max_dx      # x keeps the static global bound
            capx = 0
        warp = lambda im, fl, offs: resample2d_region_local(
            ldy, ldx, capy, capx, interp, im, fl, offs.off_src)
        splat_cov = lambda f, fl, m, offs: (
            softsplat_region_local_with_coverage(
                f, fl, m, ldy, ldx, capy, capx, offs.off_out, offs.off_src,
                interpret=interp))
        return warp, splat_cov, (ldy, ldx, capy, capx)
    if cfg.splat_max_dy and cfg.splat_max_dx and use_pal:
        # fused Pallas windowed gather (fwd + analytic flow-grad in one
        # grads-mode kernel call; image-grad adjoint DCEs — gather.py)
        from sin_inn_tpu.ops.pallas.gather import resample2d_region
        warp = lambda im, fl, offs=None: resample2d_region(
            cfg.splat_max_dy, cfg.splat_max_dx, interp, im, fl)
    elif cfg.splat_max_dy and cfg.splat_max_dx:
        warp = lambda im, fl, offs=None: resample2d_windowed(
            im, fl, cfg.splat_max_dy, cfg.resample_chunk,
            cfg.splat_max_dx, cfg.splat_col_chunk)
    else:
        warp = lambda im, fl, offs=None: resample2d(im, fl)
    if cfg.splat_max_dy and cfg.splat_max_dx and use_pal:
        # fused Pallas region-scatter kernel (2D-windowed; both bounds)
        splat_cov = lambda f, fl, m, offs=None: softsplat_region_with_coverage(
            f, fl, m, cfg.splat_max_dy, cfg.splat_max_dx, interpret=interp)
    elif cfg.splat_max_dy:
        splat_cov = lambda f, fl, m, offs=None: softsplat_windowed_with_coverage(
            f, fl, m, cfg.splat_max_dy, cfg.splat_chunk)
    else:
        splat_cov = lambda f, fl, m, offs=None: softsplat_with_coverage(
            f, fl, m)
    return warp, splat_cov, None


def _flow_offsets(flow: jnp.ndarray, local_spec):
    """Per-tile window offsets for one flow direction (None spec -> None)."""
    if local_spec is None:
        return None
    from sin_inn_tpu.ops.pallas.offsets import tile_flow_offsets
    from sin_inn_tpu.ops.pallas.splat import _B, _CB
    _, _, capy, capx = local_spec
    return tile_flow_offsets(flow, _B, _CB, capy, capx)


def photometric_flow_loss(cfg: FlowConfig, frame1: jnp.ndarray,
                          frame2: jnp.ndarray, flow12: jnp.ndarray,
                          flow21: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
    """The model-free part of the training loss (trainer.py:47-87): occlusion
    masks -> backward warp metric -> softmax splat both directions ->
    L1/census/SSIM/bilateral-smooth. Split out from :func:`flow_loss` so the
    torch parity harness can pin the loss math against an independent
    re-derivation of the reference formulas with fixed flows."""
    b, h, w, _ = frame1.shape
    if any(isinstance(getattr(cfg, f), str) for f in
           ("splat_max_dy", "splat_max_dx",
            "splat_local_dy", "splat_local_dx")):
        # 'auto' bounds not yet materialized by the driver: resolve here —
        # h/w are static under jit, so this costs nothing
        cfg = cfg.resolve_splat_bounds(h, w)
    # Forward-splat each frame toward the other (trainer.py:61-68). For the
    # Wang occlusion case the range map (splat of ones along the same flow,
    # occlusions.py:29-104) shares ONE pass with the softmax splat. The two
    # directions run as separate passes on purpose: stacking them into a 2b
    # batch was measured SLOWER (12.3 -> 11.8 f/s at Sintel size — the
    # doubled per-chunk working set hurts more than the halved overhead).
    warp, splat_cov, local = _splat_ops(cfg)
    offs21 = _flow_offsets(flow21, local)
    offs12 = _flow_offsets(flow12, local)
    warped2 = warp(frame1, flow21, offs21)
    metric = jnp.mean(jnp.abs(frame2 - warped2), axis=-1, keepdims=True)
    warped1 = warp(frame2, flow12, offs12)
    metric2 = jnp.mean(jnp.abs(frame1 - warped1), axis=-1, keepdims=True)

    if cfg.occl == "wang":
        softmax1, cover1 = splat_cov(frame2, flow21, -20.0 * metric, offs21)
        softmax2, cover2 = splat_cov(frame1, flow12, -20.0 * metric2, offs12)
        mask1 = (cover1 > cfg.occl_thresh).astype(frame1.dtype)
        mask2 = (cover2 > cfg.occl_thresh).astype(frame1.dtype)
    else:
        softmax1 = softsplat(frame2, flow21, -20.0 * metric, "softmax")
        softmax2 = softsplat(frame1, flow12, -20.0 * metric2, "softmax")
        if cfg.occl == "brox":
            mask1 = occlusion_brox(flow12, flow21, cfg.occl_thresh)
            mask2 = occlusion_brox(flow21, flow12, cfg.occl_thresh)
        else:
            mask1 = jnp.ones((b, h, w, 1), frame1.dtype)
            mask2 = jnp.ones((b, h, w, 1), frame1.dtype)

    mask1 = mask1 * (softmax1 != 0.0).astype(frame1.dtype)
    mask2 = mask2 * (softmax2 != 0.0).astype(frame1.dtype)

    l1 = (masked_l1(softmax1, frame1, mask1, cfg.loss_l1)
          + masked_l1(softmax2, frame2, mask2, cfg.loss_l1))
    census = (census_loss(softmax1, frame1, mask1, cfg.loss_census, cfg.census_width)
              + census_loss(softmax2, frame2, mask2, cfg.loss_census, cfg.census_width))
    ssim = (ssim_loss(softmax1, frame1, mask1, cfg.loss_ssim)
            + ssim_loss(softmax2, frame2, mask2, cfg.loss_ssim))
    smooth = (bilateral_smooth(frame1, flow12, cfg.loss_smooth1,
                               cfg.edge_func, cfg.edge_constant, 1)
              + bilateral_smooth(frame2, flow21, cfg.loss_smooth1,
                                 cfg.edge_func, cfg.edge_constant, 1))
    loss = l1 + census + ssim + smooth

    aux = {"loss": loss, "l1": l1, "census": census, "ssim": ssim,
           "smooth": smooth,
           "psnr": L.psnr(jnp.clip(softmax2, 0, 1), frame2)}

    if cfg.splat_max_dy:
        # window-violation monitor: taps beyond the window are DROPPED, so
        # the train loop warns loudly when the flow outgrows the bound
        # (stop_gradient: metrics only)
        af = jax.lax.stop_gradient(
            jnp.maximum(jnp.abs(flow12), jnp.abs(flow21)))
        aux["flow_max_x"] = jnp.max(af[..., 0])
        aux["flow_max_y"] = jnp.max(af[..., 1])
    if local is not None:
        # local-window monitor: the drop criterion is the DEVIATION from
        # the per-tile mean flow (both tiling criteria, both directions)
        dev = jnp.maximum(jnp.maximum(offs12.dev_src, offs12.dev_out),
                          jnp.maximum(offs21.dev_src, offs21.dev_out))
        aux["flow_dev_x"] = dev[0]
        aux["flow_dev_y"] = dev[1]

    # Per-point photometric error map for the spatial controller: the
    # intended spatially-resolved signal behind net.stash_iteration(loss)
    # (trainer.py:75; see controllers.py module docstring on the divergence).
    err = (jnp.abs(softmax1 - frame1) * mask1).mean(-1) \
        + (jnp.abs(softmax2 - frame2) * mask2).mean(-1)
    aux["point_loss"] = (err / 2.0).reshape(-1)
    return loss, aux


def flow_loss(spec: INRSpec, cfg: FlowConfig, params, consts, ctrl_cfg,
              ctrl_state, batch: Dict) -> Tuple[jnp.ndarray, Dict]:
    """Bidirectional photometric training loss (trainer.py:47-87)."""
    frame1 = batch["frame1"]
    frame2 = batch["frame2"]
    times = batch["times"]
    scale = batch["scale"]
    b, h, w, _ = frame1.shape

    flow12, flow21, stash = flow_forward(
        spec, params, consts, ctrl_cfg, ctrl_state, times, h, w, scale)
    loss, aux = photometric_flow_loss(cfg, frame1, frame2, flow12, flow21)
    aux["stash"] = stash

    if "gt_flow" in batch:
        epe = jnp.mean(jnp.sqrt(jnp.sum(
            (flow12 - batch["gt_flow"]) ** 2, axis=-1)))
        aux["epe"] = epe
    return loss, aux


def create_flow_state(key: jax.Array, cfg: FlowConfig):
    spec, params, consts, ctrl_cfg, ctrl_state = build_flow_model(key, cfg)
    if cfg.import_torch:
        # seed weights/encoding buffers/controller mask from a reference
        # checkpoint; every tensor is shape-checked against the templates
        from sin_inn_tpu.models.torch_import import (
            load_flow_reference_checkpoint)
        params, consts, ctrl_state = load_flow_reference_checkpoint(
            cfg.import_torch, spec, ctrl_cfg, ctrl_state, params, consts)
    tx = lamb(cfg.lr)
    state = FlowTrainState(params=params, opt_state=tx.init(params),
                           ctrl_state=ctrl_state,
                           step=jnp.zeros((), jnp.int32))
    return spec, state, consts, ctrl_cfg, tx


def make_flow_train_step(spec: INRSpec, cfg: FlowConfig, ctrl_cfg, tx):
    """Returns jitted fn(state, consts, batch) -> (state, metrics)."""

    def step(state: FlowTrainState, consts, batch):
        grads, aux = jax.grad(
            lambda p: flow_loss(spec, cfg, p, consts, ctrl_cfg,
                                state.ctrl_state, batch),
            has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        ctrl_state = state.ctrl_state
        if ctrl_state is not None:
            if isinstance(ctrl_state, ctrl.SpatialState):
                if ctrl_cfg.mask_dim == 3:
                    _, h, w, _ = batch["frame1"].shape
                    ctrl_state = ctrl.spatial_grid_update(
                        ctrl_cfg, ctrl_state, aux["point_loss"],
                        batch["times"], h, w)
                else:
                    ctrl_state = ctrl.spatial_update(
                        ctrl_cfg, ctrl_state, aux["point_loss"],
                        aux["stash"]["inds"], aux["stash"]["alphas"])
            else:
                ctrl_state = ctrl.linear_update(ctrl_cfg, ctrl_state,
                                                aux["loss"])
        metrics = {k: v for k, v in aux.items()
                   if k not in ("stash", "point_loss")}
        return FlowTrainState(params, opt_state, ctrl_state,
                              state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_flow_infer(spec: INRSpec, cfg: FlowConfig, ctrl_cfg):
    """Jitted fn(params, consts, ctrl_state, times, scale) -> (flow12, flow21)."""

    def infer(params, consts, ctrl_state, times, scale, h: int, w: int):
        f12, f21, _ = flow_forward(spec, params, consts, ctrl_cfg, ctrl_state,
                                   times, h, w, scale)
        return f12, f21

    return jax.jit(infer, static_argnums=(5, 6))


def make_frame_interp(spec: INRSpec, cfg: FlowConfig, ctrl_cfg):
    """Jitted mid-frame synthesizer — the video-interpolation capability the
    reference repo is named for but never ships as an op (softsplat.py
    provides the kernel, trainer.py only uses it inside the training loss).

    Softsplat-paper interpolation (Niklaus & Liu) on the fitted INR: query
    flow12 at the earlier frame's time and flow21 at the later one's,
    forward-splat each endpoint frame toward the intermediate time
    t0 + alpha*(t1-t0) along alpha-scaled flow with the same -20*L1
    photometric softmax metric the training step uses, then blend the two
    splats with (1-alpha, alpha) weights gated on splat coverage;
    uncovered pixels (holes in BOTH splats) fall back to the cross-fade.
    alpha in [0, 1] is a traced scalar: one compiled program serves every
    subdivision, and alpha=0 / alpha=1 reproduce the endpoint frames
    exactly (zero-flow softmax splat is the identity).

    Both flow directions are queried at the PAIR's time t0: the trainer
    conditions flow12 AND flow21 of pair (i, i+1) on frame i's time
    (trainer.py:37-45 — one pose grid per batch element), so flow21(t0)
    is the backward motion of this pair; flow21(t1) would belong to the
    next one.

    Returns jitted fn(params, consts, ctrl_state, t0 (scalar),
    frames2 (2, H, W, 3), alpha, scale) -> (H, W, 3)."""

    def interp(params, consts, ctrl_state, t0, frames2, alpha, scale):
        h, w = frames2.shape[1:3]
        cfg_l = cfg
        if any(isinstance(getattr(cfg_l, f), str) for f in
               ("splat_max_dy", "splat_max_dx",
                "splat_local_dy", "splat_local_dx")):
            # direct callers that bypassed the driver: never ENGAGE local
            # windows from a bare 'auto' — there is no deviation evidence
            # at inference (the driver applies the training run's probed
            # bounds via the window_bounds sidecar before building this)
            if cfg_l.splat_local_dy == "auto":
                cfg_l = cfg_l.replace(splat_local_dy="off",
                                      splat_local_dx="off")
            cfg_l = cfg_l.resolve_splat_bounds(h, w)
        warp, splat_cov, local = _splat_ops(cfg_l)
        f12, f21, _ = flow_forward(spec, params, consts, ctrl_cfg,
                                   ctrl_state, jnp.reshape(t0, (1,)),
                                   h, w, scale)
        frame0, frame1 = frames2[0:1], frames2[1:2]
        flow01, flow10 = f12[0:1], f21[0:1]
        alpha = jnp.asarray(alpha, frames2.dtype)
        # photometric-consistency splat metrics, as in the train step.
        # Local-window offsets are per-flow: the alpha-scaled splat flows
        # get their own bundles (alpha is traced — offsets follow it).
        m0 = jnp.mean(jnp.abs(frame0 - warp(frame1, flow01,
                                            _flow_offsets(flow01, local))),
                      axis=-1, keepdims=True)
        m1 = jnp.mean(jnp.abs(frame1 - warp(frame0, flow10,
                                            _flow_offsets(flow10, local))),
                      axis=-1, keepdims=True)
        s0, c0 = splat_cov(frame0, alpha * flow01, -20.0 * m0,
                           _flow_offsets(alpha * flow01, local))
        s1, c1 = splat_cov(frame1, (1.0 - alpha) * flow10, -20.0 * m1,
                           _flow_offsets((1.0 - alpha) * flow10, local))
        w0 = (1.0 - alpha) * (c0 > 0.0).astype(frames2.dtype)
        w1 = alpha * (c1 > 0.0).astype(frames2.dtype)
        den = w0 + w1
        fade = (1.0 - alpha) * frame0 + alpha * frame1
        blend = jnp.where(den > 0.0,
                          (w0 * s0 + w1 * s1) / jnp.maximum(den, 1e-8),
                          fade)
        return blend[0]

    return jax.jit(interp)


def epe(flow: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """End-point error (trainer.py:58)."""
    return jnp.mean(jnp.sqrt(jnp.sum((flow - gt) ** 2, axis=-1)))
