"""Functional train loops: the Lightning-Trainer replacement.

Owns what ``pl.Trainer`` did for the reference (main.py:108-118,
video-interpolation/main.py:72-80): epoch loop, validation cadence,
checkpoint cadence, latest-checkpoint resume, metrics, and post-train
rendering — but with jitted steps and explicit state pytrees. The
fault-tolerance story is the reference's (scan the checkpoint dir, resume the
newest — SURVEY §5) made first-class via CheckpointStore.
"""

from __future__ import annotations

import logging
import os
import os.path as path
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sin_inn_tpu.core import compile_cache
from sin_inn_tpu.core.checkpoint import CheckpointStore
from sin_inn_tpu.core.config import FlowConfig, SRConfig
from sin_inn_tpu.core.metrics import MetricsWriter
from sin_inn_tpu.core.preempt import GracefulStop
from sin_inn_tpu.core.profiler import TraceWindow
from sin_inn_tpu.core import rng as R
from sin_inn_tpu.data import flow_media
from sin_inn_tpu.data.flow_viz import flow_to_image
from sin_inn_tpu.data.flo import write_flo
from sin_inn_tpu.data.sr_video import SRVideo, make_datasets
from sin_inn_tpu.io.video_io import VideoWriter
from sin_inn_tpu.ops.occlusion import OCCLUSIONS
from sin_inn_tpu.parallel.mesh import initialize_distributed, make_mesh
from sin_inn_tpu.parallel.sharding import place_batch, place_state
from sin_inn_tpu.train import flow as FT
from sin_inn_tpu.train import sr as SR


# ===========================================================================
# Multi-chip plumbing shared by both pipelines
# ===========================================================================

def resolve_mesh(mesh_data: Optional[int], mesh_model: int = 1,
                 batch_size: Optional[int] = None):
    """Build the production mesh, or None for single-device runs.

    ``mesh_data=None`` auto-uses the visible devices when more than one is
    present (the multi-GPU capability Lightning gave the reference via
    ``gpus=`` — /root/reference/main.py:112, video-interpolation/main.py:72),
    shrinking the data axis to the largest divisor of ``batch_size`` so DP
    stays exact; ``mesh_data=1`` with ``mesh_model=1`` forces single-device.
    An *explicit* ``mesh_data`` that does not divide the batch raises.
    """
    model = max(int(mesh_model or 1), 1)
    n = len(jax.devices())
    if model > 1 and n // model < 1:
        # an explicit TP request that cannot be satisfied must not silently
        # degrade to single-device
        raise ValueError(f"mesh_model={model} exceeds the {n} visible devices")
    if mesh_data is None:
        data = n // model if n > 1 else 1
        if batch_size is not None and data > 1:
            while data > 1 and batch_size % data != 0:
                data -= 1
    else:
        data = int(mesh_data)
        if batch_size is not None and data > 1 and batch_size % data != 0:
            raise ValueError(
                f"batch_size={batch_size} not divisible by mesh data axis "
                f"{data}; choose a divisible batch or a smaller mesh_data")
    if data * model <= 1:
        return None
    return make_mesh(data=data, model=model,
                     devices=jax.devices()[:data * model])


# ===========================================================================
# SR pipeline
# ===========================================================================

def sr_dirs(cfg: SRConfig, operation: str):
    exp_dir = path.join(cfg.working_dir, operation, cfg.exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    return exp_dir


_log = logging.getLogger(__name__)


def _warn_ckpt_overrides_import(cfg, store: CheckpointStore):
    """One precedence rule for every driver (train/test/export, both
    pipelines): an existing framework checkpoint wins over ``--import-torch``
    — the import seeds a run, resume continues one, so ``test`` after
    ``train --import-torch`` renders the *trained* weights. When both
    sources exist the override is loud, and the torch.load + schema
    validation are skipped entirely (they could not take effect)."""
    step = store.latest_step()
    if cfg.import_torch and step is not None:
        _log.warning(
            "--import-torch %s ignored: framework checkpoint at %s "
            "(step %d) takes precedence. Delete that checkpoint dir or "
            "point --resume_state/--checkpoints elsewhere to run from the "
            "imported weights.", cfg.import_torch, store.directory, step)
        return cfg.replace(import_torch=None)
    return cfg


def _sr_create_and_restore(cfg: SRConfig, init_key, require: str = ""):
    """create_train_state + latest-scan restore (one code path for
    train/test/export). Restore source = ``--resume_state`` when given, else
    the experiment's own train checkpoint dir; ``require`` (an error
    message) makes a missing checkpoint fatal unless ``--import-torch``
    supplied the weights. Returns (spec, state, tx, store, start_epoch)."""
    store = CheckpointStore(
        cfg.resume_state or path.join(sr_dirs(cfg, "train"), "checkpoints"))
    spec, state, tx = SR.create_train_state(
        init_key, _warn_ckpt_overrides_import(cfg, store))
    restored, step = store.restore(state)
    if restored is not None:
        return (spec, jax.tree_util.tree_map(jnp.asarray, restored), tx,
                store, int(step))
    if cfg.resume_state:
        # an EXPLICIT resume request must never silently fall back to a
        # fresh run (a typo'd path would otherwise restart from scratch)
        raise FileNotFoundError(
            f"--resume_state {cfg.resume_state}: no checkpoint found there")
    if require and not cfg.import_torch:
        raise FileNotFoundError(require)
    return spec, state, tx, store, 0


def run_sr_train(cfg: SRConfig, video: Optional[SRVideo] = None,
                 use_wandb: bool = False) -> Dict:
    """SR training driver (reference main.py:85-118 + lit_wrapper loop).

    Multi-chip is first-class: with >1 visible device (or explicit
    ``cfg.mesh_data``/``cfg.mesh_model``) the state is placed on a mesh
    (params replicated, optional TP over glow subnet hidden channels) and
    every batch is DP-sharded over ``data`` — XLA inserts the grad psum over
    ICI. Single-device runs take the exact same code path with mesh=None.
    """
    compile_cache.enable()
    if cfg.distributed:
        initialize_distributed(cfg.dist_coordinator, cfg.dist_num_processes,
                               cfg.dist_process_id)
    video = video or SRVideo.from_dirs(cfg)
    sup, unsup, val = make_datasets(video, cfg)

    key = R.root_key(cfg.random_seed)

    # auto-tuning (reference main.py:108-109: Lightning auto_scale_batch_size
    # then auto_lr_find, before the real fit)
    if cfg.auto_batch:
        from sin_inn_tpu.train.tuner import find_batch_size
        mk = lambda b: jax.device_put(
            sup.gather(np.arange(b) % max(len(sup), 1)))
        bs = find_batch_size(cfg, mk, R.named_fold(key, "tune"),
                             start=cfg.batch_size)
        cfg = cfg.replace(batch_size=bs)
    if cfg.auto_lr:
        from sin_inn_tpu.train.tuner import find_lr
        probe = jax.device_put(
            sup.gather(np.arange(cfg.batch_size) % max(len(sup), 1)))
        lr = find_lr(cfg, probe, R.named_fold(key, "tune"))
        cfg = cfg.replace(learning_rate=lr)

    mesh = resolve_mesh(cfg.mesh_data, cfg.mesh_model,
                        batch_size=cfg.batch_size)
    spec, state, tx, store, start_epoch = _sr_create_and_restore(
        cfg, R.named_fold(key, "init"))
    step = SR.make_train_step(spec, cfg, tx)
    eval_step = SR.make_eval_step(spec, cfg)

    exp_dir = sr_dirs(cfg, "train")
    if cfg.resume_state:
        # --resume_state restores from elsewhere (reference main.py:115);
        # new checkpoints still belong to THIS experiment's dir
        store = CheckpointStore(path.join(exp_dir, "checkpoints"))
    writer = MetricsWriter(exp_dir, run_name=cfg.exp_name,
                           use_wandb=use_wandb, wandb_project="sin-inn",
                           hyperparams=cfg.__dict__)
    if mesh is not None:
        state = place_state(mesh, state, model_parallel=cfg.mesh_model > 1)

    step_key = R.named_fold(key, "train")
    use_tcr = cfg.lambda_bwd_tcr > 0
    last_metrics: Dict = {}
    sample_infer = None
    t0 = time.time()
    frames_done = 0
    # the supervised set of a single video fits in HBM: pin all batches on
    # device once; each epoch replays them with zero host work
    cached = sup.device_cache(cfg.batch_size, mesh=mesh)
    # allow_uneven: ragged final batches (len(sup) % batch_size != 0)
    # replicate instead of crashing device_put's divisibility check
    place = ((lambda b: place_batch(mesh, b, allow_uneven=True))
             if mesh is not None else jax.device_put)
    # val batches are static across the run: pin them on device once, like
    # the train batches (the host has one core; re-gathering every print
    # cadence is wasted work)
    val_cached = val.device_cache(cfg.val_batch_size, mesh=mesh)
    # --profile N: one jax.profiler trace of N post-warmup steps
    tracer = TraceWindow(path.join(store.directory, "trace"),
                         cfg.profile_steps)
    # SIGTERM/SIGINT -> finish the epoch, checkpoint, return (preemption)
    stop = GracefulStop().install()
    for epoch in range(start_epoch, cfg.epochs):
        for sup_batch in cached:
            unsup_batch = (place(
                unsup.random_batch(sup_batch["hr"].shape[0]))
                if use_tcr else None)
            state, aux = step(state, sup_batch, unsup_batch, step_key)
            tracer.tick(aux["loss"])
            frames_done += int(sup_batch["hr"].shape[0])

        if (epoch + 1) % cfg.print_iter == 0 or epoch == cfg.epochs - 1:
            # full val split, sample-weighted mean (reference evaluates the
            # entire VideoValDataset via Lightning — lit_wrapper.py:79-89)
            # accumulate per-batch metrics ON DEVICE; one host fetch per
            # metric at the end (each float() is a ~27 ms relay sync)
            vm_acc: Dict = {}
            vn = 0
            for vi, vb in enumerate(val_cached):
                vm = eval_step(state.params, vb,
                               R.step_key(R.named_fold(key, "val"),
                                          epoch * 10_000 + vi))
                nb = int(vb["hr"].shape[0])
                for k, v in vm.items():
                    vm_acc[k] = vm_acc.get(k, 0.0) + v * nb
                vn += nb
            # SR sample-frame media (wandb) — one reconstructed HR frame
            if writer.wants_media and val_cached:
                if sample_infer is None:
                    sample_infer = SR.make_infer_step(spec, cfg)
                fr = sample_infer(state.params, val_cached[0]["lr"][:1],
                                  R.step_key(R.named_fold(key, "media"),
                                             epoch))
                writer.log_image(epoch, "media/sample_hr",
                                 np.asarray(fr)[0])
            last_metrics = {k: float(v) for k, v in aux.items()}
            last_metrics.update(
                {k: float(v) / max(vn, 1) for k, v in vm_acc.items()})
            last_metrics["frames_per_sec"] = frames_done / max(
                time.time() - t0, 1e-9)
            writer.log(epoch, last_metrics)

        saved = (epoch + 1) % cfg.save_iter == 0 or epoch == cfg.epochs - 1
        if saved:
            store.save(epoch + 1, state)
        if stop:
            if not saved:
                store.save(epoch + 1, state)
            break

    stop.restore()
    tracer.close()
    writer.close()
    return {"state": state, "spec": spec, "metrics": last_metrics,
            "exp_dir": exp_dir, "start_epoch": start_epoch}


def run_sr_test(cfg: SRConfig, video: Optional[SRVideo] = None,
                state=None, spec=None, save_video: Optional[str] = None,
                save_images: bool = False) -> str:
    """SR inference driver (reference main.py:120-137 + infer).

    ``save_images=True`` dumps PNG frames to a directory instead of encoding
    a video (reference lit_wrapper.py:117-122 — whose own ``save_path`` was
    an undefined-variable bug; here it is a first-class mode)."""
    video = video or SRVideo.from_dirs(cfg)
    _, unsup, _ = make_datasets(video, cfg)
    key = R.root_key(cfg.random_seed)
    if state is None:
        # with --import-torch and no framework checkpoint, the fresh state
        # already carries the reference checkpoint's weights (train/sr.py)
        spec, state, _, _, _ = _sr_create_and_restore(
            cfg, R.named_fold(key, "init"), require="no checkpoint to test from")

    infer = SR.make_infer_step(spec, cfg)
    exp_dir = sr_dirs(cfg, "test")
    unsup.shuffle = False
    infer_key = R.named_fold(key, "infer")

    def frame_iter():
        for i, batch in enumerate(unsup.batches(cfg.val_batch_size)):
            frames = infer(state.params, jax.device_put(batch["lr"]),
                           R.step_key(infer_key, i))
            yield from np.asarray(frames)

    if save_images:
        from sin_inn_tpu.io.video_io import write_frames
        img_dir = path.join(exp_dir,
                            f"{cfg.architecture}_{cfg.suffix}_t{cfg.temp}")
        write_frames(img_dir, frame_iter(),
                     prefix=f"{cfg.architecture}_{cfg.suffix}")
        return img_dir

    out = save_video or path.join(
        exp_dir, f"{cfg.architecture}_{cfg.suffix}_t{cfg.temp}.avi")
    with VideoWriter(out, fps=30) as vw:
        for f in frame_iter():
            vw.add(f)
    return vw.path


def run_sr_export(cfg: SRConfig, out: Optional[str] = None) -> str:
    """Export the latest framework SR checkpoint as a reference-loadable
    torch state_dict (the reverse of ``--import-torch``)."""
    from sin_inn_tpu.models import torch_import as TI

    key = R.root_key(cfg.random_seed)
    spec, state, _, _, _ = _sr_create_and_restore(
        cfg, R.named_fold(key, "init"), require="no checkpoint to export")
    out = out or path.join(sr_dirs(cfg, "train"),
                           f"{cfg.architecture}_{cfg.suffix}_export.ckpt")
    return TI.save_reference_checkpoint(
        out, TI.export_state_dict(spec, state.params))


# ===========================================================================
# Flow pipeline
# ===========================================================================

def flow_ckpt_dir(cfg: FlowConfig, scene: str) -> str:
    return path.join(cfg.checkpoints_dir, scene, cfg.name)


def _flow_ckpt_format_is_combined(store: CheckpointStore) -> bool:
    """True if the latest flow checkpoint carries the round-3 combined
    ``{"state", "consts"}`` layout. Probed via orbax metadata (no restore),
    and broadcast from process 0 in multi-process runs so every process
    picks the SAME restore template — a per-process try/except around the
    restore would diverge the broadcast collectives inside
    ``CheckpointStore.restore`` on legacy files."""
    combined = False
    step = store.latest_step()
    if step is not None:
        try:
            import orbax.checkpoint as ocp
            with ocp.PyTreeCheckpointer() as ck:
                md = ck.metadata(store._path(step))
            combined = "consts" in getattr(md, "item_metadata", md)
        except Exception:
            combined = False
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        combined = bool(int(multihost_utils.broadcast_one_to_all(
            np.int64(1 if combined else 0))))
    return combined


def _flow_create_and_restore(cfg: FlowConfig, init_key, scene: str,
                             require: str = ""):
    """create_flow_state + latest-scan restore (one code path for
    train/test/export/sintel).

    Flow checkpoints carry the encoding consts alongside the train state
    (``{"state", "consts"}``): consts stopped being a pure function of the
    config when ``--import-torch`` landed (they may hold a reference
    checkpoint's encoding buffers), and a restore must never silently pair
    trained params with freshly seeded buffers — that also guards a resume
    under a changed ``--random-seed``. Legacy bare-state checkpoints
    (detected by the metadata probe below, process-0-consistent) restore
    with the config-derived consts, which is exactly what writing them
    would have recorded.
    Returns (spec, state, consts, ctrl_cfg, tx, store, start_epoch)."""
    store = CheckpointStore(flow_ckpt_dir(cfg, scene))
    spec, state, consts, ctrl_cfg, tx = FT.create_flow_state(
        init_key, _warn_ckpt_overrides_import(cfg, store))
    as_arr = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    combined = _flow_ckpt_format_is_combined(store)
    try:
        restored, step = store.restore(
            {"state": state, "consts": consts} if combined else state)
    except ValueError:
        # metadata probe mis-detected the layout (unexpected orbax
        # format): retry with the other template (single-process backstop)
        combined = not combined
        restored, step = store.restore(
            {"state": state, "consts": consts} if combined else state)
    if restored is not None:
        if combined:
            return (spec, as_arr(restored["state"]),
                    as_arr(restored["consts"]), ctrl_cfg, tx, store,
                    int(step))
        return (spec, as_arr(restored), consts, ctrl_cfg, tx, store,
                int(step))
    if require and not cfg.import_torch:
        raise FileNotFoundError(require)
    return spec, state, consts, ctrl_cfg, tx, store, 0


def _scene_flow_dir(flow_dir, scene: str):
    """Multi-scene drivers treat an explicit flow_dir as a ROOT of per-scene
    subdirectories (like the Sintel ../../flow/<scene> convention); one flat
    .flo dir must not be attached to every scene."""
    if not flow_dir:
        return None
    sub = path.join(flow_dir, scene)
    return sub if path.isdir(sub) else None


def _q16(v) -> int:
    """Global window bound from a measured max |flow|: 1.5x safety margin,
    rounded up to the 16 px window quantization, floor 16. ONE formula
    shared by the GT probe and the mid-training refit — their agreement
    (no widen/tighten oscillation across the two paths) is an invariant."""
    return max(16, int(-(-(1.5 * float(v)) // 16) * 16))


def _q8p(v) -> int:
    """Local row bound from a measured per-tile deviation: 1.5x margin +
    3 px resample-normalization allowance, sublane(8)-rounded, floor 8.
    Shared by the GT probe and the refit (same invariant as `_q16`)."""
    return max(8, int(-(-(1.5 * float(v) + 3.0) // 8) * 8))


_WINDOW_BOUND_KEYS = ("splat_max_dy", "splat_max_dx",
                      "splat_local_dy", "splat_local_dx")


def _save_window_bounds(directory: str, cfg: FlowConfig,
                        fh: int, fw: int, hist: Optional[Dict] = None
                        ) -> None:
    """Persist the EFFECTIVE (probed/refitted) window bounds next to the
    checkpoints. Bounds are derived from measured flow (the GT probe, the
    mid-training refit) but live in the config, not the checkpointed
    pytrees — without this sidecar a preemption resume or a later
    test/interpolate invocation re-resolves the raw 'auto' markers and
    silently loses every probe/refit decision (round-3 review).

    ``hist`` is the refit monitor's all-time flow-stat maxima: without it a
    RESUMED run starts with empty history, re-tightens on thin evidence,
    and oscillates (measured round 4: a 1400-epoch resume tightened dy at
    epoch 406 on 3.8 px of fresh history, then re-widened at 1106 — two
    recompiles the historical-max rule exists to prevent)."""
    import json
    if jax.process_index() != 0:     # multi-host: single-writer, like ckpts
        return
    with open(path.join(directory, "window_bounds.json"), "w") as f:
        json.dump({"fh": fh, "fw": fw,
                   **{k: getattr(cfg, k) for k in _WINDOW_BOUND_KEYS},
                   "hist": hist or {}}, f)


def _load_window_hist(directory: str, fh: int, fw: int) -> Dict:
    """The persisted refit-monitor maxima (empty when absent/size-invalid)."""
    import json
    p = path.join(directory, "window_bounds.json")
    try:
        with open(p) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    if (data.get("fh"), data.get("fw")) != (fh, fw):
        return {}
    return {k: float(v) for k, v in data.get("hist", {}).items()
            if v is not None}


def _load_window_bounds(cfg: FlowConfig, directory: str,
                        fh: int, fw: int) -> "tuple[FlowConfig, bool]":
    """Apply persisted effective bounds to every axis still on 'auto' (an
    explicit pin given NOW wins over the sidecar). Bounds are pixels at
    the train frame size — a different target size invalidates them.
    Returns (cfg, sidecar_found_and_valid)."""
    import json
    p = path.join(directory, "window_bounds.json")
    if not path.exists(p):
        return cfg, False
    try:
        with open(p) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return cfg, False
    if (data.get("fh"), data.get("fw")) != (fh, fw):
        return cfg, False
    upd = {k: data[k] for k in _WINDOW_BOUND_KEYS
           if k in data and getattr(cfg, k) == "auto"}
    return (cfg.replace(**upd) if upd else cfg), True


def _inference_bounds(cfg: FlowConfig) -> FlowConfig:
    """Inference drivers run without the train loop's monitor/refit: any
    LOCAL bound still on 'auto' (i.e. no persisted train-time evidence
    applied) resolves OFF — engaging local windows without deviation
    evidence silently drops taps on incoherent scenes that the train-time
    GT probe would have kept on static windows. Global 'auto' bounds keep
    their size-scaled defaults (the pre-local behavior)."""
    upd = {k: "off" for k in ("splat_local_dy", "splat_local_dx")
           if getattr(cfg, k) == "auto"}
    return cfg.replace(**upd) if upd else cfg


def _resolve_and_probe_splat_bounds(cfg: FlowConfig, media,
                                    fh: int, fw: int) -> FlowConfig:
    """Materialize 'auto' splat-window bounds for the loaded frame size
    (the tuned windowed path is the default — VERDICT r2 weak #1), then,
    when GT/pseudo-GT flow exists, probe its magnitude and re-derive every
    bound left on 'auto' (an explicit int pins that axis, config.py
    contract):

      * GLOBAL bounds move to 1.5x the observed max |flow| rounded to 16 —
        TIGHTENED for slow scenes (smaller windows shrink the dense
        contractions quadratically) and WIDENED for fast ones (coverage
        first: a probe that says flows will outgrow the size-scaled
        default must widen it, not warn after the fact). A probe at or
        beyond half the frame disables windowing entirely (the window
        would cover most of the image — exact scatter is the honest
        fallback, loudly logged).
      * LOCAL bounds move to the measured per-tile DEVIATION — the actual
        drop criterion — so fast-but-coherent scenes keep slow-scene
        FLOPs: the widened global bound is only padding (the offset cap)
        on the local path. Row bound: 1.5x the quantized-offset deviation
        + 3 px resample-normalization margin, sublane-rounded. Column
        bound (probe-only — never engaged without GT evidence): 64 px of
        lane-tiling quantization + 1.5x the FINE deviation + 3 px,
        engaged only when the padded window shrinks at lane granularity.

    The per-save-cadence monitor still warns loudly if training flow ever
    outgrows the chosen windows."""
    was_auto_dy = cfg.splat_max_dy == "auto"
    was_auto_dx = cfg.splat_max_dx == "auto"
    was_auto_ldy = cfg.splat_local_dy == "auto"
    was_auto_ldx = cfg.splat_local_dx == "auto"
    # the RAW local values must survive the global probe:
    # resolve_splat_bounds may null a pinned local bound against the
    # PRE-probe globals (no lane-granular shrink there), but the probe can
    # widen the globals to where the pin does shrink the window — the
    # dependent re-resolution below restarts from the user's values
    raw_ldy, raw_ldx = cfg.splat_local_dy, cfg.splat_local_dx
    cfg = cfg.resolve_splat_bounds(fh, fw)
    have_gt = (getattr(media, "gt_available", False)
               and media.flow is not None)
    if ((was_auto_dy or was_auto_dx) and have_gt
            and isinstance(cfg.splat_max_dy, int)):
        probe_dx = _q16(np.abs(media.flow[..., 0]).max())
        probe_dy = _q16(np.abs(media.flow[..., 1]).max())
        dy = probe_dy if was_auto_dy else cfg.splat_max_dy
        dx = (probe_dx if was_auto_dx and cfg.splat_max_dx is not None
              else cfg.splat_max_dx)
        if (was_auto_dy and dy >= fh // 2) or (was_auto_dx and dx is not None
                                               and dx >= fw // 2):
            if was_auto_dy and (was_auto_dx or dx is None):
                logging.getLogger(__name__).warning(
                    "GT flow probe (|dy| window %s, |dx| window %s) reaches "
                    "half the %dx%d frame — windowing buys nothing; falling "
                    "back to the exact scatter splat/warp.", dy, dx, fh, fw)
                dy = dx = None
                raw_ldy = raw_ldx = None
            else:
                # an explicitly pinned global axis is a request for the
                # windowed path (the same contract that makes
                # resolve_splat_bounds keep windowing on tiny frames when
                # dx is pinned): keep it, the auto axis just widened to
                # cover the probe
                logging.getLogger(__name__).warning(
                    "GT flow probe widened the auto window bound past half "
                    "the %dx%d frame (|dy| %s, |dx| %s) but the other axis "
                    "is pinned — keeping the windowed path.", fh, fw, dy, dx)
        # re-run the dependent local-bound resolution against the probed
        # globals from the RAW user values ('auto' ldy was resolved from
        # the pre-probe dy; a pinned local may engage only now)
        cfg = cfg.replace(splat_max_dy=dy, splat_max_dx=dx,
                          splat_local_dy=raw_ldy, splat_local_dx=raw_ldx)
        cfg = cfg.resolve_splat_bounds(fh, fw)
    if was_auto_ldy and cfg.splat_local_dy is not None and have_gt:
        from sin_inn_tpu.ops.pallas.offsets import tile_flow_offsets
        from sin_inn_tpu.ops.pallas.splat import _B, _CB

        dy = cfg.splat_max_dy
        capy = -(-dy // 8) * 8
        offs = tile_flow_offsets(jnp.asarray(media.flow), _B, _CB, capy, 0)
        dev_y = float(jnp.maximum(offs.dev_src[1], offs.dev_out[1]))
        ldy = max(8, int(-(-(1.5 * dev_y + 3.0) // 8) * 8))
        cfg = cfg.replace(splat_local_dy=ldy if ldy < dy else None)
    if (was_auto_ldx and have_gt
            and isinstance(cfg.splat_local_dy, int)
            and isinstance(cfg.splat_max_dx, int)):
        from sin_inn_tpu.ops.pallas.offsets import tile_deviation_fine
        from sin_inn_tpu.ops.pallas.splat import _B, _CB

        dx = cfg.splat_max_dx
        dev_x = float(tile_deviation_fine(jnp.asarray(media.flow),
                                          _B, _CB)[0])
        # 64 = the exact (non-drifting) lane-quantization budget; the 1.5x
        # safety factor applies only to the training-drift-prone deviation
        ldx = 64 + max(0, int(-(-(1.5 * dev_x + 3.0) // 64) * 64))
        if -(-(128 + 2 * ldx) // 128) < -(-(128 + 2 * dx) // 128):
            cfg = cfg.replace(splat_local_dx=ldx)
    return cfg


def _refit_window_bounds(cfg: FlowConfig, auto: Dict, fh: int, fw: int,
                         since: Dict, hist: Dict,
                         allow_tighten: bool) -> "Optional[FlowConfig]":
    """Mid-training window-bound refit from the monitor's measured flow
    stats (the actual drop criteria). Returns the refitted config, or None
    when nothing should change.

    ``auto`` marks which bounds the user left on 'auto' — only those may
    move (same per-axis pinning contract as the GT probe). ``since`` /
    ``hist`` are running maxima of the monitor stats {fy, fx: max |flow|;
    dvy, dvx: max per-tile deviation vs the offsets in use, present only
    in local mode} since the last refit / since training start. Rules
    mirror the GT probe's formulas (1.5x margins, same quantizations):

      * WIDEN an axis as soon as its stat crosses the warn threshold
        (bound - 1 px magnitude / bound - 3 px deviation) — coverage
        first: out-of-window taps are DROPPED, so the monitor's warning
        becomes an action. A widened global bound at/past half the frame
        drops to the exact scatter (windowing buys nothing there) —
        unless a global axis is explicitly pinned, which is a standing
        request for the windowed path (same rule as the GT probe).
        A row-local bound dropped by a transient global tighten
        RE-ENGAGES from the historical deviation evidence once the
        global bound re-widens past it (plus the same slack quantum).
      * TIGHTEN only when ``allow_tighten`` (the driver enables it after
        epochs/5, once training flow has stabilized) and only against
        ``hist`` — the historical max is monotone, so a bound never
        re-tightens below flow levels already observed: no
        widen/tighten oscillation. Tightening requires at least one
        quantization quantum of slack (16 px global, 8 sublane-local,
        64 lane-local) so refits don't churn recompiles.

    The local column bound can move but never ENGAGE here: in row-only
    mode the monitor's dev_x is the plain |flow_x| magnitude, not the
    fine per-tile deviation the engagement formula needs (that stays the
    GT probe's job, loop.py `_resolve_and_probe_splat_bounds`)."""
    dy, dx = cfg.splat_max_dy, cfg.splat_max_dx
    if not dy:
        return None          # exact ops: no windows (and no monitor stats)
    ldy, ldx = cfg.splat_local_dy, cfg.splat_local_dx
    # x-local bound from the monitor's dvx: unlike the GT probe's
    # engagement formula (fine deviation + explicit 64 px quantization
    # budget), the monitor's deviation is measured against the QUANTIZED
    # offsets in use, so the quantization error is already inside it —
    # one margin, floor = the 128 engagement minimum
    to64p = lambda v: max(128, int(-(-(1.5 * v + 3.0) // 64) * 64))
    new: Dict = {}
    if auto["dy"]:
        if since["fy"] > dy - 1:
            new["splat_max_dy"] = max(_q16(since["fy"]), dy + 16)
        elif allow_tighten and _q16(hist["fy"]) <= dy - 16:
            new["splat_max_dy"] = _q16(hist["fy"])
    if auto["dx"] and dx is not None:
        if since["fx"] > dx - 1:
            new["splat_max_dx"] = max(_q16(since["fx"]), dx + 16)
        elif allow_tighten and _q16(hist["fx"]) <= dx - 16:
            new["splat_max_dx"] = _q16(hist["fx"])
    ndy = new.get("splat_max_dy", dy)
    ndx = new.get("splat_max_dx", dx)
    if (auto["dy"] and ndy >= fh // 2) or (
            auto["dx"] and ndx is not None and ndx >= fw // 2):
        if auto["dy"] and (auto["dx"] or ndx is None):
            # same exact-scatter fallback as the GT probe past half the
            # frame — but only when no global axis is pinned: an explicit
            # pin is a request for the windowed path (probe contract)
            return cfg.replace(splat_max_dy=None, splat_max_dx=None,
                               splat_local_dy=None, splat_local_dx=None)
    if ldy is not None:
        if auto["ldy"] and since.get("dvy") is not None:
            if since["dvy"] > ldy - 3:
                new["splat_local_dy"] = max(_q8p(since["dvy"]), ldy + 8)
            elif allow_tighten and _q8p(hist["dvy"]) <= ldy - 8:
                new["splat_local_dy"] = _q8p(hist["dvy"])
        nldy = new.get("splat_local_dy", ldy)
        if nldy is not None and nldy >= ndy:
            # the static window is already tighter (possibly because the
            # global dy just tightened): drop local mode — the same
            # normalization resolve_splat_bounds applies
            new["splat_local_dy"] = None
            new["splat_local_dx"] = None
        elif (ldx is not None and auto["ldx"] and ndx is not None
              and since.get("dvx") is not None):
            if since["dvx"] > ldx - 3:
                new["splat_local_dx"] = max(to64p(since["dvx"]), ldx + 64)
            elif allow_tighten and to64p(hist["dvx"]) <= ldx - 64:
                new["splat_local_dx"] = to64p(hist["dvx"])
            nldx = new.get("splat_local_dx", ldx)
            if (nldx is not None and -(-(128 + 2 * nldx) // 128)
                    >= -(-(128 + 2 * ndx) // 128)):
                # no lane-granular window shrink left vs the global dx
                new["splat_local_dx"] = None
    elif (auto["ldy"] and ndx is not None
          and hist.get("dvy") is not None):
        # RE-ENGAGE row-local mode: a refit drop (transient global
        # tighten below the local bound) must not forfeit the local-window
        # speed path forever. The historical deviation maximum is real
        # evidence (recorded while local mode ran); the same one-quantum
        # slack rule as tightening prevents drop/re-engage churn. When
        # local mode was never on (no dvy history — e.g. the GT probe
        # disabled it on measured deviation), this stays off. Deviation is
        # UNMONITORED while local mode is off, so the historical max may be
        # stale-low: re-engage with one extra slack quantum on top of the
        # usual one (advisor r3) — the first post-re-engage cadence of
        # fresh dvy can then tighten it back under the normal rule.
        cand = _q8p(hist["dvy"]) + 8
        if cand <= ndy - 8:
            new["splat_local_dy"] = cand
    if not new or all(getattr(cfg, k) == v for k, v in new.items()):
        return None
    return cfg.replace(**new)


def _maybe_pseudo_gt(cfg: FlowConfig, media, scene: str):
    """Attach producer-generated pseudo-GT flow when the media has no GT —
    the reference's pre-train RAFT pass (video-interpolation/data.py:32-62)
    as a cached, pluggable pre-pass. The cache dir is keyed by scene, frame
    size, frame sampling (step/end), and the producer spec, so reruns reuse
    the .flo files while any change that alters the frame pairs or the
    producer regenerates instead of silently loading stale flow."""
    if (media is None or not cfg.flow_producer
            or getattr(media, "gt_available", False)):
        return media
    import hashlib

    producer = flow_media.resolve_producer(cfg.flow_producer)
    key = f"{cfg.flow_producer}|step={cfg.step}|end={cfg.end}"
    tag = hashlib.sha1(key.encode()).hexdigest()[:8]
    out = path.join(cfg.checkpoints_dir, "pseudo_gt",
                    f"{scene}_h{media.video.shape[1]}_{tag}")
    return flow_media.attach_pseudo_gt(media, producer, out)


def run_flow_train(cfg: FlowConfig, media=None, scene: str = "scene",
                   use_wandb: bool = False, val_media=None,
                   keep_writer: bool = False) -> Dict:
    """Flow training driver (reference video-interpolation/main.py:52-80).

    Multi-chip: the frame-pair batch is DP-sharded over the mesh ``data``
    axis (the SP-analog for this workload, SURVEY §2.5); params replicate.
    At ``val_iter`` cadence a held-out validation pass computes val/EPE vs GT
    when GT flow is available (reference trainer.py:93-98 validation_step
    via the val loader of data.py:92-104), in addition to the train metrics.
    """
    compile_cache.enable()
    if cfg.distributed:
        initialize_distributed(cfg.dist_coordinator, cfg.dist_num_processes,
                               cfg.dist_process_id)
    mesh = resolve_mesh(cfg.mesh_data, batch_size=cfg.batch)
    if media is None:
        media, val_media, scene = flow_media.get_video(
            cfg.input_video, cfg.size, cfg.test_size, cfg.end, cfg.step,
            flow_dir=cfg.flow_dir)
    same = val_media is media
    media = _maybe_pseudo_gt(cfg, media, scene)
    val_media = media if same else _maybe_pseudo_gt(cfg, val_media, scene)
    fh, fw = media.video.shape[1:3]
    # which bounds the user left on 'auto' — only those may move, both in
    # the GT probe below and in the mid-training refit (per-axis pinning)
    auto_bounds = {"dy": cfg.splat_max_dy == "auto",
                   "dx": cfg.splat_max_dx == "auto",
                   "ldy": cfg.splat_local_dy == "auto",
                   "ldx": cfg.splat_local_dx == "auto"}
    # a resumed run restores the bounds its probe/refit already derived
    # (the sidecar rides the checkpoint directory; axes pinned NOW win).
    # Only an ACTUAL resume (a step_* checkpoint exists) applies them: a
    # fresh run in a reused dir (step_* deleted, sidecar left behind) must
    # re-probe, not inherit the dead run's bounds — same rule as the
    # monitor-history gating below (round-5 review)
    if CheckpointStore(flow_ckpt_dir(cfg, scene)).latest_step() is not None:
        cfg, _ = _load_window_bounds(cfg, flow_ckpt_dir(cfg, scene), fh, fw)
    cfg = _resolve_and_probe_splat_bounds(cfg, media, fh, fw)
    refit_on = (cfg.window_refit != "off" and any(auto_bounds.values())
                and bool(cfg.splat_max_dy))
    key = R.root_key(cfg.random_seed)
    spec, state, consts, ctrl_cfg, tx, store, start_epoch = \
        _flow_create_and_restore(cfg, R.named_fold(key, "init"), scene)
    step = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)

    writer = MetricsWriter(store.directory, run_name=f"{scene}_{cfg.name}",
                           use_wandb=use_wandb,
                           wandb_project="optical_flow",
                           hyperparams=cfg.__dict__)
    if mesh is not None:
        state = place_state(mesh, state)

    # source / GT-flow media at run start (reference main.py:60-69)
    if writer.wants_media:
        src = (np.clip(media.video, 0.0, 1.0) * 255).astype(np.uint8)
        writer.log_media(0, "media/source", src, fps=4)
        if getattr(media, "gt_available", False):
            writer.log_media(0, "media/gt_flow", np.stack(
                [flow_to_image(f) for f in media.flow]), fps=4)

    # held-out val pass (val/EPE) only when GT flow exists and validation is
    # enabled — mirrors the reference's default-off validation (main.py:55-56)
    do_val = (val_media is not None and getattr(val_media, "gt_available", False)
              and cfg.effective_val_iter <= cfg.epochs)
    if do_val:
        infer = FT.make_flow_infer(spec, cfg, ctrl_cfg)
        vh, vw_ = val_media.video.shape[1:3]

    rng = np.random.RandomState(cfg.random_seed)
    save_every = max(cfg.epochs // 100, 1)
    last: Dict = {}
    t0 = time.time()
    frames_done = 0
    place = ((lambda b: place_batch(mesh, b, allow_uneven=True))
             if mesh is not None else jax.device_put)
    # pin all frame-pair batches in HBM once; epochs replay them in shuffled
    # order (batch composition fixed — the whole-video coverage per epoch is
    # identical, only the pairing randomness of the reference's reshuffling
    # DataLoader differs)
    cached = [place(b) for b in media.batches(cfg.batch)]
    # --profile N: one jax.profiler trace of N post-warmup steps
    tracer = TraceWindow(path.join(store.directory, "trace"),
                         cfg.profile_steps)
    # SIGTERM/SIGINT -> finish the epoch, checkpoint, return (preemption)
    stop = GracefulStop().install()
    window_warned = False
    # window-refit monitor accumulator: running max of the stats vector
    # [fy, fx(, dvy, dvx)] over EVERY batch of every epoch (device-side,
    # zero extra host syncs — one tiny stacked reduction per epoch).
    # `mon_hist` keeps the all-time max as host floats across refits (the
    # device vector's length changes when a refit switches window modes).
    mon_since = None
    # resume restores the all-time maxima with the bounds (see
    # _save_window_bounds): tighten decisions must respect pre-resume
    # evidence or they churn. Only an ACTUAL resume (start_epoch > 0)
    # restores them — a fresh run in a reused checkpoint dir (step_*
    # deleted, sidecar left behind) must not inherit stale maxima that
    # would block tightening for the whole run (round-4 advisor finding).
    mon_hist: Dict = (_load_window_hist(flow_ckpt_dir(cfg, scene), fh, fw)
                      if start_epoch > 0 else {})
    for epoch in range(start_epoch, cfg.epochs):
        order = rng.permutation(len(cached))
        mon_epoch = []
        for bi in order:
            batch = cached[bi]
            state, m = step(state, consts, batch)
            tracer.tick(m["loss"])
            frames_done += int(batch["frame1"].shape[0])
            if refit_on and "flow_max_y" in m:
                # collect EVERY batch's monitor scalars (device refs, no
                # syncs) — a last-batch-only sample can miss a single
                # fast-motion pair for a whole save cadence
                mon_epoch.append([m["flow_max_y"], m["flow_max_x"]]
                                 + ([m["flow_dev_y"], m["flow_dev_x"]]
                                    if "flow_dev_y" in m else []))
        if mon_epoch:
            # one tiny device reduction per epoch, still zero host syncs
            vec = jnp.stack([v for row in mon_epoch for v in row])
            vec = vec.reshape(len(mon_epoch), -1).max(axis=0)
            mon_since = (vec if mon_since is None
                         else jnp.maximum(mon_since, vec))
        if (epoch + 1) % cfg.effective_val_iter == 0 or epoch == cfg.epochs - 1:
            last = {k: float(v) for k, v in m.items()}
            last["frames_per_sec"] = frames_done / max(time.time() - t0, 1e-9)
            if do_val:
                # device-side accumulation; ONE scalar fetch for the whole
                # val split (per-pair float() syncs cost ~27 ms each)
                epe_sum, n = jnp.zeros(()), 0
                for vb in val_media.batches(cfg.test_batch):
                    f12, _ = infer(state.params, consts, state.ctrl_state,
                                   place(vb["times"]),
                                   jnp.asarray(vb["scale"]), vh, vw_)
                    nb = int(vb["times"].shape[0])
                    epe_sum = epe_sum + FT.epe(f12, place(vb["gt_flow"])) * nb
                    n += nb
                last["val_epe"] = float(epe_sum) / max(n, 1)
            writer.log(epoch, last)
        saved = (epoch + 1) % save_every == 0 or epoch == cfg.epochs - 1
        if saved:
            store.save(epoch + 1, {"state": state, "consts": consts})
            if refit_on and mon_since is not None:
                s = [float(v) for v in np.asarray(mon_since)]
                since = {"fy": s[0], "fx": s[1],
                         "dvy": s[2] if len(s) > 2 else None,
                         "dvx": s[3] if len(s) > 3 else None}
                mon_since = None
                for k, v in since.items():
                    if v is not None:
                        mon_hist[k] = max(mon_hist.get(k, 0.0), v)
                new_cfg = _refit_window_bounds(
                    cfg, auto_bounds, fh, fw, since, mon_hist,
                    allow_tighten=(epoch + 1) >= max(cfg.epochs // 5, 2))
                if new_cfg is not None:
                    logging.getLogger(__name__).warning(
                        "window refit at epoch %d (measured max |fy| %.1f "
                        "|fx| %.1f dev_y %s dev_x %s): dy %s->%s dx %s->%s "
                        "local dy %s->%s dx %s->%s — rebuilding the train "
                        "step (one recompile).", epoch + 1,
                        since["fy"], since["fx"], since["dvy"], since["dvx"],
                        cfg.splat_max_dy, new_cfg.splat_max_dy,
                        cfg.splat_max_dx, new_cfg.splat_max_dx,
                        cfg.splat_local_dy, new_cfg.splat_local_dy,
                        cfg.splat_local_dx, new_cfg.splat_local_dx)
                    cfg = new_cfg
                    step = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
                    window_warned = False
                    refit_on = (cfg.window_refit != "off"
                                and bool(cfg.splat_max_dy))
            # persist the post-refit effective bounds with this save event
            _save_window_bounds(store.directory, cfg, fh, fw, mon_hist)
            if cfg.splat_max_dy and "flow_max_y" in m and not window_warned:
                # loud out-of-window fallback guidance: windowed ops DROP
                # taps beyond the bound, so a flow that outgrew the window
                # silently degrades training — tell the user how to fix it
                fy, fx = float(m["flow_max_y"]), float(m["flow_max_x"])
                dy, dx = cfg.splat_max_dy, cfg.splat_max_dx
                # in LOCAL-window mode the drop criterion is the deviation
                # from the per-tile mean flow, not the magnitude (the
                # cfg.splat_local_dy guard covers one stale-metrics save
                # right after a refit dropped local mode)
                if "flow_dev_y" in m and cfg.splat_local_dy:
                    dvy, dvx = float(m["flow_dev_y"]), float(m["flow_dev_x"])
                    ldy = cfg.splat_local_dy
                    # x bound: the local column bound when the probe
                    # engaged it (dev_x is then the deviation from the
                    # 128-quantized tile means), else the static global
                    # dx (dev_x is the plain magnitude)
                    ldx = cfg.splat_local_dx or cfg.splat_max_dx
                    # resample coordinate normalization shifts taps by up
                    # to ~1.5 px relative to the raw flow — warn with a
                    # 3 px margin
                    if dvy > ldy - 3 or dvx > ldx - 3:
                        window_warned = True
                        logging.getLogger(__name__).warning(
                            "flow deviation from the tile means "
                            "(dy %.1f px; dx %.1f px) approaches the "
                            "LOCAL window bounds (local dy=%s, x=%s) at "
                            "epoch %d — out-of-window taps are DROPPED. "
                            "Raise --splat-local-dy/--splat-local-dx (or "
                            "pass 'off' for the global windows) / "
                            "--splat-max-dx.",
                            dvy, dvx, ldy, ldx, epoch + 1)
                elif fy > dy - 1 or (dx is not None and fx > dx - 1):
                    window_warned = True
                    logging.getLogger(__name__).warning(
                        "flow magnitude (|fy| %.1f, |fx| %.1f px) exceeds "
                        "the splat window bounds (dy=%s, dx=%s) at epoch %d "
                        "— out-of-window taps are being DROPPED. Raise "
                        "--splat-max-dy/--splat-max-dx or pass 'off' for "
                        "the exact scatter.", fy, fx, dy, dx, epoch + 1)
        if stop:
            if not saved:
                store.save(epoch + 1, {"state": state, "consts": consts})
                _save_window_bounds(store.directory, cfg, fh, fw, mon_hist)
            break
    stop.restore()
    tracer.close()
    out = {"state": state, "spec": spec, "consts": consts,
           "ctrl_cfg": ctrl_cfg, "metrics": last, "scene": scene,
           # the EFFECTIVE config: resolved/probed bounds, incl. any
           # mid-training window refits
           "cfg": cfg}
    if keep_writer:
        # caller will log test-phase media into the SAME run (the reference
        # logs test media into the training logger, trainer.py:114-131)
        out["writer"] = writer
    else:
        writer.close()
    return out


def run_flow_test(cfg: FlowConfig, media=None, scene: str = "scene",
                  state=None, spec=None, consts=None, ctrl_cfg=None,
                  use_wandb: bool = False, writer=None) -> Dict:
    """Flow test driver (reference trainer.py:100-132 + main.py:83-93):
    render predicted flow + occlusion masks, compute EPE vs GT when present,
    write artifacts with metadata sidecars. With wandb enabled the predicted
    flow and occlusion videos are logged as media (trainer.py:114-131)."""
    if media is None:
        _, media, scene = flow_media.get_video(
            cfg.input_video, cfg.size, cfg.test_size, cfg.end, cfg.step,
            flow_dir=cfg.flow_dir)
    media = _maybe_pseudo_gt(cfg, media, scene)
    # effective bounds from the training run when available (same frame
    # size); local 'auto' without that evidence resolves OFF at inference
    th, tw = media.video.shape[1:3]
    cfg, _ = _load_window_bounds(cfg, flow_ckpt_dir(cfg, scene), th, tw)
    cfg = _inference_bounds(cfg)
    key = R.root_key(cfg.random_seed)
    if state is None:
        # with --import-torch and no framework checkpoint, the fresh state
        # already carries the reference checkpoint's weights + controller
        # mask + encoding consts (train/flow.py)
        spec, state, consts, ctrl_cfg, _, _, _ = _flow_create_and_restore(
            cfg, R.named_fold(key, "init"), scene,
            require=f"no checkpoint for scene {scene}")

    infer = FT.make_flow_infer(spec, cfg, ctrl_cfg)
    occl = OCCLUSIONS.get(cfg.occl)

    os.makedirs(cfg.results_dir, exist_ok=True)
    tag = f"{scene}_{cfg.name}"
    epes = []
    flow_imgs = []
    mask_imgs = []
    h, w = media.video.shape[1:3]
    for batch in media.batches(cfg.test_batch):
        f12, f21 = infer(state.params, consts, state.ctrl_state,
                         jax.device_put(batch["times"]),
                         jnp.asarray(batch["scale"]), h, w)
        if "gt_flow" in batch:
            epes.append(float(FT.epe(f12, jax.device_put(batch["gt_flow"]))))
        for f in np.asarray(f12):
            flow_imgs.append(flow_to_image(f))
        if occl is not None:
            m = np.asarray(occl(f12, f21, cfg.occl_thresh))
            for mm in m:
                mask_imgs.append((mm.repeat(3, -1) * 255).astype(np.uint8))

    mean_epe = float(np.mean(epes)) if epes else 0.0
    with VideoWriter(path.join(cfg.results_dir,
                               f"flow_{tag}_epe_{mean_epe:.3f}.gif"),
                     fps=4) as vw:
        for f in flow_imgs:
            vw.add(f)
    flow_path = vw.path
    import json
    with open(path.join(cfg.results_dir, f"flow_{tag}.json"), "w") as fh:
        json.dump({"epe": mean_epe, "frames": len(flow_imgs),
                   "scene": scene, "name": cfg.name}, fh)
    occl_path = None
    if mask_imgs:
        with VideoWriter(path.join(cfg.results_dir, f"occl_{tag}.gif"),
                         fps=4) as ow:
            for f in mask_imgs:
                ow.add(f)
        occl_path = ow.path

    # wandb media parity (reference trainer.py:114-131 wandb.Video path)
    own_writer = writer is None and use_wandb
    if own_writer:
        writer = MetricsWriter(cfg.results_dir, run_name=f"test_{tag}",
                               use_wandb=True, wandb_project="optical_flow")
    if writer is not None:
        writer.log_artifact(flow_path, {"epe": mean_epe, "scene": scene})
        if writer.wants_media:
            # log PAST the training epochs: wandb drops non-monotonic steps,
            # so step=0 after a training run would be silently discarded
            media_step = cfg.epochs
            writer.log_media(media_step, f"flow/{tag}",
                             np.stack(flow_imgs), fps=4)
            if mask_imgs:
                writer.log_media(media_step, f"occl/{tag}",
                                 np.stack(mask_imgs), fps=4)
        if own_writer:
            writer.close()
    return {"epe": mean_epe, "num_frames": len(flow_imgs),
            "flow_path": flow_path, "occl_path": occl_path}


def run_flow_interpolate(cfg: FlowConfig, factor: int = 2, media=None,
                         scene: str = "scene") -> Dict:
    """Temporal upsampling of the fitted video: render ``factor-1``
    intermediate frames between every adjacent pair via the softsplat
    interpolation (`train/flow.py make_frame_interp`) and write the
    interleaved (N-1)*factor+1 frame video + a JSON metadata sidecar.

    This is the video-interpolation deliverable the reference repo is named
    for; it ships only the flow fit (trainer.py), so this op has no direct
    reference counterpart — documented as an extension in docs/PARITY.md."""
    if factor < 2:
        raise ValueError(f"factor must be >= 2, got {factor}")
    if media is None:
        _, media, scene = flow_media.get_video(
            cfg.input_video, cfg.size, cfg.test_size, cfg.end, cfg.step,
            flow_dir=cfg.flow_dir)
    # the interp splats at this media's size: apply the training run's
    # probed/refitted bounds when they match it, and never engage local
    # windows from a bare 'auto' (no deviation evidence at inference)
    th, tw = media.video.shape[1:3]
    cfg, _ = _load_window_bounds(cfg, flow_ckpt_dir(cfg, scene), th, tw)
    cfg = _inference_bounds(cfg)
    key = R.root_key(cfg.random_seed)
    spec, state, consts, ctrl_cfg, _, _, _ = _flow_create_and_restore(
        cfg, R.named_fold(key, "init"), scene,
        require=f"no checkpoint for scene {scene}")

    interp = FT.make_frame_interp(spec, cfg, ctrl_cfg)
    video = media.video
    times = media.times
    scale = jnp.asarray(media.flow_scale, jnp.float32)
    frames_out = []
    for i in range(len(video) - 1):
        pair = jax.device_put(jnp.asarray(video[i:i + 2], jnp.float32))
        t0 = jax.device_put(jnp.asarray(times[i]))
        frames_out.append(video[i])
        for k in range(1, factor):
            mid = interp(state.params, consts, state.ctrl_state, t0, pair,
                         jnp.float32(k / factor), scale)
            frames_out.append(np.asarray(jnp.clip(mid, 0.0, 1.0)))
    frames_out.append(video[-1])

    os.makedirs(cfg.results_dir, exist_ok=True)
    tag = f"{scene}_{cfg.name}"
    out_path = path.join(cfg.results_dir, f"interp_{tag}_x{factor}.gif")
    with VideoWriter(out_path, fps=4 * factor) as vw:
        for f in frames_out:
            vw.add((np.clip(np.asarray(f), 0.0, 1.0) * 255).astype(np.uint8))
    import json
    with open(path.join(cfg.results_dir, f"interp_{tag}_x{factor}.json"),
              "w") as fh:
        json.dump({"scene": scene, "name": cfg.name, "factor": factor,
                   "frames_in": int(len(video)),
                   "frames_out": len(frames_out)}, fh)
    return {"path": vw.path, "num_frames": len(frames_out)}


def run_flow_export(cfg: FlowConfig, out: Optional[str] = None) -> str:
    """Export the latest framework flow checkpoint as a reference-loadable
    torch state_dict (the reverse of ``--import-torch``). The controller
    mask exports as the reference's own stashed counts (save_mask)."""
    from sin_inn_tpu.models import torch_import as TI

    # scene naming only — no need to load the frames (flow_media.get_video)
    scene = path.splitext(path.basename(cfg.input_video))[0]
    key = R.root_key(cfg.random_seed)
    spec, state, consts, ctrl_cfg, _, store, _ = _flow_create_and_restore(
        cfg, R.named_fold(key, "init"), scene,
        require=f"no checkpoint for scene {scene}")
    out = out or path.join(store.directory, f"{cfg.name}_export.ckpt")
    return TI.save_reference_checkpoint(
        out, TI.export_flow_state_dict(spec, state.ctrl_state, state.params,
                                       consts))


def run_flow_summarize(cfg: FlowConfig) -> float:
    """Dataset-level normalized AEPE over all scenes
    (reference main.py:96-106), reading metadata JSONs, not filenames."""
    root = path.dirname(cfg.input_video)
    epe_accum, frame_accum = 0.0, 0
    for scene in sorted(os.listdir(root)):
        scene_cfg = cfg.replace(input_video=path.join(root, scene),
                                flow_dir=_scene_flow_dir(cfg.flow_dir, scene))
        out = run_flow_test(scene_cfg)
        epe_accum += out["epe"] * out["num_frames"]
        frame_accum += out["num_frames"]
    aepe = epe_accum / max(frame_accum, 1)
    print(f"Normalized AEPE: {aepe}")
    return aepe


def run_flow_sintel(cfg: FlowConfig, outroot: str = "sintel_submission"):
    """Sintel leaderboard submission writer (reference main.py:109-130)."""
    root = path.dirname(cfg.input_video)
    sub = "clean" if cfg.name.endswith("clean") else "final"
    for scene in sorted(os.listdir(root)):
        scene_cfg = cfg.replace(input_video=path.join(root, scene),
                                flow_dir=_scene_flow_dir(cfg.flow_dir, scene))
        _, media, scene_name = flow_media.get_video(
            scene_cfg.input_video, cfg.size, cfg.test_size, cfg.end, cfg.step,
            flow_dir=scene_cfg.flow_dir)
        key = R.root_key(cfg.random_seed)
        # same precedence as every flow driver: per-scene checkpoints win;
        # scenes without one render from --import-torch weights when given
        spec, state, consts, ctrl_cfg, _, _, _ = _flow_create_and_restore(
            scene_cfg, R.named_fold(key, "init"), scene_name,
            require=f"no checkpoint for {scene_name}")
        infer = FT.make_flow_infer(spec, scene_cfg, ctrl_cfg)
        outdir = path.join(outroot, sub, scene_name)
        os.makedirs(outdir, exist_ok=True)
        h, w = media.video.shape[1:3]
        i = 0
        for batch in media.batches(1):
            f12, _ = infer(state.params, consts, state.ctrl_state,
                           jax.device_put(batch["times"]),
                           jnp.asarray(batch["scale"]), h, w)
            write_flo(path.join(outdir, f"frame_{i+1:04d}.flo"),
                      np.asarray(f12[0]))
            i += 1
