"""Typed experiment configs with derived-field validation.

Replaces the reference's argparse-with-injected-fields idiom
(/root/reference/main.py:9-83 derives ``lr_dims``/``z_dims`` at lines 74-75 and
asserts ``scale % 4 == 0`` at line 79; /root/reference/video-interpolation/
main.py:17-49). Here every derived quantity is computed and validated at
construction time, and the channel math is shape-driven so non-4-multiple
power-of-two scales (e.g. the tiny 2x config) work too.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _octaves(scale: int) -> int:
    """Number of per-octave stages: ``(scale - 1).bit_length()``.

    Mirrors the reference arch loop bound (/root/reference/archs.py:33,212).
    """
    return (scale - 1).bit_length()


@dataclass(frozen=True)
class SRConfig:
    """Config for the INN space-time super-resolution pipeline.

    Field defaults mirror the reference CLI (/root/reference/main.py:9-83).
    """

    # Dataset
    dataset: str = "datasets/adobe240f"
    scene: str = "IMG_0028_binning_4x"
    suffix: str = "default"
    fps: int = 10                 # HR fps; LR frames are assumed 120 fps
    lr_window: int = 10           # LR frames on either side of one HR frame
    batch_size: int = 8
    val_batch_size: int = 40

    # Architecture
    architecture: str = "SRF"     # 'SRF' | 'IRN'
    scale: int = 4
    num_coupling: int = 4
    clamp_srf: float = 1.2        # GLOW soft-clamp (reference archs.py:63)
    clamp_irn: float = 1.0        # InvBlockExp clamp (reference archs.py:136)
    hidden_channels: int = 256    # conv subnet width (reference archs.py:11-17)
    dense_gc: int = 32            # DenseBlock growth channels (archs.py:75)

    # Training
    epochs: int = 10_000
    save_iter: int = 100
    print_iter: int = 10
    learning_rate: float = 1e-4
    adam_betas: Tuple[float, float] = (0.9, 0.99)
    weight_decay: float = 1e-5
    lambda_fwd_rec: float = 1.0
    lambda_fwd_mmd: float = 0.0
    lambda_latent_nll: float = 0.0
    lambda_bwd_rec: float = 1.0
    lambda_bwd_mmd: float = 0.0
    random_seed: int = 0

    # TCR (transformation-consistency regularization)
    lambda_bwd_tcr: float = 0.0
    rotation: float = 5.0         # degrees
    translation: float = 5.0      # pixels
    tcr_iters: int = 5
    # gradient-free TCR warp for reference-parity runs (the reference's
    # transform carries no gradient — lit_wrapper.py:61 TODO); default False
    # keeps the differentiable warp, which is the better training signal
    tcr_stop_grad: bool = False

    # Inference
    temp: float = 0.8             # latent sampling temperature

    # Runtime
    working_dir: str = "experiments"
    resume_state: Optional[str] = None
    # seed params from a reference torch/Lightning checkpoint
    # (models/torch_import.py); an on-disk framework checkpoint (resume)
    # takes precedence over the import
    import_torch: Optional[str] = None
    # subnet MXU precision: 'float32' (default TPU bf16-pass matmuls),
    # 'bfloat16' (explicit bf16 inputs), or 'float32_highest' (true f32
    # 6-pass matmuls for strict inversion/parity runs)
    compute_dtype: str = "float32"
    # fused Pallas kernels for the 1x1-subnet GLOW couplings:
    # 'auto' (on TPU), 'on', 'off'
    use_pallas: str = "auto"
    # jax.checkpoint each coupling: backward stashes only coupling inputs
    # and recomputes the subnet chain (the IRN dense blocks' concat
    # activations never round-trip HBM). Measured A/B in docs/PERF.md.
    remat: bool = False
    data_axis: str = "data"          # mesh axis the batch is sharded over
    donate_state: bool = True
    # Multi-chip execution (first-class, not test-only): mesh_data=None means
    # "use every visible device" when >1 are present (the capability Lightning
    # gave the reference for free via gpus= — main.py:112); 1 forces
    # single-device. mesh_model>1 additionally shards the glow subnet hidden
    # channels (TP, parallel/sharding.py rules).
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    # call jax.distributed.initialize() first (multi-host pods). With the
    # dist_* fields left None the runtime auto-detects (TPU pod metadata);
    # explicit coordinator/num_processes/process_id boot any N-process
    # cluster (incl. the CPU gloo path the tests exercise).
    distributed: bool = False
    dist_coordinator: Optional[str] = None
    dist_num_processes: Optional[int] = None
    dist_process_id: Optional[int] = None
    # --profile N: capture one jax.profiler trace of N post-warmup train
    # steps into <checkpoints>/trace (TensorBoard/xprof readable)
    profile_steps: int = 0
    # auto-tuning before training (reference main.py:108-109 enables
    # Lightning's auto_lr_find / auto_scale_batch_size)
    auto_lr: bool = False
    auto_batch: bool = False

    def __post_init__(self):
        if self.architecture not in ("SRF", "IRN"):
            raise ValueError(f"unknown architecture {self.architecture!r}")
        if self.scale < 2 or (self.scale & (self.scale - 1)) != 0:
            # Generalizes the reference's `scale % 4 == 0` assert: the squeeze
            # ladder needs a power-of-two scale (main.py:79 was stricter than
            # the math requires).
            raise ValueError(f"scale must be a power of two >= 2, got {self.scale}")
        if self.lr_window < 0:
            raise ValueError("lr_window must be >= 0")
        if self.z_dims <= 0:
            raise ValueError(
                f"lr_dims={self.lr_dims} >= total INN channels "
                f"{self.total_dims}; shrink lr_window or raise scale"
            )

    # ---- derived fields (reference main.py:74-75, made shape-driven) ----

    @property
    def octaves(self) -> int:
        return _octaves(self.scale)

    @property
    def num_squeezes(self) -> int:
        """Initial squeeze + one per octave (archs.py:28-38, 208-215)."""
        return 1 + self.octaves

    @property
    def total_dims(self) -> int:
        """Channel count after all squeezes of a 3-channel input.

        Equals ``3 * 4**num_squeezes``; for power-of-two scales this is
        ``scale**2 * 3 * 4`` as in reference main.py:75.
        """
        return 3 * 4 ** self.num_squeezes

    @property
    def lr_dims(self) -> int:
        """(2*lr_window+1) RGGB LR frames stacked on channels (main.py:74)."""
        return (2 * self.lr_window + 1) * 4

    @property
    def z_dims(self) -> int:
        return self.total_dims - self.lr_dims

    @property
    def clamp(self) -> float:
        return self.clamp_srf if self.architecture == "SRF" else self.clamp_irn

    @property
    def exp_name(self) -> str:
        return f"{self.scene}_{self.architecture}_{self.suffix}"

    def replace(self, **kw) -> "SRConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class FlowConfig:
    """Config for the INR optical-flow / video-interpolation pipeline.

    Field defaults mirror /root/reference/video-interpolation/main.py:17-49.
    """

    # Data
    input_video: str = "../datasets/sintel/training/final/alley_1"
    name: str = "temp"
    end: Optional[int] = None
    step: Optional[int] = None
    size: int = 436
    batch: int = 1
    test_size: int = 436
    test_batch: int = 1

    # Network
    net: str = "RBF"
    spatially_adaptive: bool = False
    spatial_res: int = 50        # controller grid resolution (main.py:141)

    # INR model params (reference model.py:11-28 ModelParams)
    domain_dim: int = 3
    num_frequencies: int = 256
    std: float = 25.0
    power: int = 20
    num_layers: int = 3
    hidden_dim: int = 256
    output_channels: int = 4
    num_frequencies_pe: int = 4
    std_rbf: float = 12.0

    # Train
    epochs: int = 1000
    val_iter: Optional[int] = None
    lr: float = 1e-4
    loss_l1: float = 1.0
    loss_census: float = 0.1
    loss_ssim: float = 0.0
    census_width: int = 3
    loss_smooth1: float = 0.1
    edge_constant: float = 150.0
    edge_func: str = "gauss"     # 'exp' | 'gauss'
    occl: Optional[str] = "wang"  # 'brox' | 'wang' | None
    occl_thresh: float = 0.7
    controller_epsilon: float = 1e-3
    random_seed: int = 0
    # Windowed matmul splat: bounds |flow_y| taps to +-splat_max_dy px and
    # replaces the TPU scatter with dense MXU contractions; its backward is
    # the hand-derived 4-tap gather adjoint (ops/splat.py). 'auto' (default)
    # derives a size-scaled bound at train time — see resolve_splat_bounds —
    # so the tuned path is the out-of-the-box configuration (the exact
    # scatter runs 4.3 f/s at Sintel size vs ~15 windowed); None/'off' =
    # exact scatter; an int pins the bound. The train loop monitors the
    # max |flow| each save cadence and warns LOUDLY when flows exceed the
    # window (out-of-window taps are dropped, like the reference's
    # out-of-frame taps).
    splat_max_dy: "Optional[int] | str" = "auto"
    splat_chunk: int = 2          # 2 measured fastest with the fused backward
                              # (56/59/64 ms fwd+grad at chunk 2/4/8)
    # Horizontal window bound |flow_x| <= splat_max_dx for the METRIC WARPS
    # (resample2d_windowed with the fused backward: 48 -> 31 ms fwd+grad per
    # direction at Sintel size). Requires splat_max_dy. The splat itself
    # stays exact in x (its 2D-windowed variant measured SLOWER — strided
    # carry updates). 'auto' (default) = size-scaled; None/'off' = exact.
    splat_max_dx: "Optional[int] | str" = "auto"
    splat_col_chunk: int = 256    # column block for the windowed warp
    resample_chunk: int = 8       # row chunk for the windowed warp
    # LOCAL-window row bound for the Pallas region kernels: each 128x128
    # tile's source window recenters VERTICALLY on the tile's mean flow
    # (per-tile dynamic DMA row offsets, ops/pallas/offsets.py), so this
    # bounds only the DEVIATION |flow_y - tile_mean_y| instead of
    # |flow_y| — the splat window shrinks 256 -> 192 rows and the gather
    # windows 136 -> 80 at Sintel defaults. 'auto' (default) = half the
    # resolved global dy (64 -> 32), tightened/loosened by the train
    # loop's GT-flow probe to 1.5x the measured per-tile DEVIATION when
    # GT/pseudo-GT flow exists (same contract as the global-bound probe);
    # engaged only on the Pallas 2D-window path and only when strictly
    # smaller than the global window; int pins; None/'off' disables
    # (static windows). Measured at Sintel size: 35.0 -> 44.1 f/s at
    # local dy 32, 51.4 at a pinned 16; convergence identical
    # (tools/validate.py flow --splat-local-dy). The global dy still caps the
    # offsets (and sizes the padding), so the local path reaches every tap
    # the static path could — and FARTHER (|flow_y| up to dy + local - 1
    # when the local deviation is small). The train loop monitors the
    # deviation and warns loudly when it outgrows the local window.
    # Columns keep the static splat_max_dx bound: Mosaic requires DMA
    # starts divisible by the (8, 128) tiling, and 128-quantizing a column
    # offset costs a full lane tile of window width — more than any
    # x-locality win (the row offsets quantize to 8, costing <= 4 px).
    splat_local_dy: "Optional[int] | str" = "auto"
    # LOCAL-window COLUMN bound: with it set, the per-tile windows also
    # recenter horizontally on the 128-quantized tile-mean flow (the lane
    # tiling is the only dynamic DMA column start Mosaic accepts, so up
    # to 64 px of quantization error eats this budget — x-local only pays
    # for fast scenes whose global dx is >= 192, where the shrunken
    # window still wins after the quantization tax). 'auto' (default)
    # resolves to OFF and is engaged by the train loop's GT-flow probe
    # (64 + 1.5x the measured fine per-tile deviation + 3 px margin,
    # lane-granular) only when that shrinks the padded window; an int
    # pins; requires the row-local path (splat_local_dy). This is what
    # keeps fast-pan scenes at slow-scene speed: the probe WIDENS the
    # global bounds for coverage and the local bounds keep the FLOPs at
    # the deviation scale.
    splat_local_dx: "Optional[int] | str" = "auto"
    # Mid-training window-bound REFIT: at each save cadence the train loop
    # re-derives every bound the user left on 'auto' from the monitor's
    # measured flow stats (running max of |flow| and of the per-tile
    # deviation — the actual drop criteria) and rebuilds the jitted step
    # when they change: bounds WIDEN as soon as flow approaches the window
    # (coverage first — the monitor's warning becomes an action; past half
    # the frame the loop falls back to the exact scatter), and TIGHTEN once
    # flows stabilize (after epochs/5, against the historical max so a
    # bound never re-tightens below flow levels already observed — no
    # oscillation). This gives no-GT runs the same deviation-scale windows
    # the GT probe derives up front (44 -> ~51 f/s at Sintel defaults once
    # training flow settles). 'auto' = on whenever any bound is 'auto';
    # 'off' disables (static bounds + warnings, the pre-refit behavior).
    # bench.py never uses the train loop, so benchmarks are unaffected.
    window_refit: str = "auto"

    # Runtime
    results_dir: str = "results"
    checkpoints_dir: str = "checkpoints"
    compute_dtype: str = "float32"
    # fused Pallas region-scatter kernel for the windowed softmax splat
    # (ops/pallas/splat.py; needs both window bounds): 'auto' (on TPU),
    # 'on', 'off'
    use_pallas: str = "auto"
    data_axis: str = "data"       # mesh axis pixel/frame grid is sharded over
    # Multi-chip: shard the frame-pair batch over `data` (SP-analog for this
    # workload, SURVEY §2.5). None = all visible devices when >1; 1 = off.
    mesh_data: Optional[int] = None
    distributed: bool = False
    dist_coordinator: Optional[str] = None     # see SRConfig.dist_*
    dist_num_processes: Optional[int] = None
    dist_process_id: Optional[int] = None
    # --profile N: capture one jax.profiler trace of N post-warmup train
    # steps into <checkpoints>/trace (TensorBoard/xprof readable)
    profile_steps: int = 0
    # precomputed GT/pseudo-GT flow directory (.flo/.npy per frame pair) —
    # the honest replacement for the reference's in-loop RAFT run
    # (video-interpolation/data.py:32-62); see also data.flow_media.FLOW_PRODUCERS
    flow_dir: Optional[str] = None
    # pseudo-GT producer spec when no GT flow exists: 'raft:<ckpt.pth>[@iters]'
    # (the TPU-native RAFT port, models/raft.py), 'py:<module>:<fn>', or a
    # '{f1} {f2} {out}' subprocess template (data.flow_media.resolve_producer)
    flow_producer: Optional[str] = None
    # seed params/encoding buffers/controller mask from a reference
    # torch/Lightning flow checkpoint (models/torch_import.py); an on-disk
    # framework checkpoint (resume) takes precedence over the import
    import_torch: Optional[str] = None

    def __post_init__(self):
        if self.edge_func not in ("exp", "gauss"):
            raise ValueError(f"edge_func must be 'exp' or 'gauss', got {self.edge_func}")
        if self.occl not in ("brox", "wang", None):
            raise ValueError(f"occl must be 'brox'|'wang'|None, got {self.occl}")
        for name in ("splat_max_dy", "splat_max_dx", "splat_local_dy",
                     "splat_local_dx"):
            v = getattr(self, name)
            if isinstance(v, str) and v not in ("auto", "off"):
                raise ValueError(f"{name} must be an int, 'auto', 'off' or "
                                 f"None, got {v!r}")
        if self.window_refit not in ("auto", "off"):
            raise ValueError(f"window_refit must be 'auto' or 'off', got "
                             f"{self.window_refit!r}")
        if (self._bound_off(self.splat_max_dy)
                and isinstance(self.splat_max_dx, int)
                and self.splat_max_dx > 0):
            # 'auto' dx with dy off is fine (it resolves to None); only an
            # explicit dx int contradicts a disabled dy
            raise ValueError(
                "splat_max_dx requires splat_max_dy (the windowed metric "
                "warps engage only with both bounds set)")

    @staticmethod
    def _bound_off(v) -> bool:
        return v is None or v == "off" or v == 0

    def resolve_splat_bounds(self, h: int, w: int) -> "FlowConfig":
        """Materialize 'auto' window bounds for a known frame size.

        Called by the train drivers once the media is loaded. 'auto' picks
        ceil(dim/8) rounded up to a multiple of 16 (Sintel 436x1024 ->
        dy=64, dx=128 — exactly the bounds measured fastest, CLAUDE.md) and
        falls back to the exact scatter for frames under 128 px (windowing
        buys nothing when the window covers most of the image) — unless
        splat_max_dx was pinned to an explicit int, which is a request for
        the windowed path and keeps dy on its auto value (the silent
        fallback would contradict the loud ValueError the same dy-off +
        dx-int contradiction raises at construction time). Idempotent for
        already-integer bounds.
        """
        def auto(dim):
            eighth = -(-dim // 8)                       # ceil(dim / 8)
            return max(16, (eighth + 15) // 16 * 16)    # to multiple of 16

        dy, dx = self.splat_max_dy, self.splat_max_dx
        dx_pinned = isinstance(dx, int) and not self._bound_off(dx)
        if dy == "auto":
            dy = None if (min(h, w) < 128 and not dx_pinned) else auto(h)
        elif self._bound_off(dy):
            dy = None
        if dx == "auto":
            dx = None if dy is None else auto(w)
        elif self._bound_off(dx):
            dx = None
        if dy is None:
            dx = None

        # the local-window row bound rides the resolved global bounds:
        # 'auto' = half the global dy (rounded to the sublane tiling),
        # engaged only on the 2D-window path and only when it strictly
        # shrinks the window
        ldy = self.splat_local_dy
        if ldy == "auto":
            ldy = None if dy is None else max(8, -(-(dy // 2) // 8) * 8)
        elif self._bound_off(ldy):
            ldy = None
        if ldy is not None and (dy is None or dx is None or ldy >= dy):
            ldy = None

        # the local COLUMN bound is probe-only on 'auto' (the 128-lane
        # offset quantization eats 64 px of budget, so engaging it needs
        # evidence the deviation is small — the GT probe in the train
        # loop); a pinned int engages iff the row-local path is on and
        # the padded window actually shrinks at lane granularity
        ldx = self.splat_local_dx
        if ldx == "auto" or self._bound_off(ldx):
            ldx = None
        if ldx is not None and (
                ldy is None
                or -(-(128 + 2 * ldx) // 128) >= -(-(128 + 2 * dx) // 128)):
            ldx = None
        return self.replace(splat_max_dy=dy, splat_max_dx=dx,
                            splat_local_dy=ldy, splat_local_dx=ldx)

    @property
    def effective_val_iter(self) -> int:
        # Reference disables validation by default (main.py:55-56).
        return self.val_iter if self.val_iter else self.epochs + 1

    def model_params(self) -> dict:
        return dict(
            domain_dim=self.domain_dim,
            num_frequencies=self.num_frequencies,
            std=self.std,
            power=self.power,
            num_layers=self.num_layers,
            hidden_dim=self.hidden_dim,
            output_channels=self.output_channels,
            num_frequencies_pe=self.num_frequencies_pe,
            std_rbf=self.std_rbf,
        )

    def replace(self, **kw) -> "FlowConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class PrepareConfig:
    """Config for offline dataset preparation (reference datasets/prepare.py:7-33)."""

    video: str = ""
    downsampling: float = 1.0
    operator: str = "binning"   # binning | linear | cubic | lanczos4 | nearest | area
    reduction: str = "mean"     # mean | sum (binning only)
    scale: int = 4
    bayer: bool = False
    noise: Optional[float] = None

    def __post_init__(self):
        ops = ("binning", "linear", "cubic", "lanczos4", "nearest", "area")
        if self.operator not in ops:
            raise ValueError(f"operator must be one of {ops}")
        if self.reduction not in ("mean", "sum"):
            raise ValueError("reduction must be 'mean' or 'sum'")
