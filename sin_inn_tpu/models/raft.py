"""RAFT optical-flow inference in JAX — the TPU-native pseudo-GT producer.

The reference's ``VideoClip`` dataset shells out to an external RAFT checkout
to synthesize pseudo-ground-truth flow before training
(/root/reference/video-interpolation/data.py:32-62: hard-coded
``sys.path`` import, ``torch.nn.DataParallel``, 20 iterations). This module
replaces that external dependency with a first-class implementation of the
same public architecture (Teed & Deng, "RAFT: Recurrent All-Pairs Field
Transforms for Optical Flow", ECCV 2020) that

  * runs as ONE jitted XLA program per frame pair (the recurrent update is a
    ``lax.scan``; the all-pairs correlation volume is a single MXU matmul);
  * imports the official pretrained checkpoints (``raft-things.pth`` etc.)
    directly from their torch ``state_dict`` via :func:`load_torch_weights`;
  * plugs into the flow pipeline's pluggable pseudo-GT hook
    (:func:`sin_inn_tpu.data.flow_media.generate_pseudo_gt`) through
    :func:`make_raft_producer`.

Both official variants are implemented: the full "Basic" model (the one the
reference runs) and ``--small`` (SmallEncoder with BottleneckBlocks, plain
ConvGRU, bilinear 8x upsampling; hidden 96 / context 64 / corr radius 3).
:func:`load_torch_weights` auto-detects the variant from the state_dict's
key set, so ``raft:<ckpt>`` producers accept either checkpoint family.
Dropout is irrelevant at inference and omitted.

Layout conventions: NHWC activations, HWIO conv kernels. Parameters are a
flat ``dict[str, jnp.ndarray]`` keyed by the official torch module paths
(``fnet.conv1.weight`` ...) so the checkpoint importer is a pure
transpose-and-strip pass and the parity test can diff key sets directly.
Numerics are pinned against an independent torch replica of the official
modules in ``tests/test_raft.py``.

.. caution:: **Fidelity caveat.** The parity tests validate against a torch
   replica written from the paper and the official module structure — NOT
   against outputs of the official repository run with a real
   ``raft-things.pth`` (no network access / checkpoint in this environment).
   The importer fails loudly on any key/shape mismatch, and
   ``tests/test_raft.py`` pins shape-preserving conventions (ConvGRU gate-slab
   order, corr-pyramid level order, upsample-mask softmax axis) against the
   replica on randomized weights — but a systematic convention shared by the
   replica and the port would not be caught. Treat pseudo-GT from this port
   as unvalidated against upstream until diffed once against the official
   implementation's output on the same frame pair.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sin_inn_tpu.ops.subnet import conv2d
from sin_inn_tpu.ops.warp import sample_bilinear

Params = Dict[str, jnp.ndarray]

# correlation pyramid (official defaults for the Basic model)
CORR_LEVELS = 4
CORR_RADIUS = 4
HDIM = 128   # GRU hidden
CDIM = 128   # context

# --small variant dims (official RAFT(args.small) defaults)
S_HDIM = 96
S_CDIM = 64
S_CORR_RADIUS = 3


# ---------------------------------------------------------------------------
# Parameter schema + init (documents the exact official shapes)
# ---------------------------------------------------------------------------

def _encoder_schema(prefix: str, norm: str) -> Dict[str, Tuple[int, ...]]:
    """BasicEncoder parameter shapes. ``norm``: 'instance' (fnet — the
    official InstanceNorm2d is affine-free, so it contributes NO parameters)
    or 'batch' (cnet — folded inference BatchNorm: weight/bias/mean/var)."""
    s: Dict[str, Tuple[int, ...]] = {}

    def conv(name, kh, kw, cin, cout):
        s[f"{prefix}.{name}.weight"] = (kh, kw, cin, cout)
        s[f"{prefix}.{name}.bias"] = (cout,)

    def bn(name, c):
        if norm == "batch":
            s[f"{prefix}.{name}.weight"] = (c,)
            s[f"{prefix}.{name}.bias"] = (c,)
            s[f"{prefix}.{name}.running_mean"] = (c,)
            s[f"{prefix}.{name}.running_var"] = (c,)

    conv("conv1", 7, 7, 3, 64)
    bn("norm1", 64)
    dims = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
    for li, (cin, cout, stride) in enumerate(dims, start=1):
        for bi in range(2):
            b_cin = cin if bi == 0 else cout
            b_stride = stride if bi == 0 else 1
            base = f"layer{li}.{bi}"
            conv(f"{base}.conv1", 3, 3, b_cin, cout)
            conv(f"{base}.conv2", 3, 3, cout, cout)
            bn(f"{base}.norm1", cout)
            bn(f"{base}.norm2", cout)
            if b_stride != 1:
                conv(f"{base}.downsample.0", 1, 1, b_cin, cout)
                bn(f"{base}.downsample.1", cout)
    conv("conv2", 1, 1, 128, 256)
    return s


def _update_schema() -> Dict[str, Tuple[int, ...]]:
    s: Dict[str, Tuple[int, ...]] = {}
    p = "update_block"
    corr_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2   # 324

    def conv(name, kh, kw, cin, cout):
        s[f"{p}.{name}.weight"] = (kh, kw, cin, cout)
        s[f"{p}.{name}.bias"] = (cout,)

    # BasicMotionEncoder
    conv("encoder.convc1", 1, 1, corr_planes, 256)
    conv("encoder.convc2", 3, 3, 256, 192)
    conv("encoder.convf1", 7, 7, 2, 128)
    conv("encoder.convf2", 3, 3, 128, 64)
    conv("encoder.conv", 3, 3, 192 + 64, 126)
    # SepConvGRU (input = context 128 + motion 128 = 256; hidden 128)
    for g in ("convz1", "convr1", "convq1"):
        conv(f"gru.{g}", 1, 5, HDIM + 256, HDIM)
    for g in ("convz2", "convr2", "convq2"):
        conv(f"gru.{g}", 5, 1, HDIM + 256, HDIM)
    # FlowHead
    conv("flow_head.conv1", 3, 3, HDIM, 256)
    conv("flow_head.conv2", 3, 3, 256, 2)
    # convex-upsampling mask head
    conv("mask.0", 3, 3, HDIM, 256)
    conv("mask.2", 1, 1, 256, 64 * 9)
    return s


def _small_encoder_schema(prefix: str, out_dim: int) -> Dict[str, Tuple[int, ...]]:
    """SmallEncoder parameter shapes. Both small encoders are norm-param-free
    (fnet: affine-free InstanceNorm2d, cnet: norm_fn='none')."""
    s: Dict[str, Tuple[int, ...]] = {}

    def conv(name, kh, kw, cin, cout):
        s[f"{prefix}.{name}.weight"] = (kh, kw, cin, cout)
        s[f"{prefix}.{name}.bias"] = (cout,)

    conv("conv1", 7, 7, 3, 32)
    dims = [(32, 32, 1), (32, 64, 2), (64, 96, 2)]
    for li, (cin, planes, stride) in enumerate(dims, start=1):
        for bi in range(2):
            b_cin = cin if bi == 0 else planes
            b_stride = stride if bi == 0 else 1
            base = f"layer{li}.{bi}"
            conv(f"{base}.conv1", 1, 1, b_cin, planes // 4)
            conv(f"{base}.conv2", 3, 3, planes // 4, planes // 4)
            conv(f"{base}.conv3", 1, 1, planes // 4, planes)
            if b_stride != 1:
                conv(f"{base}.downsample.0", 1, 1, b_cin, planes)
    conv("conv2", 1, 1, 96, out_dim)
    return s


def _small_update_schema() -> Dict[str, Tuple[int, ...]]:
    s: Dict[str, Tuple[int, ...]] = {}
    p = "update_block"
    corr_planes = CORR_LEVELS * (2 * S_CORR_RADIUS + 1) ** 2   # 196

    def conv(name, kh, kw, cin, cout):
        s[f"{p}.{name}.weight"] = (kh, kw, cin, cout)
        s[f"{p}.{name}.bias"] = (cout,)

    # SmallMotionEncoder (no convc2): output cat([out80, flow2]) = 82 ch
    conv("encoder.convc1", 1, 1, corr_planes, 96)
    conv("encoder.convf1", 7, 7, 2, 64)
    conv("encoder.convf2", 3, 3, 64, 32)
    conv("encoder.conv", 3, 3, 96 + 32, 80)
    # plain ConvGRU; input = context 64 + motion 82 = 146
    for g in ("convz", "convr", "convq"):
        conv(f"gru.{g}", 3, 3, S_HDIM + 146, S_HDIM)
    # FlowHead(96, hidden 128); no convex-mask head (bilinear upsampling)
    conv("flow_head.conv1", 3, 3, S_HDIM, 128)
    conv("flow_head.conv2", 3, 3, 128, 2)
    return s


def param_schema(variant: str = "basic") -> Dict[str, Tuple[int, ...]]:
    s = {}
    if variant == "small":
        s.update(_small_encoder_schema("fnet", 128))
        s.update(_small_encoder_schema("cnet", S_HDIM + S_CDIM))
        s.update(_small_update_schema())
        return s
    s.update(_encoder_schema("fnet", "instance"))
    s.update(_encoder_schema("cnet", "batch"))
    s.update(_update_schema())
    return s


def init_raft(key: jax.Array, variant: str = "basic") -> Params:
    """Random params with the official shapes (for tests; real use imports a
    pretrained checkpoint via :func:`load_torch_weights`)."""
    params: Params = {}
    for name, shape in param_schema(variant).items():
        key, sub = jax.random.split(key)
        if name.endswith("running_var"):
            params[name] = jax.random.uniform(sub, shape, jnp.float32, 0.5, 1.5)
        elif name.endswith(("bias", "running_mean")):
            params[name] = 0.1 * jax.random.normal(sub, shape, jnp.float32)
        elif len(shape) == 1:       # norm weight
            params[name] = jax.random.uniform(sub, shape, jnp.float32, 0.5, 1.5)
        else:
            fan_in = shape[0] * shape[1] * shape[2]
            params[name] = (jax.random.normal(sub, shape, jnp.float32)
                            / math.sqrt(fan_in))
    return params


def detect_variant(keys) -> str:
    """'small' iff the state_dict has the plain-ConvGRU key (the Basic model
    uses SepConvGRU convz1/convz2; --small uses a single convz)."""
    return "small" if any(k.endswith("gru.convz.weight") for k in keys) \
        else "basic"


def load_torch_weights(path: str, variant: str | None = None) -> Params:
    """Import an official RAFT checkpoint (torch ``state_dict``) —
    e.g. ``raft-things.pth`` or ``raft-small.pth`` from the public
    princeton-vl/RAFT release. ``variant=None`` auto-detects via
    :func:`detect_variant`.

    Strips the ``module.`` DataParallel prefix, transposes conv kernels
    OIHW -> HWIO, and drops batch-norm ``num_batches_tracked`` counters.
    Validates every expected key/shape so a wrong/truncated file fails loudly.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: expected a state_dict")
    if "state_dict" in sd and not any(k.startswith(("module.", "fnet."))
                                      for k in sd):
        sd = sd["state_dict"]

    params: Params = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(v.detach().cpu().numpy(), np.float32)
        if arr.ndim == 4:                       # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        params[k] = jnp.asarray(arr)

    if variant is None:
        variant = detect_variant(params)
    schema = param_schema(variant)
    missing = sorted(set(schema) - set(params))
    if missing:
        raise ValueError(f"{path}: missing RAFT ({variant}) params: "
                         f"{missing[:5]} (+{max(len(missing)-5,0)})")
    for name, shape in schema.items():
        if tuple(params[name].shape) != shape:
            raise ValueError(f"{path}: {name} has shape "
                             f"{tuple(params[name].shape)}, want {shape}")
    return {k: v for k, v in params.items() if k in schema}


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free InstanceNorm2d (torch defaults: no affine, biased var)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps)


def _norm(p: Params, prefix: str, x: jnp.ndarray, norm: str) -> jnp.ndarray:
    if norm == "none":          # small cnet: norm_fn='none'
        return x
    if norm == "instance":
        return _instance_norm(x)
    # folded inference-mode BatchNorm2d
    w = p[f"{prefix}.weight"]
    b = p[f"{prefix}.bias"]
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    return (x - mean) * lax.rsqrt(var + 1e-5) * w + b


def _conv(p: Params, name: str, x: jnp.ndarray, stride: int = 1,
          pad: Tuple[int, int] | None = None) -> jnp.ndarray:
    """Conv with torch-style symmetric padding (k//2 by default). Explicit
    padding (not XLA SAME) so strided convs match torch window placement."""
    w = p[f"{name}.weight"]
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = (kh // 2, kw // 2) if pad is None else pad
    return conv2d(x, w, p[f"{name}.bias"], stride=stride,
                  padding=((ph, ph), (pw, pw)))


def _res_block(p: Params, prefix: str, x: jnp.ndarray, stride: int,
               norm: str) -> jnp.ndarray:
    y = jax.nn.relu(_norm(p, f"{prefix}.norm1",
                          _conv(p, f"{prefix}.conv1", x, stride=stride), norm))
    y = jax.nn.relu(_norm(p, f"{prefix}.norm2",
                          _conv(p, f"{prefix}.conv2", y), norm))
    if stride != 1:
        x = _norm(p, f"{prefix}.downsample.1",
                  _conv(p, f"{prefix}.downsample.0", x, stride=stride), norm)
    return jax.nn.relu(x + y)


def _encoder(p: Params, prefix: str, x: jnp.ndarray, norm: str) -> jnp.ndarray:
    """BasicEncoder: 1/8-resolution 256-dim features."""
    x = jax.nn.relu(_norm(p, f"{prefix}.norm1",
                          _conv(p, f"{prefix}.conv1", x, stride=2), norm))
    for li, stride in ((1, 1), (2, 2), (3, 2)):
        x = _res_block(p, f"{prefix}.layer{li}.0", x, stride, norm)
        x = _res_block(p, f"{prefix}.layer{li}.1", x, 1, norm)
    return _conv(p, f"{prefix}.conv2", x)


def _bottleneck_block(p: Params, prefix: str, x: jnp.ndarray, stride: int,
                      norm: str) -> jnp.ndarray:
    """Official BottleneckBlock: 1x1 -> 3x3(stride) -> 1x1 at planes//4,
    relu after every (param-free) norm; 1x1 downsample when strided."""
    y = jax.nn.relu(_norm(p, "", _conv(p, f"{prefix}.conv1", x), norm))
    y = jax.nn.relu(_norm(p, "", _conv(p, f"{prefix}.conv2", y,
                                       stride=stride), norm))
    y = jax.nn.relu(_norm(p, "", _conv(p, f"{prefix}.conv3", y), norm))
    if stride != 1:
        x = _norm(p, "", _conv(p, f"{prefix}.downsample.0", x,
                               stride=stride), norm)
    return jax.nn.relu(x + y)


def _small_encoder(p: Params, prefix: str, x: jnp.ndarray,
                   norm: str) -> jnp.ndarray:
    """SmallEncoder: 1/8-resolution features (out_dim set by conv2)."""
    x = jax.nn.relu(_norm(p, "", _conv(p, f"{prefix}.conv1", x, stride=2),
                          norm))
    for li, stride in ((1, 1), (2, 2), (3, 2)):
        x = _bottleneck_block(p, f"{prefix}.layer{li}.0", x, stride, norm)
        x = _bottleneck_block(p, f"{prefix}.layer{li}.1", x, 1, norm)
    return _conv(p, f"{prefix}.conv2", x)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """torch avg_pool2d(k=2, s=2): floors odd spatial dims (VALID window)."""
    out = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                            "VALID")
    return out * 0.25


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray):
    """All-pairs correlation pyramid.

    fmap1/fmap2: (B, H, W, 256) at 1/8 res. Level i: (B*H*W, H/2^i, W/2^i, 1).
    The full volume is one batched matmul — the op the official code builds
    with a reshaped ``torch.matmul`` and we feed straight to the MXU.
    """
    b, h, w, c = fmap1.shape
    corr = jnp.einsum("bxc,byc->bxy", fmap1.reshape(b, h * w, c),
                      fmap2.reshape(b, h * w, c)) / math.sqrt(c)
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(CORR_LEVELS - 1):
        pyramid.append(_avg_pool2(pyramid[-1]))
    return pyramid


def pad_corr_pyramid(pyramid, r: int = CORR_RADIUS):
    """Zero-pad every level for the patch-form lookup (once per pair —
    lookup_corr runs every refinement iteration inside the lax.scan, so the
    pad must not ride the loop). Pad width = the patch side (2r+2): a window
    whose TRUE start is beyond ±pad is fully out of frame, and the clamped
    slice then lands entirely inside the zero margin — reproducing the
    official zero padding without per-tap validity masks."""
    p = 2 * r + 2
    return [jnp.pad(c[..., 0], ((0, 0), (p, p), (p, p))) for c in pyramid]


def lookup_corr_padded(padded, coords: jnp.ndarray,
                       r: int = CORR_RADIUS) -> jnp.ndarray:
    """Patch-form correlation lookup on a :func:`pad_corr_pyramid` pyramid.

    The official CorrBlock samples (2r+1)^2 bilinear taps per query from
    that query's PRIVATE (h, w) correlation slice — per-point gathers that
    serialize on TPU ((2r+1)^2 x levels x iters points). But the taps are a
    contiguous patch at integer offsets around ONE float coordinate, so the
    fractional bilinear weights are shared by all taps: ONE (2r+2)^2 integer
    patch per query (a vmapped dynamic_slice = a gather of (2r+1)^2-fold
    fewer points) followed by a separable 2-tap hat combine reproduces every
    sample exactly. Channel order matches the official meshgrid(dy, dx)
    quirk: x-offset slow / y-offset fast, levels coarse-last.
    """
    b, h, w, _ = coords.shape
    n = 2 * r + 1
    p = n + 1
    flat = coords.reshape(b * h * w, 2)
    out = []
    for i, cpad in enumerate(padded):
        q, hp2, wp2 = cpad.shape
        hi, wi = hp2 - 2 * p, wp2 - 2 * p
        c = flat / (2 ** i)
        # clip before the int cast (huge/non-finite coords must not wrap);
        # anything past the pad margin reads zeros either way
        cx = jnp.clip(c[:, 0], -2.0 * p - wi, wi + 2.0 * p)
        cy = jnp.clip(c[:, 1], -2.0 * p - hi, hi + 2.0 * p)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0)[:, None, None]
        fy = (cy - y0)[:, None, None]
        ys = jnp.clip(y0.astype(jnp.int32) - r + p, 0, hp2 - p)
        xs = jnp.clip(x0.astype(jnp.int32) - r + p, 0, wp2 - p)
        # ONE flat take_along_axis for all p*p patch cells: XLA's batched
        # element gather runs ~10 ns/value on this chip, while a vmapped
        # (p, p) dynamic_slice lowers ~3 us/SLICE and a per-row (1, p)
        # slice form is worse still (both measured; CLAUDE.md round-4) —
        # slice contiguity buys nothing, value count and the take_along
        # lowering are what matter.
        cells = (jnp.arange(p, dtype=jnp.int32)[:, None] * wp2
                 + jnp.arange(p, dtype=jnp.int32)[None, :]).reshape(-1)
        idx = (ys * wp2 + xs)[:, None] + cells[None]         # (Q, p*p)
        patch = jnp.take_along_axis(cpad.reshape(q, hp2 * wp2), idx,
                                    axis=1).reshape(q, p, p)
        rows = patch[:, :-1, :] * (1 - fy) + patch[:, 1:, :] * fy
        samp = rows[:, :, :-1] * (1 - fx) + rows[:, :, 1:] * fx  # (Q,[y],[x])
        out.append(samp.transpose(0, 2, 1).reshape(b, h, w, n * n))
    return jnp.concatenate(out, axis=-1)


def lookup_corr(pyramid, coords: jnp.ndarray,
                r: int = CORR_RADIUS) -> jnp.ndarray:
    """Sample a (2r+1)^2 neighborhood around ``coords`` at every level.

    coords: (B, H, W, 2) as (x, y) at 1/8 res. Returns (B, H, W, L*(2r+1)^2)
    with the official channel order: per level, x-offset slow / y-offset fast
    (the official meshgrid(dy, dx) quirk), levels concatenated coarse-last.
    (Convenience form over :func:`lookup_corr_padded`; callers in a loop
    should pad once via :func:`pad_corr_pyramid`.)
    """
    return lookup_corr_padded(pad_corr_pyramid(pyramid, r), coords, r)


def lookup_corr_matmul(pyramid, coords: jnp.ndarray,
                       r: int = CORR_RADIUS,
                       precision=None) -> jnp.ndarray:
    """Bilinear corr lookup as two hat-weighted batched matmuls (no gather).

    The take_along_axis patch form (:func:`lookup_corr_padded`) is
    take-BOUND: ~10 ns/value x (2r+2)^2 x levels x iters serialized element
    reads ≈ 330 of the 441.8 ms/pair (round-4 record). But the read is
    separable bilinear sampling from each query's PRIVATE (hi, wi) slice —
    exactly the structure ops/warp.py resample2d_windowed turns into
    matmuls, batched over the query axis:

      rows[p, a, :] = sum_k RA[p, a, k] * vol[p, k, :]
      taps[p, a, b] = sum_j CB[p, b, j] * rows[p, a, j]

    where RA/CB are 2-tap HAT row vectors ((1-f) at floor+offset, f at
    floor+offset+1) built from iota comparisons — the bilinear weights are
    FOLDED into the selection, so the (2r+1)^2 output needs no post-combine
    and indices that fall outside the slice simply match no iota and read
    EXACT ZEROS (the official zero-padding contract; this form needs no
    padded pyramid copy at all). Per level the pair of einsums is a
    batched (n, hi) @ (hi, wi) then (n, wi) @ (wi, n) contraction — dense
    MXU/VPU work whose FLOPs (~2 GFLOP/iter at 440x1024) replace the
    serialized take entirely. RAFT slices are small (55x128 at 1/8 res),
    so windowing the contraction would save <2x FLOPs and add an anchor
    control plane — the full-slice form is the measured winner
    (docs/PERF.md round-5).

    Exactness: the hat weights are exact f32; on TPU the einsum's default
    single bf16 pass rounds the corr VALUES (~0.4% rel) — pass
    ``precision=jax.lax.Precision.HIGHEST`` for true-f32 parity runs
    (measured EPE impact of the default pass: see docs/PERF.md).

    pyramid: the RAW (unpadded) :func:`build_corr_pyramid` output.
    Returns (B, H, W, L*(2r+1)^2), official channel order (x slow/y fast).
    """
    b, h, w, _ = coords.shape
    n = 2 * r + 1
    flat = coords.reshape(b * h * w, 2)
    out = []
    for i, lvl in enumerate(pyramid):
        q, hi, wi, _ = lvl.shape
        vol = lvl[..., 0]                                 # (Q, hi, wi)
        c = flat / (2 ** i)
        # clip before the int cast (huge/non-finite coords must not wrap);
        # anything outside [0, hi/wi) reads zeros via the iota compares
        cx = jnp.clip(c[:, 0], -2.0 * n, wi + 2.0 * n)
        cy = jnp.clip(c[:, 1], -2.0 * n, hi + 2.0 * n)
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        fx = (cx - x0).astype(vol.dtype)[:, None, None]
        fy = (cy - y0).astype(vol.dtype)[:, None, None]
        offs = jnp.arange(n, dtype=jnp.int32) - r
        ty = y0.astype(jnp.int32)[:, None] + offs[None]   # (Q, n)
        tx = x0.astype(jnp.int32)[:, None] + offs[None]
        ks = jnp.arange(hi, dtype=jnp.int32)
        js = jnp.arange(wi, dtype=jnp.int32)
        ra = ((ks[None, None] == ty[:, :, None]).astype(vol.dtype) * (1 - fy)
              + (ks[None, None] == ty[:, :, None] + 1).astype(vol.dtype) * fy)
        cb = ((js[None, None] == tx[:, :, None]).astype(vol.dtype) * (1 - fx)
              + (js[None, None] == tx[:, :, None] + 1).astype(vol.dtype) * fx)
        rows = jnp.einsum("pak,pkw->paw", ra, vol, precision=precision)
        taps = jnp.einsum("pbw,paw->pab", cb, rows, precision=precision)
        # official channel order: x-offset slow / y-offset fast
        out.append(taps.transpose(0, 2, 1).reshape(b, h, w, n * n))
    return jnp.concatenate(out, axis=-1)


def _sep_conv_gru(p: Params, net: jnp.ndarray, inp: jnp.ndarray) -> jnp.ndarray:
    g = "update_block.gru"
    for suffix, pad in (("1", (0, 2)), ("2", (2, 0))):
        hx = jnp.concatenate([net, inp], axis=-1)
        z = jax.nn.sigmoid(_conv(p, f"{g}.convz{suffix}", hx, pad=pad))
        r = jax.nn.sigmoid(_conv(p, f"{g}.convr{suffix}", hx, pad=pad))
        q = jnp.tanh(_conv(p, f"{g}.convq{suffix}",
                           jnp.concatenate([r * net, inp], axis=-1), pad=pad))
        net = (1.0 - z) * net + z * q
    return net


def _motion_encoder(p: Params, flow: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
    e = "update_block.encoder"
    cor = jax.nn.relu(_conv(p, f"{e}.convc1", corr))
    cor = jax.nn.relu(_conv(p, f"{e}.convc2", cor))
    flo = jax.nn.relu(_conv(p, f"{e}.convf1", flow))
    flo = jax.nn.relu(_conv(p, f"{e}.convf2", flo))
    out = jax.nn.relu(_conv(p, f"{e}.conv",
                            jnp.concatenate([cor, flo], axis=-1)))
    return jnp.concatenate([out, flow], axis=-1)


def _update_block(p: Params, net, inp, corr, flow):
    motion = _motion_encoder(p, flow, corr)
    net = _sep_conv_gru(p, net, jnp.concatenate([inp, motion], axis=-1))
    dflow = _conv(p, "update_block.flow_head.conv2",
                  jax.nn.relu(_conv(p, "update_block.flow_head.conv1", net)))
    mask = 0.25 * _conv(p, "update_block.mask.2",
                        jax.nn.relu(_conv(p, "update_block.mask.0", net)))
    return net, mask, dflow


def _conv_gru(p: Params, net: jnp.ndarray, inp: jnp.ndarray) -> jnp.ndarray:
    """Plain 3x3 ConvGRU (the --small update block's recurrence)."""
    g = "update_block.gru"
    hx = jnp.concatenate([net, inp], axis=-1)
    z = jax.nn.sigmoid(_conv(p, f"{g}.convz", hx))
    r = jax.nn.sigmoid(_conv(p, f"{g}.convr", hx))
    q = jnp.tanh(_conv(p, f"{g}.convq",
                       jnp.concatenate([r * net, inp], axis=-1)))
    return (1.0 - z) * net + z * q


def _small_motion_encoder(p: Params, flow: jnp.ndarray,
                          corr: jnp.ndarray) -> jnp.ndarray:
    e = "update_block.encoder"
    cor = jax.nn.relu(_conv(p, f"{e}.convc1", corr))
    flo = jax.nn.relu(_conv(p, f"{e}.convf1", flow))
    flo = jax.nn.relu(_conv(p, f"{e}.convf2", flo))
    out = jax.nn.relu(_conv(p, f"{e}.conv",
                            jnp.concatenate([cor, flo], axis=-1)))
    return jnp.concatenate([out, flow], axis=-1)


def _small_update_block(p: Params, net, inp, corr, flow):
    motion = _small_motion_encoder(p, flow, corr)
    net = _conv_gru(p, net, jnp.concatenate([inp, motion], axis=-1))
    dflow = _conv(p, "update_block.flow_head.conv2",
                  jax.nn.relu(_conv(p, "update_block.flow_head.conv1", net)))
    return net, dflow


def upsample_flow_bilinear8(flow: jnp.ndarray) -> jnp.ndarray:
    """``upflow8``: 8 * bilinear resize with align_corners=True (the --small
    model has no convex mask head)."""
    b, h, w, _ = flow.shape
    ys = jnp.arange(8 * h, dtype=flow.dtype) * ((h - 1) / (8 * h - 1))
    xs = jnp.arange(8 * w, dtype=flow.dtype) * ((w - 1) / (8 * w - 1))
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gy = jnp.broadcast_to(gy[None], (b, 8 * h, 8 * w))
    gx = jnp.broadcast_to(gx[None], (b, 8 * h, 8 * w))
    return 8.0 * sample_bilinear(flow, gx, gy, padding="border")


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Learned convex 8x upsampling. flow (B,H,W,2), mask (B,H,W,576).

    Official channel layout (from ``mask.view(N,1,9,8,8,H,W)``): channel
    c = k*64 + dy*8 + dx, with k enumerating the 3x3 unfold window row-major.
    """
    b, h, w, _ = flow.shape
    flow8 = 8.0 * flow
    # 3x3 unfold via shifted zero-padded slices: taps[k] = flow8 shifted so
    # taps[k][y, x] = flow8[y + ky - 1, x + kx - 1], k = ky*3 + kx
    padded = jnp.pad(flow8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([padded[:, ky:ky + h, kx:kx + w, :]
                      for ky in range(3) for kx in range(3)], axis=3)
    m = jax.nn.softmax(mask.reshape(b, h, w, 9, 64), axis=3)
    up = jnp.einsum("bhwkd,bhwkc->bhwdc", m, taps)     # (B,H,W,64,2)
    up = up.reshape(b, h, w, 8, 8, 2)
    # d = dy*8+dx; full-res pixel (8y+dy, 8x+dx)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def _coords_grid(b: int, h: int, w: int) -> jnp.ndarray:
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.broadcast_to(jnp.stack([xs, ys], axis=-1)[None], (b, h, w, 2))


@partial(jax.jit, static_argnames=("iters", "variant", "lookup",
                                   "lookup_precision"))
def raft_flow(params: Params, image1: jnp.ndarray, image2: jnp.ndarray,
              iters: int = 20, variant: str = "basic",
              lookup: str = "matmul", lookup_precision=None) -> jnp.ndarray:
    """Flow from image1 to image2 at full resolution.

    image1/image2: (B, H, W, 3) in [0, 255], H and W multiples of 8 (use
    :func:`pad_to_multiple` otherwise). Returns (B, H, W, 2) pixel flow
    (dx, dy) — the channel convention the rest of the framework uses.
    The recurrent refinement is a ``lax.scan`` so the program stays one
    compiled step regardless of ``iters`` (the reference ran 20).
    ``variant`` selects the official model family: "basic" (SepConvGRU +
    convex upsampling) or "small" (SmallEncoder, plain ConvGRU, bilinear
    upsampling, corr radius 3). ``lookup``: "matmul" (hat-weighted batched
    matmuls, :func:`lookup_corr_matmul` — the fast TPU form) or "take"
    (the flat take_along_axis patch form; exact-gather reference).
    ``lookup_precision``: forwarded to :func:`lookup_corr_matmul` —
    ``jax.lax.Precision.HIGHEST`` makes the matmul lookup ulp-exact vs
    the take form on TPU at ~1.1x the default-precision cost (53.5 vs
    48.1 ms/pair; docs/PERF.md), the fast option for fidelity runs.
    """
    if lookup not in ("matmul", "take"):
        raise ValueError(f"lookup={lookup!r}: want 'matmul' or 'take' "
                         "(a typo would silently fall back to the ~9x "
                         "slower take path)")
    small = variant == "small"
    x1 = 2.0 * (image1 / 255.0) - 1.0
    x2 = 2.0 * (image2 / 255.0) - 1.0

    # official fnet runs both images as one batch — InstanceNorm makes that
    # equivalent to two separate calls; batch them for one MXU pass
    fenc = _small_encoder if small else _encoder
    fmaps = fenc(params, "fnet", jnp.concatenate([x1, x2], 0), "instance")
    fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
    radius0 = S_CORR_RADIUS if small else CORR_RADIUS
    raw_pyramid = build_corr_pyramid(fmap1, fmap2)
    if lookup == "matmul":
        lookup_fn = partial(lookup_corr_matmul, raw_pyramid,
                            precision=lookup_precision)
    else:
        padded = pad_corr_pyramid(raw_pyramid, radius0)
        lookup_fn = partial(lookup_corr_padded, padded)

    if small:
        cnet = _small_encoder(params, "cnet", x1, "none")
        hdim, radius = S_HDIM, S_CORR_RADIUS
    else:
        cnet = _encoder(params, "cnet", x1, "batch")
        hdim, radius = HDIM, CORR_RADIUS
    net = jnp.tanh(cnet[..., :hdim])
    inp = jax.nn.relu(cnet[..., hdim:])

    b, h, w, _ = fmap1.shape
    coords0 = _coords_grid(b, h, w)

    if small:
        def step(carry, _):
            net, coords1 = carry
            corr = lookup_fn(coords1, r=radius)
            flow = coords1 - coords0
            net, dflow = _small_update_block(params, net, inp, corr, flow)
            return (net, coords1 + dflow), None

        (net, coords1), _ = lax.scan(step, (net, coords0), None,
                                     length=iters)
        return upsample_flow_bilinear8(coords1 - coords0)

    def step(carry, _):
        net, coords1, _ = carry
        corr = lookup_fn(coords1)
        flow = coords1 - coords0
        net, mask, dflow = _update_block(params, net, inp, corr, flow)
        # carry the mask (only the final iteration's is consumed) instead of
        # stacking iters copies of a (B,H,W,576) tensor through the scan
        return (net, coords1 + dflow, mask), None

    mask0 = jnp.zeros((b, h, w, 64 * 9), jnp.float32)
    (net, coords1, mask), _ = lax.scan(step, (net, coords0, mask0), None,
                                       length=iters)
    return upsample_flow_convex(coords1 - coords0, mask)


def pad_to_multiple(img: jnp.ndarray, mult: int = 8):
    """Replicate-pad (B, H, W, C) up to the next multiple (the official
    ``InputPadder``, sintel mode: split padding between both sides)."""
    _, h, w, _ = img.shape
    ph = (-h) % mult
    pw = (-w) % mult
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    return jnp.pad(img, pads, mode="edge"), pads


def unpad(x: jnp.ndarray, pads) -> jnp.ndarray:
    _, (t, b), (l, r), _ = pads
    return x[:, t:x.shape[1] - b if b else None,
             l:x.shape[2] - r if r else None, :]


def make_raft_producer(ckpt_path: str, iters: int = 20,
                       batch_pairs: int = 4):
    """A pseudo-GT flow producer backed by this module.

    Returns a callable ``(frame1, frame2) -> (H, W, 2)`` (frames float [0,1])
    compatible with :func:`sin_inn_tpu.data.flow_media.generate_pseudo_gt` —
    the drop-in replacement for the reference's external RAFT run
    (video-interpolation/data.py:32-62, 20 iterations there too). The
    ``batch_pairs`` attribute lets ``generate_pseudo_gt`` stack that many
    consecutive pairs per device call (relay-sync amortization). The model
    variant (basic / ``--small``) is auto-detected from the checkpoint.
    """
    params = load_torch_weights(ckpt_path)
    variant = detect_variant(params)

    def producer(frame1: np.ndarray, frame2: np.ndarray) -> np.ndarray:
        # accepts one (H, W, 3) pair or a (B, H, W, 3) batch of pairs —
        # generate_pseudo_gt batches `batch_pairs` consecutive pairs per
        # device call to amortize the relayed-TPU per-call sync (~27 ms)
        batched = np.asarray(frame1).ndim == 4
        f1 = jnp.asarray(frame1, jnp.float32) * 255.0
        f2 = jnp.asarray(frame2, jnp.float32) * 255.0
        if not batched:
            f1, f2 = f1[None], f2[None]
        f1, pads = pad_to_multiple(f1)
        f2, _ = pad_to_multiple(f2)
        flow = raft_flow(params, f1, f2, iters=iters, variant=variant)
        flow = unpad(flow, pads)
        return np.asarray(flow if batched else flow[0])

    producer.batch_pairs = batch_pairs
    return producer
