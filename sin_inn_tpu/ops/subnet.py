"""Coupling-block subnets: plain conv stacks and the dense block.

Functional (init, apply) equivalents of the reference subnets:
  * ``subnet_conv`` / ``subnet_conv_1x1`` (/root/reference/archs.py:11-17) —
    Conv(c_in->256, k) ReLU Conv(256->c_out, k), torch-default init.
  * ``DenseBlock`` (/root/reference/archs.py:74-133) — 5-conv dense block with
    LeakyReLU(0.2), xavier-normal(x0.1) init on convs 1-4 and a zero-init last
    conv so each coupling starts as the identity map.

All convs are NHWC with HWIO kernels: on TPU, XLA lowers them to MXU matmuls
over the channel dimension (channels here are 84-256 wide — MXU-friendly),
and fuses the activations; no hand-written kernel is needed for these.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
           stride: int = 1, padding: str | Sequence = "SAME",
           compute_dtype=None) -> jnp.ndarray:
    """NHWC conv. With ``compute_dtype`` (e.g. bfloat16) the MXU inputs are
    cast down while accumulation and the returned activation stay float32 —
    the TPU mixed-precision recipe. Params remain f32 master copies."""
    out_dtype = x.dtype
    precision = None
    if compute_dtype == "highest":
        # strict-parity mode: true f32 matmuls (6-pass on TPU); used when
        # exact inversion / golden comparisons matter more than speed
        precision = lax.Precision.HIGHEST
    elif compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # No preferred_element_type upcast here: keeping the conv's output dtype
    # equal to its input dtype keeps the transpose (gradient) convs
    # dtype-consistent under jax.grad; the TPU MXU still accumulates in f32
    # internally for bf16 inputs.
    out = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=_DIMNUMS, precision=precision,
    )
    out = out.astype(out_dtype)
    if b is not None:
        out = out + b
    return out


# ---------------------------------------------------------------------------
# Initializers replicating the torch schemes the reference relies on.
# ---------------------------------------------------------------------------

def _torch_default_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """torch.nn.Conv2d default: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))."""
    kw_, kb = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw_, (kh, kw, cin, cout), dtype, -bound, bound)
    b = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _xavier_normal_conv(key, kh, kw, cin, cout, scale=1.0, dtype=jnp.float32):
    """nn.init.xavier_normal_ then weight *= scale; zero bias (archs.py:116-130)."""
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw
    std = math.sqrt(2.0 / (fan_in + fan_out)) * scale
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) * std
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def _zero_conv(kh, kw, cin, cout, dtype=jnp.float32):
    """Last dense-block conv: kaiming init scaled by 0 == zeros (archs.py:86,103-104)."""
    return {"w": jnp.zeros((kh, kw, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


# ---------------------------------------------------------------------------
# Plain conv subnet (SRFlow GLOW couplings)
# ---------------------------------------------------------------------------

def conv_subnet_init(key, c_in: int, c_out: int, kernel: int,
                     hidden: int = 256, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _torch_default_conv(k1, kernel, kernel, c_in, hidden, dtype),
        "conv2": _torch_default_conv(k2, kernel, kernel, hidden, c_out, dtype),
    }


def conv_subnet_apply(params: Dict, x: jnp.ndarray,
                      compute_dtype=None) -> jnp.ndarray:
    h = conv2d(x, params["conv1"]["w"], params["conv1"]["b"],
               compute_dtype=compute_dtype)
    h = jax.nn.relu(h)
    return conv2d(h, params["conv2"]["w"], params["conv2"]["b"],
                  compute_dtype=compute_dtype)


def conv2d_shift(x: jnp.ndarray, w: jnp.ndarray,
                 b: jnp.ndarray | None = None,
                 compute_dtype=None) -> jnp.ndarray:
    """3x3 SAME conv as 9 shifted (M, cin) @ (cin, cout) matmuls.

    Identical math to :func:`conv2d` up to summation order, kept as a
    MEASURED RETIREMENT record (round 3): the hypothesis was that XLA's
    conv lowering is im2col-traffic-bound at the IRN dense-block channel
    counts (a patch-buffer model predicts ~22 GB/pass ~= the measured
    22.6 ms forward) and that re-reading the input per tap would halve
    that. Measured full IRN flagship step: 449 ms vs 176 ms — 2.5x
    WORSE (bf16: 248 vs 147 ms). The K=cin MXU lane padding
    (24/128..152/128 utilization) and nine separate M=115200 matmuls
    lose far more than any patch-buffer traffic; same conclusion as the
    Pallas 9-shift coupling kernels (ops/pallas/coupling3x3.py). XLA's native conv is the local
    optimum for these blocks; the bf16 activation chain (compute_dtype)
    is the lever that actually pays: 176 -> 147 ms (45.4 -> 54.5 f/s).
    """
    assert w.shape[0] == 3 and w.shape[1] == 3
    out_dtype = x.dtype
    if compute_dtype is not None and compute_dtype != "highest":
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    _, hh, ww_, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for i in range(3):
        for j in range(3):
            t = xp[:, i:i + hh, j:j + ww_, :] @ w[i, j]
            out = t if out is None else out + t
    out = out.astype(out_dtype)
    if b is not None:
        out = out + b
    return out


# ---------------------------------------------------------------------------
# DenseBlock (IRN couplings)
# ---------------------------------------------------------------------------

def dense_block_init(key, c_in: int, c_out: int, gc: int = 32,
                     dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 4)
    params = {}
    for i in range(4):
        params[f"conv{i+1}"] = _xavier_normal_conv(
            ks[i], 3, 3, c_in + i * gc, gc, scale=0.1, dtype=dtype)
    params["conv5"] = _zero_conv(3, 3, c_in + 4 * gc, c_out, dtype)
    return params


def dense_block_apply(params: Dict, x: jnp.ndarray,
                      compute_dtype=None, fused: bool = False,
                      shift: bool = False) -> jnp.ndarray:
    """DenseBlock forward (archs.py:88-95).

    ``fused=True`` computes the same math as the reference's concat chain
    in **lower-triangular piece form**: conv_i(cat(x, x1..)) =
    sum_j conv(piece_j, W_i[cin-slice of piece_j]), and each piece's
    contributions to ALL later convs run as ONE wide conv — five Cout=32
    convs (25% output-lane utilization) become five convs of Cout
    4*gc+c_out, 3*gc+c_out, ..., and the growing concats disappear.
    Measured on the v5e (batch 8 flagship shapes) it LOSES: fwd+grad
    7.10 vs 6.44 ms at the 24->24 oct1 block and a wash (3.61 vs 3.61)
    at oct2 — output-lane padding is not what bounds these convs, and
    the piece form's extra weight-slicing/recombination costs more than
    the concats it removes. Kept (default OFF) with a parity test as the
    measured record, like the coupling3x3 retirement.

    **Why the IRN conv stack is at its ceiling (round-3 closure of the
    "optimize IRN" item).** MXU tile-quantization accounting: a matmul
    costs ceil(K/128)*ceil(N/128) tile-passes streaming M rows, so its
    padded-FLOP cost is 2*M*K_pad*N_pad regardless of fill. Every
    dense-block conv has cout = gc = 32 (or c_out <= 108), i.e. 25-84%
    of ONE output tile. Summing over the flagship IRN stack:

    * XLA's im2col form (K = 9*cin = 216..2124, N = 128-padded):
      padded/ideal = 4.7x (oct1) / 2.9x (oct2) -> ~2.2 padded TFLOP per
      forward -> >= 14.6 ms at the 151 TFLOP/s measured bf16 peak. The
      shipped bf16 forward measures ~13-15 ms: **XLA already runs AT its
      tile-quantization bound** — there is no implementation headroom
      left, only traffic was left and bf16 took it.
    * Any per-tap 9-shift form (XLA or Pallas, incl. a VMEM-fused dense
      block): K = cin_pad per tap -> padded/ideal = 7.6x (oct1) / 3.7x
      (oct2) -> >= 22 ms at peak with ZERO memory traffic — cannot beat
      XLA even in the ideal limit. A winning kernel would need im2col
      built in VMEM (K = 9*cin), which Mosaic cannot lower (the
      lane-misaligned concat blocker recorded in
      ops/pallas/coupling3x3.py).

    The bound is architectural — InvRescaleNet's growth channel gc=32
    fills a quarter of the MXU's 128-lane output tile — so 54.5 frames/s
    (bf16 chain) is ~speed-of-light for this architecture on this
    hardware; the lever that remains (gc=128) would change the model.
    """
    lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
    if not fused:
        base = conv2d_shift if shift else conv2d
        cv = lambda inp, p: base(inp, p["w"], p["b"],
                                 compute_dtype=compute_dtype)
        x1 = lrelu(cv(x, params["conv1"]))
        cat = jnp.concatenate([x, x1], axis=-1)
        x2 = lrelu(cv(cat, params["conv2"]))
        cat = jnp.concatenate([cat, x2], axis=-1)
        x3 = lrelu(cv(cat, params["conv3"]))
        cat = jnp.concatenate([cat, x3], axis=-1)
        x4 = lrelu(cv(cat, params["conv4"]))
        cat = jnp.concatenate([cat, x4], axis=-1)
        return cv(cat, params["conv5"])

    c_in = x.shape[-1]
    gc = params["conv1"]["w"].shape[-1]
    ws = [params[f"conv{i}"]["w"] for i in range(1, 6)]
    bs = [params[f"conv{i}"]["b"] for i in range(1, 6)]
    def contrib(piece, start_conv, lo, hi):
        """One wide conv: piece's contribution to convs start_conv..5,
        where [lo, hi) is the piece's cin-slice in each later conv."""
        w_cat = jnp.concatenate([ws[i][:, :, lo:hi] for i in
                                 range(start_conv, 5)], axis=-1)
        return conv2d(piece, w_cat, None, compute_dtype=compute_dtype)

    # x's contribution carries the biases (added exactly once per conv)
    b_cat = jnp.concatenate(bs)
    yx = contrib(x, 0, 0, c_in) + b_cat
    x1 = lrelu(yx[..., :gc])
    y1 = contrib(x1, 1, c_in, c_in + gc)
    x2 = lrelu(yx[..., gc:2 * gc] + y1[..., :gc])
    y2 = contrib(x2, 2, c_in + gc, c_in + 2 * gc)
    x3 = lrelu(yx[..., 2 * gc:3 * gc] + y1[..., gc:2 * gc] + y2[..., :gc])
    y3 = contrib(x3, 3, c_in + 2 * gc, c_in + 3 * gc)
    x4 = lrelu(yx[..., 3 * gc:4 * gc] + y1[..., 2 * gc:3 * gc]
               + y2[..., gc:2 * gc] + y3[..., :gc])
    y4 = contrib(x4, 4, c_in + 3 * gc, c_in + 4 * gc)
    return (yx[..., 4 * gc:] + y1[..., 3 * gc:] + y2[..., 2 * gc:]
            + y3[..., gc:] + y4)
