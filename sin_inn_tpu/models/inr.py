"""Implicit neural representation (INR) model zoo.

Functional equivalent of /root/reference/video-interpolation/model.py:31-684:
a coordinate MLP fed by one of the encodings in
:mod:`sin_inn_tpu.ops.encodings`, with the 13-entry registry of the reference
``model_dict`` (model.py:681-684). Progressive variants concatenate the raw
coordinates to the encoding and accept a per-channel (optionally per-point)
soft mask (model.py:526-576).

API:
    spec, params, consts = build_inr(key, name, cfg)
    out = inr_apply(spec, params, consts, x, override_mask=None, alpha=None)

``params`` is the trainable pytree (MLP weights + any trainable encoding
leaves); ``consts`` holds fixed buffers. The whole model is matmuls +
elementwise — pure MXU work; a (t*h*w, E) point batch runs as a handful of
large GEMMs under jit, and shards trivially over the point axis
(see parallel/).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sin_inn_tpu.core.config import FlowConfig
from sin_inn_tpu.ops.encodings import ENCODINGS, encoding_output_channels


# --------------------------------------------------------------------------
# MLP (torch-default init) and SIREN
# --------------------------------------------------------------------------

def _torch_linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {"w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)}


def mlp_init(key, layers: List[int], dtype=jnp.float32) -> List[Dict]:
    params = []
    for i in range(len(layers) - 1):
        key, k = jax.random.split(key)
        params.append(_torch_linear_init(k, layers[i], layers[i + 1], dtype))
    return params


def mlp_apply(params: List[Dict], x: jnp.ndarray,
              compute_dtype: Optional[str] = None) -> jnp.ndarray:
    """Linear->ReLU chain, no activation after the last layer (model.py:36-43).

    ``compute_dtype='bfloat16'`` runs the whole chain (matmuls AND
    activations) in bf16 with f32 master params and an f32 result — at INR
    scale the (points, hidden) activations are the HBM traffic, so casting
    per-matmul would not help. ``'float32_highest'`` forces true f32 (6-pass)
    matmuls for strict parity runs; default is the TPU's standard
    f32-in/bf16-pass matmul.
    """
    out_dtype = x.dtype
    precision = None
    cast = None
    if compute_dtype in ("highest", "float32_highest"):
        precision = jax.lax.Precision.HIGHEST
    elif compute_dtype not in (None, "float32"):
        cast = jnp.dtype(compute_dtype)
        x = x.astype(cast)
    for i, layer in enumerate(params):
        w, b = layer["w"], layer["b"]
        if cast is not None:
            w = w.astype(cast)
            b = b.astype(cast)
        x = jnp.matmul(x, w, precision=precision) + b
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x.astype(out_dtype)


def siren_init(key, domain_dim: int, hidden: int, num_layers: int,
               out_ch: int, omega0: float = 30.0, dtype=jnp.float32):
    """SIREN init (model.py:123-171): first layer U(+-1/in), hidden layers
    U(+-sqrt(6/in)/omega0), final linear U(+-sqrt(6/hidden)/omega0)."""
    params = []
    key, k = jax.random.split(key)
    b0 = 1.0 / domain_dim
    params.append({
        "w": jax.random.uniform(k, (domain_dim, hidden), dtype, -b0, b0),
        "b": _torch_linear_init(jax.random.fold_in(k, 1), domain_dim, hidden)["b"],
    })
    for _ in range(num_layers):
        key, k = jax.random.split(key)
        bh = math.sqrt(6.0 / hidden) / omega0
        params.append({
            "w": jax.random.uniform(k, (hidden, hidden), dtype, -bh, bh),
            "b": _torch_linear_init(jax.random.fold_in(k, 1), hidden, hidden)["b"],
        })
    key, k = jax.random.split(key)
    bf = math.sqrt(6.0 / hidden) / omega0
    params.append({
        "w": jax.random.uniform(k, (hidden, out_ch), dtype, -bf, bf),
        "b": _torch_linear_init(jax.random.fold_in(k, 1), hidden, out_ch)["b"],
    })
    return params


def siren_apply(params: List[Dict], x: jnp.ndarray,
                omega0: float = 30.0,
                compute_dtype: Optional[str] = None) -> jnp.ndarray:
    """Sine chain; same ``compute_dtype`` semantics as :func:`mlp_apply`."""
    out_dtype = x.dtype
    precision = None
    cast = None
    if compute_dtype in ("highest", "float32_highest"):
        precision = jax.lax.Precision.HIGHEST
    elif compute_dtype not in (None, "float32"):
        cast = jnp.dtype(compute_dtype)
        x = x.astype(cast)

    def lin(x, layer):
        w, b = layer["w"], layer["b"]
        if cast is not None:
            w = w.astype(cast)
            b = b.astype(cast)
        return jnp.matmul(x, w, precision=precision) + b

    for layer in params[:-1]:
        x = jnp.sin(omega0 * lin(x, layer))
    return lin(x, params[-1]).astype(out_dtype)


# --------------------------------------------------------------------------
# Model spec + registry
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class INRSpec:
    name: str
    kind: str                # 'mlp' | 'siren' | 'encoded'
    encoding: Optional[str]  # key into ENCODINGS, None for mlp/siren
    domain_dim: int
    encoding_dim: int        # mask length: enc channels (+ domain for progressive)
    is_progressive: bool
    hidden_dim: int
    num_layers: int
    output_channels: int
    # MLP matmul/activation dtype: 'float32' (default bf16-pass matmuls),
    # 'bfloat16' (explicit bf16 chain), 'float32_highest' (true f32)
    compute_dtype: str = "float32"
    # Fused Pallas encode->mask->MLP kernel with hand-derived weight-grad
    # backward (ops/pallas/inr.py): 'auto' (on TPU when eligible), 'on',
    # 'off'. Eligibility: fixed (non-trainable) rbf/ff encodings, vector
    # or no mask, 128-multiple widths — see fused_inr_supported.
    use_pallas: str = "off"


# name -> (kind, encoding, progressive)   (reference model_dict, model.py:681-684)
MODEL_REGISTRY: Dict[str, Tuple[str, Optional[str], bool]] = {
    "siren": ("siren", None, False),
    "FFN": ("encoded", "gaussian_ff", False),
    "UFF": ("encoded", "uniform_ff", False),
    "PFF": ("encoded", "gaussian_ff", True),
    "RBF": ("encoded", "rbf", False),
    "PRBF": ("encoded", "rbf", True),
    "RBFG": ("encoded", "rbf_grid_uniform", False),
    "PRBFG": ("encoded", "rbf_grid_uniform", True),
    "PE": ("encoded", "positional", False),
    "PPE": ("encoded", "positional", True),
    "RFF": ("encoded", "rotated_ff", False),
    "PRFF": ("encoded", "rotated_ff", True),
    "PUFF": ("encoded", "uniform_ff", True),
    "MPFF": ("encoded", "piecewise_uniform", True),
    "base": ("mlp", None, False),
}


def _enc_args(encoding: str, cfg: FlowConfig):
    if encoding == "positional":
        return (cfg.domain_dim, cfg.num_frequencies_pe)
    if encoding in ("rbf", "rbf_grid_random", "rbf_grid_uniform"):
        return (cfg.domain_dim, cfg.num_frequencies, cfg.std_rbf)
    return (cfg.domain_dim, cfg.num_frequencies, cfg.std)


def _enc_out_channels(encoding: str, cfg: FlowConfig) -> int:
    if encoding == "positional":
        return encoding_output_channels("positional", cfg.num_frequencies_pe,
                                        cfg.domain_dim)
    if encoding == "rbf":
        # reference RadialBasisEncoding doubles num_frequencies internally
        return 2 * cfg.num_frequencies
    if encoding in ("rbf_grid_random", "rbf_grid_uniform"):
        return 2 * cfg.num_frequencies
    return 2 * cfg.num_frequencies


def build_inr(key: jax.Array, name: str, cfg: FlowConfig
              ) -> Tuple[INRSpec, Any, Any]:
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown INR model {name!r}; have {sorted(MODEL_REGISTRY)}")
    kind, encoding, progressive = MODEL_REGISTRY[name]
    d = cfg.domain_dim

    if kind == "mlp":
        spec = INRSpec(name, kind, None, d, d, False, cfg.hidden_dim,
                       cfg.num_layers, cfg.output_channels,
                       cfg.compute_dtype)
        mlp = mlp_init(key, [d] + [cfg.hidden_dim] * cfg.num_layers
                       + [cfg.output_channels])
        return spec, {"mlp": mlp}, {}

    if kind == "siren":
        spec = INRSpec(name, kind, None, d, d, False, cfg.hidden_dim,
                       cfg.num_layers, cfg.output_channels,
                       cfg.compute_dtype)
        mlp = siren_init(key, d, cfg.hidden_dim, cfg.num_layers,
                         cfg.output_channels)
        return spec, {"mlp": mlp}, {}

    k_enc, k_mlp = jax.random.split(key)
    init_fn, _ = ENCODINGS[encoding]
    enc_params, enc_consts = init_fn(k_enc, *_enc_args(encoding, cfg))
    enc_ch = _enc_out_channels(encoding, cfg)
    # Progressive models concatenate the raw coords (model.py:532-535,540-542)
    mask_dim = enc_ch + d if progressive else enc_ch
    spec = INRSpec(name, "encoded", encoding, d, mask_dim, progressive,
                   cfg.hidden_dim, cfg.num_layers, cfg.output_channels,
                   cfg.compute_dtype, getattr(cfg, "use_pallas", "off"))
    mlp = mlp_init(k_mlp, [mask_dim] + [cfg.hidden_dim] * cfg.num_layers
                   + [cfg.output_channels])
    return spec, {"mlp": mlp, "enc": enc_params}, {"enc": enc_consts}


def get_encoding(spec: INRSpec, params, consts, x: jnp.ndarray) -> jnp.ndarray:
    """Encoding with raw-coord concat for progressive models
    (model.py:532-535)."""
    if spec.kind != "encoded":
        return x
    _, apply_fn = ENCODINGS[spec.encoding]
    enc = apply_fn(params.get("enc", {}), consts.get("enc", {}), x)
    if spec.is_progressive:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def alpha_mask(spec: INRSpec, alpha: float) -> jnp.ndarray:
    """Dense soft mask for a progress fraction (model.py:544-552)."""
    e = spec.encoding_dim
    if alpha == 0:
        return jnp.zeros((e,))
    a = alpha * (e - spec.domain_dim) + spec.domain_dim
    idx = jnp.arange(e, dtype=jnp.float32)
    cur = jnp.floor(a)
    return jnp.where(idx < cur, 1.0, jnp.where(idx == cur, a - cur, 0.0))


def inr_apply(spec: INRSpec, params, consts, x: jnp.ndarray,
              override_mask: Optional[jnp.ndarray] = None,
              alpha: Optional[float] = None) -> jnp.ndarray:
    """encode -> mask -> MLP (model.py:95-99)."""
    if spec.use_pallas in ("on", "auto"):
        from sin_inn_tpu.ops.pallas.inr import (fused_inr_apply,
                                                fused_inr_available,
                                                fused_inr_eligible)
        mask = override_mask
        if (mask is None and alpha is not None and spec.is_progressive
                and alpha < 1):
            mask = alpha_mask(spec, alpha)
        if fused_inr_eligible(spec, params, consts, x, mask):
            interp = (spec.use_pallas == "on"
                      and not fused_inr_available())
            # Operand dtype follows the compute_dtype contract: only an
            # explicit bfloat16 config gets bf16 matmul operands. XLA's
            # default f32 matmuls on TPU are NOT one bf16 pass — measured:
            # at lr 3e-3/scale 204 the XLA-f32 flow run converges (EPE
            # 0.41) while XLA-bf16 and a bf16-operand kernel both diverge
            # — so an f32 config must keep f32 operands in the kernel too
            # (multi-pass Mosaic matmuls; the kernel's win is the
            # recompute-in-VMEM backward, not matmul throughput).
            # interpret mode (CPU tests) is always precise.
            precise = interp or spec.compute_dtype != "bfloat16"
            return fused_inr_apply(spec, params, consts, x, mask,
                                   precise=precise, interpret=interp)
    if isinstance(override_mask, tuple):
        # factored spatial masks emitted for the fused Pallas path
        # (controllers.spatial_grid_mask_split / spatial_grid_mask_slabs);
        # reassemble the dense (n, E) mask for the XLA fallback — only hit
        # when the kernel is unavailable/ineligible
        from sin_inn_tpu.ops.pallas.inr import inr_mask_perm
        perm = inr_mask_perm(spec)
        if len(override_mask) == 3:
            # row slabs: contract the x axis the kernel would have done
            enc, coord, wx = override_mask
            wx = wx.astype(enc.dtype)
            me = jnp.einsum("wr,SrE->SwE", wx, enc).reshape(
                -1, enc.shape[-1])
            mc = jnp.einsum("wr,SrD->SwD", wx, coord).reshape(
                -1, coord.shape[-1])
        else:
            mc, me = override_mask
            mc = mc.T
        if perm is not None:
            import numpy as np
            me = me[:, np.argsort(perm)]
        override_mask = jnp.concatenate([mc.astype(me.dtype), me], axis=-1)
    code = get_encoding(spec, params, consts, x)
    out_dtype = code.dtype
    if spec.compute_dtype not in (None, "float32", "float32_highest",
                                  "highest"):
        # cast BEFORE the mask multiply: the (points, E) code and mask are
        # the dominant HBM traffic at INR scale; mlp_apply's own cast would
        # come one full read/write too late
        code = code.astype(spec.compute_dtype)
        if override_mask is not None:
            override_mask = override_mask.astype(spec.compute_dtype)
    if override_mask is not None:
        code = code * override_mask
    elif alpha is not None and spec.is_progressive and alpha < 1:
        code = code * alpha_mask(spec, alpha)
    if spec.kind == "siren":
        out = siren_apply(params["mlp"], code,
                          compute_dtype=spec.compute_dtype)
    else:
        out = mlp_apply(params["mlp"], code, spec.compute_dtype)
    return out.astype(out_dtype)
