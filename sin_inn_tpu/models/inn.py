"""Invertible network architectures for single-video space-time SR.

TPU-native equivalents of the two reference architectures:

* ``UncondSRFlow`` (/root/reference/archs.py:19-71): initial i-RevNet squeeze,
  then per scale-octave [squeeze + num_coupling x (GLOW coupling with 3x3/1x1
  conv subnets alternating + seeded random channel permutation)].
* ``InvRescaleNet`` (/root/reference/archs.py:201-233): Haar squeeze ladder
  with ``InvBlockExp`` couplings (DenseBlock subnets, split at
  ``min(lr_dims, C/2)``).

Design: a static layer *spec* (plain dataclasses, hashable per model build)
plus a params pytree (list aligned with the spec). ``inn_apply`` walks the
spec forward or backward; both directions trace into one XLA program, so a
train step can run fwd+inv+grad in a single compiled executable — the
reference needed three separate autograd backward calls
(/root/reference/lit_wrapper.py:49,56,72).

Layout is NHWC throughout (channel-last is the MXU-friendly layout; the
coupling subnets' convs become channel-dim matmuls).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.ops import coupling as C
from sin_inn_tpu.ops import subnet as S
from sin_inn_tpu.ops.haar import haar_log_det, haar_squeeze, haar_unsqueeze
from sin_inn_tpu.ops.permute import (invert_permutation, make_permutation,
                                     permute_channels)
from sin_inn_tpu.ops.squeeze import depth_to_space, space_to_depth


@dataclass(frozen=True)
class LayerSpec:
    kind: str                       # squeeze | haar | glow | invblock | permute
    clamp: float = 0.0
    split_len1: int = 0
    kernel: int = 0                 # glow subnet conv kernel (3 or 1)
    hidden: int = 256
    gc: int = 32
    perm: Optional[Tuple[int, ...]] = None       # permute only
    perm_inv: Optional[Tuple[int, ...]] = None
    compute: str = "float32"        # subnet MXU input dtype (see ops.subnet)
    use_pallas: bool = False        # fused Pallas kernel (1x1 glow only)


def _resolve_pallas(cfg: SRConfig) -> bool:
    if cfg.use_pallas == "off":
        return False
    if cfg.use_pallas == "on":
        return True
    from sin_inn_tpu.ops.pallas.coupling import pallas_available
    # fused kernels run at default (bf16-pass) matmul precision; keep the
    # strict-parity mode on the XLA path
    return pallas_available() and cfg.compute_dtype != "float32_highest"


def build_srf_spec(cfg: SRConfig, c: int) -> Tuple[List[LayerSpec], int]:
    """SRFlow layer stack (reference archs.py:24-71). Returns (spec, out_channels)."""
    use_pallas = _resolve_pallas(cfg)
    spec: List[LayerSpec] = [LayerSpec("squeeze")]
    c *= 4
    for _ in range(cfg.octaves):
        spec.append(LayerSpec("squeeze"))
        c *= 4
        for kk in range(cfg.num_coupling):
            kernel = 3 if kk % 2 == 0 else 1     # archs.py:54-59
            spec.append(LayerSpec(
                "glow", clamp=cfg.clamp_srf, split_len1=c // 2,
                kernel=kernel, hidden=cfg.hidden_channels,
                compute=cfg.compute_dtype,
                use_pallas=use_pallas))
            perm = make_permutation(c, seed=kk)  # archs.py:65-68 (seed=kk)
            spec.append(LayerSpec(
                "permute", perm=tuple(perm.tolist()),
                perm_inv=tuple(invert_permutation(perm).tolist())))
    return spec, c


def build_irn_spec(cfg: SRConfig, c: int) -> Tuple[List[LayerSpec], int]:
    """InvRescaleNet layer stack (reference archs.py:202-221)."""
    spec: List[LayerSpec] = [LayerSpec("haar")]
    c *= 4
    for _ in range(cfg.octaves):
        spec.append(LayerSpec("haar"))
        c *= 4
        for _ in range(cfg.num_coupling):
            split = min(cfg.lr_dims, c // 2)     # archs.py:218
            spec.append(LayerSpec(
                "invblock", clamp=cfg.clamp_irn, split_len1=split,
                gc=cfg.dense_gc, compute=cfg.compute_dtype))
    return spec, c


def build_inn_spec(cfg: SRConfig, c: int = 3) -> Tuple[List[LayerSpec], int]:
    if cfg.architecture == "SRF":
        return build_srf_spec(cfg, c)
    return build_irn_spec(cfg, c)


def init_inn(key: jax.Array, spec: Sequence[LayerSpec], c_in: int = 3,
             dtype=jnp.float32) -> List[Optional[Dict]]:
    """Initialize the params list aligned with ``spec``."""
    params: List[Optional[Dict]] = []
    c = c_in
    for layer in spec:
        if layer.kind in ("squeeze", "haar"):
            c *= 4
            params.append(None)
        elif layer.kind == "permute":
            params.append(None)
        elif layer.kind == "glow":
            key, k1, k2 = jax.random.split(key, 3)
            len1 = layer.split_len1
            len2 = c - len1
            params.append({
                # s1: y1 -> 2*len2 ; s2: x2 -> 2*len1 (FrEIA GLOWCouplingBlock)
                "s1": S.conv_subnet_init(k1, len1, 2 * len2, layer.kernel,
                                         layer.hidden, dtype),
                "s2": S.conv_subnet_init(k2, len2, 2 * len1, layer.kernel,
                                         layer.hidden, dtype),
            })
        elif layer.kind == "invblock":
            key, kf, kg, kh = jax.random.split(key, 4)
            len1 = layer.split_len1
            len2 = c - len1
            params.append({
                "F": S.dense_block_init(kf, len2, len1, layer.gc, dtype),
                "G": S.dense_block_init(kg, len1, len2, layer.gc, dtype),
                "H": S.dense_block_init(kh, len1, len2, layer.gc, dtype),
            })
        else:
            raise ValueError(layer.kind)
    return params


def _apply_layer(layer: LayerSpec, p: Optional[Dict], x: jnp.ndarray,
                 rev: bool, with_log_det: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    zero = jnp.zeros((x.shape[0],), x.dtype)
    if layer.kind == "squeeze":
        return (depth_to_space(x) if rev else space_to_depth(x)), zero
    if layer.kind == "haar":
        y = haar_unsqueeze(x) if rev else haar_squeeze(x)
        if with_log_det:
            # (reference archs.py:184-185); inverse negates
            n, h, w, c = x.shape
            ld = haar_log_det(h, w, c)
            return y, jnp.full((n,), -ld if rev else ld, x.dtype)
        return y, zero
    if layer.kind == "permute":
        perm = layer.perm_inv if rev else layer.perm
        return permute_channels(x, np.asarray(perm)), zero
    if layer.compute == "float32":
        compute = None
    elif layer.compute == "float32_highest":
        compute = "highest"
    else:
        compute = jnp.dtype(layer.compute)
    if layer.kind == "glow":
        # Fused Pallas kernels serve the 1x1-subnet couplings: forward AND
        # hand-derived backward, both directions. The kernels return y only,
        # so a log-det request takes the XLA path (same math) rather than
        # silently returning zero. 3x3 couplings stay on XLA BY MEASUREMENT:
        # the row-band-tiled fused kernels (ops/pallas/coupling3x3.py,
        # interpret-validated incl. fused backwards) ran at 150-156 f/s vs
        # 174 f/s XLA at the flagship config — small Cin wastes MXU lanes in
        # the K=Cin matmul form, Mosaic cannot lower the lane-misaligned
        # im2col concat, and the banded backward recomputes (band+6)/band
        # rows. Full record in that module's docstring.
        if layer.use_pallas and layer.kernel == 1 and not with_log_det:
            from sin_inn_tpu.ops.pallas.coupling import (
                make_fused_coupling_full, make_fused_coupling_full_inv)
            if rev:
                inv = make_fused_coupling_full_inv(layer.clamp,
                                                   layer.split_len1)
                return inv(p, x), zero
            fwd = make_fused_coupling_full(layer.clamp, layer.split_len1)
            return fwd(p, x), zero
        subnet = partial(S.conv_subnet_apply, compute_dtype=compute)
        if rev:
            if with_log_det:
                return C.glow_coupling_inverse_ld(
                    p, x, subnet, layer.clamp, layer.split_len1)
            return C.glow_coupling_inverse(p, x, subnet,
                                           layer.clamp, layer.split_len1), zero
        return C.glow_coupling_forward(p, x, subnet,
                                       layer.clamp, layer.split_len1)
    if layer.kind == "invblock":
        subnet = partial(S.dense_block_apply, compute_dtype=compute)
        if rev:
            if with_log_det:
                return C.inv_block_inverse_ld(
                    p, x, subnet, layer.clamp, layer.split_len1)
            return C.inv_block_inverse(p, x, subnet,
                                       layer.clamp, layer.split_len1), zero
        return C.inv_block_forward(p, x, subnet,
                                   layer.clamp, layer.split_len1)
    raise ValueError(layer.kind)


def inn_apply(spec: Sequence[LayerSpec], params: Sequence[Optional[Dict]],
              x: jnp.ndarray, rev: bool = False,
              with_log_det: bool = False, remat: bool = False):
    """Run the INN forward (HR -> LR||z) or inverse (LR||z -> HR).

    Mirrors ``InvRescaleNet.forward`` (/root/reference/archs.py:223-233) /
    ``ReversibleGraphNet`` traversal, as one traced XLA program.

    ``remat=True`` wraps each parameterized coupling in ``jax.checkpoint``:
    the backward stashes only each coupling's input and recomputes the
    subnet chain in the VJP — the dense blocks' concat activations
    (6 tensors per block per direction) never round-trip HBM. Trades
    ~1 extra forward of FLOPs for the stash traffic; see docs/PERF.md
    for the measured flagship A/B.
    """
    log_det = jnp.zeros((x.shape[0],), x.dtype)
    pairs = list(zip(spec, params))
    if rev:
        pairs = pairs[::-1]
    for layer, p in pairs:
        if remat and layer.kind in ("glow", "invblock"):
            step = jax.checkpoint(
                partial(_apply_layer, layer, rev=rev,
                        with_log_det=with_log_det))
            x, ld = step(p, x)
        else:
            x, ld = _apply_layer(layer, p, x, rev, with_log_det=with_log_det)
        log_det = log_det + ld
    if with_log_det:
        return x, log_det
    return x


def param_count(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
               if hasattr(l, "shape"))
