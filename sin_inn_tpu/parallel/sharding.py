"""Named shardings for the train states: DP + optional TP, SP-analog.

What is sharded (honest scoping per SURVEY §2.5 — the reference's only real
parallelism is 1-GPU runs + SLURM scene arrays):

  * **DP**: the batch axis of every batch array over mesh axis ``data``.
    Params/opt-state replicated; XLA inserts the gradient psum over ICI.
  * **TP** (optional, ``model`` axis > 1): the 256-wide hidden channels of the
    GLOW coupling conv subnets are sharded — conv1 output channels and conv2
    input channels — so each chip holds a slice of the subnet and XLA inserts
    one all-reduce per subnet output. DenseBlock (IRN) subnets stay replicated
    (their dense concats make TP unprofitable at gc=32).
  * **SP-analog** (flow pipeline): the frame/time batch of the coordinate
    grid is the sharded axis — each chip evaluates the INR on its frames'
    full (h, w) grid; loss/grad psum. Ring-attention/Ulysses do not apply
    (no attention in either pipeline).
  * **PP / EP**: out of scope (documented; nothing in the workload pipelines
    or routes experts).
"""

from __future__ import annotations

import logging
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, SequenceKey

logger = logging.getLogger(__name__)


def _path_names(path) -> list:
    names = []
    for k in path:
        if isinstance(k, DictKey):
            names.append(str(k.key))
        elif isinstance(k, SequenceKey):
            names.append(str(k.idx))
        else:
            names.append(str(k))
    return names


def sr_param_spec(path, leaf, model_parallel: bool) -> P:
    """PartitionSpec for one INN param leaf (TP on glow subnet hidden)."""
    if not model_parallel or not hasattr(leaf, "ndim"):
        return P()
    names = _path_names(path)
    in_glow_subnet = any(n in ("s1", "s2") for n in names)
    if not in_glow_subnet:
        return P()
    if "conv1" in names:
        if leaf.ndim == 4:              # (kh, kw, cin, hidden)
            return P(None, None, None, "model")
        if leaf.ndim == 1:              # (hidden,)
            return P("model")
    if "conv2" in names and leaf.ndim == 4:  # (kh, kw, hidden, cout)
        return P(None, None, "model", None)
    return P()


def state_shardings(mesh: Mesh, state: Any, model_parallel: bool = False):
    """NamedShardings for a train-state pytree.

    Param-shaped leaves (params and the optimizer moments that mirror them)
    get the TP rules; scalars and controller state replicate.

    TP divisibility contract: a dim can only shard over ``model`` when the
    axis size divides it; otherwise that leaf REPLICATES with a loud warning
    (the math is unchanged — only the TP memory/compute saving is lost).
    JAX's NamedSharding would reject the uneven split with an opaque error
    deep in device_put, so the contract is enforced here.
    """
    n_model = mesh.shape.get("model", 1)
    warned: set = set()

    def one(path, leaf):
        spec = sr_param_spec(path, leaf, model_parallel)
        if "model" in spec and hasattr(leaf, "shape"):
            dim = leaf.shape[spec.index("model")]
            if dim % n_model != 0:
                if dim not in warned:
                    warned.add(dim)
                    logger.warning(
                        "TP: hidden dim %d not divisible by model axis %d — "
                        "replicating %s (and leaves like it) instead of "
                        "sharding", dim, n_model, "/".join(_path_names(path)))
                spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)


def batch_shardings(mesh: Mesh, batch: Any, allow_uneven: bool = False):
    """Shard axis 0 of every batch array over ``data``; scalars replicate.

    ``allow_uneven=True`` replicates any array whose leading axis is not
    divisible by the data-axis size instead of failing — used for val/test
    batches whose last batch may be ragged.
    """
    n = mesh.shape["data"]

    def one(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            if allow_uneven and leaf.shape[0] % n != 0:
                return NamedSharding(mesh, P())
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(one, batch)


def place_state(mesh: Mesh, state: Any, model_parallel: bool = False):
    sh = state_shardings(mesh, state, model_parallel)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def place_batch(mesh: Mesh, batch: Any, allow_uneven: bool = False):
    sh = batch_shardings(mesh, batch, allow_uneven)
    return jax.tree_util.tree_map(jax.device_put, batch, sh)
