"""Device mesh construction and sharding rules.

The framework's distributed-communication layer (SURVEY §2.5, §5): a small
module that owns `jax.sharding.Mesh` construction and the named shardings the
train steps use. This *replaces* the reference's implicit Lightning/NCCL layer
(reference main.py:112 ``gpus=``; commented mpirun in train_hpc.sh:83-84) with
XLA collectives over ICI — psum of grads/losses is inserted automatically by
pjit from the shardings below; no explicit comm code is needed.

Sharding plan (TPU-idiomatic for these workloads):
  * SR pipeline: batch axis sharded over ``data`` (pure DP; params replicated;
    XLA inserts the grad all-reduce over ICI).
  * Flow/INR pipeline: the (t*h*w) coordinate/pixel axis is embarrassingly
    shardable — we shard the *frame batch* over ``data`` (each chip computes
    its frames' full loss; grads psum). This is the TPU analog of sequence
    parallelism for this workload (SURVEY §2.5: no attention anywhere, so
    ring-attention/Ulysses do not apply).
  * An optional ``model`` axis exists for generality (SURVEY §2.5 TP row);
    the INN's conv subnets can shard their hidden channels over it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build an (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of batch arrays with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           timeout_s: Optional[float] = None) -> bool:
    """Multi-host JAX runtime init (the NCCL/MPI replacement, SURVEY §2.5).

    On single-host runs this is a no-op returning False. In a multi-host
    deployment call it first (or rely on TPU pod auto-detection by passing
    nothing); afterwards ``jax.devices()`` spans all hosts and the meshes
    built here carry DCN+ICI collectives automatically.

    With EXPLICIT coordinator args a failure raises: the caller asked for a
    specific cluster, and silently falling back to single-host would run a
    divergent job (each process training alone on the same output dirs).
    Auto-detect failures return False (no pod metadata = single-host run).
    """
    import jax

    explicit = coordinator_address is not None or num_processes is not None
    try:
        kw = {} if timeout_s is None else {
            "initialization_timeout": timeout_s}
        if not explicit:
            jax.distributed.initialize(**kw)   # TPU pod metadata auto-detect
        else:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id, **kw)
        return jax.process_count() > 1
    except Exception:
        if explicit:
            raise
        return False
