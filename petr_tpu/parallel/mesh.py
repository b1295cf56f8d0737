"""Device-mesh construction and sharding rules.

Design (SURVEY.md §2.10 / §5): the reference is pure NCCL data-parallelism;
the TPU engine adds a 2-axis mesh:

  * ``data``  — batch data-parallelism (across hosts / DCN at scale).
  * ``model`` — token-axis sharding inside the decoder: the flattened
    multi-view key/value tokens (N*H*W per sample) are partitioned across
    the axis while the 900 object queries stay replicated; XLA lowers the
    cross-attention softmax into partial reductions + psum over ICI.

Everything runs under ``jax.jit`` with sharding constraints (GSPMD); gradient
reduction falls out of the partitioning — no explicit collectives in model
code. ``constrain`` is a no-op outside a mesh context so the same model code
serves single-chip and sharded runs.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Default factorization: ALL devices on the data axis (pure DP — the
    reference trains batch 1/device, so an 8-chip host naturally runs
    data=8). Pass ``model`` (or ``data``) to trade batch ways for token-axis
    sharding inside the decoder (useful for memory-bound large-image
    configs).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model == n, (data, model, n)
    import numpy as np

    return Mesh(np.asarray(devices).reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def _get_abstract_mesh():
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and not m.empty:
            return m
    except Exception:
        pass
    return None


def constrain(x: jax.Array, spec: Sequence[Optional[str]]) -> jax.Array:
    """with_sharding_constraint if a mesh context is active; else identity.

    Axis names not present in the active mesh are dropped from the spec.
    """
    mesh = _get_abstract_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    clean = tuple(s if (s in names) else None for s in spec)
    if all(s is None for s in clean):
        return x
    return jax.lax.with_sharding_constraint(x, P(*clean))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place host batch arrays batch-sharded over the data axis."""
    out = {}
    for k, v in batch.items():
        spec = P(DATA_AXIS) if v.ndim >= 1 else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
