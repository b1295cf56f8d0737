"""Multi-host (pod-slice) initialization and host-sharded data placement.

Replaces the reference's NCCL/torch.distributed launchers
(`tools/dist_train.sh`, `tools/slurm_train.sh`): JAX is single-program
multi-data — every host runs the same script, `jax.distributed.initialize`
wires the DCN mesh, and one jitted train step spans all chips. The (data,
model) mesh is laid out so the `data` axis crosses hosts (gradient allreduce
over DCN is latency-tolerant) while `model` (the decoder token axis) stays
inside a host's ICI domain where the partial-softmax psum is cheap.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from petr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops on a single process.

    Env fallbacks follow the common launchers: COORDINATOR_ADDRESS,
    NUM_PROCESSES/WORLD_SIZE, PROCESS_ID/RANK (covers SLURM via srun env).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", os.environ.get("WORLD_SIZE", "1")))
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", os.environ.get("RANK", "0")))
    if num_processes <= 1 or coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(model_parallel: Optional[int] = None) -> Mesh:
    """(data, model) mesh with `model` confined to each host's local chips.

    Device order groups local chips contiguously, so reshaping to
    (n_hosts * dp_per_host, mp) keeps every model group on one host's ICI.
    """
    devices = jax.devices()
    local = jax.local_device_count()
    if model_parallel is None:
        model_parallel = local  # whole host = one model group by default
    assert local % model_parallel == 0 or model_parallel % local == 0
    n = len(devices)
    data = n // model_parallel
    arr = np.asarray(devices).reshape(data, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def host_local_batch_to_global(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, jax.Array]:
    """Each host feeds its local shard of the global batch (the JAX-native
    replacement for torch's DistributedSampler)."""
    out = {}
    for k, v in batch.items():
        sharding = NamedSharding(mesh, P(DATA_AXIS))
        out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
    return out
