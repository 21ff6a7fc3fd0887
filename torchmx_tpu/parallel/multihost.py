"""Multi-host execution: process initialization and hybrid DCN x ICI meshes.

The BASELINE north star is >=85% tokens/s scaling from 1 to 2 hosts.  The
design: the ``data`` axis spans hosts over DCN (per-host batch shards, no
cross-host tensor collectives on the hot path) and the ``model`` axis stays
inside each host's ICI-connected slice, so TP collectives ride ICI and only
data-parallel gradient/throughput aggregation crosses DCN.  Packed MX
payloads make any cross-host weight movement 4-8x cheaper than bf16.

Single-host environments fall back transparently (``initialize`` is a no-op,
the hybrid mesh degenerates to the local mesh), so the same launcher script
runs everywhere:

    # per host (TPU pod slice), e.g. via GKE/xmanager:
    python -c "
    from torchmx_tpu.parallel import multihost
    multihost.initialize()                      # env-driven on TPU pods
    mesh = multihost.create_hybrid_mesh(model_parallelism=8)
    ..."
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize JAX's distributed runtime (no-op on a single process).

    On TPU pods all arguments resolve from the environment
    (``jax.distributed.initialize()`` with no args); explicit values support
    manual bring-up.  Returns the process count.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif jax.process_count() == 1 and coordinator_address is None:
        # Env-driven init only when a multi-process environment is detected.
        import os

        if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
    return jax.process_count()


def create_hybrid_mesh(model_parallelism: Optional[int] = None) -> Mesh:
    """(data, model) mesh with the data axis spanning hosts (DCN) and the
    model axis inside each host's slice (ICI).

    Args:
        model_parallelism: chips per model shard group; defaults to all chips
            of one process (pure in-host TP, cross-host DP).
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if model_parallelism is None:
        model_parallelism = n_local
    # TP collectives must ride ICI: a model group may not span hosts.
    assert model_parallelism <= n_local and n_local % model_parallelism == 0, (
        f"model_parallelism {model_parallelism} must divide the {n_local} "
        f"local (ICI-connected) devices — host-spanning TP would put tensor "
        f"collectives on DCN"
    )
    total = n_local * n_proc
    data = total // model_parallelism
    if n_proc > 1:
        try:
            from jax.experimental import mesh_utils

            dev = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_local // model_parallelism, model_parallelism),
                dcn_mesh_shape=(n_proc, 1),
            )
            # create_hybrid_device_mesh returns (dcn*ici_data, model)
            dev = dev.reshape(data, model_parallelism)
        except ValueError:
            # Non-TPU backends (e.g. the multi-process CPU rehearsal) report
            # no slice topology; group by process index instead — the same
            # invariant (each model row single-process) by construction.
            devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            dev = np.asarray(devs).reshape(data, model_parallelism)
    else:
        dev = np.asarray(jax.devices()).reshape(data, model_parallelism)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def process_local_batch(global_batch: int) -> int:
    """Per-host batch share for a data-parallel input pipeline."""
    n = jax.process_count()
    assert global_batch % n == 0, f"batch {global_batch} not divisible by {n} hosts"
    return global_batch // n
