"""Device mesh + sharding utilities: SPMD data parallelism over ICI/DCN.

TPU-native replacement for the reference's DDP/NCCL stack (reference
train.py:680-683, utils/torch_utils.py:60-82). One program, one
`jax.sharding.Mesh` with a "data" axis; parameters replicated, batches
sharded on the leading axis; XLA inserts the gradient all-reduce the moment
the loss is a mean over the sharded batch — there is no smart_DDP, no
`loss *= WORLD_SIZE` compensation (train.py:405-406), and no rank-0 barrier
dance (`torch_distributed_zero_first`): per-host input sharding and
`jax.process_index()==0` gating cover those roles.

Multi-host: call `initialize_distributed()` once per process (the analog of
dist.init_process_group, but coordinates hosts not devices).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host init — the analog of dist.init_process_group (reference
    train.py:680-683), but coordinating HOSTS not devices: one JAX process per
    host, devices enumerated globally afterwards.

    Runs whenever an explicit coordinator is given (also at num_processes=1,
    so the path is exercisable single-host); bare single-host runs skip it.
    """
    if num_processes and (num_processes > 1 or coordinator):
        jax.distributed.initialize(coordinator, num_processes, process_id)
        LOGGER_INFO = f"initialized distributed: process {jax.process_index()}/{jax.process_count()}"
        from yolov3_tpu.utils.general import LOGGER

        LOGGER.info(LOGGER_INFO)


def create_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over all local (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, axis_name="data"):
    """Place a host array (or pytree of arrays) sharded on the batch axis.

    Multi-host: each process passes its LOCAL rows (the per-host loader shard,
    see datasets shard_per_host) and gets back the global sharded jax.Array —
    the SPMD analog of DistributedSampler feeding DDP (reference
    dataloaders.py:115): no host ever materializes the global batch."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(lambda x: jax.make_array_from_process_local_data(sh, x), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh. Multi-host:
    every process passes the same host values (deterministic init/checkpoint
    load guarantees that) and addresses only its local replicas."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
