"""Device-mesh utilities: the TPU-native replacement for the reference's
torch.distributed/NCCL/DDP plumbing (/root/reference/GA/train.py:374-381,505-515).

Data parallelism is expressed as a 1-D `jax.sharding.Mesh` over axis 'data';
the train step runs under `shard_map` with explicit `lax.pmean` gradient
reduction (the DDP-allreduce analog, riding ICI), and the input pipeline
shards the global batch over the same axis. Multi-host extends transparently:
`jax.distributed.initialize()` + the same mesh over all devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (DCN rendezvous), analogous to init_process_group.

    coordinator='auto' (or '' with env already set) uses jax.distributed's
    own detection — on TPU pods the slice metadata provides everything, so
    no flags are needed (the torchrun env-var analog)."""
    if coordinator == "auto":
        jax.distributed.initialize()
    elif coordinator:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Place host arrays on the mesh, batch-dim sharded over 'data'.

    Multi-host: each process passes its PROCESS-LOCAL rows (the loader's
    num_shards/shard_id block of the global batch) and the global array is
    assembled with `jax.make_array_from_process_local_data` — no host
    gather, each host feeds only its own ICI-attached chips (the
    DistributedSampler + DDP input contract, GA/train.py:567,657).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def zero1_spec(shape, n_devices: int) -> P:
    """PartitionSpec sharding the largest axis divisible by the mesh size.

    Used for ZeRO-1-style optimizer/EMA state sharding over the data axis:
    leaves whose every axis is indivisible (scalars, odd head tables) stay
    replicated — correctness never depends on a leaf being sharded, sharding
    is purely an HBM saving. The reference has no analog (DDP replicates
    optimizer state per GPU); this is the TPU-native extension: annotate the
    sharding, let XLA insert the reduce-scatter/all-gather pair.
    """
    best = None
    for i, s in enumerate(shape):
        if s >= n_devices and s % n_devices == 0 and (best is None or s > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)
