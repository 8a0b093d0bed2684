"""Device-mesh + sharding helpers (the framework's communication layer).

The reference has no distributed layer at all (SURVEY.md §2.3: its only
parallelism is `nn.DataParallel`).  Here scenario batches shard across TPU
chips over a 1-D `data` mesh: solver/prediction batches split along the
batch axis, model parameters replicate, and metric reductions ride XLA
collectives over ICI/DCN.  The same code runs on one chip, a v5e-8 slice,
or a forced 8-device CPU host (tests).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host entry: initialize `jax.distributed` so `jax.devices()`
    spans every host of the slice/pod (ICI within a slice, DCN across
    slices) and collectives ride the global mesh.

    With no arguments, cluster parameters come from the TPU pod metadata /
    environment (the standard multi-host JAX bootstrap).  On a single host
    with no cluster environment this degrades to a no-op and returns False,
    so the same entry point runs everywhere (SURVEY.md §2.3 point 2).

    Must run before the first backend use on a fresh process; in this
    repo's pre-imported-JAX container that means passing --distributed
    only to dedicated sweep processes launched with JAX_PLATFORMS=tpu.
    """
    if jax.process_count() > 1:
        return True                     # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except (ValueError, RuntimeError) as e:   # single host, no cluster env
        import sys
        print(f"init_distributed: single-host fallback ({e})",
              file=sys.stderr)
        return False


def make_global_batch(mesh: Mesh, tree):
    """Build batch-sharded GLOBAL arrays from host-replicated numpy data.

    Every process passes the identical full batch (same seed → same
    scenarios); each host materializes only its addressable shards.  On a
    single host this is equivalent to `shard_batch`.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/scenario) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of batched arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_map_batch(fn, mesh: Mesh):
    """Wrap a batched function so each device runs it on ITS batch shard.

    The production escalated/multistart batch solves gather failing lanes
    across their batch (`jnp.nonzero` + rank merge).  Under plain
    `jit(in_shardings=...)` that gather is GLOBAL — XLA inserts all-gathers
    and the lanes serialize across devices.  `shard_map` keeps the whole
    decision rule device-local instead: each chip escalates within its own
    shard (slot counts follow the LOCAL batch), no collective ever crosses
    ICI, and weak scaling is exact by construction.  This is the multi-chip
    form of the headline bench (`bench.py BENCH_DEVICES`) and of
    `sim.sweep` at pod scale.

    fn must map leading-axis-batched inputs to leading-axis-batched outputs
    (every leaf batched); mesh axis size must divide the global batch.
    """
    import jax as _jax
    return _jax.jit(_jax.shard_map(
        fn, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS)))


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad the leading axis to a multiple (returns padded array + true n)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[-1:], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n
