"""Device-mesh utilities: the framework's distributed layer.

The reference has NO distributed execution at all (SURVEY.md §2.9 — its only
parallelism is env worker processes). This layer is new TPU-first design: envs
are sharded across a ``dp`` mesh axis (each chip owns N/n_dev env instances and
steps them locally inside the jitted rollout), parameters are replicated, and
XLA's GSPMD partitioner inserts the gradient/stat ``psum`` collectives over ICI
automatically from the sharding annotations — no NCCL/MPI analog code.

Global statistics correctness: the PID multiplier consumes the mean episodic
cost over ALL envs; with EpisodeStats aggregates produced by reductions over the
sharded env axis, GSPMD lowers them to ``all-reduce`` so every chip sees the
global mean — matching the reference's whole-collect statistics semantics
(``lagrangian_base.py:98-100``).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DP_AXIS = "dp"
HOST_AXIS = "host"


def make_mesh(n_devices: int | None = None, axis: str = DP_AXIS) -> Mesh:
    """Build a 1-D data-parallel ``jax.sharding.Mesh`` over the available
    devices (SURVEY.md §2.9: the learner's distributed axis)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def init_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """Bring up cross-host collectives (the DCN layer).

    One call per host process before any jax computation. On TPU pods the
    runtime wires ICI+DCN automatically; on CPU/GPU JAX falls back to Gloo
    over TCP — which is what the 2-process CI dryrun exercises
    (``tests/test_multihost.py``). After this, ``jax.devices()`` is GLOBAL
    (every device of every process) and ``jax.process_count() ==
    num_processes``.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_multihost_mesh(axis: str = DP_AXIS,
                        hierarchical: bool = False) -> Mesh:
    """Global mesh spanning every device of every initialized process.

    ``hierarchical=False`` (default): one flat ``dp`` axis over all global
    devices, ordered host-major so each host's shard block is contiguous —
    gradient all-reduces then decompose into intra-host reductions over
    ICI plus one cross-host exchange over DCN (GSPMD does this split).

    ``hierarchical=True``: a 2-D ``(host, dp)`` mesh for layouts that want
    explicit control over which collectives cross DCN (e.g. per-host stat
    reduction before a small cross-host psum).
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if hierarchical:
        n_hosts = jax.process_count()
        arr = np.array(devs).reshape(n_hosts, -1)
        return Mesh(arr, (HOST_AXIS, axis))
    return Mesh(np.array(devs), (axis,))


def env_sharding(mesh: Mesh, batch_axis: int = 0, axis: str = DP_AXIS
                 ) -> NamedSharding:
    """Shard the env-instance axis across the mesh."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    """NamedSharding that replicates an array across the whole mesh."""
    return NamedSharding(mesh, P())


def shard_env_state(mesh: Mesh, env_state: Any, axis: str = DP_AXIS) -> Any:
    """Place a vectorized EnvState (leading axis = env instances) with the env
    axis split across devices."""
    n_dev = mesh.shape[axis]

    def place(x):
        # shard only leaves whose leading axis is the (divisible) env axis;
        # scalars and small aggregate vectors (e.g. EpisodeStats.sum_cost of
        # shape (M,)) are replicated
        if x.ndim >= 1 and x.shape[0] % n_dev == 0 and x.shape[0] >= n_dev:
            spec = P(*([axis] + [None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, env_state)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Place every leaf of a pytree replicated across the mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
