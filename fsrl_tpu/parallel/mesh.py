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


def make_mesh(n_devices: int | None = None, axis: str = DP_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def env_sharding(mesh: Mesh, batch_axis: int = 0, axis: str = DP_AXIS
                 ) -> NamedSharding:
    """Shard the env-instance axis across the mesh."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
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
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
