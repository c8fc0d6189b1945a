"""Core pytree containers for FSRL-TPU.

The reference (liuzuxin/FSRL) uses Tianshou's ``Batch`` — a mutable nested
dict-of-arrays (see reference ``fsrl/data/fast_collector.py``). The TPU-native
equivalent is plain JAX pytrees built from ``flax.struct`` dataclasses: immutable,
jit-traceable, shardable with ``jax.sharding``.

Conventions
-----------
* Rollout data is **time-major**: leading axes ``(T, N_envs, ...)`` so that GAE and
  other temporal kernels are a single ``lax.scan`` over axis 0.
* ``cost`` is a first-class field of shape ``(..., M)`` for M constraints (the
  reference smuggles it through ``info["cost"]``, ``base_policy.py:377-382``).
* ``terminated`` vs ``truncated`` are kept separate so bootstrap masking matches the
  reference's ``value_mask`` semantics (``base_policy.py:357-375``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array
PyTree = Any


@struct.dataclass
class Timestep:
    """One environment step's outputs (vectorized over leading axes)."""

    obs: Array          # (..., obs_dim) observation AFTER the step (next obs)
    reward: Array       # (...,)
    cost: Array         # (..., M)
    terminated: Array   # (...,) bool — true env termination (no bootstrap)
    truncated: Array    # (...,) bool — time-limit truncation (bootstrap allowed)

    @property
    def done(self) -> Array:
        return jnp.logical_or(self.terminated, self.truncated)


@struct.dataclass
class Transition:
    """A full (s, a, r, c, s') transition as stored by collectors/buffers."""

    obs: Array          # (..., obs_dim)
    act: Array          # (..., act_dim) — the *raw* policy action (pre map_action)
    obs_next: Array     # (..., obs_dim)
    reward: Array       # (...,)
    cost: Array         # (..., M)
    terminated: Array   # (...,) bool
    truncated: Array    # (...,) bool
    logp: Array         # (...,) behavior log-prob at collection time

    @property
    def done(self) -> Array:
        return jnp.logical_or(self.terminated, self.truncated)


@struct.dataclass
class EpisodeStats:
    """Running per-env episode accumulators + completed-episode aggregates.

    Reproduces the episodic statistics the reference's ``FastCollector`` returns
    (``fast_collector.py:399-408``): mean episodic reward / cost / length plus
    episode and step counts, maintained fully on device.
    """

    # per-env running accumulators, shape (N_envs,) / (N_envs, M)
    ep_reward: Array
    ep_cost: Array
    ep_len: Array
    # aggregates over completed episodes (scalars / (M,))
    n_episodes: Array
    n_steps: Array
    sum_reward: Array
    sum_cost: Array
    sum_len: Array
    n_terminated: Array
    n_truncated: Array

    @classmethod
    def init(cls, n_envs: int, n_costs: int = 1) -> "EpisodeStats":
        f = jnp.zeros
        return cls(
            ep_reward=f((n_envs,)),
            ep_cost=f((n_envs, n_costs)),
            ep_len=f((n_envs,), jnp.int32),
            n_episodes=jnp.zeros((), jnp.int32),
            n_steps=jnp.zeros((), jnp.int32),
            sum_reward=jnp.zeros(()),
            sum_cost=f((n_costs,)),
            sum_len=jnp.zeros(()),
            n_terminated=jnp.zeros((), jnp.int32),
            n_truncated=jnp.zeros((), jnp.int32),
        )

    def update(self, ts: Timestep) -> "EpisodeStats":
        """Fold one vectorized env step into the accumulators (jit-safe)."""
        ep_reward = self.ep_reward + ts.reward
        ep_cost = self.ep_cost + ts.cost
        ep_len = self.ep_len + 1
        done = ts.done
        donef = done.astype(ep_reward.dtype)
        n_new = jnp.sum(done.astype(jnp.int32))
        return self.replace(
            ep_reward=jnp.where(done, 0.0, ep_reward),
            ep_cost=jnp.where(done[..., None], 0.0, ep_cost),
            ep_len=jnp.where(done, 0, ep_len),
            n_episodes=self.n_episodes + n_new,
            n_steps=self.n_steps + ep_len.shape[0] if ep_len.ndim else self.n_steps + 1,
            sum_reward=self.sum_reward + jnp.sum(donef * ep_reward),
            sum_cost=self.sum_cost + jnp.sum(donef[..., None] * ep_cost, axis=0),
            sum_len=self.sum_len + jnp.sum(donef * ep_len),
            n_terminated=self.n_terminated + jnp.sum(ts.terminated.astype(jnp.int32)),
            n_truncated=self.n_truncated + jnp.sum(ts.truncated.astype(jnp.int32)),
        )

    def reset_aggregates(self) -> "EpisodeStats":
        """Zero the completed-episode aggregates while keeping per-env running
        accumulators — start of a new collect window (the reference resets its
        collect-level stats per ``collect()`` call)."""
        z = jnp.zeros_like
        return self.replace(
            n_episodes=z(self.n_episodes), n_steps=z(self.n_steps),
            sum_reward=z(self.sum_reward), sum_cost=z(self.sum_cost),
            sum_len=z(self.sum_len), n_terminated=z(self.n_terminated),
            n_truncated=z(self.n_truncated),
        )

    # --- aggregate views (match FastCollector's returned stat keys) ---
    @property
    def mean_reward(self) -> Array:
        return self.sum_reward / jnp.maximum(self.n_episodes, 1)

    @property
    def mean_cost(self) -> Array:
        """Mean episodic cost per constraint, shape (M,)."""
        return self.sum_cost / jnp.maximum(self.n_episodes, 1)

    @property
    def mean_length(self) -> Array:
        return self.sum_len / jnp.maximum(self.n_episodes, 1)

    def merge_across(self, axis_name: str) -> "EpisodeStats":
        """psum the aggregate fields across a mesh axis (global episodic stats).

        The PID multiplier must see the *global* mean episodic cost — the
        reference computes it over the entire collect (``lagrangian_base.py:98-100``).
        """
        psum = lambda x: jax.lax.psum(x, axis_name)
        return self.replace(
            n_episodes=psum(self.n_episodes),
            n_steps=psum(self.n_steps),
            sum_reward=psum(self.sum_reward),
            sum_cost=psum(self.sum_cost),
            sum_len=psum(self.sum_len),
            n_terminated=psum(self.n_terminated),
            n_truncated=psum(self.n_truncated),
        )


# ---------------------------------------------------------------------------
# Small pytree utilities (the Batch.split / Batch[index] equivalents)
# ---------------------------------------------------------------------------

def tree_index(tree: PyTree, idx) -> PyTree:
    """Index every leaf's leading axis."""
    return jax.tree.map(lambda x: x[idx], tree)


def tree_flatten_time(tree: PyTree) -> PyTree:
    """Merge leading (T, N) axes into one batch axis (T*N, ...)."""
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), tree)


def tree_concat(trees: list, axis: int = 0) -> PyTree:
    """Concatenate a list of pytrees leaf-wise along ``axis``."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def tree_stack(trees: list, axis: int = 0) -> PyTree:
    """Stack a list of pytrees leaf-wise along a new ``axis``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *trees)


def minibatch_scan(
    rng: Array,
    batch: PyTree,
    n_minibatches: int,
    body: Callable,
    carry_init: PyTree,
    tile_size: int | None = None,
    n_blocks: int = 1,
):
    """Shuffle a flat batch and scan ``body(carry, minibatch) -> (carry, out)``
    over equal-size minibatches. The jit-native replacement for Tianshou's
    ``Batch.split(batch_size, merge_last=True)`` loop.

    TPU performance note: element-level permutation gathers of many narrow
    arrays compile to a catastrophically slow scalar-space gather on TPU
    (measured ~10 ms per epoch at B=262k vs ~0.7 ms for the path below). So
    for large batches the shuffle is done at **tile granularity**: leaves are
    packed per-dtype into one (n_tiles, tile*D) matrix, tiles are permuted
    with a single wide-row gather that runs at HBM speed, and minibatches are
    unpacked views. Each sample still appears exactly once per epoch and
    minibatch composition is uniformly random at tile level — statistically
    equivalent for SGD at these minibatch sizes. ``tile_size=1`` recovers the
    exact element-level shuffle (the default for small batches).

    Remainder semantics (vs the reference's ``merge_last=True`` which grows
    the last minibatch instead): when the per-block row count is not
    divisible by ``n_minibatches * tile_size``, up to
    ``n_blocks * n_minibatches * tile_size - 1`` samples are EXCLUDED from
    this epoch. Ragged minibatches would break the static shapes
    ``lax.scan`` needs, so exclusion is the jit-native choice. Which samples
    are excluded is re-randomized every call (dropped tiles are chosen by the
    permutation; the sub-tile tail is randomized by a rolled start offset),
    so no sample is systematically starved across epochs.

    Multi-device (``n_blocks > 1``): rows are assumed BLOCK-CONTIGUOUS along
    a dp-sharded leading axis (env-major flatten, ``process_rollout``), with
    ``n_blocks`` equal to the dp mesh size. The shuffle then permutes tiles
    WITHIN each block (a batched ``take_along_axis`` whose batch dim is the
    sharded one), and every minibatch takes an equal tile quota from every
    block — so the epoch is partitionable: no cross-device batch traffic,
    gradients all-reduce as usual. A single global permutation instead makes
    GSPMD all-gather the entire rollout onto every device and run the update
    replicated (measured on a 2-device mesh).
    """
    import numpy as np

    leaves, treedef = jax.tree.flatten(batch)
    size = leaves[0].shape[0]
    assert size % n_blocks == 0, (size, n_blocks)
    rows_pb = size // n_blocks
    if tile_size is None:
        # ≥4096 tiles keeps composition well mixed; tile rows of ≥64 samples
        # make the gather HBM-friendly. Small batches fall back to exact.
        tile_size = max(1, size // 4096)
    tpb = rows_pb // tile_size                      # tiles per block
    usable_pb = (tpb // n_minibatches) * n_minibatches
    tiles_per_mb_pb = usable_pb // n_minibatches    # per block, per minibatch
    assert usable_pb > 0, (
        f"minibatch_scan: {rows_pb} rows/block cannot fill "
        f"{n_minibatches} minibatches of tile {tile_size}")

    rng, k_perm, k_roll = jax.random.split(rng, 3)

    if rows_pb % tile_size != 0:
        # rows beyond tpb*tile_size in each block never make it into a tile;
        # rotate the batch by a random offset so the excluded tail varies per
        # epoch (one extra HBM pass, only paid in the non-divisible case)
        off = jax.random.randint(k_roll, (), 0, size)
        batch = jax.tree.map(lambda x: jnp.roll(x, off, axis=0), batch)
        leaves = jax.tree.leaves(batch)

    if tile_size == 1 and n_blocks == 1:
        perm = jax.random.permutation(k_perm, tpb)[: usable_pb]
        mbs = jax.tree.map(
            lambda x: x[perm.reshape(n_minibatches, tiles_per_mb_pb)], batch)
        return jax.lax.scan(body, carry_init, mbs)

    # per-block within-block permutations: (n_blocks, usable_pb)
    perms = jax.vmap(lambda k: jax.random.permutation(k, tpb)[: usable_pb])(
        jax.random.split(k_perm, n_blocks))

    # pack leaves (grouped by dtype) → per-block tiled rows → one batched
    # take_along_axis per group (batch dim = block dim = the sharded axis)
    trailing = [x.shape[1:] for x in leaves]
    flat = [x.reshape(n_blocks, rows_pb, -1)[:, : tpb * tile_size]
            .reshape(n_blocks, tpb, -1) for x in leaves]
    groups: dict = {}
    for i, f in enumerate(flat):
        groups.setdefault(f.dtype, []).append(i)
    gathered: dict = {}
    for dt, idxs in groups.items():
        packed = flat[idxs[0]] if len(idxs) == 1 else jnp.concatenate(
            [flat[i] for i in idxs], axis=2)     # (n_blocks, tpb, tile*Dsum)
        shuf = jnp.take_along_axis(packed, perms[:, :, None], axis=1)
        # (n_blocks, n_mb, tiles_per_mb_pb, W) → (n_mb, n_blocks, tpm, W)
        gathered[dt] = shuf.reshape(
            n_blocks, n_minibatches, tiles_per_mb_pb, -1).swapaxes(0, 1)

    widths = [f.shape[2] for f in flat]

    def unpack(mb_packed):
        out = [None] * len(leaves)
        mb_rows = n_blocks * tiles_per_mb_pb * tile_size
        for dt, idxs in groups.items():
            g = mb_packed[dt]              # (n_blocks, tpm, tile*Dgroup)
            offs = np.cumsum([0] + [widths[i] for i in idxs])
            for j, i in enumerate(idxs):
                col = g[:, :, offs[j]:offs[j + 1]]
                out[i] = col.reshape((mb_rows,) + trailing[i])
        return jax.tree.unflatten(treedef, out)

    def body2(carry, mb_packed):
        return body(carry, unpack(mb_packed))

    return jax.lax.scan(body2, carry_init, gathered)


def minibatch_epochs_scan(
    rng: Array,
    batch: PyTree,
    n_epochs: int,
    n_minibatches: int,
    body: Callable,
    carry_init: PyTree,
    tile_size: int | None = None,
    n_blocks: int = 1,
    unroll: int = 1,
    per_leaf: bool = False,
):
    """Multi-epoch variant of :func:`minibatch_scan`: pack ONCE, draw all
    ``n_epochs`` per-block tile permutations up front, gather them in one
    batched ``take_along_axis``, and run a single flat scan over
    ``n_epochs * n_minibatches`` grad steps.

    Rationale (v5e, ``benchmarks/bench_update_breakdown.py``): the per-epoch
    pack+gather of ``minibatch_scan`` costs ~2.1 ms at B=262k — as much as
    the epoch's 8 grad steps together — and an epoch-per-scan structure pays
    it ``n_epochs`` times. Packing once and batching the gathers pays it
    ~once. The flat scan also takes ``unroll`` (epochs' bodies are identical,
    so unrolling by ``n_minibatches`` amortizes loop overhead without code
    growth beyond one epoch).

    ``body(carry, mb, is_epoch_end) -> (carry, aux)`` — the extra flag marks
    each epoch's last minibatch so epoch-granular logic (the reference's KL
    early stop, ``ppo_lag.py:249-255``) lives in the caller's body.

    ``per_leaf=True`` gathers each leaf separately (same tile permutation,
    a few more gather launches) so each scanned minibatch is a NATURAL
    row-major (mb_rows, D) array instead of an unpacked view of the packed
    buffer. Use when the body hands the minibatch to a custom kernel with
    layout constraints (``ops/fused_ppo_grad.py``): the packed-view unpack
    otherwise forces a relayout copy of every leaf per grad step.

    Shuffle semantics are identical to :func:`minibatch_scan` (block-local
    tile permutations, re-randomized excluded tail), with one difference:
    the random tail offset in the non-divisible case is drawn once for all
    epochs rather than per epoch.
    """
    import numpy as np

    leaves, treedef = jax.tree.flatten(batch)
    size = leaves[0].shape[0]
    assert size % n_blocks == 0, (size, n_blocks)
    rows_pb = size // n_blocks
    if tile_size is None:
        tile_size = max(1, size // 4096)
    tpb = rows_pb // tile_size
    usable_pb = (tpb // n_minibatches) * n_minibatches
    tiles_per_mb_pb = usable_pb // n_minibatches
    assert usable_pb > 0, (
        f"minibatch_epochs_scan: {rows_pb} rows/block cannot fill "
        f"{n_minibatches} minibatches of tile {tile_size}")

    rng, k_perm, k_roll = jax.random.split(rng, 3)
    if rows_pb % tile_size != 0:
        off = jax.random.randint(k_roll, (), 0, size)
        batch = jax.tree.map(lambda x: jnp.roll(x, off, axis=0), batch)
        leaves = jax.tree.leaves(batch)

    # (n_epochs, n_blocks, usable_pb) independent per-block permutations
    keys = jax.random.split(k_perm, n_epochs * n_blocks).reshape(
        n_epochs, n_blocks, -1)
    perms = jax.vmap(jax.vmap(
        lambda k: jax.random.permutation(k, tpb)[: usable_pb]))(keys)

    # pack leaves (grouped by dtype) once: (n_blocks, tpb, tile*Dsum)
    trailing = [x.shape[1:] for x in leaves]
    flat = [x.reshape(n_blocks, rows_pb, -1)[:, : tpb * tile_size]
            .reshape(n_blocks, tpb, -1) for x in leaves]
    groups: dict = {}
    for i, f in enumerate(flat):
        groups.setdefault(f.dtype, []).append(i)
    widths = [f.shape[2] for f in flat]

    n_steps = n_epochs * n_minibatches
    is_end_arr = (jnp.arange(n_steps) + 1) % n_minibatches == 0

    if per_leaf:
        mb_rows = n_blocks * tiles_per_mb_pb * tile_size
        cols = []
        for x, tr_shape, f in zip(leaves, trailing, flat):
            # (E, n_blocks, usable, tile*D) -> (E*n_mb, mb_rows, *trailing);
            # the tiles->rows reshape is a row-major no-op view
            shuf = jax.vmap(
                lambda pr, _p=f: jnp.take_along_axis(
                    _p, pr[:, :, None], axis=1))(perms)
            cols.append(shuf.reshape(
                n_epochs, n_blocks, n_minibatches, tiles_per_mb_pb, -1
            ).swapaxes(1, 2).reshape((n_steps, mb_rows) + tr_shape))
        mbs = jax.tree.unflatten(treedef, cols)

        def body_pl(carry, x):
            mb, end = x
            return body(carry, mb, end)

        return jax.lax.scan(body_pl, carry_init, (mbs, is_end_arr),
                            unroll=unroll)

    gathered: dict = {}
    for dt, idxs in groups.items():
        packed = flat[idxs[0]] if len(idxs) == 1 else jnp.concatenate(
            [flat[i] for i in idxs], axis=2)
        # one gather for ALL epochs: (n_epochs, n_blocks, usable_pb, W)
        shuf = jax.vmap(
            lambda pr, _p=packed: jnp.take_along_axis(
                _p, pr[:, :, None], axis=1))(perms)
        gathered[dt] = shuf.reshape(
            n_epochs, n_blocks, n_minibatches, tiles_per_mb_pb, -1
        ).swapaxes(1, 2).reshape(
            n_steps, n_blocks, tiles_per_mb_pb, -1)

    is_end = (jnp.arange(n_steps) + 1) % n_minibatches == 0

    def unpack(mb_packed):
        out = [None] * len(leaves)
        mb_rows = n_blocks * tiles_per_mb_pb * tile_size
        for dt, idxs in groups.items():
            g = mb_packed[dt]
            offs = np.cumsum([0] + [widths[i] for i in idxs])
            for j, i in enumerate(idxs):
                col = g[:, :, offs[j]:offs[j + 1]]
                out[i] = col.reshape((mb_rows,) + trailing[i])
        return jax.tree.unflatten(treedef, out)

    def body2(carry, x):
        mb_packed, end = x
        return body(carry, unpack(mb_packed), end)

    return jax.lax.scan(body2, carry_init, (gathered, is_end), unroll=unroll)
