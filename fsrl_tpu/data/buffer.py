"""Device-resident ring replay buffer with first-class cost channel.

TPU-native replacement for Tianshou's ``VectorReplayBuffer``/
``ReplayBufferManager`` (the reference's storage layer, SURVEY.md §2.8): one
pre-allocated pytree of shape (C, N_envs, ...) living in HBM, written by whole
rollout segments (dynamic_update_slice — no host round trip) and sampled by
gather. Episodes stay contiguous per env column exactly like the reference's
per-env sub-buffers (``fast_collector.py:70-90``).

n-step linkage reproduces Tianshou ``buffer.next``: the successor of a row is
the next row of the same env, except at episode ends and at the newest written
row, where it is the row itself (chains stall there; the return kernel's
end-flag bookkeeping does the rest — see ``fsrl_tpu/ops/nstep.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.types import Transition

Array = jax.Array


@struct.dataclass
class ReplayBufferState:
    data: Transition     # leaves (C, N, ...)
    pos: Array           # () int32 — next row to write
    filled: Array        # () int32 — number of valid rows (<= C)

    @property
    def size(self) -> Array:
        return self.filled


class ReplayBuffer:
    """Static-config handle; all methods are pure and jittable."""

    def __init__(self, capacity_per_env: int, n_envs: int):
        self.C = int(capacity_per_env)
        self.N = int(n_envs)

    def init(self, obs_dim: int, act_dim: int, num_costs: int = 1,
             dtype=jnp.float32) -> ReplayBufferState:
        C, N = self.C, self.N
        z = lambda *s: jnp.zeros(s, dtype)
        data = Transition(
            obs=z(C, N, obs_dim), act=z(C, N, act_dim), obs_next=z(C, N, obs_dim),
            reward=z(C, N), cost=z(C, N, num_costs),
            terminated=jnp.zeros((C, N), bool), truncated=jnp.zeros((C, N), bool),
            logp=z(C, N),
        )
        return ReplayBufferState(data=data, pos=jnp.zeros((), jnp.int32),
                                 filled=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def add_segment(self, state: ReplayBufferState, tr: Transition
                    ) -> ReplayBufferState:
        """Write a (T, N, ...) rollout segment at the ring cursor. T must be a
        static value <= C."""
        T = tr.reward.shape[0]
        C = self.C
        assert T <= C, "segment longer than buffer capacity"
        rows = (state.pos + jnp.arange(T)) % C

        def put(buf, seg):
            return buf.at[rows].set(seg)

        data = jax.tree.map(put, state.data, tr)
        return ReplayBufferState(
            data=data, pos=(state.pos + T) % C,
            filled=jnp.minimum(state.filled + T, C),
        )

    # ------------------------------------------------------------------
    def sample_indices(self, state: ReplayBufferState, rng: Array,
                       batch_size: int) -> Array:
        """Uniform flat indices (row*N + env) over valid rows."""
        rows = jax.random.randint(rng, (batch_size,), 0, state.filled)
        envs = jax.random.randint(jax.random.fold_in(rng, 1), (batch_size,),
                                  0, self.N)
        # map logical row r (0=oldest) to physical ring row
        phys = jnp.where(state.filled < self.C, rows, (state.pos + rows) % self.C)
        return phys * self.N + envs

    def gather(self, state: ReplayBufferState, flat_idx: Array) -> Transition:
        r, n = flat_idx // self.N, flat_idx % self.N
        return jax.tree.map(lambda x: x[r, n], state.data)

    # ------------------------------------------------------------------
    def next_flat(self, state: ReplayBufferState) -> Array:
        """(C*N,) successor index per flat slot (Tianshou ``buffer.next``):
        same env next row, stalling at episode ends and at the newest row."""
        C, N = self.C, self.N
        rows = jnp.arange(C)[:, None]
        envs = jnp.arange(N)[None, :]
        here = rows * N + envs
        nxt = ((rows + 1) % C) * N + envs
        newest = (state.pos - 1) % C
        done = jnp.logical_or(state.data.terminated, state.data.truncated)
        stall = jnp.logical_or(done, rows == newest)
        return jnp.where(stall, here, nxt).reshape(-1)

    def end_flag_flat(self, state: ReplayBufferState) -> Array:
        """(C*N,) episode-end flags incl. the unfinished newest row (the
        reference forces ``end_flag[unfinished_index] = True``,
        base_policy.py:492-493)."""
        C = self.C
        done = jnp.logical_or(state.data.terminated, state.data.truncated)
        newest = (state.pos - 1) % C
        done = done.at[newest].set(True)
        return done.reshape(-1)

    def metrics_flat(self, state: ReplayBufferState) -> Array:
        """(C*N, K) stacked reward+cost channels of the whole buffer."""
        d = state.data
        m = jnp.concatenate([d.reward[..., None], d.cost], axis=-1)
        return m.reshape(-1, m.shape[-1])
