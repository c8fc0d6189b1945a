"""Ring replay buffer unit tests: segment writes, wrap-around, successor
linkage, and sampling validity."""

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.data.buffer import ReplayBuffer
from fsrl_tpu.types import Transition


def make_segment(t0, T, N, obs_dim=3, act_dim=2):
    """Deterministic segment whose obs encodes (t, env) for tracing."""
    t = jnp.arange(t0, t0 + T)[:, None]
    n = jnp.arange(N)[None, :]
    base = (t * 100 + n).astype(jnp.float32)
    obs = jnp.stack([base] * obs_dim, axis=-1)
    z = jnp.zeros((T, N))
    return Transition(
        obs=obs, act=jnp.zeros((T, N, act_dim)), obs_next=obs + 0.5,
        reward=base, cost=base[..., None] * 0.1,
        terminated=jnp.zeros((T, N), bool),
        truncated=(t % 5 == 4) * jnp.ones((T, N), bool),  # episode ends every 5
        logp=z,
    )


def test_add_and_gather_roundtrip():
    buf = ReplayBuffer(capacity_per_env=16, n_envs=3)
    st = buf.init(3, 2)
    st = buf.add_segment(st, make_segment(0, 8, 3))
    assert int(st.filled) == 8 and int(st.pos) == 8
    batch = buf.gather(st, jnp.array([0 * 3 + 1, 5 * 3 + 2]))
    assert float(batch.reward[0]) == 1.0     # t=0, env=1
    assert float(batch.reward[1]) == 502.0   # t=5, env=2


def test_wraparound_overwrites_oldest():
    buf = ReplayBuffer(capacity_per_env=8, n_envs=2)
    st = buf.init(3, 2)
    st = buf.add_segment(st, make_segment(0, 8, 2))
    st = buf.add_segment(st, make_segment(8, 4, 2))  # rows 0-3 overwritten
    assert int(st.filled) == 8 and int(st.pos) == 4
    # physical row 0 now holds t=8
    batch = buf.gather(st, jnp.array([0]))
    assert float(batch.reward[0]) == 800.0
    # logical sampling maps row 0 → oldest (physical pos=4 → t=4)
    idx = buf.sample_indices(st, jax.random.PRNGKey(0), 256)
    rows = idx // 2
    got_t = np.asarray(buf.gather(st, idx).reward) // 100
    assert set(got_t.astype(int)) <= set(range(4, 12))  # only live rows


def test_next_flat_stalls_at_episode_end_and_newest():
    buf = ReplayBuffer(capacity_per_env=8, n_envs=2)
    st = buf.init(3, 2)
    st = buf.add_segment(st, make_segment(0, 6, 2))   # rows 0..5, pos=6
    nxt = np.asarray(buf.next_flat(st)).reshape(8, 2)
    # normal row advances: (0, env0) -> (1, env0)
    assert nxt[0, 0] == 1 * 2 + 0
    # episode end at t=4 (t%5==4) stalls
    assert nxt[4, 0] == 4 * 2 + 0
    # newest row (pos-1=5) stalls
    assert nxt[5, 1] == 5 * 2 + 1


def test_end_flag_includes_unfinished_newest():
    buf = ReplayBuffer(capacity_per_env=8, n_envs=2)
    st = buf.init(3, 2)
    st = buf.add_segment(st, make_segment(0, 6, 2))
    flags = np.asarray(buf.end_flag_flat(st)).reshape(8, 2)
    assert flags[4].all()       # true episode end
    assert flags[5].all()       # newest unfinished row forced True
    assert not flags[1].any()


def test_metrics_flat_channels():
    buf = ReplayBuffer(capacity_per_env=4, n_envs=2)
    st = buf.init(3, 2)
    st = buf.add_segment(st, make_segment(0, 4, 2))
    m = np.asarray(buf.metrics_flat(st)).reshape(4, 2, 2)
    assert m[1, 0, 0] == 100.0          # reward channel
    assert abs(m[1, 0, 1] - 10.0) < 1e-5  # cost channel
