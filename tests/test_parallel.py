"""Distributed-path tests on the virtual 8-device CPU mesh: the multi-chip
train step compiles and executes with real shardings, and data-parallel
training is numerically equivalent to single-device training (same global
batch, replicated params)."""

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.data.collector import make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_state
from fsrl_tpu.types import EpisodeStats


def _setup(N, T):
    env = make("SafetyBallRun-v0")
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=2, n_minibatches=2)
    rollout = make_rollout_fn(env, algo.act_fn, T)

    def train_step(state, env_state, stats, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        state, metrics = algo.update(
            state, res.transitions, res.stats.mean_cost,
            res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, metrics

    return env, algo, jax.jit(train_step)


def test_dryrun_multichip_entrypoint(devices):
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dp_matches_single_device(devices):
    """Same seeds, same global batch: sharded-over-8-devices step must produce
    (numerically close) identical params to the unsharded step."""
    N, T = 8, 16
    env, algo, train_step = _setup(N, T)
    rng = jax.random.PRNGKey(0)
    state0 = algo.init(rng)
    env0 = env.reset_vec(jax.random.PRNGKey(1), N)
    stats0 = EpisodeStats.init(N, 1)

    # single device (default placement)
    s1, _, _, m1 = train_step(state0, env0, stats0, jax.random.PRNGKey(2))

    # sharded over the dp mesh
    mesh = make_mesh(8)
    s_sh = replicate_tree(mesh, state0)
    e_sh = shard_env_state(mesh, env0)
    st_sh = shard_env_state(mesh, stats0)
    s2, _, _, m2 = train_step(s_sh, e_sh, st_sh, jax.random.PRNGKey(2))

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert np.allclose(float(m1["loss/total"]), float(m2["loss/total"]),
                       rtol=1e-3)


def test_global_episode_stats_under_sharding(devices):
    """EpisodeStats aggregates must be GLOBAL across the sharded env axis —
    the PID multiplier input correctness condition (SURVEY.md §8)."""
    env = make("SafetyBallRun-v0")
    N = 8
    T = env.max_episode_steps + 2
    mesh = make_mesh(8)
    from fsrl_tpu.data.collector import make_rollout_fn

    def act(params, obs, rng):
        return jnp.zeros(obs.shape[:-1] + (env.action_size,)), \
            jnp.zeros(obs.shape[:-1])

    rollout = jax.jit(make_rollout_fn(env, act, T))
    e_sh = shard_env_state(mesh, env.reset_vec(jax.random.PRNGKey(0), N))
    st_sh = shard_env_state(mesh, EpisodeStats.init(N, 1))
    res = rollout({}, e_sh, st_sh, jax.random.PRNGKey(1))
    # every env truncates exactly once in T steps → global count == N
    assert int(res.stats.n_episodes) == N


def test_offpolicy_dp_matches_single_device(devices):
    """Off-policy path under dp sharding: SAC-Lag through
    ``OffpolicyTrainerTPU`` (sharded ring buffer with rows placed on their
    env's shard, n-step view build, chunked scanned updates) must be
    numerically equivalent to the identical unsharded run."""
    from fsrl_tpu.algos.sac_lag import SACLag
    from fsrl_tpu.parallel.mesh import make_mesh
    from fsrl_tpu.trainer.trainer import OffpolicyTrainerTPU

    env = make("SafetyBallRun-v0")

    def build(mesh):
        algo = SACLag(env.observation_size, env.action_size, cost_limit=10.0,
                      batch_size=32, n_step=2)
        return OffpolicyTrainerTPU(
            algo, env, None, cost_limit=10.0, seed=0, n_envs=8,
            steps_per_collect=12, update_per_step=0.1, buffer_size=2048,
            epochs=1, step_per_epoch=10**9, verbose=False, log_every=10**9,
            mesh=mesh)

    t1 = build(None)
    t2 = build(make_mesh(8))
    for _ in range(3):
        t1._run_iter()
        t2._run_iter()

    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # the sharded buffer holds identical contents
    for a, b in zip(jax.tree.leaves(t1.buf_state.data),
                    jax.tree.leaves(t2.buf_state.data)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_multihost_mesh_shapes():
    """Single-process shape checks for the multi-host constructors (the
    2-process behavior is covered by tests/test_multihost.py)."""
    import jax
    from fsrl_tpu.parallel.mesh import make_multihost_mesh

    flat = make_multihost_mesh()
    assert flat.axis_names == ("dp",)
    assert flat.devices.size == len(jax.devices())
    hier = make_multihost_mesh(hierarchical=True)
    assert hier.axis_names == ("host", "dp")
    assert hier.devices.shape == (jax.process_count(),
                                  len(jax.devices()) // jax.process_count())


def test_cpo_dp_matches_single_device(devices):
    """Trust-region family under dp (VERDICT r4 #4): CPO's CG dot products,
    FVP and line search must stay GLOBAL under a sharded batch — the
    sharded step must reproduce the unsharded step's params."""
    from fsrl_tpu.algos.cpo import CPO

    N, T = 8, 16
    env = make("SafetyBallRun-v0")
    algo = CPO(env.observation_size, env.action_size, cost_limit=10.0)
    rollout = make_rollout_fn(env, algo.act_fn, T)

    def train_step(state, env_state, stats, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        state, metrics = algo.update(
            state, res.transitions, res.stats.mean_cost,
            res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, metrics

    train_step = jax.jit(train_step)
    rng = jax.random.PRNGKey(0)
    state0 = algo.init(rng)
    env0 = env.reset_vec(jax.random.PRNGKey(1), N)
    stats0 = EpisodeStats.init(N, 1)

    s1, _, _, m1 = train_step(state0, env0, stats0, jax.random.PRNGKey(2))

    mesh = make_mesh(8)
    s2, _, _, m2 = train_step(replicate_tree(mesh, state0),
                              shard_env_state(mesh, env0),
                              shard_env_state(mesh, stats0),
                              jax.random.PRNGKey(2))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # the dual internals must agree too (the 4-case solve is scalar math
    # downstream of the global reductions)
    for k in ("update/step_size", "loss/kl"):
        if k in m1 and k in m2:
            np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                       rtol=2e-3, atol=1e-5)
