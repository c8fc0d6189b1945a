"""Recurrent PPO-Lagrangian training (truncated BPTT) — the capability the
reference only plumbs for but never implements (its collector threads hidden
state, ``fast_collector.py:154-163``, but no policy does sequence-aware
minibatch training). Tests:

1. replay consistency — re-unrolling the GRU inside the update from the stored
   segment-start carry reproduces the collection-time log-probs EXACTLY,
   including across auto-reset episode boundaries (the property BPTT
   correctness hinges on);
2. the jitted update runs, changes params, and produces finite metrics;
3. cross-segment carry: the rollout returns the final hidden so consecutive
   segments continue the recurrence instead of resetting to zero.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.algos import RecurrentPPOLag
from fsrl_tpu.data.collector import make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.types import EpisodeStats


def _setup(T=64, N=8, seed=0):
    env = make("SafetyBallRun-v0")
    algo = RecurrentPPOLag(env.observation_size, env.action_size,
                           cost_limit=50.0, hidden_size=32,
                           critic_hidden_sizes=(32, 32),
                           repeat=2, n_minibatches=2)
    rng = jax.random.PRNGKey(seed)
    state = algo.init(rng)
    rollout = jax.jit(make_rollout_fn(env, algo.act_fn, T,
                                      init_hidden=algo.init_hidden))
    env_state = env.reset_vec(jax.random.PRNGKey(seed + 1), N)
    stats = EpisodeStats.init(N, env.num_costs)
    return env, algo, state, rollout, env_state, stats


def test_bptt_replay_matches_collection_logp():
    # long enough that several episodes end inside the segment
    env = make("SafetyBallRun-v0")
    T = env.max_episode_steps + 17
    _, algo, state, rollout, env_state, stats = _setup(T=T, N=4)
    res = rollout(state.params, env_state, stats, jax.random.PRNGKey(7))
    assert int(res.stats.n_episodes) >= 4  # boundaries occurred

    tr = res.transitions
    mean, std = algo._unroll(state.params["actor"], tr.obs, tr.done,
                             res.init_hidden)
    from fsrl_tpu.nets.distributions import DiagGaussian
    logp_replay = DiagGaussian(mean=mean, std=std).log_prob(tr.act)
    np.testing.assert_allclose(np.asarray(logp_replay), np.asarray(tr.logp),
                               rtol=1e-5, atol=1e-5)


def test_bptt_update_runs_and_changes_params():
    _, algo, state, rollout, env_state, stats = _setup()
    res = rollout(state.params, env_state, stats, jax.random.PRNGKey(3))
    upd = jax.jit(algo.update)
    new_state, metrics = upd(state, res.transitions, res.init_hidden,
                             res.stats.mean_cost, res.stats.n_episodes,
                             jax.random.PRNGKey(4))
    # params moved
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params, new_state.params)
    assert max(jax.tree.leaves(diffs)) > 0
    assert int(new_state.gradient_steps) > 0
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(v))), (k, v)


def test_cross_segment_hidden_carry():
    _, algo, state, rollout, env_state, stats = _setup(T=8, N=4)
    r1 = rollout(state.params, env_state, stats, jax.random.PRNGKey(0))
    assert r1.hidden is not None
    # second segment starts from the carried hidden, not zeros
    r2 = rollout(state.params, r1.env_state, r1.stats, jax.random.PRNGKey(1),
                 hidden=r1.hidden)
    np.testing.assert_allclose(np.asarray(r2.init_hidden),
                               np.asarray(r1.hidden))
    assert not np.allclose(np.asarray(r1.hidden), 0.0)


def test_bptt_learning_improves_reward():
    """A short constrained run must improve episodic reward on BallRun."""
    env, algo, state, rollout, env_state, stats = _setup(T=128, N=16, seed=2)

    @jax.jit
    def train_iter(state, env_state, stats, hidden, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1,
                      hidden=hidden)
        state, metrics = algo.update(state, res.transitions, res.init_hidden,
                                     res.stats.mean_cost, res.stats.n_episodes,
                                     k2)
        return state, res.env_state, res.stats, res.hidden, rng, metrics

    hidden = algo.init_hidden(16)
    rng = jax.random.PRNGKey(5)
    # episodes truncate in lockstep at t=500, so only ~every 4th segment
    # completes episodes — track every segment that did
    rews = []
    for i in range(44):
        state, env_state, stats, hidden, rng, metrics = train_iter(
            state, env_state, stats, hidden, rng)
        if int(stats.n_episodes) > 0:
            rews.append(float(stats.mean_reward))
    assert len(rews) >= 4
    assert rews[-1] > rews[0] + 50.0, rews


def test_recurrent_agent_trainer_integration():
    """RecurrentPPOLag drives through the full agent/trainer stack: hidden
    carried across collects, BPTT updates, recurrent episode-exact eval."""
    from fsrl_tpu.agent import RecurrentPPOLagAgent

    agent = RecurrentPPOLagAgent("SafetyBallRun-v0", cost_limit=9999.0, seed=0,
                                 hidden_size=32, critic_hidden_sizes=(32, 32))
    info = agent.learn(epochs=4, step_per_epoch=4000, n_envs=16,
                       steps_per_collect=125, episode_per_test=4,
                       verbose=False)
    assert info["env_step"] >= 16000
    rew, length, cost = agent.evaluate(n_episodes=4)
    assert jnp.isfinite(rew) and length > 0
    # learning signal: test reward above the untrained baseline (~<50)
    assert info["best_reward"] > 50.0, info
