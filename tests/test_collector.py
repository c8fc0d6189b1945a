"""Collector tests — the analog of the reference's ``tests/test_collector.py``
(random policy, episode counting) plus segment-stat correctness that the
reference cannot test (device-side accumulators)."""

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.data.collector import evaluate, make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.types import EpisodeStats


def random_act_fn(env):
    def act(params, obs, rng):
        a = jax.random.uniform(rng, obs.shape[:-1] + (env.action_size,),
                               minval=-1.0, maxval=1.0)
        return a, jnp.zeros(obs.shape[:-1])
    return act


def test_rollout_shapes_and_episode_count():
    env = make("SafetyBallRun-v0")
    N, T = 5, env.max_episode_steps * 2 + 10
    rollout = jax.jit(make_rollout_fn(env, random_act_fn(env), T))
    rng = jax.random.PRNGKey(0)
    env_state = env.reset_vec(rng, N)
    stats = EpisodeStats.init(N, env.num_costs)
    res = rollout({}, env_state, stats, rng)
    tr = res.transitions
    assert tr.obs.shape == (T, N, env.observation_size)
    assert tr.cost.shape == (T, N, env.num_costs)
    # ball never terminates → exactly 2 truncations per env in 2*L+10 steps
    assert int(res.stats.n_episodes) == 2 * N
    assert float(res.stats.mean_length) == env.max_episode_steps
    assert int(res.stats.n_steps) == T * N


def test_rollout_stats_match_transitions():
    """Completed-episode reward/cost sums recomputed from the stored transitions
    must equal the scan-carried accumulators."""
    env = make("SafetyBallCircle-v0")
    N, T = 4, env.max_episode_steps + 50
    rollout = jax.jit(make_rollout_fn(env, random_act_fn(env), T))
    rng = jax.random.PRNGKey(1)
    res = rollout({}, env.reset_vec(rng, N), EpisodeStats.init(N, 1), rng)
    tr = res.transitions
    done = np.asarray(tr.done)
    rew = np.asarray(tr.reward)
    cost = np.asarray(tr.cost)[..., 0]
    sum_r, sum_c = 0.0, 0.0
    for n in range(N):
        acc_r = acc_c = 0.0
        for t in range(T):
            acc_r += rew[t, n]
            acc_c += cost[t, n]
            if done[t, n]:
                sum_r += acc_r
                sum_c += acc_c
                acc_r = acc_c = 0.0
    assert float(res.stats.sum_reward) == np.float32(sum_r)
    np.testing.assert_allclose(float(res.stats.sum_cost[0]), sum_c, rtol=1e-5)


def test_evaluate_episode_exact():
    env = make("SafetyBallRun-v0")
    out = jax.jit(
        lambda r: evaluate(env, random_act_fn(env), {}, r, n_episodes=6)
    )(jax.random.PRNGKey(2))
    assert float(out["length"]) == env.max_episode_steps
    assert np.isfinite(float(out["reward"]))
    assert float(out["cost"]) >= 0.0


def test_autoreset_does_not_leak_final_obs():
    """The stored transition at a done step must carry the FINAL observation of
    the episode (for bootstrapping), not the reset observation."""
    env = make("SafetyBallRun-v0")
    N, T = 2, env.max_episode_steps + 1
    rollout = jax.jit(make_rollout_fn(env, random_act_fn(env), T))
    rng = jax.random.PRNGKey(3)
    res = rollout({}, env.reset_vec(rng, N), EpisodeStats.init(N, 1), rng)
    tr = res.transitions
    t_done = env.max_episode_steps - 1
    assert bool(tr.truncated[t_done, 0])
    # obs stream is continuous across the episode: obs_next[t-1] == obs[t]
    np.testing.assert_array_equal(np.asarray(tr.obs_next[t_done - 1, 0]),
                                  np.asarray(tr.obs[t_done, 0]))
    # after the reset, obs[t_done+1] is a fresh-episode obs — it differs from
    # the final obs of the finished episode
    assert not np.allclose(np.asarray(tr.obs[t_done + 1, 0]),
                           np.asarray(tr.obs_next[t_done, 0]))


def test_recurrent_rollout_hidden_plumbing():
    """GRU policy collects with hidden state threaded through the scan and
    reset at episode ends — RNN parity with the reference collector."""
    import jax
    from fsrl_tpu.nets.mlp import RecurrentGaussianActor

    env = make("SafetyBallRun-v0")
    actor = RecurrentGaussianActor(act_dim=env.action_size, hidden_size=32)
    params = actor.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, env.observation_size)),
                        jnp.zeros((1, 32)))

    def act_fn(p, obs, hidden, rng):
        dist, hidden = actor.apply(p, obs, hidden)
        act = dist.sample(rng)
        return act, dist.log_prob(act), hidden

    N, T = 3, env.max_episode_steps + 5
    rollout = jax.jit(make_rollout_fn(
        env, act_fn, T, init_hidden=lambda n: jnp.zeros((n, 32))))
    res = rollout({"params": params["params"]} if "params" in params else params,
                  env.reset_vec(jax.random.PRNGKey(1), N),
                  EpisodeStats.init(N, 1), jax.random.PRNGKey(2))
    assert res.transitions.obs.shape == (T, N, env.observation_size)
    assert int(res.stats.n_episodes) == N  # episodes completed w/ resets
    assert bool(jnp.all(jnp.isfinite(res.transitions.act)))
