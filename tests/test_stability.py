"""Unit tests for the off-policy Lagrangian stability mechanisms:
fresh-data-gated PID steps, bounded auto-alpha, entropy-free cost-critic
targets, and staggered episode clocks."""

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.algos.sac_lag import SACLag
from fsrl_tpu.data.buffer import ReplayBuffer
from fsrl_tpu.data.collector import make_rollout_fn
from fsrl_tpu.envs import make
from fsrl_tpu.types import EpisodeStats


def test_pid_skips_stale_collects():
    """update_lagrangian must leave the PID state untouched when the collect
    completed no episodes (stale last_ep_cost must not wind the integral)."""
    env = make("SafetyBallRun-v0")
    algo = SACLag(env.observation_size, env.action_size, cost_limit=25.0)
    state = algo.init(jax.random.PRNGKey(0))

    fresh = algo.update_lagrangian(
        state, jnp.array([400.0]), jnp.asarray(1, jnp.int32))
    assert float(jnp.sum(fresh.lag.multiplier)) > 0.0
    assert float(fresh.lag.error_integral[0]) > 0.0

    # a stale collect after the fresh one: multiplier/integral frozen
    stale = algo.update_lagrangian(
        fresh, jnp.array([0.0]), jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(stale.lag.multiplier),
                               np.asarray(fresh.lag.multiplier))
    np.testing.assert_allclose(np.asarray(stale.lag.error_integral),
                               np.asarray(fresh.lag.error_integral))
    # last_ep_cost keeps the last measurement, not the stale zero input
    np.testing.assert_allclose(np.asarray(stale.last_ep_cost), [400.0])


def test_onpolicy_pid_skips_stale_collects():
    env = make("SafetyBallRun-v0")
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=25.0,
                  repeat=1, n_minibatches=1)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    env_state = env.reset_vec(rng, 4)
    stats = EpisodeStats.init(4, env.num_costs)
    rollout = make_rollout_fn(env, algo.act_fn, 8)  # far shorter than episode
    res = rollout(state.params, env_state, stats, rng)
    assert int(res.stats.n_episodes) == 0
    new_state, _ = algo.update(state, res.transitions, res.stats.mean_cost,
                               res.stats.n_episodes, rng)
    np.testing.assert_allclose(np.asarray(new_state.lag.multiplier),
                               np.asarray(state.lag.multiplier))


def test_alpha_stays_bounded():
    """The auto-alpha ascent must clip at log_alpha=2 even under persistently
    low-entropy (high logp) updates."""
    env = make("SafetyBallRun-v0")
    algo = SACLag(env.observation_size, env.action_size, cost_limit=25.0)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    buffer = ReplayBuffer(512, 2)
    buf_state = buffer.init(env.observation_size, env.action_size,
                            env.num_costs)
    env_state = env.reset_vec(rng, 2)
    stats = EpisodeStats.init(2, env.num_costs)
    rollout = make_rollout_fn(env, algo.act_fn, 64)
    res = rollout(state.params, env_state, stats, rng)
    buf_state = buffer.add_segment(buf_state, res.transitions)
    # force the divergent regime directly: huge log_alpha must clip back
    state = state.replace(log_alpha=jnp.asarray(50.0))
    state, _ = jax.jit(algo.update_step, static_argnums=(1,))(
        state, buffer, buf_state, rng)
    assert float(state.log_alpha) <= 2.0


def test_cost_target_excludes_entropy():
    """The n-step targets of the cost critics must not contain the
    -alpha*logp entropy bonus (only the reward critic's does)."""
    env = make("SafetyBallRun-v0")
    algo = SACLag(env.observation_size, env.action_size, cost_limit=25.0)
    state = algo.init(jax.random.PRNGKey(0))
    B = 5
    obs_next = jnp.zeros((B, env.observation_size))

    class FakeBatch:
        pass

    fb = FakeBatch()
    fb.obs_next = obs_next

    # replicate update_step's target_q_fn at two alphas: the cost channel
    # must be alpha-invariant, the reward channel must not
    def target(alpha):
        rng_t = jax.random.PRNGKey(7)
        dist = algo._dist(state.params["actor"], fb.obs_next)
        a, logp = dist.sample_and_log_prob(rng_t)
        q = algo.critics.apply(state.target_critic_params, fb.obs_next, a)
        minq = jnp.min(q, axis=-1)
        ent_mask = (jnp.arange(algo.K) == 0).astype(minq.dtype)
        return minq - alpha * logp[:, None] * ent_mask

    t_lo, t_hi = target(0.0), target(100.0)
    assert not np.allclose(np.asarray(t_lo[:, 0]), np.asarray(t_hi[:, 0]))
    np.testing.assert_allclose(np.asarray(t_lo[:, 1:]),
                               np.asarray(t_hi[:, 1:]))


def test_stagger_spreads_episode_clocks():
    env = make("SafetyBallCircle-v0")
    rng = jax.random.PRNGKey(0)
    plain = env.reset_vec(rng, 8)
    assert int(jnp.max(plain.t)) == 0
    st = env.reset_vec(rng, 8, stagger=True)
    t = np.asarray(st.t)
    assert len(np.unique(t)) == 8          # all distinct offsets
    assert t.max() < env.max_episode_steps
    # truncations then spread across collects instead of firing together
    algo = SACLag(env.observation_size, env.action_size)
    state = algo.init(rng)
    stats = EpisodeStats.init(8, env.num_costs)
    rollout = make_rollout_fn(env, algo.act_fn, 100)
    done_collects = []
    env_state = st
    for _ in range(5):
        rng, k = jax.random.split(rng)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k)
        env_state, stats = res.env_state, res.stats
        done_collects.append(int(stats.n_episodes))
    assert all(n >= 1 for n in done_collects), done_collects
