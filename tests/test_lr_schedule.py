"""Learning-rate schedules through optax — the reference's ``LambdaLR`` /
``MultipleLRSchedulers`` capability (``fsrl/policy/base_policy.py:66,353``)
as pure schedule functions baked into the jitted update."""

import jax
import jax.numpy as jnp
import optax

from fsrl_tpu.algos.common import make_optimizer, per_update_schedule
from fsrl_tpu.algos.ppo_lag import PPOLag


def test_schedule_decays_update_magnitude():
    """With linear decay to zero, Adam's applied step shrinks to ~0 by the
    final gradient step (Adam's step size is ≈ lr once warmed up)."""
    sched = optax.linear_schedule(1e-2, 0.0, transition_steps=100)
    tx = make_optimizer(sched)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4,))}

    deltas = []
    for _ in range(100):
        updates, opt_state = tx.update(grads, opt_state, params)
        deltas.append(float(jnp.max(jnp.abs(updates["w"]))))
        params = optax.apply_updates(params, updates)
    assert deltas[5] > 1e-3            # early: near full lr
    assert deltas[-1] < deltas[5] / 20  # late: decayed away


def test_per_update_schedule_counts_in_update_units():
    sched = per_update_schedule(
        optax.linear_schedule(1.0, 0.0, transition_steps=10),
        grad_steps_per_update=16)
    # all 16 grad steps of update 0 see lr(0); update 5's see lr(5)
    assert float(sched(0)) == float(sched(15)) == 1.0
    assert abs(float(sched(5 * 16)) - 0.5) < 1e-6
    assert float(sched(10 * 16)) == 0.0


def test_ppo_lag_accepts_schedule():
    """PPOLag trains with a schedule as ``lr`` and advances the schedule via
    its gradient-step counter."""
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.types import EpisodeStats

    env = make("SafetyBallRun-v0")
    sched = per_update_schedule(
        optax.linear_schedule(5e-4, 0.0, transition_steps=4),
        grad_steps_per_update=2 * 2)
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=50.0,
                  lr=sched, hidden_sizes=(32, 32), repeat=2, n_minibatches=2)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    env_state = env.reset_vec(jax.random.PRNGKey(1), 8)
    stats = EpisodeStats.init(8, env.num_costs)
    rollout = jax.jit(make_rollout_fn(env, algo.act_fn, 32))
    upd = jax.jit(algo.update)

    res = rollout(state.params, env_state, stats, jax.random.PRNGKey(2))
    state, metrics = upd(state, res.transitions, res.stats.mean_cost,
                         res.stats.n_episodes, jax.random.PRNGKey(3))
    assert int(state.gradient_steps) == 4
    assert bool(jnp.isfinite(metrics["loss/total"]))
    # schedule position after one update = lr(1)
    assert abs(float(sched(state.gradient_steps)) - 5e-4 * 0.75) < 1e-9
