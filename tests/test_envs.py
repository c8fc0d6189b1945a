"""Environment suite tests: API shape contracts, truncation, auto-reset, and
task cost semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsrl_tpu.envs import make, registered_tasks
from fsrl_tpu.envs.tasks import CircleTask, RunTask

ALL_TASKS = [
    "SafetyBallRun-v0", "SafetyBallCircle-v0",
    "SafetyCarRun-v0", "SafetyCarCircle-v0",
    "SafetyDroneRun-v0", "SafetyDroneCircle-v0",
]


def test_registry_contains_core_suite():
    tasks = registered_tasks()
    for t in ALL_TASKS:
        assert t in tasks


@pytest.mark.parametrize("task", ALL_TASKS)
def test_env_api_shapes(task):
    env = make(task)
    rng = jax.random.PRNGKey(0)
    state = env.reset(rng)
    assert state.obs.shape == (env.observation_size,)
    act = jnp.zeros((env.action_size,))
    state, ts = env.step(state, act)
    assert ts.obs.shape == (env.observation_size,)
    assert ts.reward.shape == ()
    assert ts.cost.shape == (env.num_costs,)
    assert ts.terminated.dtype == bool and ts.truncated.dtype == bool
    assert bool(jnp.all(jnp.isfinite(ts.obs)))


def test_truncation_at_max_episode_steps():
    env = make("SafetyBallRun-v0")
    state = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(c, _):
            s, n_trunc = c
            s, ts = env.step(s, jnp.zeros(2))
            return (s, n_trunc + ts.truncated.astype(jnp.int32)), ts.truncated
        return jax.lax.scan(body, (state, jnp.zeros((), jnp.int32)), None,
                            length=env.max_episode_steps + 3)

    (state, n_trunc), truncs = run(state)
    assert int(n_trunc) >= 1
    assert int(jnp.argmax(truncs)) == env.max_episode_steps - 1


def test_autoreset_resets_done_envs():
    env = make("SafetyBallRun-v0")
    state = env.reset_vec(jax.random.PRNGKey(0), 4)

    @jax.jit
    def run(state):
        def body(s, _):
            s, ts = env.step_autoreset(s, jnp.zeros((4, 2)))
            return s, ts.done
        return jax.lax.scan(body, state, None, length=env.max_episode_steps + 1)

    state, dones = run(state)
    assert bool(jnp.any(dones))          # episodes ended...
    assert int(jnp.max(state.t)) <= 2    # ...and step counters were reset


def test_run_task_cost_semantics():
    t = RunTask()
    # inside corridor, slow → no cost; fast → cost; outside corridor → cost
    _, c = t.reward_cost(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]))
    assert float(c) == 0.0
    _, c = t.reward_cost(jnp.array([0.0, 0.0]), jnp.array([t.speed_limit + 1, 0.0]))
    assert float(c) == 1.0
    _, c = t.reward_cost(jnp.array([0.0, t.y_lim + 0.1]), jnp.array([1.0, 0.0]))
    assert float(c) == 1.0
    # reward is forward velocity normalized
    r, _ = t.reward_cost(jnp.array([0.0, 0.0]), jnp.array([t.v_target, 0.0]))
    assert float(r) == pytest.approx(1.0)


def test_circle_task_cost_and_reward_direction():
    t = CircleTask()
    pos = jnp.array([0.0, t.radius])  # top of circle, inside band
    ccw_vel = jnp.array([-2.0, 0.0])  # counter-clockwise tangent
    r_ccw, c = t.reward_cost(pos, ccw_vel)
    r_cw, _ = t.reward_cost(pos, -ccw_vel)
    assert float(c) == 0.0
    assert float(r_ccw) > 0 > float(r_cw)
    _, c = t.reward_cost(jnp.array([t.x_lim + 0.5, 0.0]), ccw_vel)
    assert float(c) == 1.0


def test_drone_crash_terminates_and_charges_cost():
    """Free fall hits the ground -> episode TERMINATES and the crash is
    charged to the COST channel at the suite limit (CRASH_COST): a crashed
    episode is never feasible, so "die fast" cannot be the constrained
    optimizer's shortcut (round-5 semantics; diag_drone_trpol.py E-G)."""
    from fsrl_tpu.envs.drone import CRASH_COST
    env = make("SafetyDroneRun-v0")
    state = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(c, _):
            s, term, ccum = c
            # full negative rotors → zero thrust → free fall
            s, ts = env.step(s, -jnp.ones(4))
            first = jnp.logical_and(ts.terminated, jnp.logical_not(term))
            ccum = ccum + jnp.where(first, ts.cost[0], 0.0)
            return (s, jnp.logical_or(term, ts.terminated), ccum), None
        return jax.lax.scan(body, (state, jnp.zeros((), bool),
                                   jnp.zeros(())), None, length=100)

    (_, term, crash_cost), _ = run(state)
    assert bool(term)                       # crash ends the episode
    assert float(crash_cost) >= CRASH_COST  # and is a charged violation


def test_drone_flyaway_still_terminates():
    env = make("SafetyDroneRun-v0")
    state = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(c, _):
            s, term = c
            s, ts = env.step(s, jnp.ones(4))   # full thrust forever
            return (s, jnp.logical_or(term, ts.terminated)), None
        return jax.lax.scan(body, (state, jnp.zeros((), bool)), None,
                            length=200)
    (_, term), _ = run(state)
    assert bool(term)


def test_env_determinism():
    env = make("SafetyCarCircle-v0")
    s1 = env.reset(jax.random.PRNGKey(7))
    s2 = env.reset(jax.random.PRNGKey(7))
    act = jnp.array([0.5, -0.3])
    s1, ts1 = env.step(s1, act)
    s2, ts2 = env.step(s2, act)
    np.testing.assert_array_equal(np.asarray(ts1.obs), np.asarray(ts2.obs))
