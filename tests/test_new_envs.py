"""Tests for the navigation (Goal) and Ant env families + velocity wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsrl_tpu.envs import make

NAV_TASKS = ["SafetyPointGoal1-v0", "SafetyPointGoal2-v0",
             "SafetyCarGoal1-v0", "SafetyCarGoal2-v0"]
ANT_TASKS = ["SafetyAntRun-v0", "SafetyAntCircle-v0"]


@pytest.mark.parametrize("task", NAV_TASKS + ANT_TASKS)
def test_env_shapes_and_finiteness(task):
    env = make(task)
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (env.observation_size,)

    @jax.jit
    def run(state, key):
        def body(c, k):
            s, tot_r, tot_c = c
            act = jax.random.uniform(k, (env.action_size,), minval=-1, maxval=1)
            s, ts = env.step(s, act)
            return (s, tot_r + ts.reward, tot_c + jnp.sum(ts.cost)), ts.obs
        keys = jax.random.split(key, 50)
        (s, r, c), obs = jax.lax.scan(body, (state, 0.0, 0.0), keys)
        return r, c, obs

    r, c, obs = run(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(r)) and float(c) >= 0
    assert bool(jnp.all(jnp.isfinite(obs)))


def test_goal_env_reward_progress_and_hazard_cost():
    env = make("SafetyPointGoal1-v0")
    state = env.reset(jax.random.PRNGKey(3))
    # drive straight toward the goal → positive cumulative reward
    @jax.jit
    def toward(state):
        def body(s, _):
            rel = s.sim.goal - s.sim.pos
            act = jnp.clip(rel, -1, 1)
            s, ts = env.step(s, act)
            return s, ts.reward
        return jax.lax.scan(body, state, None, length=100)
    state, rews = toward(state)
    assert float(jnp.sum(rews)) > 0.5


def test_ant_gait_produces_forward_motion():
    """A hand-scripted paddling gait (alternating stroke with lift on the
    recovery swing) must move the ant forward — the task is solvable."""
    env = make("SafetyAntRun-v0")
    state = env.reset(jax.random.PRNGKey(0))

    @jax.jit
    def run(state):
        def body(c, t):
            s, x0 = c
            phase = jnp.sin(0.6 * t)
            # all legs: stroke backward (negative) on power, forward on recovery
            stroke = jnp.where(phase > 0, -1.0, 1.0)
            lift = jnp.where(phase > 0, -1.0, 1.0)  # grounded on power stroke
            act = jnp.stack([stroke, lift] * 4).reshape(8)
            s, ts = env.step(s, act)
            return (s, x0), s.sim.pos[0]
        (s, _), xs = jax.lax.scan(body, (state, 0.0),
                                  jnp.arange(200, dtype=jnp.float32))
        return xs
    xs = run(state)
    assert float(xs[-1]) > 1.0, f"scripted gait went {float(xs[-1]):.2f}m"


def test_velocity_wrapper_cost():
    pytest.importorskip("mujoco")
    from fsrl_tpu.envs.velocity import make_velocity_env
    env = make_velocity_env("SafetyHalfCheetahVelocity-v1")
    obs, _ = env.reset(seed=0)
    _, _, _, _, info = env.step(env.action_space.sample())
    assert "cost" in info and info["cost"] in (0.0, 1.0)
    env.close()
