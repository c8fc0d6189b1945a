"""Tests for the navigation (Goal) and Ant env families + velocity wrappers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsrl_tpu.envs import make

NAV_TASKS = ["SafetyPointGoal1-v0", "SafetyPointGoal2-v0",
             "SafetyCarGoal1-v0", "SafetyCarGoal2-v0",
             "SafetyPointButton1-v0", "SafetyPointButton2-v0",
             "SafetyPointPush1-v0", "SafetyPointPush2-v0"]
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


def test_button_env_goal_press_and_wrong_button_cost():
    env = make("SafetyPointButton1-v0")
    state = env.reset(jax.random.PRNGKey(5))

    @jax.jit
    def toward_goal(state):
        def body(s, _):
            goal = s.sim.buttons[s.sim.goal_idx]
            act = jnp.clip(goal - s.sim.pos, -1, 1)
            s, ts = env.step(s, act)
            return s, ts.reward
        return jax.lax.scan(body, state, None, length=200)

    state, rews = toward_goal(state)
    assert float(jnp.sum(rews)) > 0.5  # progress + press bonus reachable

    # parking on a NON-goal button accrues cost every step
    sim = state.sim
    wrong_idx = (sim.goal_idx + 1) % 4
    sim2 = sim.replace(pos=sim.buttons[wrong_idx], vel=jnp.zeros(2))
    s2 = state.replace(sim=sim2)
    _, ts = env.step(s2, jnp.zeros(env.action_size))
    assert float(ts.cost.sum()) == 1.0


def test_push_env_box_moves_and_pillar_costs():
    env = make("SafetyPointPush1-v0")
    state = env.reset(jax.random.PRNGKey(7))
    # teleport robot just behind the box relative to goal and push
    sim = state.sim
    to_goal = (sim.goal - sim.box) / jnp.linalg.norm(sim.goal - sim.box)
    sim = sim.replace(pos=sim.box - 0.35 * to_goal, vel=jnp.zeros(2))
    state = state.replace(sim=sim)

    @jax.jit
    def push(state):
        def body(s, _):
            d = (s.sim.box - s.sim.pos)
            act = jnp.clip(3.0 * d + (s.sim.goal - s.sim.box), -1, 1)
            s, ts = env.step(s, act)
            return s, jnp.linalg.norm(s.sim.goal - s.sim.box)
        return jax.lax.scan(body, state, None, length=150)

    d0 = float(jnp.linalg.norm(state.sim.goal - state.sim.box))
    state2, dists = push(state)
    assert float(dists[-1]) < d0 - 0.2  # the box actually moved toward goal

    # standing inside the pillar contact radius costs and is projected out
    simp = state.sim.replace(pos=state.sim.pillar)
    sp = state.replace(sim=simp)
    sp2, ts = env.step(sp, jnp.zeros(env.action_size))
    assert float(ts.cost.sum()) == 1.0
    assert float(jnp.linalg.norm(sp2.sim.pos - sp2.sim.pillar)) >= 0.44


def test_pointgoal_mj_task_semantics():
    """Raw-MuJoCo PointGoal1 reconstruction: goal reach pays +1 and
    resamples without ending the episode; standing inside a hazard pays
    cost 1/step; obs is finite with the documented layout."""
    import numpy as np
    from fsrl_tpu.envs.pointgoal_mj import PointGoalMJEnv

    env = PointGoalMJEnv(seed=3)
    obs, _ = env.reset(seed=3)
    assert obs.shape == (3 + 3 + 2 * 16,)
    assert np.all(np.isfinite(obs))

    # teleport onto the goal: the step must pay the bonus and resample
    env.data.qpos[0:2] = env.goal
    env._last_dist = 0.0
    old_goal = env.goal.copy()
    obs, r, term, trunc, info = env.step([0.0, 0.0])
    assert info["goal_met"] and r > 0.5 and not term
    assert np.linalg.norm(env.goal - old_goal) > 1e-6  # resampled

    # teleport into a hazard: cost fires every step
    env.data.qpos[0:2] = env.hazards[0]
    env.data.qvel[:] = 0.0
    _, _, _, _, info = env.step([0.0, 0.0])
    assert info["cost"] == 1.0

    # physics sanity: forward thrust moves the robot along its heading
    env.reset(seed=4)
    env.data.qpos[2] = 0.0
    x0 = float(env.data.qpos[0])
    for _ in range(25):
        env.step([1.0, 0.0])
    assert float(env.data.qpos[0]) > x0 + 0.15
