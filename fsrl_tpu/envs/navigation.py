"""Safety-Gymnasium-style navigation tasks (Goal family), pure JAX.

Reproduces the task semantics of Safety-Gymnasium's SafetyPointGoal1/2 and
SafetyCarGoal1/2 (the reference's navigation suite,
``docs/tutorials/benchmark.rst:81-113``): a robot navigates to a goal position
while avoiding circular hazard regions.

* reward: dense progress toward the goal (distance delta), + bonus on reaching
  it; the goal then resamples (episode continues to the time limit).
* cost: 1 per step inside any hazard circle (level 1) — level 2 adds more and
  larger hazards.
* observations: ego-frame goal direction/distance + pseudo-lidar over hazards
  (16 bins of inverse-distance readings), matching the spirit of
  safety-gymnasium's compass + lidar sensors.

Robots: Point (double integrator, 2 act dims) and Car (unicycle, 2 act dims) —
the same bodies as the primary suite (``fsrl_tpu/envs/ball.py`` / ``car.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.envs.base import SafeEnv, register

Array = jax.Array

DT = 0.1
ARENA = 3.0            # positions sampled in [-ARENA, ARENA]^2
GOAL_RADIUS = 0.4
LIDAR_BINS = 16
LIDAR_MAX = 3.0
GOAL_BONUS = 10.0


@struct.dataclass
class NavSim:
    pos: Array        # (2,)
    vel: Array        # (2,) point: velocity; car: (speed, heading)
    goal: Array       # (2,)
    hazards: Array    # (H, 2)


def _pseudo_lidar(pos: Array, points: Array, radius: float) -> Array:
    """16-bin inverse-distance lidar over circle centers (safety-gymnasium
    style natural lidar)."""
    rel = points - pos[None, :]
    dist = jnp.maximum(jnp.linalg.norm(rel, axis=-1) - radius, 1e-3)
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])  # [-pi, pi]
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * LIDAR_BINS).astype(jnp.int32)
    bins = jnp.clip(bins, 0, LIDAR_BINS - 1)
    strength = jnp.clip(1.0 - dist / LIDAR_MAX, 0.0, 1.0)
    out = jnp.zeros((LIDAR_BINS,))
    return out.at[bins].max(strength)


class GoalEnv(SafeEnv):
    """Goal navigation with hazards. ``robot`` in {"point", "car"}; ``level``
    in {1, 2} controls hazard count/size like safety-gymnasium."""

    max_episode_steps = 1000

    def __init__(self, robot: str = "point", level: int = 1):
        assert robot in ("point", "car")
        self.robot = robot
        self.n_hazards = 8 if level == 1 else 10
        self.hazard_radius = 0.2 if level == 1 else 0.3
        self.action_size = 2
        # obs: goal compass(2) + goal dist(1) + ego vel(2|3) + hazard lidar(16)
        self.observation_size = 3 + (2 if robot == "point" else 3) + LIDAR_BINS

    # ------------------------------------------------------------------
    def _init_sim(self, rng: Array) -> NavSim:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        pos = jax.random.uniform(k1, (2,), minval=-ARENA, maxval=ARENA)
        goal = jax.random.uniform(k2, (2,), minval=-ARENA, maxval=ARENA)
        hazards = jax.random.uniform(k3, (self.n_hazards, 2),
                                     minval=-ARENA, maxval=ARENA)
        vel = jnp.zeros(2)
        return NavSim(pos=pos, vel=vel, goal=goal, hazards=hazards)

    def _step_sim(self, sim: NavSim, action: Array, rng: Array) -> NavSim:
        if self.robot == "point":
            acc = 10.0 * action - 1.0 * sim.vel
            vel = sim.vel + DT * acc
            pos = sim.pos + DT * vel
        else:  # car: vel = (speed, heading)
            speed = sim.vel[0] + DT * (8.0 * action[0] - sim.vel[0])
            heading = sim.vel[1] + DT * 3.0 * action[1]
            vel = jnp.array([speed, heading])
            pos = sim.pos + DT * speed * jnp.array(
                [jnp.cos(heading), jnp.sin(heading)])
        pos = jnp.clip(pos, -1.5 * ARENA, 1.5 * ARENA)

        # goal resampling on reach (keeps episodes fixed-length like the suite)
        k_goal, rng = jax.random.split(rng)
        reached = jnp.linalg.norm(pos - sim.goal) < GOAL_RADIUS
        new_goal = jax.random.uniform(k_goal, (2,), minval=-ARENA, maxval=ARENA)
        goal = jnp.where(reached, new_goal, sim.goal)
        return NavSim(pos=pos, vel=vel, goal=goal, hazards=sim.hazards)

    def _world_vel(self, sim: NavSim) -> Array:
        if self.robot == "point":
            return sim.vel
        return sim.vel[0] * jnp.array([jnp.cos(sim.vel[1]), jnp.sin(sim.vel[1])])

    def _obs(self, sim: NavSim) -> Array:
        rel = sim.goal - sim.pos
        dist = jnp.linalg.norm(rel)
        compass = rel / jnp.maximum(dist, 1e-6)
        ego = sim.vel / 5.0 if self.robot == "point" else jnp.array(
            [sim.vel[0] / 5.0, jnp.cos(sim.vel[1]), jnp.sin(sim.vel[1])])
        lidar = _pseudo_lidar(sim.pos, sim.hazards, self.hazard_radius)
        return jnp.concatenate([compass, jnp.array([dist / (2 * ARENA)]),
                                ego, lidar])

    def _reward_cost(self, sim_prev: NavSim, sim: NavSim, action: Array):
        # progress toward the goal that was active during the step
        d_before = jnp.linalg.norm(sim_prev.goal - sim_prev.pos)
        d_after = jnp.linalg.norm(sim_prev.goal - sim.pos)
        reached = d_after < GOAL_RADIUS
        reward = (d_before - d_after) + GOAL_BONUS * reached.astype(jnp.float32)
        in_hazard = jnp.any(
            jnp.linalg.norm(sim.hazards - sim.pos[None, :], axis=-1)
            < self.hazard_radius)
        return reward, in_hazard.astype(jnp.float32)


register("SafetyPointGoal1-v0", lambda **kw: GoalEnv("point", 1))
register("SafetyPointGoal2-v0", lambda **kw: GoalEnv("point", 2))
register("SafetyCarGoal1-v0", lambda **kw: GoalEnv("car", 1))
register("SafetyCarGoal2-v0", lambda **kw: GoalEnv("car", 2))
