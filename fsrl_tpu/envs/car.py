"""Car agent: planar unicycle (throttle + steering rate) — SafetyCarRun-v0 /
SafetyCarCircle-v0 analogs of Bullet-Safety-Gym's Car agent."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.envs.base import SafeEnv, register
from fsrl_tpu.envs.tasks import CircleTask, RunTask

Array = jax.Array

DT = 0.1
ACCEL = 8.0
DRAG = 1.0          # terminal speed 8
STEER_RATE = 3.0
VEL_SCALE = 5.0


@struct.dataclass
class CarSim:
    pos: Array      # (2,)
    heading: Array  # () radians
    speed: Array    # () signed forward speed


class CarEnv(SafeEnv):
    action_size = 2  # (throttle, steer)
    max_episode_steps = 500

    def __init__(self, task):
        self.task = task
        self.observation_size = 5 + task.obs_extras(jnp.zeros(2), jnp.zeros(2)).shape[0]

    def _init_sim(self, rng: Array) -> CarSim:
        k1, k2 = jax.random.split(rng)
        if isinstance(self.task, CircleTask):
            theta = jax.random.uniform(k1, (), minval=0, maxval=2 * jnp.pi)
            pos = self.task.radius * jnp.array([jnp.cos(theta), jnp.sin(theta)])
            pos = pos.at[0].set(jnp.clip(pos[0], -self.task.x_lim, self.task.x_lim))
            heading = theta + jnp.pi / 2  # tangential
        else:
            pos = jax.random.uniform(k1, (2,), minval=-0.5, maxval=0.5)
            heading = jax.random.uniform(k2, (), minval=-0.3, maxval=0.3)
        return CarSim(pos=pos, heading=heading, speed=jnp.zeros(()))

    def _step_sim(self, sim: CarSim, action: Array, rng: Array) -> CarSim:
        throttle, steer = action[0], action[1]
        speed = sim.speed + DT * (ACCEL * throttle - DRAG * sim.speed)
        heading = sim.heading + DT * STEER_RATE * steer
        vel = speed * jnp.array([jnp.cos(heading), jnp.sin(heading)])
        pos = sim.pos + DT * vel
        return CarSim(pos=pos, heading=heading, speed=speed)

    def _vel(self, sim: CarSim) -> Array:
        return sim.speed * jnp.array([jnp.cos(sim.heading), jnp.sin(sim.heading)])

    def _obs(self, sim: CarSim) -> Array:
        vel = self._vel(sim)
        base = jnp.concatenate([
            vel / VEL_SCALE,
            jnp.array([jnp.cos(sim.heading), jnp.sin(sim.heading),
                       sim.speed / VEL_SCALE]),
        ])
        return jnp.concatenate([base, self.task.obs_extras(sim.pos, vel)])

    def _reward_cost(self, sim_prev: CarSim, sim: CarSim, action: Array):
        return self.task.reward_cost(sim.pos, self._vel(sim))


register("SafetyCarRun-v0", lambda **kw: CarEnv(RunTask(**kw)))
register("SafetyCarCircle-v0", lambda **kw: CarEnv(CircleTask(**kw)))
