"""Ball agent: 2-D force-controlled point mass with drag (SafetyBallRun-v0 /
SafetyBallCircle-v0 analogs of Bullet-Safety-Gym's Ball agent)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.envs.base import SafeEnv, register
from fsrl_tpu.envs.tasks import CircleBoundSpeedTask, CircleTask, RunTask

Array = jax.Array

DT = 0.1
ACCEL = 10.0
DRAG = 1.0          # terminal speed = ACCEL/DRAG = 10 per axis
VEL_SCALE = 5.0     # obs normalization


@struct.dataclass
class BallSim:
    pos: Array  # (2,)
    vel: Array  # (2,)


class BallEnv(SafeEnv):
    action_size = 2
    max_episode_steps = 500

    def __init__(self, task):
        self.task = task
        self.num_costs = getattr(task, "num_costs", 1)
        self.observation_size = 4 + task.obs_extras(jnp.zeros(2), jnp.zeros(2)).shape[0]

    def _init_sim(self, rng: Array) -> BallSim:
        k1, k2 = jax.random.split(rng)
        if isinstance(self.task, (CircleTask, CircleBoundSpeedTask)):
            # spawn near the circle with small noise
            theta = jax.random.uniform(k1, (), minval=0, maxval=2 * jnp.pi)
            r = self.task.radius + jax.random.uniform(k2, (), minval=-0.5, maxval=0.5)
            pos = r * jnp.array([jnp.cos(theta), jnp.sin(theta)])
            # clamp spawn inside the safe band
            pos = pos.at[0].set(jnp.clip(pos[0], -self.task.x_lim, self.task.x_lim))
            vel = jnp.zeros(2)
        else:
            pos = jax.random.uniform(k1, (2,), minval=-0.5, maxval=0.5)
            vel = jax.random.uniform(k2, (2,), minval=-0.1, maxval=0.1)
        return BallSim(pos=pos, vel=vel)

    def _step_sim(self, sim: BallSim, action: Array, rng: Array) -> BallSim:
        acc = ACCEL * action - DRAG * sim.vel
        vel = sim.vel + DT * acc
        pos = sim.pos + DT * vel
        return BallSim(pos=pos, vel=vel)

    def _obs(self, sim: BallSim) -> Array:
        base = jnp.concatenate([sim.vel / VEL_SCALE,
                                jnp.tanh(sim.pos / 10.0)])
        return jnp.concatenate([base, self.task.obs_extras(sim.pos, sim.vel)])

    def _reward_cost(self, sim_prev: BallSim, sim: BallSim, action: Array):
        return self.task.reward_cost(sim.pos, sim.vel)


register("SafetyBallRun-v0", lambda **kw: BallEnv(RunTask(**kw)))
register("SafetyBallCircle-v0", lambda **kw: BallEnv(CircleTask(**kw)))
# two-constraint variant (position band + speed limit as separate channels)
register("SafetyBallCircle2C-v0",
         lambda **kw: BallEnv(CircleBoundSpeedTask(**kw)))
