"""Drone agent: simplified planar-attitude quadrotor (4 rotor inputs) —
SafetyDroneRun-v0 / SafetyDroneCircle-v0 analogs of Bullet-Safety-Gym's Drone.

Dynamics: rigid body with roll/pitch attitude, rotor mixing to (thrust, roll
torque, pitch torque); yaw is ignored. Gravity must be actively compensated,
and the episode terminates on ground contact (z <= 0) — the one agent in the
family with a true ``terminated`` signal, exercising the value-mask path.
Crashing charges the COST channel at the suite limit (``CRASH_COST``): a
crash is itself a safety violation, so "die fast" is never a feasible
shortcut for the constrained optimizer (see ``_reward_cost``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.envs.base import SafeEnv, register
from fsrl_tpu.envs.tasks import CircleTask, RunTask

Array = jax.Array

DT = 0.05
G = 9.81
THRUST_MAX = 2.0 * G      # per-unit total thrust at action=+1
TILT_RATE = 4.0           # attitude torque scale
ANG_DRAG = 2.0
# Anisotropic linear drag: rotor downwash gives a quadrotor far more vertical
# damping than horizontal. The strong z-drag makes altitude perturbations decay
# in ~0.6s instead of ~3s, which keeps hover recoverable under exploration
# noise — without it, on-policy learners crash-terminate before they can
# assign credit for altitude control (see benchmarks/diag_drone.py).
# Plain tuple (not jnp.array): a module-level device array would initialize
# the JAX backend at import time and lock platform selection before user code
# can call jax.config.update. Converted inside _step_sim (jit-traced, free).
LIN_DRAG = (0.3, 0.3, 1.6)
Z_TARGET = 2.0
# Cost charged to the constraint channel on crash-termination: the suite's
# standard cost limit, so a crashed episode can never undercut the budget.
CRASH_COST = 25.0
VEL_SCALE = 5.0


@struct.dataclass
class DroneSim:
    pos: Array     # (3,)
    vel: Array     # (3,)
    att: Array     # (2,) roll, pitch
    angvel: Array  # (2,)


class DroneEnv(SafeEnv):
    action_size = 4  # rotor thrusts in [-1, 1] (mapped to [0, 1])
    max_episode_steps = 500

    def __init__(self, task):
        self.task = task
        self.observation_size = 10 + task.obs_extras(jnp.zeros(2), jnp.zeros(2)).shape[0]

    def _init_sim(self, rng: Array) -> DroneSim:
        k1, k2 = jax.random.split(rng)
        if isinstance(self.task, CircleTask):
            theta = jax.random.uniform(k1, (), minval=0, maxval=2 * jnp.pi)
            xy = self.task.radius * jnp.array([jnp.cos(theta), jnp.sin(theta)])
            xy = xy.at[0].set(jnp.clip(xy[0], -self.task.x_lim, self.task.x_lim))
        else:
            xy = jax.random.uniform(k1, (2,), minval=-0.5, maxval=0.5)
        pos = jnp.concatenate([xy, jnp.array([Z_TARGET])])
        vel = 0.1 * jax.random.normal(k2, (3,))
        return DroneSim(pos=pos, vel=vel, att=jnp.zeros(2), angvel=jnp.zeros(2))

    def _step_sim(self, sim: DroneSim, action: Array, rng: Array) -> DroneSim:
        rotors = 0.5 * (action + 1.0)  # [0, 1]
        thrust = THRUST_MAX * jnp.mean(rotors)
        # X-configuration mixing for roll/pitch torques
        roll_t = TILT_RATE * (rotors[0] + rotors[2] - rotors[1] - rotors[3]) * 0.5
        pitch_t = TILT_RATE * (rotors[0] + rotors[1] - rotors[2] - rotors[3]) * 0.5
        angvel = sim.angvel + DT * (jnp.array([roll_t, pitch_t]) - ANG_DRAG * sim.angvel)
        att = jnp.clip(sim.att + DT * angvel, -0.8, 0.8)
        roll, pitch = att[0], att[1]
        # small-angle body-z thrust direction in world frame
        acc = thrust * jnp.array([
            jnp.sin(pitch), -jnp.sin(roll) * jnp.cos(pitch),
            jnp.cos(roll) * jnp.cos(pitch),
        ]) - jnp.array([0.0, 0.0, G]) - jnp.asarray(LIN_DRAG) * sim.vel
        vel = sim.vel + DT * acc
        pos = sim.pos + DT * vel
        # Inelastic ground plane (round-5 reference alignment): the
        # PyBullet drone RESTS on the plane and the episode continues —
        # crashing is not an exit. Our previous hard crash-termination made
        # "die fast" the nearest feasible point under a wound-up multiplier
        # and stalled every monotone/deterministic learner on DroneRun
        # (trpol 0.22x / cpo 0.41x / sacl -0.03x, benchmarks/
        # diag_drone_trpol.py findings C-D). Grounded: z clamped, downward
        # velocity zeroed (thrust can still lift off), strong xy friction.
        return DroneSim(pos=pos, vel=vel, att=att, angvel=angvel)

    def _obs(self, sim: DroneSim) -> Array:
        base = jnp.concatenate([
            sim.vel / VEL_SCALE,
            sim.att,
            sim.angvel / 4.0,
            jnp.array([(sim.pos[2] - Z_TARGET) / Z_TARGET,
                       jnp.tanh(sim.pos[0] / 10.0),
                       jnp.tanh(sim.pos[1] / 10.0)]),
        ])
        return jnp.concatenate([base, self.task.obs_extras(sim.pos[:2], sim.vel[:2])])

    def _reward_cost(self, sim_prev: DroneSim, sim: DroneSim, action: Array):
        reward, cost = self.task.reward_cost(sim.pos[:2], sim.vel[:2])
        term = self._terminated(sim).astype(jnp.float32)
        # altitude-hold shaping + crash penalty keep the task well-posed in 3D
        reward = reward - 0.1 * jnp.abs(sim.pos[2] - Z_TARGET) - 10.0 * term
        # Crashing IS a safety violation: the crash charges the COST channel
        # at the standard suite limit, so a crashed episode is never
        # feasible. This removes the "die fast" degenerate basin BY
        # CONSTRUCTION (a dead drone used to pay no episodic cost, which
        # made early termination the nearest feasible point for every
        # monotone/deterministic learner — trpol 0.22x / cpo 0.41x /
        # sacl -0.03x, diag_drone_trpol.py) while keeping crash-termination
        # itself, which concentrates on-policy samples on airborne states
        # (non-terminating floor/bounce variants starved PPO/FOCOPS to
        # ~0.1x; measured r5, findings E-G).
        cost = cost + CRASH_COST * term
        return reward, cost

    def _terminated(self, sim: DroneSim) -> Array:
        return jnp.logical_or(sim.pos[2] <= 0.0, sim.pos[2] > 4.0 * Z_TARGET)


register("SafetyDroneRun-v0", lambda **kw: DroneEnv(RunTask(**kw)))
register("SafetyDroneCircle-v0", lambda **kw: DroneEnv(CircleTask(**kw)))
