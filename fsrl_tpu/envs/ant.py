"""Ant agent: planar quadruped with a paddling-gait contact model —
SafetyAntRun-v0 / SafetyAntCircle-v0 analogs of Bullet-Safety-Gym's Ant.

NOT MuJoCo Ant dynamics (no articulated rigid-body sim in this image — mjx is
unavailable); this is an original 8-action locomotion model with the same
interface scale (8-dim action, ~25-dim obs) and the same learning challenge
shape: reward requires discovering a coordinated gait, not just pushing a
velocity command.

Model: torso (2-D position, heading, body-frame velocity) + 4 legs. Per leg:
stroke angle ``alpha`` (hip sweep) and lift ``l`` in [0, 1] (knee). Actions =
(stroke rate, lift) x 4. A grounded leg (low lift) sweeping backward produces
forward thrust; sweeping forward while grounded brakes — so net progress
demands the swing-lift/power-press cycle. Left/right thrust asymmetry turns
the torso. Falls (all legs lifted at speed) terminate the episode.

Falling charges the COST channel at the suite limit (``FALL_COST``), the
same crash-cost semantics as ``envs/drone.py``: a fall is itself a safety
violation, so the "fall fast, pay no episodic cost" degenerate feasible
point — diagnosed as the stall-seed mechanism behind the sub-0.8x AntRun
on-policy cells (`docs/env_fidelity.md`, `benchmarks/diag_drone_trpol.py`)
— is removed by construction while fall-termination is kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.envs.base import SafeEnv, register
from fsrl_tpu.envs.tasks import CircleTask, RunTask

Array = jax.Array

DT = 0.05
STROKE_RATE = 6.0      # max hip sweep speed (rad/s)
STROKE_LIM = 0.8       # hip sweep range (rad)
THRUST = 2.5           # per-leg thrust coefficient
DRAG = 0.8
TURN = 1.5
LIFT_TAU = 8.0         # lift servo speed
VEL_SCALE = 4.0
# Cost charged to the constraint channel on fall-termination (see module
# docstring; mirrors drone.py CRASH_COST): the suite's standard cost limit,
# so a fallen episode can never undercut the budget.
FALL_COST = 25.0


@struct.dataclass
class AntSim:
    pos: Array       # (2,)
    heading: Array   # ()
    vel_body: Array  # (2,) longitudinal/lateral
    alpha: Array     # (4,) leg stroke angles
    alpha_dot: Array # (4,)
    lift: Array      # (4,) in [0, 1]


class AntEnv(SafeEnv):
    action_size = 8
    max_episode_steps = 500

    def __init__(self, task):
        self.task = task
        self.observation_size = 21 + task.obs_extras(jnp.zeros(2),
                                                     jnp.zeros(2)).shape[0]

    def _init_sim(self, rng: Array) -> AntSim:
        k1, k2, k3 = jax.random.split(rng, 3)
        if isinstance(self.task, CircleTask):
            theta = jax.random.uniform(k1, (), minval=0, maxval=2 * jnp.pi)
            pos = self.task.radius * jnp.array([jnp.cos(theta), jnp.sin(theta)])
            pos = pos.at[0].set(jnp.clip(pos[0], -self.task.x_lim,
                                         self.task.x_lim))
            heading = theta + jnp.pi / 2
        else:
            pos = jax.random.uniform(k1, (2,), minval=-0.5, maxval=0.5)
            heading = jax.random.uniform(k2, (), minval=-0.3, maxval=0.3)
        alpha = 0.1 * jax.random.normal(k3, (4,))
        return AntSim(pos=pos, heading=heading, vel_body=jnp.zeros(2),
                      alpha=alpha, alpha_dot=jnp.zeros(4), lift=jnp.zeros(4))

    def _step_sim(self, sim: AntSim, action: Array, rng: Array) -> AntSim:
        stroke_cmd = action[0::2]           # (4,) target sweep rate
        lift_cmd = 0.5 * (action[1::2] + 1) # (4,) target lift in [0, 1]
        # first-order servos for stroke rate and lift
        alpha_dot = STROKE_RATE * stroke_cmd
        alpha = jnp.clip(sim.alpha + DT * alpha_dot, -STROKE_LIM, STROKE_LIM)
        # at the stroke limit the leg stops contributing motion
        at_lim = jnp.abs(alpha) >= STROKE_LIM
        eff_rate = jnp.where(at_lim & (jnp.sign(alpha_dot) == jnp.sign(alpha)),
                             0.0, alpha_dot)
        lift = sim.lift + DT * LIFT_TAU * (lift_cmd - sim.lift)
        ground = 1.0 - lift                 # (4,) contact weight
        # backward sweep (negative rate) of a grounded leg → forward thrust
        thrust_i = -eff_rate * ground * THRUST / STROKE_RATE
        fwd = jnp.sum(thrust_i)
        # left legs (0,1) vs right legs (2,3) asymmetry → yaw
        yaw = TURN * (jnp.sum(thrust_i[:2]) - jnp.sum(thrust_i[2:]))
        v_lon = sim.vel_body[0] + DT * (fwd * 4.0 - DRAG * sim.vel_body[0])
        v_lat = sim.vel_body[1] * (1.0 - DT * 4.0)   # strong lateral friction
        heading = sim.heading + DT * yaw
        c, s = jnp.cos(heading), jnp.sin(heading)
        vel_world = jnp.array([c * v_lon - s * v_lat, s * v_lon + c * v_lat])
        pos = sim.pos + DT * vel_world
        return AntSim(pos=pos, heading=heading,
                      vel_body=jnp.array([v_lon, v_lat]),
                      alpha=alpha, alpha_dot=eff_rate, lift=lift)

    def _world_vel(self, sim: AntSim) -> Array:
        c, s = jnp.cos(sim.heading), jnp.sin(sim.heading)
        vl, vt = sim.vel_body[0], sim.vel_body[1]
        return jnp.array([c * vl - s * vt, s * vl + c * vt])

    def _obs(self, sim: AntSim) -> Array:
        base = jnp.concatenate([
            sim.vel_body / VEL_SCALE,
            jnp.array([jnp.cos(sim.heading), jnp.sin(sim.heading)]),
            jnp.sin(sim.alpha), jnp.cos(sim.alpha),
            sim.alpha_dot / STROKE_RATE, sim.lift,
            jnp.array([jnp.mean(sim.lift)]),
        ])
        return jnp.concatenate([base,
                                self.task.obs_extras(sim.pos,
                                                     self._world_vel(sim))])

    def _reward_cost(self, sim_prev: AntSim, sim: AntSim, action: Array):
        reward, cost = self.task.reward_cost(sim.pos, self._world_vel(sim))
        # small control cost like MuJoCo Ant
        term = self._terminated(sim).astype(jnp.float32)
        reward = reward - 0.01 * jnp.sum(action**2) - 5.0 * term
        # falling IS a safety violation (drone.py crash-cost semantics): the
        # charge removes the die-fast degenerate feasible point that stalls
        # 1-in-3 on-policy seeds (env_fidelity.md AntRun diagnosis)
        cost = cost + FALL_COST * term
        return reward, cost

    def _terminated(self, sim: AntSim) -> Array:
        # "fall": every leg lifted while moving — no support polygon
        return jnp.logical_and(jnp.min(sim.lift) > 0.9,
                               jnp.abs(sim.vel_body[0]) > 0.5)


register("SafetyAntRun-v0",
         lambda **kw: AntEnv(RunTask(speed_limit=3.0, v_target=2.0, **kw)))
register("SafetyAntCircle-v0", lambda **kw: AntEnv(CircleTask(**kw)))
