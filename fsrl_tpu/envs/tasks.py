"""Run / Circle safe-control task definitions (shared across agent bodies).

These reproduce the task *semantics* of Bullet-Safety-Gym's Run and Circle
families (the reference's env suite, ``README.md:74-81``; tasks originally from
the CPO paper, Achiam et al. 2017) on our own JAX dynamics:

* **Run**: reward for forward velocity along +x; unit cost whenever the agent
  leaves the corridor ``|y| <= y_lim`` or exceeds ``speed_limit``.
* **Circle**: reward for circulating counter-clockwise on a circle of radius
  ``radius`` — r = (−y·vx + x·vy) / (r · (1 + | ‖p‖ − r |)) — while the safety
  constraint forbids ``|x| > x_lim`` (the safe region is a vertical band
  narrower than the circle).

Costs are sparse indicators (0/1 per step) exactly like the reference suite, so
episodic cost == number of unsafe steps and ``cost_limit`` has the same meaning.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class RunTask:
    y_lim: float = 2.0
    speed_limit: float = 6.0
    v_target: float = 4.0  # reward normalization: reward ≈ 1/step at v_x = v_target

    def reward_cost(self, pos, vel):
        reward = vel[0] / self.v_target
        speed = jnp.linalg.norm(vel)
        cost = jnp.logical_or(
            jnp.abs(pos[1]) > self.y_lim, speed > self.speed_limit
        ).astype(jnp.float32)
        return reward, cost

    def obs_extras(self, pos, vel):
        """Task-relevant features (translation-invariant along x)."""
        speed = jnp.linalg.norm(vel)
        return jnp.array([
            pos[1] / self.y_lim,
            (self.y_lim - jnp.abs(pos[1])) / self.y_lim,
            (self.speed_limit - speed) / self.speed_limit,
        ])


@dataclass(frozen=True)
class CircleTask:
    radius: float = 7.0
    x_lim: float = 4.0

    def reward_cost(self, pos, vel):
        x, y = pos[0], pos[1]
        dist = jnp.sqrt(x * x + y * y)
        reward = (-y * vel[0] + x * vel[1]) / (
            self.radius * (1.0 + jnp.abs(dist - self.radius))
        )
        cost = (jnp.abs(x) > self.x_lim).astype(jnp.float32)
        return reward, cost

    def obs_extras(self, pos, vel):
        dist = jnp.linalg.norm(pos[:2])
        return jnp.array([
            pos[0] / self.radius,
            pos[1] / self.radius,
            (dist - self.radius) / self.radius,
            (self.x_lim - jnp.abs(pos[0])) / self.radius,
        ])


@dataclass(frozen=True)
class CircleBoundSpeedTask:
    """Two-constraint Circle variant: cost channel 0 = position band
    (|x| > x_lim), channel 1 = speed limit — exercises the reference's
    multi-constraint path (M critics + M multipliers,
    ``lagrangian_base.py:85-96``) with a real vector cost signal."""

    radius: float = 7.0
    x_lim: float = 4.0
    speed_limit: float = 6.0
    num_costs: int = 2

    def reward_cost(self, pos, vel):
        x, y = pos[0], pos[1]
        dist = jnp.sqrt(x * x + y * y)
        reward = (-y * vel[0] + x * vel[1]) / (
            self.radius * (1.0 + jnp.abs(dist - self.radius))
        )
        cost_pos = (jnp.abs(x) > self.x_lim).astype(jnp.float32)
        cost_speed = (jnp.linalg.norm(vel) > self.speed_limit).astype(jnp.float32)
        return reward, jnp.stack([cost_pos, cost_speed])

    def obs_extras(self, pos, vel):
        dist = jnp.linalg.norm(pos[:2])
        speed = jnp.linalg.norm(vel)
        return jnp.array([
            pos[0] / self.radius,
            pos[1] / self.radius,
            (dist - self.radius) / self.radius,
            (self.x_lim - jnp.abs(pos[0])) / self.radius,
            (self.speed_limit - speed) / self.speed_limit,
        ])
