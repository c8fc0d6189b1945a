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


def _robot_step(robot: str, pos: Array, vel: Array, action: Array):
    """Shared robot dynamics: "point" = force-controlled damped mass,
    "car" = unicycle (vel stores [speed, heading]) — the two safety-gymnasium
    robots our analogs model. Both keep vel shape (2,)."""
    if robot == "point":
        acc = 10.0 * action - 1.0 * vel
        vel = vel + DT * acc
        pos = pos + DT * vel
    else:  # car
        speed = vel[0] + DT * (8.0 * action[0] - vel[0])
        heading = vel[1] + DT * 3.0 * action[1]
        vel = jnp.array([speed, heading])
        pos = pos + DT * speed * jnp.array([jnp.cos(heading),
                                            jnp.sin(heading)])
    return jnp.clip(pos, -1.5 * ARENA, 1.5 * ARENA), vel


def _robot_ego(robot: str, vel: Array) -> Array:
    if robot == "point":
        return vel / 5.0
    return jnp.array([vel[0] / 5.0, jnp.cos(vel[1]), jnp.sin(vel[1])])


def _robot_world_vel(robot: str, vel: Array) -> Array:
    if robot == "point":
        return vel
    return vel[0] * jnp.array([jnp.cos(vel[1]), jnp.sin(vel[1])])


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
        pos, vel = _robot_step(self.robot, sim.pos, sim.vel, action)

        # goal resampling on reach (keeps episodes fixed-length like the suite)
        k_goal, rng = jax.random.split(rng)
        reached = jnp.linalg.norm(pos - sim.goal) < GOAL_RADIUS
        new_goal = jax.random.uniform(k_goal, (2,), minval=-ARENA, maxval=ARENA)
        goal = jnp.where(reached, new_goal, sim.goal)
        return NavSim(pos=pos, vel=vel, goal=goal, hazards=sim.hazards)

    def _world_vel(self, sim: NavSim) -> Array:
        return _robot_world_vel(self.robot, sim.vel)

    def _obs(self, sim: NavSim) -> Array:
        rel = sim.goal - sim.pos
        dist = jnp.linalg.norm(rel)
        compass = rel / jnp.maximum(dist, 1e-6)
        ego = _robot_ego(self.robot, sim.vel)
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


# ---------------------------------------------------------------------------
# Button family (safety-gymnasium SafetyPointButton1/2): press the highlighted
# button among several; hazards, moving gremlins, and wrong-button presses all
# cost. Reference benchmark suite, ``docs/tutorials/benchmark.rst:88-89``.
# ---------------------------------------------------------------------------

N_BUTTONS = 4
BUTTON_RADIUS = 0.3
GREMLIN_RADIUS = 0.25
GREMLIN_ORBIT = 0.6
GREMLIN_SPEED = 0.06   # radians per step


@struct.dataclass
class ButtonSim:
    pos: Array        # (2,)
    vel: Array        # (2,)
    buttons: Array    # (N_BUTTONS, 2)
    goal_idx: Array   # () int32 — which button is the goal
    hazards: Array    # (H, 2)
    gremlin_centers: Array   # (G, 2)
    phase: Array      # () gremlin orbit phase


class ButtonEnv(SafeEnv):
    """Press-the-right-button navigation with hazards and orbiting gremlins."""

    max_episode_steps = 1000

    def __init__(self, level: int = 1, robot: str = "point"):
        assert robot in ("point", "car")
        self.robot = robot
        self.n_hazards = 4 if level == 1 else 6
        self.n_gremlins = 4 if level == 1 else 6
        self.hazard_radius = 0.2 if level == 1 else 0.25
        self.action_size = 2
        # compass(2) + dist(1) + ego(2|3) + lidar(buttons/hazards/gremlins)
        self.observation_size = 3 + (2 if robot == "point" else 3) \
            + 3 * LIDAR_BINS

    def _init_sim(self, rng: Array) -> ButtonSim:
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        return ButtonSim(
            pos=jax.random.uniform(k1, (2,), minval=-ARENA, maxval=ARENA),
            vel=jnp.zeros(2),
            buttons=jax.random.uniform(k2, (N_BUTTONS, 2), minval=-ARENA,
                                       maxval=ARENA),
            goal_idx=jax.random.randint(k3, (), 0, N_BUTTONS),
            hazards=jax.random.uniform(k4, (self.n_hazards, 2), minval=-ARENA,
                                       maxval=ARENA),
            gremlin_centers=jax.random.uniform(k5, (self.n_gremlins, 2),
                                               minval=-ARENA, maxval=ARENA),
            phase=jnp.zeros(()),
        )

    def _gremlin_pos(self, sim: ButtonSim) -> Array:
        ang = sim.phase + jnp.arange(self.n_gremlins) * (2 * jnp.pi /
                                                         self.n_gremlins)
        orbit = GREMLIN_ORBIT * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)
        return sim.gremlin_centers + orbit

    def _step_sim(self, sim: ButtonSim, action: Array, rng: Array) -> ButtonSim:
        pos, vel = _robot_step(self.robot, sim.pos, sim.vel, action)
        goal_btn = sim.buttons[sim.goal_idx]
        pressed = jnp.linalg.norm(pos - goal_btn) < BUTTON_RADIUS
        new_idx = jax.random.randint(rng, (), 0, N_BUTTONS)
        goal_idx = jnp.where(pressed, new_idx, sim.goal_idx)
        return sim.replace(pos=pos, vel=vel, goal_idx=goal_idx,
                           phase=sim.phase + GREMLIN_SPEED)

    def _obs(self, sim: ButtonSim) -> Array:
        goal = sim.buttons[sim.goal_idx]
        rel = goal - sim.pos
        dist = jnp.linalg.norm(rel)
        compass = rel / jnp.maximum(dist, 1e-6)
        return jnp.concatenate([
            compass, jnp.array([dist / (2 * ARENA)]),
            _robot_ego(self.robot, sim.vel),
            _pseudo_lidar(sim.pos, sim.buttons, BUTTON_RADIUS),
            _pseudo_lidar(sim.pos, sim.hazards, self.hazard_radius),
            _pseudo_lidar(sim.pos, self._gremlin_pos(sim), GREMLIN_RADIUS),
        ])

    def _reward_cost(self, sim_prev: ButtonSim, sim: ButtonSim, action: Array):
        goal_prev = sim_prev.buttons[sim_prev.goal_idx]
        d_before = jnp.linalg.norm(goal_prev - sim_prev.pos)
        d_after = jnp.linalg.norm(goal_prev - sim.pos)
        pressed = d_after < BUTTON_RADIUS
        reward = (d_before - d_after) + GOAL_BONUS * pressed.astype(jnp.float32)

        dists_btn = jnp.linalg.norm(sim.buttons - sim.pos[None, :], axis=-1)
        wrong = jnp.any(jnp.logical_and(
            dists_btn < BUTTON_RADIUS,
            jnp.arange(N_BUTTONS) != sim_prev.goal_idx))
        in_hazard = jnp.any(
            jnp.linalg.norm(sim.hazards - sim.pos[None, :], axis=-1)
            < self.hazard_radius)
        hit_gremlin = jnp.any(
            jnp.linalg.norm(self._gremlin_pos(sim) - sim.pos[None, :], axis=-1)
            < GREMLIN_RADIUS)
        cost = jnp.logical_or(jnp.logical_or(in_hazard, hit_gremlin), wrong)
        return reward, cost.astype(jnp.float32)


register("SafetyPointButton1-v0", lambda **kw: ButtonEnv(1))
register("SafetyPointButton2-v0", lambda **kw: ButtonEnv(2))
register("SafetyCarButton1-v0", lambda **kw: ButtonEnv(1, robot="car"))
register("SafetyCarButton2-v0", lambda **kw: ButtonEnv(2, robot="car"))


# ---------------------------------------------------------------------------
# Push family (safety-gymnasium SafetyPointPush1/2): push a box to the goal;
# hazards and an impassable pillar cost on contact. Reference benchmark suite,
# ``docs/tutorials/benchmark.rst:92-93``.
# ---------------------------------------------------------------------------

BOX_RADIUS = 0.25
ROBOT_RADIUS = 0.15
PILLAR_RADIUS = 0.3


@struct.dataclass
class PushSim:
    pos: Array        # (2,) robot
    vel: Array        # (2,)
    box: Array        # (2,)
    goal: Array       # (2,)
    hazards: Array    # (H, 2)
    pillar: Array     # (2,)


class PushEnv(SafeEnv):
    """Box-pushing navigation: dense reward for robot→box and box→goal
    progress; contact with hazards or the pillar costs."""

    max_episode_steps = 1000

    def __init__(self, level: int = 1, robot: str = "point"):
        assert robot in ("point", "car")
        self.robot = robot
        self.n_hazards = 2 if level == 1 else 4
        self.hazard_radius = 0.2 if level == 1 else 0.25
        self.action_size = 2
        # box compass(2)+dist(1) + box->goal compass(2)+dist(1) + ego + lidar
        self.observation_size = 6 + (2 if robot == "point" else 3) \
            + LIDAR_BINS

    def _init_sim(self, rng: Array) -> PushSim:
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        return PushSim(
            pos=jax.random.uniform(k1, (2,), minval=-ARENA, maxval=ARENA),
            vel=jnp.zeros(2),
            box=jax.random.uniform(k2, (2,), minval=-ARENA / 2, maxval=ARENA / 2),
            goal=jax.random.uniform(k3, (2,), minval=-ARENA, maxval=ARENA),
            hazards=jax.random.uniform(k4, (self.n_hazards, 2), minval=-ARENA,
                                       maxval=ARENA),
            pillar=jax.random.uniform(k5, (2,), minval=-ARENA, maxval=ARENA),
        )

    def _step_sim(self, sim: PushSim, action: Array, rng: Array) -> PushSim:
        pos, vel = _robot_step(self.robot, sim.pos, sim.vel, action)

        # quasi-static push: when the robot overlaps the box, the box is
        # displaced along the contact normal by the overlap amount
        rel = sim.box - pos
        d = jnp.linalg.norm(rel)
        contact = BOX_RADIUS + ROBOT_RADIUS
        overlap = jnp.maximum(contact - d, 0.0)
        normal = rel / jnp.maximum(d, 1e-6)
        box = sim.box + overlap * normal

        # pillar is impassable for the robot: project out of the pillar disc
        prel = pos - sim.pillar
        pd = jnp.linalg.norm(prel)
        pmin = PILLAR_RADIUS + ROBOT_RADIUS
        pnormal = jnp.where(pd > 1e-6, prel / jnp.maximum(pd, 1e-6),
                            jnp.array([1.0, 0.0]))   # degenerate: dead center
        pos = jnp.where(pd < pmin, sim.pillar + pnormal * pmin, pos)

        # goal resample when the box arrives
        k_goal, k_box = jax.random.split(rng)
        reached = jnp.linalg.norm(box - sim.goal) < GOAL_RADIUS
        new_goal = jax.random.uniform(k_goal, (2,), minval=-ARENA, maxval=ARENA)
        goal = jnp.where(reached, new_goal, sim.goal)
        return sim.replace(pos=pos, vel=vel, box=box, goal=goal)

    def _obs(self, sim: PushSim) -> Array:
        rel_box = sim.box - sim.pos
        d_box = jnp.linalg.norm(rel_box)
        rel_goal = sim.goal - sim.box
        d_goal = jnp.linalg.norm(rel_goal)
        return jnp.concatenate([
            rel_box / jnp.maximum(d_box, 1e-6),
            jnp.array([d_box / (2 * ARENA)]),
            rel_goal / jnp.maximum(d_goal, 1e-6),
            jnp.array([d_goal / (2 * ARENA)]),
            _robot_ego(self.robot, sim.vel),
            _pseudo_lidar(sim.pos, jnp.concatenate(
                [sim.hazards, sim.pillar[None, :]], axis=0),
                self.hazard_radius),
        ])

    def _reward_cost(self, sim_prev: PushSim, sim: PushSim, action: Array):
        # box progress toward the goal active during the step + robot progress
        # toward the box (safety-gymnasium's two-term push reward)
        bg_before = jnp.linalg.norm(sim_prev.goal - sim_prev.box)
        bg_after = jnp.linalg.norm(sim_prev.goal - sim.box)
        rb_before = jnp.linalg.norm(sim_prev.box - sim_prev.pos)
        rb_after = jnp.linalg.norm(sim.box - sim.pos)
        reached = bg_after < GOAL_RADIUS
        reward = (bg_before - bg_after) + 0.5 * (rb_before - rb_after) \
            + GOAL_BONUS * reached.astype(jnp.float32)
        obstacles = jnp.concatenate([sim.hazards, sim.pillar[None, :]], axis=0)
        radii = jnp.concatenate([
            jnp.full((self.n_hazards,), self.hazard_radius),
            jnp.array([PILLAR_RADIUS + ROBOT_RADIUS + 1e-3])])
        in_contact = jnp.any(
            jnp.linalg.norm(obstacles - sim.pos[None, :], axis=-1) < radii)
        return reward, in_contact.astype(jnp.float32)


register("SafetyPointPush1-v0", lambda **kw: PushEnv(1))
register("SafetyPointPush2-v0", lambda **kw: PushEnv(2))
register("SafetyCarPush1-v0", lambda **kw: PushEnv(1, robot="car"))
register("SafetyCarPush2-v0", lambda **kw: PushEnv(2, robot="car"))


# ---------------------------------------------------------------------------
# Circle family (safety-gymnasium SafetyPointCircle1/2, SafetyCarCircle1/2):
# circulate a circle of radius CIRCLE_R_NAV; cost fires beyond the sigwall
# |x| > x_lim (level 2 tightens the walls). Reference benchmark suite,
# ``docs/tutorials/benchmark.rst:84-87``; same circulation reward as the
# Bullet CircleTask (envs/tasks.py) at the navigation suite's scale.
# ---------------------------------------------------------------------------

CIRCLE_R_NAV = 1.5


@struct.dataclass
class CircleNavSim:
    pos: Array   # (2,)
    vel: Array   # (2,)


class CircleNavEnv(SafeEnv):
    """Circle-following navigation with sigwall cost."""

    max_episode_steps = 500

    def __init__(self, robot: str = "point", level: int = 1):
        assert robot in ("point", "car")
        self.robot = robot
        self.x_lim = 1.125 if level == 1 else 1.0
        self.action_size = 2
        # [x/R, y/R, dist-R, wall margin] + world vel(2) + ego(2|3)
        self.observation_size = 6 + (2 if robot == "point" else 3)

    def _init_sim(self, rng: Array) -> CircleNavSim:
        k1, k2 = jax.random.split(rng)
        theta = jax.random.uniform(k1, (), minval=0, maxval=2 * jnp.pi)
        pos = CIRCLE_R_NAV * jnp.array([jnp.cos(theta), jnp.sin(theta)])
        pos = pos.at[0].set(jnp.clip(pos[0], -self.x_lim, self.x_lim))
        return CircleNavSim(pos=pos, vel=jnp.zeros(2))

    def _step_sim(self, sim: CircleNavSim, action: Array,
                  rng: Array) -> CircleNavSim:
        pos, vel = _robot_step(self.robot, sim.pos, sim.vel, action)
        return CircleNavSim(pos=pos, vel=vel)

    def _obs(self, sim: CircleNavSim) -> Array:
        x, y = sim.pos[0], sim.pos[1]
        dist = jnp.linalg.norm(sim.pos)
        wvel = _robot_world_vel(self.robot, sim.vel)
        return jnp.concatenate([
            jnp.array([x / CIRCLE_R_NAV, y / CIRCLE_R_NAV,
                       (dist - CIRCLE_R_NAV) / CIRCLE_R_NAV,
                       (self.x_lim - jnp.abs(x)) / self.x_lim]),
            wvel / 5.0,
            _robot_ego(self.robot, sim.vel),
        ])

    def _reward_cost(self, sim_prev: CircleNavSim, sim: CircleNavSim,
                     action: Array):
        x, y = sim.pos[0], sim.pos[1]
        wvel = _robot_world_vel(self.robot, sim.vel)
        dist = jnp.linalg.norm(sim.pos)
        reward = (-y * wvel[0] + x * wvel[1]) / (
            CIRCLE_R_NAV * (1.0 + jnp.abs(dist - CIRCLE_R_NAV)))
        cost = (jnp.abs(x) > self.x_lim).astype(jnp.float32)
        return reward, cost


register("SafetyPointCircle1-v0", lambda **kw: CircleNavEnv("point", 1))
register("SafetyPointCircle2-v0", lambda **kw: CircleNavEnv("point", 2))
register("SafetyCarCircle1-v0", lambda **kw: CircleNavEnv("car", 1))
register("SafetyCarCircle2-v0", lambda **kw: CircleNavEnv("car", 2))
