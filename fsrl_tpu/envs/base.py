"""JAX-native safe-RL environment API.

The reference runs external PyBullet/MuJoCo envs in worker *processes* behind
Tianshou's VectorEnv (reference ``fsrl/data/fast_collector.py``, §2.9 of
SURVEY.md) and smuggles the safety signal through ``info["cost"]``. The TPU-native
design makes envs **pure functions on device**: ``reset``/``step`` are jittable,
``vmap``-able, and carry their own RNG, so thousands of env instances step in
lockstep inside the collector's ``lax.scan`` with zero host round-trips. ``cost``
is a first-class field of the returned :class:`~fsrl_tpu.types.Timestep`.

Termination semantics follow Gymnasium: ``terminated`` (true failure — no
bootstrap) vs ``truncated`` (time limit — bootstrap allowed), which the return
kernels consume exactly like the reference's ``value_mask``
(``fsrl/policy/base_policy.py:357-375``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.types import Timestep

Array = jax.Array


@struct.dataclass
class EnvState:
    sim: Any        # env-specific physics state pytree
    obs: Array      # current observation
    t: Array        # int32 step-in-episode counter
    rng: Array      # per-instance PRNG key


class SafeEnv:
    """Base class. Subclasses implement ``_init_sim``, ``_step_sim``, ``_obs``,
    ``_reward_cost``, ``_terminated`` as pure functions of the sim state."""

    observation_size: int
    action_size: int
    max_episode_steps: int = 500
    num_costs: int = 1
    # action bounds of the *environment* action space; policies emit [-1, 1]
    # and the collector rescales (reference ``map_action``, base_policy.py:226-256)
    action_low: float = -1.0
    action_high: float = 1.0

    # --- public API ---
    def reset(self, rng: Array) -> EnvState:
        rng, sub = jax.random.split(rng)
        sim = self._init_sim(sub)
        return EnvState(sim=sim, obs=self._obs(sim), t=jnp.zeros((), jnp.int32), rng=rng)

    def step(self, state: EnvState, action: Array) -> tuple[EnvState, Timestep]:
        rng, sub = jax.random.split(state.rng)
        action = jnp.clip(action, self.action_low, self.action_high)
        sim = self._step_sim(state.sim, action, sub)
        obs = self._obs(sim)
        reward, cost = self._reward_cost(state.sim, sim, action)
        t = state.t + 1
        terminated = self._terminated(sim)
        truncated = jnp.logical_and(t >= self.max_episode_steps,
                                    jnp.logical_not(terminated))
        ts = Timestep(obs=obs, reward=reward,
                      cost=jnp.atleast_1d(cost)[:self.num_costs],
                      terminated=terminated, truncated=truncated)
        return EnvState(sim=sim, obs=obs, t=t, rng=rng), ts

    # --- subclass hooks ---
    def _init_sim(self, rng: Array):
        raise NotImplementedError

    def _step_sim(self, sim, action: Array, rng: Array):
        raise NotImplementedError

    def _obs(self, sim) -> Array:
        raise NotImplementedError

    def _reward_cost(self, sim_prev, sim, action: Array) -> tuple[Array, Array]:
        raise NotImplementedError

    def _terminated(self, sim) -> Array:
        return jnp.zeros((), bool)

    # --- vectorization helpers ---
    def reset_vec(self, rng: Array, n_envs: int,
                  stagger: bool = False) -> EnvState:
        """Reset ``n_envs`` instances. With ``stagger=True`` the per-env
        episode clocks start uniformly spread over ``[0, max_episode_steps)``
        so truncations desynchronize: a lockstep-reset fleet would otherwise
        complete ALL episodes at the same step, making episodic-cost
        measurements (the PID multiplier's input) arrive in rare bursts
        instead of the steady per-collect stream a host env fleet produces.
        First episodes are correspondingly shorter; use only for training
        states, never for episode-exact evaluation."""
        state = jax.vmap(self.reset)(jax.random.split(rng, n_envs))
        if stagger and n_envs > 1:
            offsets = (jnp.arange(n_envs) * self.max_episode_steps) // n_envs
            state = state.replace(t=offsets.astype(jnp.int32))
        return state

    def step_vec(self, state: EnvState, action: Array) -> tuple[EnvState, Timestep]:
        return jax.vmap(self.step)(state, action)

    def step_autoreset(self, state: EnvState, action: Array) -> tuple[EnvState, Timestep]:
        """Vectorized step with per-env auto-reset on done.

        The returned Timestep contains the TRUE final-step signals (reward, cost,
        terminated/truncated, and ``obs`` = the final observation for correct
        bootstrapping); the returned state is already reset where done — the
        device-side equivalent of the reference collector's
        ``_reset_env_with_ids`` (``fast_collector.py:349-353``).
        """
        new_state, ts = self.step_vec(state, action)
        done = ts.done
        fresh = jax.vmap(self.reset)(new_state.rng)  # reuse per-env rng streams
        sel = lambda a, b: jnp.where(
            done.reshape(done.shape + (1,) * (a.ndim - done.ndim)), a, b)
        reset_state = jax.tree.map(sel, fresh, new_state)
        return reset_state, ts


_REGISTRY: dict[str, Callable[[], SafeEnv]] = {}


def register(name: str, ctor: Callable[[], SafeEnv]) -> None:
    """Register a task constructor under a gym-style name."""
    _REGISTRY[name] = ctor


def make(name: str, **kwargs) -> SafeEnv:
    """Create an env by task id, e.g. ``make("SafetyBallRun-v0")``."""
    if name not in _REGISTRY:
        # import side-effect registration
        import fsrl_tpu.envs  # noqa: F401
    if name not in _REGISTRY:
        # accept reference-style ids ("SafetyPointGoal1Gymnasium-v0")
        from fsrl_tpu.config.configs import TASK_ALIASES
        name = TASK_ALIASES.get(name, name)
    if name not in _REGISTRY:
        raise KeyError(f"Unknown task '{name}'. Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def registered_tasks() -> list[str]:
    """All registered task names (the ``make`` registry)."""
    import fsrl_tpu.envs  # noqa: F401
    return sorted(_REGISTRY)
