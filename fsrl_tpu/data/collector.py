"""On-device rollout collection.

The reference's ``FastCollector`` (``fsrl/data/fast_collector.py``) is a host
while-loop: policy forward under no_grad → pipe actions to env worker processes →
read back obs → extract ``info["cost"]`` → buffer.add. Here the entire loop is a
``jax.lax.scan`` over time of ``vmap``-ped env steps — policy, physics, cost
extraction and episode bookkeeping all fused into one XLA program on device.

Semantics notes (SURVEY.md §7.3):
* Training collection is **fixed-length segments** (T steps × N envs) with
  auto-reset, not episode-count-exact like the reference (which refuses
  ``n_step`` collection, ``fast_collector.py:216-221``). Unbiased episodic
  reward/cost statistics are reconstructed from completed-episode accumulators
  carried through the scan (:class:`fsrl_tpu.types.EpisodeStats`).
* Evaluation uses :func:`evaluate` — episode-exact (one episode per env, masked
  after done), matching the reference's eval path for exact parity.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from fsrl_tpu.envs.base import EnvState, SafeEnv
from fsrl_tpu.types import EpisodeStats, Transition

Array = jax.Array

# act_fn(params, obs, rng) -> (raw_action, logp). For deterministic policies the
# logp slot is zeros. Raw actions live in the policy's output space; map_action
# clips/scales to the env bounds (reference ``map_action``, base_policy.py:226-256).
ActFn = Callable[[dict, Array, Array], tuple[Array, Array]]


def map_action(act: Array, low: float, high: float) -> Array:
    """Clip the raw policy output to [-1, 1] and affinely scale to
    [low, high] — the reference action remap (``base_policy.py:226-256``)."""
    act = jnp.clip(act, -1.0, 1.0)
    return low + (high - low) * (act + 1.0) / 2.0


class RolloutResult(NamedTuple):
    env_state: EnvState
    stats: EpisodeStats          # cumulative across the segment
    transitions: Transition      # time-major (T, N, ...)
    hidden: object = None        # recurrent carry AFTER the segment (None if FF)
    init_hidden: object = None   # recurrent carry at segment START (for BPTT)


def make_rollout_fn(env: SafeEnv, act_fn: ActFn, num_steps: int,
                    init_hidden=None, unroll: int = 1):
    """Build ``rollout(params, env_state, stats, rng)`` collecting a
    (num_steps, N_envs) segment. Pure and jittable; N is implied by env_state.

    Recurrent policies: pass ``init_hidden(n_envs) -> carry pytree`` and an
    ``act_fn(params, obs, hidden, rng) -> (act, logp, hidden')``; the hidden
    state threads through the scan and resets per env on episode end — the
    reference collector's RNN plumbing (``fast_collector.py:154-163, 255,
    349-353``) without leaving the device."""

    recurrent = init_hidden is not None

    def rollout(params, env_state: EnvState, stats: EpisodeStats, rng: Array,
                hidden=None) -> RolloutResult:
        if recurrent and hidden is None:
            hidden = init_hidden(env_state.obs.shape[0])
        hidden0 = hidden

        def step(carry, _):
            env_state, stats, hidden, rng = carry
            rng, akey = jax.random.split(rng)
            obs = env_state.obs
            if recurrent:
                act, logp, hidden = act_fn(params, obs, hidden, akey)
            else:
                act, logp = act_fn(params, obs, akey)
            env_act = map_action(act, env.action_low, env.action_high)
            env_state, ts = env.step_autoreset(env_state, env_act)
            if recurrent:
                # per-env hidden reset at episode boundaries
                fresh = init_hidden(obs.shape[0])
                done = ts.done
                sel = lambda f, h: jnp.where(
                    done.reshape(done.shape + (1,) * (h.ndim - 1)), f, h)
                hidden = jax.tree.map(sel, fresh, hidden)
            stats = stats.update(ts)
            tr = Transition(
                obs=obs, act=act, obs_next=ts.obs, reward=ts.reward, cost=ts.cost,
                terminated=ts.terminated, truncated=ts.truncated, logp=logp,
            )
            return (env_state, stats, hidden, rng), tr

        # unroll>1 replicates the step body inside the compiled loop,
        # cutting per-iteration loop overhead — worthwhile when the rollout
        # scan is latency- (not bandwidth-) bound, see bench_phases.py
        (env_state, stats, hidden, rng), transitions = jax.lax.scan(
            step, (env_state, stats, hidden, rng), None, length=num_steps,
            unroll=unroll,
        )
        return RolloutResult(env_state, stats, transitions, hidden, hidden0)

    return rollout


def evaluate(
    env: SafeEnv,
    act_fn: ActFn,
    params,
    rng: Array,
    n_episodes: int,
    init_hidden=None,
) -> dict[str, Array]:
    """Episode-exact evaluation: n_episodes envs each run exactly one episode
    (latched done mask). Returns the reference eval stat triple
    (mean reward, length, cost — ``base_agent.py:53-88``) plus termination
    counts. Jittable; wrap in jax.jit at call sites that reuse it.

    Recurrent policies: pass ``init_hidden(n) -> carry`` and a 4-arg
    ``act_fn(params, obs, hidden, rng) -> (act, logp, hidden')``; each episode
    starts from the fresh carry (matching the reference eval collector's
    per-episode hidden reset)."""
    recurrent = init_hidden is not None
    rng, rkey = jax.random.split(rng)
    state = env.reset_vec(rkey, n_episodes)
    M = env.num_costs

    def step(carry, _):
        state, alive, ep_r, ep_c, ep_len, n_term, hidden, rng = carry
        rng, akey = jax.random.split(rng)
        if recurrent:
            act, _, hidden = act_fn(params, state.obs, hidden, akey)
        else:
            act, _ = act_fn(params, state.obs, akey)
        env_act = map_action(act, env.action_low, env.action_high)
        state, ts = env.step_vec(state, env_act)
        af = alive.astype(ep_r.dtype)
        ep_r = ep_r + af * ts.reward
        ep_c = ep_c + af[..., None] * ts.cost
        ep_len = ep_len + alive.astype(jnp.int32)
        n_term = n_term + jnp.sum(alive & ts.terminated)
        alive = jnp.logical_and(alive, jnp.logical_not(ts.done))
        return (state, alive, ep_r, ep_c, ep_len, n_term, hidden, rng), None

    N = n_episodes
    hidden0 = init_hidden(N) if recurrent else None
    init = (state, jnp.ones((N,), bool), jnp.zeros((N,)), jnp.zeros((N, M)),
            jnp.zeros((N,), jnp.int32), jnp.zeros((), jnp.int32), hidden0, rng)
    (state, alive, ep_r, ep_c, ep_len, n_term, _, rng), _ = jax.lax.scan(
        step, init, None, length=env.max_episode_steps
    )
    return {
        "reward": jnp.mean(ep_r),
        "cost": jnp.mean(jnp.sum(ep_c, axis=-1)),
        "cost_per_constraint": jnp.mean(ep_c, axis=0),
        "length": jnp.mean(ep_len.astype(jnp.float32)),
        "n_terminated": n_term,
        "reward_std": jnp.std(ep_r),
    }


def map_action_inverse(act: Array, low: float, high: float) -> Array:
    """Inverse of :func:`map_action` — env-space action back to the policy's
    [-1, 1] range (reference ``BasePolicy.map_action_inverse``,
    base_policy.py:258-283)."""
    return jnp.clip(2.0 * (act - low) / (high - low) - 1.0, -1.0, 1.0)
