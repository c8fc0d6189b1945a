"""Shared algorithm plumbing: on-policy batch processing and optimizer helpers.

Replaces the reference's ``BasePolicy.process_fn`` / ``compute_gae_returns``
(``fsrl/policy/base_policy.py:332-451``) with pure functions over time-major
rollout pytrees. All (1 + M) metric channels are processed jointly as a trailing
axis K = 1 + M (column 0 = reward, 1..M = costs — the reference's critic-list
convention as a dense tensor).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fsrl_tpu.ops.gae import gae_advantages, gae_advantages_pscan
from fsrl_tpu.types import Transition

Array = jax.Array


@struct.dataclass
class OnPolicyBatch:
    """Flattened (B = T*N) processed batch for policy-gradient updates."""

    obs: Array        # (B, obs_dim)
    act: Array        # (B, act_dim)
    logp_old: Array   # (B,)
    adv: Array        # (B, K)
    ret: Array        # (B, K)
    value_old: Array  # (B, K)


def metrics_of(tr: Transition) -> Array:
    """Stack reward + cost channels → (T, N, K) (reference ``get_metrics``,
    base_policy.py:377-382)."""
    return jnp.concatenate([tr.reward[..., None], tr.cost], axis=-1)


def process_rollout(
    critic_apply: Callable[[Any, Array], Array],  # params, obs -> (..., K) values
    params,
    tr: Transition,
    gamma: float,
    lam: float,
    gae_impl: str = "pscan",   # "pscan" | "scan" | "pallas" (TPU kernel)
    ret_rms=None,              # RunningMeanStd (K,) → reward normalization on
    episode_len: int | None = None,   # env truncation horizon → 1-pass critic
) -> OnPolicyBatch:
    """GAE over the rollout segment.

    * bootstrap mask: ``v(s') = 0`` where terminated (reference ``value_mask``).
    * the lambda-chain breaks at done steps; the segment tail is naturally
      truncated by the reverse scan (equivalent to the reference forcing
      ``end_flag=True`` at ``buffer.unfinished_index()``, base_policy.py:410-411).

    Critic cost: by default the critic runs over both ``obs`` and ``obs_next``
    (2 full passes, like the reference's two forwards, base_policy.py:420-423).
    When ``episode_len`` (the env's truncation horizon) is given, one pass over
    ``T+1`` rows suffices: ``obs_next[t] == obs[t+1]`` except at done rows,
    terminated rows are value-masked to zero anyway, and the only rows needing
    a true ``v(obs_next)`` are truncations — at most ``T // episode_len + 1``
    per env column (truncation fires exactly at the horizon, so consecutive
    truncations in a column are ≥ episode_len apart) — patched with one small
    fixed-size gather+forward+scatter.
    """
    T, N = tr.reward.shape
    m = metrics_of(tr)                                # (T, N, K)
    if episode_len is not None and T > 2:
        n_boot = N * (T // int(episode_len) + 1)
        ext = jnp.concatenate([tr.obs, tr.obs_next[-1:]], axis=0)  # (T+1,N,d)
        values_ext = critic_apply(params, ext)        # (T+1, N, K)
        values = values_ext[:-1]
        values_next = values_ext[1:]
        trunc = jnp.logical_and(tr.truncated, jnp.logical_not(tr.terminated))
        idx = jnp.nonzero(trunc.reshape(-1), size=n_boot, fill_value=T * N)[0]
        obs_next_flat = tr.obs_next.reshape((T * N,) + tr.obs_next.shape[2:])
        v_boot = critic_apply(params, obs_next_flat[jnp.minimum(idx, T * N - 1)])
        values_next = (values_next.reshape(T * N, -1)
                       .at[idx].set(v_boot, mode="drop")
                       .reshape(values_next.shape))
    else:
        values = critic_apply(params, tr.obs)             # (T, N, K)
        values_next = critic_apply(params, tr.obs_next)   # (T, N, K)
    mask = jnp.logical_not(tr.terminated).astype(values.dtype)[..., None]
    values_next = values_next * mask
    end_flag = jnp.logical_or(tr.terminated, tr.truncated)
    if gae_impl == "pallas":
        from fsrl_tpu.ops.pallas_gae import gae_advantages_pallas
        gae_fn = gae_advantages_pallas
    else:
        gae_fn = gae_advantages_pscan if gae_impl == "pscan" \
            else gae_advantages

    if ret_rms is not None:
        # reward_normalization pipeline (reference base_policy.py:434-444):
        # critics are trained on scale-normalized returns, so unscale their
        # outputs for GAE, then re-normalize the new returns and update stats.
        scale = jnp.sqrt(ret_rms.var + 1e-8)
        adv, ret = gae_fn(m, values * scale, values_next * scale, end_flag,
                          gamma, lam)
        ret = ret / scale
        new_rms = ret_rms.update(ret.reshape(T * N, -1))
    else:
        adv, ret = gae_fn(m, values, values_next, end_flag, gamma, lam)
        new_rms = None

    # ENV-MAJOR flatten: (T, N, ...) -> (N*T, ...) with each env column's
    # rows contiguous. Under a dp mesh (env axis sharded) this keeps every
    # flat row on the device that produced it, so the whole update partitions
    # instead of XLA all-gathering the batch — time-major (T*N) interleaves
    # shards row-by-row and forces the update to run replicated (measured: 6
    # full-batch all-gathers on a 2-device mesh). Update math is
    # permutation-invariant, so single-device numerics are unchanged.
    flat = lambda x: jnp.swapaxes(x, 0, 1).reshape((N * T,) + x.shape[2:])
    batch = OnPolicyBatch(
        obs=flat(tr.obs), act=flat(tr.act), logp_old=flat(tr.logp),
        adv=flat(adv), ret=flat(ret), value_old=flat(values),
    )
    return (batch, new_rms) if ret_rms is not None else batch


def normalize_adv(adv: Array, eps: float = 1e-8) -> Array:
    """Per-batch, per-channel advantage normalization (reference
    ``ppo_lag.py:178-182`` — note it normalizes cost channels too)."""
    mean = jnp.mean(adv, axis=0, keepdims=True)
    std = jnp.std(adv, axis=0, keepdims=True)
    return (adv - mean) / (std + eps)


def make_optimizer(lr, max_grad_norm: float | None = None,
                   flat: bool = False):
    """Adam with optional global-norm clipping.

    ``lr`` may be a float or any optax schedule (``Callable[[step], lr]``) —
    the TPU-native replacement for the reference's per-update ``LambdaLR`` /
    ``MultipleLRSchedulers`` plumbing (``fsrl/policy/base_policy.py:353``,
    Tianshou ``MultipleLRSchedulers``): the schedule advances once per
    *gradient step* inside the jitted update, no host-side ``.step()`` calls.
    Use :func:`per_update_schedule` to express a schedule in units of trainer
    updates like the reference's.
    """
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adam(lr))
    tx = optax.chain(*chain)
    # flat=True: optax.flatten runs the transform on ONE concatenated vector
    # instead of ~8 leaves — fewer small HLOs per grad step, a win inside
    # PPO's 32-step update scan (0.34 -> 0.23 ms/step in isolation,
    # benchmarks/bench_update_breakdown.json). It LOSES for the off-policy
    # algorithms (one grad step per dispatch: the ravel/unravel overhead is
    # not amortized — sacl 91.6k -> 55.8k steps/s when it was made the
    # default), so it is opt-in. Note: changes the opt_state pytree (flat
    # mu/nu), so older checkpoints restore params but need optimizer
    # re-init.
    return optax.flatten(tx) if flat else tx


def per_update_schedule(schedule, grad_steps_per_update: int):
    """Adapt a schedule expressed in trainer-update units (the reference's
    ``lr_scheduler.step()`` cadence, one per ``policy.update``) to optax's
    per-gradient-step counting: ``lr(t) = schedule(t // grad_steps_per_update)``.

    For on-policy algos ``grad_steps_per_update = repeat * n_minibatches``."""
    def sched(count):
        return schedule(count // grad_steps_per_update)
    return sched


def select_tree(pred: Array, on_true, on_false):
    """Leafwise ``where`` with a scalar bool — used to mask out optimizer steps
    after KL early stop while keeping shapes static (SURVEY.md §7 hard parts)."""
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def soft_update(target, online, tau: float):
    """Polyak averaging for target networks (reference ``sync_weight``)."""
    return jax.tree.map(lambda t, o: (1.0 - tau) * t + tau * o, target, online)
