"""n-step Bellman targets for the device ring buffer.

Replacement for the reference numba kernel ``nstep_return``
(``fsrl/policy/base_policy.py:543-567``): given sampled flat indices into a
time-major ring buffer laid out as (capacity_per_env, N_envs), roll forward up to
``n_step`` transitions (stopping at episode ends), then

    G = sum_{k<K} gamma^k m_{t+k} + gamma^K * maskedQ(s_{t+K})

where K <= n_step shrinks at episode boundaries exactly like the reference's
``gammas`` bookkeeping. Everything is gather + fori-style scan — no host loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def nstep_forward_indices(
    idx: Array,         # (B,) flat sampled indices (t * N + env)
    next_flat: Array,   # (size,) flat index of the *next* stored transition of the
                        # same env, or itself if none (buffer-provided)
    n_step: int,
) -> Array:
    """Chase the per-env next pointer n_step-1 times → (n_step, B) index matrix,
    matching the reference's ``buffer.next`` chain (``base_policy.py:483-486``)."""
    def body(cur, _):
        nxt = next_flat[cur]
        return nxt, cur

    _, chain = jax.lax.scan(body, idx, None, length=n_step)
    return chain  # chain[0] = idx, chain[k] = k-th successor


def nstep_targets(
    metrics: Array,     # (size, K) reward/cost channels of the whole buffer
    end_flag: Array,    # (size,) bool done (terminated|truncated|unfinished-tail)
    target_q: Array,    # (B, K) masked target value at the terminal index
    indices: Array,     # (n_step, B) from nstep_forward_indices
    gamma: float,
) -> Array:
    """Backward accumulation identical to the reference recurrence
    (``base_policy.py:560-566``): walking n from last to first,

        returns[end@now] = 0 ;  gammas[end@now] = n+1
        returns = m[now] + gamma * returns

    final: target = gamma^gammas * Q_terminal + returns. Shape (B, K).
    """
    n_step, _ = indices.shape

    def body2(carry, x):
        n, now = x
        returns, gammas = carry
        ended = end_flag[now]
        gammas = jnp.where(ended, n + 1, gammas)
        returns = jnp.where(ended[..., None], 0.0, returns)
        returns = metrics[now] + gamma * returns
        return (returns, gammas), None

    B = indices.shape[1]
    K = metrics.shape[-1]
    init = (jnp.zeros((B, K), metrics.dtype), jnp.full((B,), n_step, jnp.int32))
    ns = jnp.arange(n_step - 1, -1, -1)
    (returns, gammas), _ = jax.lax.scan(body2, init, (ns, indices[ns]))
    return target_q * (gamma ** gammas.astype(metrics.dtype))[..., None] + returns
