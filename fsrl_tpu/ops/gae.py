"""GAE over joint (reward, cost, ...) value channels as a single reverse scan.

TPU-native replacement for the reference's numba kernel ``gae_return``
(``fsrl/policy/base_policy.py:524-540``): identical recurrence

    delta_t = m_t + gamma * v_{t+1} * mask_t - v_t
    gae_t   = delta_t + (1 - end_t) * gamma * lam * gae_t+1

computed as ``jax.lax.scan(reverse=True)`` over time with all (1 + M) metric
channels stacked on the trailing axis — one fused VPU pass instead of M+1
sequential numba loops. Bootstrap masking (``value_mask = ~terminated``,
``base_policy.py:357-375``) is applied by the caller on ``values_next``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gae_advantages(
    metrics: Array,       # (T, N, K) per-step reward/cost channels
    values: Array,        # (T, N, K) V(s_t) per channel
    values_next: Array,   # (T, N, K) V(s_{t+1}) per channel, already value-masked
    end_flag: Array,      # (T, N) bool — terminated | truncated (stop GAE chain)
    gamma: float,
    lam: float,
) -> tuple[Array, Array]:
    """Returns (advantages, returns) of shape (T, N, K); returns = adv + values."""
    delta = metrics + gamma * values_next - values
    discount = (1.0 - end_flag.astype(delta.dtype))[..., None] * (gamma * lam)

    def body(gae, x):
        d, disc = x
        gae = d + disc * gae
        return gae, gae

    init = jnp.zeros(delta.shape[1:], delta.dtype)
    _, adv = jax.lax.scan(body, init, (delta, discount), reverse=True)
    return adv, adv + values


def gae_advantages_pscan(
    metrics: Array,
    values: Array,
    values_next: Array,
    end_flag: Array,
    gamma: float,
    lam: float,
) -> tuple[Array, Array]:
    """Parallel-scan GAE: identical recurrence to :func:`gae_advantages` but as
    a log-depth ``lax.associative_scan`` over the linear recurrence

        adv_t = delta_t + disc_t * adv_{t+1}   (first-order, a=disc, b=delta)

    On TPU the sequential scan issues T dependent (N*K)-wide VPU ops; the
    associative form runs ~log2(T) sweeps over the whole (T, N, K) block,
    keeping the VPU lanes full — the standard linear-recurrence trick from the
    scaling playbook. Bit-exactness: floating-point associativity differs
    slightly from the sequential order (~1e-6 relative).
    """
    delta = metrics + gamma * values_next - values
    disc = (1.0 - end_flag.astype(delta.dtype))[..., None] * (gamma * lam)

    def combine(right, left):
        # scanning reversed arrays: cumulative op composes toward earlier t
        a1, b1 = right
        a2, b2 = left
        return a1 * a2, b2 + a2 * b1

    a, b = jax.lax.associative_scan(combine, (disc, delta), axis=0,
                                    reverse=True)
    return b, b + values


def discounted_returns(
    metrics: Array,      # (T, N, K)
    end_flag: Array,     # (T, N)
    bootstrap: Array,    # (N, K) value estimate after the last step (masked)
    gamma: float,
) -> Array:
    """Plain discounted return-to-go (GAE with lam=1 shortcut), (T, N, K)."""
    cont = (1.0 - end_flag.astype(metrics.dtype))[..., None]

    def body(ret, x):
        m, c = x
        ret = m + gamma * c * ret
        return ret, ret

    _, rets = jax.lax.scan(body, bootstrap, (metrics, cont), reverse=True)
    return rets
