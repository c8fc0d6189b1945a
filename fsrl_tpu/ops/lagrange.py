"""PID-controlled Lagrangian multiplier as a pure pytree update.

TPU-native port of the reference ``LagrangianOptimizer``
(``fsrl/utils/optim_util.py:28-45``), vectorized over M constraints:

    e      = cost - limit
    d      = max(0, e - e_old)
    I      = max(0, I + e)
    lambda = max(0, Kp*e + Ki*I + Kd*d)

With Kp = Kd = 0 it reduces to SGD-ascent on the multiplier, exactly like the
reference note (``optim_util.py:15-18``). The state lives inside the algorithm
TrainState pytree so it checkpoints with everything else (the reference threads it
through ``get_extra_state``/``set_extra_state``, ``lagrangian_base.py:122-143``).

``filtered_pid_step`` is the off-policy controller hardening (deliberate
deviation from the reference, diagnosed in ``benchmarks/diag_sacl.py``): with
short fixed-length collects the raw episodic-cost measurement is a ~2-episode
mean, and single-episode spikes (e.g. cost 0 -> 300 on SafetyBallRun) whipsaw
the multiplier between 0 and ~25 every few collects — the proportional and
derivative terms respond to measurement noise, the relu'd integral ratchets
monotonically (a spike adds +(cost-limit) in one step but feasible steps drain
only ``limit`` each), and the resulting lambda floor first over-regulates the
policy to cost ~0 (instead of riding the limit) and finally collapses it.
The hardening:

1. EMA-filter the measurement with an ~``horizon``-episode effective window
   (episode-count-weighted, so sparse collects aren't over-smoothed);
2. accumulate the integral SYMMETRICALLY: the error is clipped to
   [-limit, +limit] before integration, so a one-collect spike cannot ratchet
   the integral any faster than a feasible collect drains it. Sustained true
   violations still grow I without bound (+limit per step), so the
   steady-state authority of the integral term is preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class PIDLagrangianState:
    error_old: Array       # (M,)
    error_integral: Array  # (M,)
    multiplier: Array      # (M,)
    # measurement filter (used by filtered_pid_step; zero-cost otherwise)
    cost_ema: Array        # (M,) EMA of mean episodic cost
    ema_n: Array           # ()   effective sample count, capped at horizon

    @classmethod
    def init(cls, n_constraints: int = 1) -> "PIDLagrangianState":
        z = jnp.zeros((n_constraints,))
        return cls(error_old=z, error_integral=z, multiplier=z,
                   cost_ema=z, ema_n=jnp.zeros(()))


def pid_step(
    state: PIDLagrangianState,
    cost_values: Array,   # (M,) mean episodic cost per constraint
    cost_limits: Array,   # (M,)
    kp: float,
    ki: float,
    kd: float,
) -> PIDLagrangianState:
    """The exact reference recurrence (``optim_util.py:28-41``)."""
    relu = jax.nn.relu
    error_new = cost_values - cost_limits
    error_diff = relu(error_new - state.error_old)
    error_integral = relu(state.error_integral + error_new)
    multiplier = relu(kp * error_new + ki * error_integral + kd * error_diff)
    return state.replace(
        error_old=error_new, error_integral=error_integral,
        multiplier=multiplier,
    )


def filtered_pid_step(
    state: PIDLagrangianState,
    cost_values: Array,   # (M,) mean episodic cost over this collect
    n_episodes: Array,    # ()  episodes finished in this collect
    cost_limits: Array,   # (M,)
    kp: float,
    ki: float,
    kd: float,
    *,
    horizon: float = 10.0,
) -> PIDLagrangianState:
    """EMA-filtered, anti-windup PID step for noisy episodic measurements.

    Holds all state unchanged when the collect finished no episodes (the
    reference's collects are episode-counted so every PID step sees fresh
    data, ``lagrangian_base.py:98-100``; re-feeding a stale cost each short
    fixed-length collect would wind the integral several times per
    measurement).
    """
    relu = jax.nn.relu
    n_ep = n_episodes.astype(jnp.float32)
    # running mean for the first `horizon` episodes, then an EMA with an
    # ~horizon-episode window; weight scales with the number of episodes
    # actually observed so a 1-episode collect moves the filter 1/h, not 1/2
    w = n_ep / jnp.maximum(state.ema_n + n_ep, 1e-8)
    cost_f = state.cost_ema + w * (cost_values - state.cost_ema)
    ema_n = jnp.minimum(state.ema_n + n_ep, horizon)

    error_new = cost_f - cost_limits
    error_diff = relu(error_new - state.error_old)
    # symmetric integral accumulation (anti-ratchet): |e| capped at the
    # limit, floored at 1.0 so strict-safety configs (cost_limit=0, a legal
    # setting the reference recurrence handles) retain integral authority
    # instead of freezing I via clip to [0, 0]
    cap = jnp.maximum(cost_limits, 1.0)
    e_int = jnp.clip(error_new, -cap, cap)
    error_integral = relu(state.error_integral + e_int)
    multiplier = relu(kp * error_new + ki * error_integral + kd * error_diff)

    stepped = PIDLagrangianState(
        error_old=error_new, error_integral=error_integral,
        multiplier=multiplier, cost_ema=cost_f, ema_n=ema_n,
    )
    return jax.tree.map(
        lambda new, old: jnp.where(n_episodes > 0, new, old), stepped, state)


def pid_controller_step(
    state: PIDLagrangianState,
    cost_values: Array,
    n_episodes: Array,
    cost_limits: Array,
    kp: float,
    ki: float,
    kd: float,
    *,
    filtered: bool = True,
    horizon: float = 10.0,
) -> PIDLagrangianState:
    """Controller dispatch: the hardened ``filtered_pid_step`` (default) or
    the exact reference recurrence (``pid_step``) for reference-parity
    ablations (selected by each algorithm's ``pid_filter`` flag). Both paths
    hold state on episode-free collects; the exact path tracks the raw
    measurement in ``cost_ema`` so downstream ``last_ep_cost`` logging stays
    meaningful."""
    if filtered:
        return filtered_pid_step(state, cost_values, n_episodes, cost_limits,
                                 kp, ki, kd, horizon=horizon)
    stepped = pid_step(state, cost_values, cost_limits, kp, ki, kd)
    stepped = stepped.replace(cost_ema=cost_values)
    return jax.tree.map(
        lambda new, old: jnp.where(n_episodes > 0, new, old), stepped, state)


def rescaling_factor(multiplier: Array, rescaling: bool = True) -> Array:
    """Stooke et al. Alg.1 multiplier-rescaling ``1 / (sum(lambda) + 1)``
    (reference ``lagrangian_base.py:153-156``)."""
    if not rescaling:
        return jnp.ones(())
    return 1.0 / (jnp.sum(multiplier) + 1.0)
