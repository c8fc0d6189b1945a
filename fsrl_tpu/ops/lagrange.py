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

    @classmethod
    def init(cls, n_constraints: int = 1) -> "PIDLagrangianState":
        z = jnp.zeros((n_constraints,))
        return cls(error_old=z, error_integral=z, multiplier=z)


def pid_step(
    state: PIDLagrangianState,
    cost_values: Array,   # (M,) mean episodic cost per constraint
    cost_limits: Array,   # (M,)
    kp: float,
    ki: float,
    kd: float,
) -> PIDLagrangianState:
    relu = jax.nn.relu
    error_new = cost_values - cost_limits
    error_diff = relu(error_new - state.error_old)
    error_integral = relu(state.error_integral + error_new)
    multiplier = relu(kp * error_new + ki * error_integral + kd * error_diff)
    return PIDLagrangianState(
        error_old=error_new, error_integral=error_integral, multiplier=multiplier
    )


def rescaling_factor(multiplier: Array, rescaling: bool = True) -> Array:
    """Stooke et al. Alg.1 multiplier-rescaling ``1 / (sum(lambda) + 1)``
    (reference ``lagrangian_base.py:153-156``)."""
    if not rescaling:
        return jnp.ones(())
    return 1.0 / (jnp.sum(multiplier) + 1.0)
