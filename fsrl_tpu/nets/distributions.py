"""Minimal jit-friendly action distributions.

The reference relies on ``torch.distributions.Independent(Normal(...))``
(``fsrl/agent/ppo_lag_agent.py:166-167``) and a tanh-squashed Gaussian for SAC
(``fsrl/policy/sac_lag.py:155-183``). Here they are pure pytrees with closed-form
log_prob / entropy / kl so everything stays inside jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


@struct.dataclass
class DiagGaussian:
    """Independent Normal over the last axis (event dim = act_dim)."""

    mean: Array     # (..., A)
    std: Array      # (..., A)

    def sample(self, rng: Array) -> Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape)

    def log_prob(self, x: Array) -> Array:
        z = (x - self.mean) / self.std
        per_dim = -0.5 * z * z - jnp.log(self.std) - _LOG_SQRT_2PI
        return jnp.sum(per_dim, axis=-1)

    def entropy(self) -> Array:
        return jnp.sum(jnp.log(self.std) + 0.5 + _LOG_SQRT_2PI, axis=-1)

    def mode(self) -> Array:
        return self.mean

    def kl(self, other: "DiagGaussian") -> Array:
        """KL(self || other), summed over event dim."""
        var, ovar = self.std**2, other.std**2
        per_dim = (
            jnp.log(other.std) - jnp.log(self.std)
            + (var + (self.mean - other.mean) ** 2) / (2.0 * ovar) - 0.5
        )
        return jnp.sum(per_dim, axis=-1)


def gaussian_kl_decoupled(mean_old, std_old, mean_new, std_new):
    """Decoupled mean/covariance KL for CVPO's M-step (reference
    ``fsrl/policy/cvpo.py`` ``gaussian_kl``): KL split into a mean term (old std)
    and a covariance term (old mean irrelevant)."""
    var_old, var_new = std_old**2, std_new**2
    kl_mean = jnp.sum(0.5 * (mean_new - mean_old) ** 2 / var_old, axis=-1)
    kl_std = jnp.sum(
        jnp.log(std_new) - jnp.log(std_old) + (var_old) / (2.0 * var_new) - 0.5,
        axis=-1,
    )
    return kl_mean, kl_std


@struct.dataclass
class TanhGaussian:
    """tanh-squashed Gaussian with closed-form log-prob correction.

    Matches the reference SAC forward: ``squashed = tanh(x)``,
    ``logp -= sum(log(1 - tanh(x)^2 + eps))`` computed stably as
    ``2*(log2 - x - softplus(-2x))`` (``sac_lag.py:155-183``).
    """

    mean: Array
    std: Array

    def sample_and_log_prob(self, rng: Array) -> tuple[Array, Array]:
        base = DiagGaussian(self.mean, self.std)
        x = base.sample(rng)
        logp = base.log_prob(x) - _tanh_correction(x)
        return jnp.tanh(x), logp

    def mode(self) -> Array:
        return jnp.tanh(self.mean)

    def log_prob_from_pre_tanh(self, x: Array) -> Array:
        return DiagGaussian(self.mean, self.std).log_prob(x) - _tanh_correction(x)


def _tanh_correction(x: Array) -> Array:
    # sum_i log(1 - tanh(x_i)^2) = sum_i 2*(log 2 - x_i - softplus(-2 x_i))
    return jnp.sum(2.0 * (math.log(2.0) - x - jax.nn.softplus(-2.0 * x)), axis=-1)
