"""Welford running mean/std as pytree state (Tianshou ``RunningMeanStd`` /
FSRL ``RunningAverage`` equivalents, reference ``fsrl/utils/logger/logger_util.py``),
with a mesh-aware merge for global normalization statistics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class RunningMeanStd:
    mean: Array
    var: Array
    count: Array

    @classmethod
    def init(cls, shape=()) -> "RunningMeanStd":
        return cls(mean=jnp.zeros(shape), var=jnp.ones(shape),
                   count=jnp.asarray(1e-4))

    def update(self, batch: Array) -> "RunningMeanStd":
        """Chan-parallel update with a batch whose leading axis is samples."""
        b_mean = jnp.mean(batch, axis=0)
        b_var = jnp.var(batch, axis=0)
        b_count = jnp.asarray(batch.shape[0], self.count.dtype)
        return self._merge(b_mean, b_var, b_count)

    def _merge(self, b_mean, b_var, b_count) -> "RunningMeanStd":
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * self.count * b_count / tot
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: Array, eps: float = 1e-8) -> Array:
        return (x - self.mean) / jnp.sqrt(self.var + eps)

    def scale(self, x: Array, eps: float = 1e-8) -> Array:
        return x / jnp.sqrt(self.var + eps)

    def unscale(self, x: Array, eps: float = 1e-8) -> Array:
        return x * jnp.sqrt(self.var + eps)
