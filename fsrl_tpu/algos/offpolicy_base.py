"""Shared off-policy machinery: n-step target assembly from the device ring
buffer (reference ``BasePolicy.compute_nstep_returns``, base_policy.py:453-512,
with target networks and value masking)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from fsrl_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from fsrl_tpu.ops.nstep import nstep_forward_indices, nstep_targets
from fsrl_tpu.types import Transition

Array = jax.Array


@struct.dataclass
class NStepView:
    """Buffer-wide arrays the n-step sampler needs, precomputed ONCE per
    update phase. The buffer is frozen while gradient steps run (the reference
    also samples from a fixed buffer between collects, offpolicy.py:93-106),
    but building these inside every scanned ``update_step`` materializes
    ~(C*N) rows per gradient step — measured ~3x the whole step's cost at
    200k capacity. Build with :func:`make_nstep_view` outside the update scan
    and pass via ``update_step(..., view=view)``."""

    next_flat: Array   # (C*N,)
    end_flag: Array    # (C*N,)
    metrics: Array     # (C*N, K)


def make_nstep_view(buffer: ReplayBuffer, buf_state: ReplayBufferState
                    ) -> NStepView:
    """Flatten the replay ring's chain/termination/metric arrays once per
    collect so every gradient step's n-step gather reuses them."""
    return NStepView(
        next_flat=buffer.next_flat(buf_state),
        end_flag=buffer.end_flag_flat(buf_state),
        metrics=buffer.metrics_flat(buf_state),
    )


def sample_nstep_batch(
    buffer: ReplayBuffer,
    buf_state: ReplayBufferState,
    rng: Array,
    batch_size: int,
    n_step: int,
    gamma: float,
    target_q_fn: Callable[[Transition], Array],  # batch at terminal -> (B, K)
    view: Optional[NStepView] = None,
) -> tuple[Transition, Array]:
    """Sample a batch and build per-channel n-step targets.

    Returns (batch at the sampled indices, rets (B, K)). ``target_q_fn``
    receives the transition batch at the chain-terminal indices and must return
    the (B, K) target value of ``obs_next`` there (e.g. target-critic Q of the
    target-actor action). Value masking (zero where terminated) is applied here
    (reference ``value_mask``, base_policy.py:489-502).

    Pass a precomputed ``view`` (see :class:`NStepView`) when calling from a
    scanned update loop; without it the buffer-wide arrays are rebuilt per call.
    """
    if view is None:
        view = make_nstep_view(buffer, buf_state)
    idx = buffer.sample_indices(buf_state, rng, batch_size)
    chain = nstep_forward_indices(idx, view.next_flat, n_step)
    terminal = chain[-1]
    term_batch = buffer.gather(buf_state, terminal)
    target_q = target_q_fn(term_batch)                       # (B, K)
    mask = jnp.logical_not(term_batch.terminated).astype(target_q.dtype)
    target_q = target_q * mask[:, None]
    rets = nstep_targets(view.metrics, view.end_flag, target_q, chain, gamma)
    batch = buffer.gather(buf_state, idx)
    return batch, rets
