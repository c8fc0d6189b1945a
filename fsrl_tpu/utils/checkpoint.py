"""Checkpointing: one pytree, whole training state.

The reference checkpoints ``{"model": policy.state_dict()}`` with ``torch.save``
via a logger hook (``fsrl/utils/logger/base_logger.py:118-130``), with PID state
riding inside (``lagrangian_base.py:122-143``). Here the algorithm TrainState is
a single pytree (params, optimizer states, multiplier/dual states, counters) so
checkpoint/restore is one call — nothing can be forgotten.

Serialization goes through ``flax.serialization.to_state_dict`` so restore is
NAME-addressed (field/key names), not flatten-order-addressed — a plain
leaf-order graft silently mis-assigns leaves because restored dicts flatten in
sorted-key order while struct dataclasses flatten in field order.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree checkpoint to ``path`` (a directory)."""
    import orbax.checkpoint as ocp
    from flax.serialization import to_state_dict
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, to_state_dict(jax.device_get(state)), force=True)


def _merge_missing(restored: Any, reference: Any) -> Any:
    """Fill keys present in ``reference`` (the target's state dict) but absent
    from ``restored`` with the reference values — the forward-migration shim
    for checkpoints written before a TrainState grew new fields (e.g. round-3
    checkpoints predate ``PIDLagrangianState.cost_ema/ema_n`` and CVPO's
    ``lag``; the new fields restore to their init values, which is exactly the
    pre-filter controller state)."""
    if isinstance(reference, dict):
        if not isinstance(restored, dict):
            return restored
        out = {}
        for k, ref_v in reference.items():
            out[k] = _merge_missing(restored[k], ref_v) if k in restored \
                else ref_v
        # keep unknown extra keys so from_state_dict can still error loudly
        for k in restored:
            if k not in reference:
                out[k] = restored[k]
        return out
    return restored


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a checkpoint; with ``target`` (a matching TrainState pytree) the
    state dict is grafted back by name onto the target structure. Fields the
    checkpoint predates are zero-filled from the target (see
    ``_merge_missing``)."""
    import orbax.checkpoint as ocp
    from flax.serialization import from_state_dict, to_state_dict
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    if target is None:
        return restored
    restored = _merge_missing(restored, to_state_dict(jax.device_get(target)))
    return from_state_dict(target, restored)
