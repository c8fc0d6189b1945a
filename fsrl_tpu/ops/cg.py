"""Trust-region machinery: flat-param utilities, Fisher-vector products,
conjugate gradient, and backtracking line search — all pure XLA.

The reference implements these with torch autograd + host Python loops
(``fsrl/policy/trpo_lag.py:253-289``, ``fsrl/policy/cpo.py:177-204,305-333``).
Here CG is a ``lax.fori_loop`` over flat vectors and the FVP is a
Hessian-vector product via ``jax.jvp(jax.grad(kl))`` (forward-over-reverse), so
TRPO/CPO updates stay entirely on device inside one jit.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

Array = jax.Array


def flatten(tree):
    """Pytree -> (flat vector, unravel fn)."""
    return ravel_pytree(tree)


def make_fvp(kl_fn: Callable, params, damping: float = 0.1):
    """Return ``fvp(v)`` computing (H_kl + damping*I) v for flat vector v.

    ``kl_fn(params) -> scalar`` is the mean KL(old||new) at ``params``. Uses
    forward-over-reverse HVP — one jvp of grad — the XLA analog of the
    reference's double-backward (``trpo_lag.py:253-259``).
    """
    flat0, unravel = ravel_pytree(params)

    def grad_kl_flat(flat):
        g = jax.grad(lambda p: kl_fn(p))(unravel(flat))
        return ravel_pytree(g)[0]

    def fvp(v: Array) -> Array:
        _, hv = jax.jvp(grad_kl_flat, (flat0,), (v,))
        return hv + damping * v

    return fvp


def conjugate_gradient(
    mvp: Callable[[Array], Array],
    b: Array,
    n_iters: int = 10,
    residual_tol: float = 1e-8,
) -> Array:
    """Solve A x = b with fixed-iteration CG (reference uses 10 iterations,
    ``trpo_lag.py:261-283``). Iterations where the residual is already below
    tolerance become masked no-ops to keep the loop bound static."""

    def body(_, carry):
        x, r, p, rdotr = carry
        z = mvp(p)
        alpha = rdotr / (jnp.dot(p, z) + 1e-12)
        x_new = x + alpha * p
        r_new = r - alpha * z
        new_rdotr = jnp.dot(r_new, r_new)
        beta = new_rdotr / (rdotr + 1e-12)
        p_new = r_new + beta * p
        live = rdotr > residual_tol
        pick = lambda a, b_: jnp.where(live, a, b_)
        return (pick(x_new, x), pick(r_new, r), pick(p_new, p),
                jnp.where(live, new_rdotr, rdotr))

    x0 = jnp.zeros_like(b)
    x, _, _, _ = jax.lax.fori_loop(
        0, n_iters, body, (x0, b, b, jnp.dot(b, b))
    )
    return x


def backtracking_line_search(
    eval_fn: Callable[[Array], Array],
    accept_fn: Callable[..., Array],
    flat_params: Array,
    full_step: Array,
    max_backtracks: int = 10,
    backtrack_coeff: float = 0.8,
):
    """Generic masked backtracking search inside jit.

    ``eval_fn(candidate_flat_params) -> metrics pytree`` and
    ``accept_fn(metrics, frac) -> bool``. Evaluates candidates for the static
    ``max_backtracks`` schedule and selects the FIRST accepted step (no-step if
    none accepted) — semantics of the reference's early-breaking host loop
    (``trpo_lag.py:199-231``) with static shapes.

    Returns (new_flat_params, accepted: bool, frac_used).
    """
    fracs = backtrack_coeff ** jnp.arange(max_backtracks, dtype=flat_params.dtype)

    def eval_one(frac):
        cand = flat_params + frac * full_step
        ok = accept_fn(eval_fn(cand), frac)
        return ok

    oks = jax.vmap(eval_one)(fracs)
    any_ok = jnp.any(oks)
    first = jnp.argmax(oks)  # first True (argmax of bool picks first max)
    frac = jnp.where(any_ok, fracs[first], 0.0)
    return flat_params + frac * full_step, any_ok, frac
