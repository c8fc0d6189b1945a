"""Monolithic Pallas grad-step kernel for the PPO-Lagrangian update.

Why: the profiler attribution (``benchmarks/bench_update_breakdown.json``)
shows each grad step of the 32-step update scan executes ~150 small XLA
kernels averaging ~2.6 us — the fused step is latency-bound on kernel count,
not on FLOPs (compute floor ~0.25 ms vs ~12.5 ms measured). This kernel
computes the ENTIRE minibatch gradient — actor forward, Gaussian log-prob,
clipped+Lagrangian surrogate, critic ensemble forward, value loss, and the
full hand-derived backward — in ONE ``pallas_call`` (a handful of MXU gemms
back-to-back in VMEM, no per-op kernel launches).

Scope (the reference PPO recipe, ``fsrl/policy/ppo_lag.py:173-212``):
feedforward GaussianActor with free log-sigma, ``tanh``-bounded mean with
``max_action=1``, V-critic ensemble, ``dual_clip=None``, ``value_clip=False``,
advantages pre-normalized by the caller. ``PPOLag.update`` falls back to the
XLA ``jax.grad`` path whenever the config leaves this envelope.

Numerics: matmuls run on the MXU in the caller's compute dtype (bf16 for the
benchmark config) with f32 accumulation (``preferred_element_type``), biases/
activations f32 — at least as precise as the flax mixed-precision path.
Gradient tie-breaking matches JAX's VJP conventions exactly (0.5/0.5 split
for ``minimum`` ties and ``clip`` boundaries — material because the first
grad step of every epoch has ``ratio == 1`` everywhere).

Validated against ``jax.grad`` of the XLA loss in interpret mode
(``tests/test_fused_ppo_grad.py``) and on real TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _mm(a, b, dt):
    """MXU matmul in compute dtype with f32 accumulation."""
    if dt is not None:
        a, b = a.astype(dt), b.astype(dt)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_at_b(a, b, dt):
    """a^T @ b without materializing the transpose."""
    if dt is not None:
        a, b = a.astype(dt), b.astype(dt)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _mm_a_bt(a, b, dt):
    """a @ b^T without materializing the transpose."""
    if dt is not None:
        a, b = a.astype(dt), b.astype(dt)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def _kernel(obs, act, logp_old, adv, ret, aW1, ab1, aW2, ab2, aWmu, abmu,
            lsig, cW1, cb1, cW2, cb2, cWv, cbv, lam, resc,
            d_aW1, d_ab1, d_aW2, d_ab2, d_aWmu, d_abmu, d_lsig,
            d_cW1, d_cb1, d_cW2, d_cb2, d_cWv, d_cbv, aux,
            *, K: int, B: int, eps_clip: float, vf_coef: float, dt):
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        for r in (d_aW1, d_ab1, d_aW2, d_ab2, d_aWmu, d_abmu, d_lsig,
                  d_cW1, d_cb1, d_cW2, d_cb2, d_cWv, d_cbv, aux):
            r[:] = jnp.zeros_like(r)

    x = obs[:]                                        # (C, D) f32
    A = act.shape[1]
    adt = jnp.float32   # activation storage dtype (bf16 storage measured slower: cast overhead)

    # ---------------- actor forward ----------------
    h1 = jnp.maximum(_mm(x, aW1[:], dt) + ab1[:], 0.0).astype(adt)  # (C, H)
    h2 = jnp.maximum(_mm(h1, aW2[:], dt) + ab2[:], 0.0).astype(adt)
    mu_raw = _mm(h2, aWmu[:], None) + abmu[:]                 # (C, A) f32
    mu = jnp.tanh(mu_raw)
    sig = jnp.exp(lsig[:])                                    # (1, A)
    z = (act[:] - mu) / sig                                   # (C, A)
    logp = (jnp.sum(-0.5 * z * z, axis=1, keepdims=True)
            - jnp.sum(lsig[:]) - A * _LOG_SQRT_2PI)           # (C, 1)
    lo = logp_old[:]                                          # (C, 1)
    ratio = jnp.exp(logp - lo)

    advr = adv[:, 0:1]                                        # (C, 1)
    rc = jnp.clip(ratio, 1.0 - eps_clip, 1.0 + eps_clip)
    s1 = ratio * advr
    s2 = rc * advr
    mins = jnp.minimum(s1, s2)

    # d min(s1, s2) / d ratio with JAX's exact tie conventions:
    # minimum splits 0.5/0.5 at s1==s2; clip contributes 0.5 at boundaries.
    w1 = jnp.where(s1 < s2, 1.0, jnp.where(s1 == s2, 0.5, 0.0))
    w2 = 1.0 - w1
    inside = jnp.where(
        (ratio > 1.0 - eps_clip) & (ratio < 1.0 + eps_clip), 1.0,
        jnp.where((ratio == 1.0 - eps_clip) | (ratio == 1.0 + eps_clip),
                  0.5, 0.0))
    dmin_dr = advr * (w1 + w2 * inside)

    cadv = adv[:, 1:]                                         # (C, M)
    lam_row = lam[:]                                          # (1, M)
    resc_s = resc[0, 0]
    # loss_actor = resc * ( -mean(mins) + sum_m lam_m * mean(ratio*cadv_m) )
    g_ratio = resc_s * (-dmin_dr
                        + jnp.sum(cadv * lam_row, axis=1, keepdims=True)) / B
    g_logp = g_ratio * ratio                                  # (C, 1)

    # ---------------- actor backward ----------------
    g_mu_raw = g_logp * (z / sig) * (1.0 - mu * mu)           # (C, A)
    d_lsig[:] += jnp.sum(g_logp * (z * z - 1.0), axis=0, keepdims=True)
    d_aWmu[:] += _mm_at_b(h2, g_mu_raw, None)
    d_abmu[:] += jnp.sum(g_mu_raw, axis=0, keepdims=True)
    g_h2 = _mm_a_bt(g_mu_raw, aWmu[:], None) * (h2 > 0.0)     # (C, H)
    d_aW2[:] += _mm_at_b(h1, g_h2, dt)
    d_ab2[:] += jnp.sum(g_h2, axis=0, keepdims=True)
    g_h1 = _mm_a_bt(g_h2, aW2[:], dt) * (h1 > 0.0)
    d_aW1[:] += _mm_at_b(x, g_h1, dt)
    d_ab1[:] += jnp.sum(g_h1, axis=0, keepdims=True)

    # ---------------- critic towers ----------------
    vf_local = jnp.zeros((1, 1), jnp.float32)
    for k in range(K):
        h1k = jnp.maximum(_mm(x, cW1[k], dt) + cb1[k], 0.0).astype(adt)
        h2k = jnp.maximum(_mm(h1k, cW2[k], dt) + cb2[k], 0.0).astype(adt)
        v = _mm(h2k, cWv[k], dt) + cbv[k]                     # (C, 1)
        diff = v - ret[:, k:k + 1]
        vf_local += jnp.sum(diff * diff, keepdims=True)[:1, :1]
        # loss += vf_coef * mean_B(diff^2) per tower
        g_v = (2.0 * vf_coef / B) * diff                      # (C, 1)
        d_cWv[k] += _mm_at_b(h2k, g_v, dt)
        d_cbv[k] += jnp.sum(g_v, axis=0, keepdims=True)
        g_h2k = _mm_a_bt(g_v, cWv[k], dt) * (h2k > 0.0)       # (C, H)
        d_cW2[k] += _mm_at_b(h1k, g_h2k, dt)
        d_cb2[k] += jnp.sum(g_h2k, axis=0, keepdims=True)
        g_h1k = _mm_a_bt(g_h2k, cW2[k], dt) * (h1k > 0.0)
        d_cW1[k] += _mm_at_b(x, g_h1k, dt)
        d_cb1[k] += jnp.sum(g_h1k, axis=0, keepdims=True)

    # ---------------- aux accumulators ----------------
    # [0]=sum(logp_old - logp)  [1]=sum(mins)  [2]=sum_k sum(diff^2)
    # [3..3+M)=sum(ratio * cadv_m)   (masked-column build: scalar .at
    # stores don't lower on TPU)
    M = K - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    row = (jnp.where(col == 0, jnp.sum(lo - logp), 0.0)
           + jnp.where(col == 1, jnp.sum(mins), 0.0)
           + jnp.where(col == 2, vf_local[0, 0], 0.0))
    if M > 0:
        csum = jnp.sum(ratio * cadv, axis=0)                  # (M,)
        for m in range(M):
            row += jnp.where(col == 3 + m, csum[m], 0.0)
    aux[:] += row


@functools.partial(
    jax.jit,
    static_argnames=("eps_clip", "vf_coef", "compute_dtype", "interpret",
                     "chunk_rows"))
def ppo_grad_minibatch(params, obs, act, logp_old, adv, ret, lam, resc, *,
                       eps_clip: float = 0.2, vf_coef: float = 0.25,
                       compute_dtype: Any = None, interpret: bool = False,
                       chunk_rows: int | None = None):
    """Gradient of the PPO-Lag minibatch loss in one fused TPU kernel.

    Args mirror the XLA ``loss_fn`` in ``algos/ppo_lag.py`` (``adv`` must be
    pre-normalized when ``advantage_normalization`` is on). Returns
    ``(grads, aux)`` with ``grads`` matching the ``{"actor", "critics"}``
    param tree and ``aux`` the same metric dict the XLA path produces.
    """
    ap = params["actor"]["params"]
    cp = params["critics"]["params"]["Vmap_VHead_0"]["MLP_0"]
    B, D = obs.shape
    A = act.shape[1]
    K = ret.shape[1]
    M = K - 1
    H = ap["MLP_0"]["Dense_0"]["kernel"].shape[1]

    C = B
    for cand in ((chunk_rows,) if chunk_rows else (1024, 512, 256, 128)):
        if B % cand == 0:
            C = cand
            break
    grid = B // C

    w_in = [
        ap["MLP_0"]["Dense_0"]["kernel"],                    # aW1 (D,H)
        ap["MLP_0"]["Dense_0"]["bias"][None],                # ab1 (1,H)
        ap["MLP_0"]["Dense_1"]["kernel"],                    # aW2
        ap["MLP_0"]["Dense_1"]["bias"][None],                # ab2
        ap["Dense_0"]["kernel"],                             # aWmu (H,A)
        ap["Dense_0"]["bias"][None],                         # abmu (1,A)
        ap["log_sigma"][None],                               # (1,A)
        cp["Dense_0"]["kernel"],                             # cW1 (K,D,H)
        cp["Dense_0"]["bias"][:, None],                      # cb1 (K,1,H)
        cp["Dense_1"]["kernel"],                             # cW2 (K,H,H)
        cp["Dense_1"]["bias"][:, None],                      # cb2
        cp["Dense_2"]["kernel"],                             # cWv (K,H,1)
        cp["Dense_2"]["bias"][:, None],                      # cbv (K,1,1)
    ]
    lam2 = jnp.reshape(lam, (1, max(M, 1))).astype(jnp.float32)
    resc2 = jnp.reshape(resc, (1, 1)).astype(jnp.float32)

    row_spec = lambda w: pl.BlockSpec(
        (C,) + w.shape[1:], lambda i: (i,) + (0,) * (w.ndim - 1),
        memory_space=pltpu.VMEM)
    const_spec = lambda w: pl.BlockSpec(
        w.shape, lambda i: (0,) * w.ndim, memory_space=pltpu.VMEM)

    in_specs = [row_spec(obs), row_spec(act), row_spec(logp_old[:, None]),
                row_spec(adv), row_spec(ret)]
    in_specs += [const_spec(w) for w in w_in]
    in_specs += [const_spec(lam2), const_spec(resc2)]

    out_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w_in]
    out_shapes.append(jax.ShapeDtypeStruct((1, 8), jnp.float32))   # aux
    out_specs = [const_spec(w) for w in w_in]
    out_specs.append(pl.BlockSpec((1, 8), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))

    kern = functools.partial(_kernel, K=K, B=B, eps_clip=eps_clip,
                             vf_coef=vf_coef, dt=compute_dtype)
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(obs, act, logp_old[:, None].astype(jnp.float32),
      adv.astype(jnp.float32), ret.astype(jnp.float32), *w_in, lam2, resc2)

    (d_aW1, d_ab1, d_aW2, d_ab2, d_aWmu, d_abmu, d_lsig,
     d_cW1, d_cb1, d_cW2, d_cb2, d_cWv, d_cbv, aux_v) = outs

    grads = {
        "actor": {"params": {
            "MLP_0": {
                "Dense_0": {"kernel": d_aW1, "bias": d_ab1[0]},
                "Dense_1": {"kernel": d_aW2, "bias": d_ab2[0]},
            },
            "Dense_0": {"kernel": d_aWmu, "bias": d_abmu[0]},
            "log_sigma": d_lsig[0],
        }},
        "critics": {"params": {"Vmap_VHead_0": {"MLP_0": {
            "Dense_0": {"kernel": d_cW1, "bias": d_cb1[:, 0]},
            "Dense_1": {"kernel": d_cW2, "bias": d_cb2[:, 0]},
            "Dense_2": {"kernel": d_cWv, "bias": d_cbv[:, 0]},
        }}}},
    }

    kl = aux_v[0, 0] / B
    loss_rew = -aux_v[0, 1] / B
    loss_vf = aux_v[0, 2] / B
    cost_terms = aux_v[0, 3:3 + M] / B if M > 0 else jnp.zeros((0,))
    lam_f = jnp.reshape(lam, (-1,))[:M]
    loss_actor = jnp.reshape(resc, ()) * (loss_rew
                                          + jnp.sum(lam_f * cost_terms))
    sig = jnp.exp(params["actor"]["params"]["log_sigma"])
    entropy = jnp.sum(jnp.log(sig) + 0.5 + _LOG_SQRT_2PI)
    aux = dict(
        loss_actor_rew=loss_rew, loss_actor_total=loss_actor,
        loss_vf_total=loss_vf, kl=kl,
        entropy=entropy,
    )
    loss = loss_actor + vf_coef * loss_vf
    return loss, aux, grads
