"""TRPO-Lagrangian, TPU-native.

Re-derivation of the reference ``TRPOLagrangian`` (``fsrl/policy/trpo_lag.py``):
natural-gradient step on the combined (reward + lambda*cost, rescaled) surrogate.

Per update (reference ``learn``, trpo_lag.py:173-251):
1. actor loss = rescale * ( -mean(ratio*advR) + sum_i lambda_i*mean(ratio*advC_i) )
2. search direction = -CG_10( H_kl^{-1} grad ) with damping 0.1
   (``_conjugate_gradients``/``_MVP``, trpo_lag.py:253-283) — here the FVP is a
   forward-over-reverse HVP of the closed-form diag-Gaussian KL, all in XLA.
3. step size = sqrt(2*delta / s^T H s) then backtracking line search accepting
   ``kl < delta  and  loss_new < loss_old`` (trpo_lag.py:199-231); on total
   failure the reference APPLIES the smallest candidate step — reproduced.
4. critics: ``optim_critic_iters`` Adam steps on the MSE loss (trpo_lag.py:234-239).

The host-Python line search becomes a vmapped candidate sweep with first-accept
selection (static shapes, SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from fsrl_tpu.algos.common import (make_optimizer, normalize_adv,
                                   process_rollout)
from fsrl_tpu.nets.mlp import GaussianActor, VCriticEnsemble
from fsrl_tpu.ops.cg import conjugate_gradient
from fsrl_tpu.ops.lagrange import (PIDLagrangianState, pid_controller_step,
                                   rescaling_factor)
from fsrl_tpu.types import Transition

Array = jax.Array


@struct.dataclass
class TRPOLagState:
    params: Any              # {"actor": ..., "critics": ...}
    critic_opt_state: Any
    lag: PIDLagrangianState
    last_ep_cost: Array
    update_count: Array
    gradient_steps: Array


class TRPOLag:
    """Natural-gradient TRPO on the Lagrangian surrogate: CG + Fisher-vector
    products + KL-bounded backtracking line search, fully inside jit (see
    module docstring; reference ``fsrl/policy/trpo_lag.py``)."""

    name = "trpo_lag"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float | list = 10.0,
        num_costs: int = 1,
        hidden_sizes=(128, 128),
        lr: float = 1e-3,                 # critic lr (actor uses natural grad)
        target_kl: float = 0.001,         # reference default (trpo_lag_agent.py:90)
        backtrack_coeff: float = 0.8,
        max_backtracks: int = 10,
        optim_critic_iters: int = 20,
        gae_lambda: float = 0.95,
        advantage_normalization: bool = True,
        use_lagrangian: bool = True,
        pid_filter: bool = True,   # False = exact reference recurrence (ablation)
        lagrangian_pid=(0.05, 0.0005, 0.1),
        rescaling: bool = True,
        gamma: float = 0.99,
        unbounded: bool = False,
        last_layer_scale: bool = True,
        max_action: float = 1.0,
        cg_iters: int = 10,
        damping: float = 0.1,
        repeat: int = 1,
        deterministic_eval: bool = True,
        sigma_floor: float | None = None,  # entropy floor (documented deviation)
        compute_dtype: Any = None,   # jnp.bfloat16 -> MXU mixed-precision trunks
        episode_len: int | None = None,  # env truncation horizon -> 1-pass GAE critic
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = num_costs
        self.K = 1 + num_costs
        cl = [cost_limit] * num_costs if jnp.isscalar(cost_limit) else list(cost_limit)
        self.cost_limit = jnp.asarray(cl, jnp.float32)
        self.hp = dict(
            episode_len=episode_len,
            target_kl=target_kl, backtrack_coeff=backtrack_coeff,
            max_backtracks=max_backtracks, optim_critic_iters=optim_critic_iters,
            gae_lambda=gae_lambda, norm_adv=advantage_normalization,
            use_lagrangian=use_lagrangian, pid=tuple(lagrangian_pid),
            pid_filter=pid_filter,
            rescaling=rescaling, gamma=gamma, cg_iters=cg_iters, damping=damping,
            repeat=repeat,
        )
        self.deterministic_eval = deterministic_eval
        self.actor = GaussianActor(
            act_dim=act_dim, hidden_sizes=hidden_sizes, max_action=max_action,
            unbounded=unbounded, conditioned_sigma=False,
            last_layer_scale=last_layer_scale, sigma_floor=sigma_floor,
            compute_dtype=compute_dtype,
        )
        self.critics = VCriticEnsemble(num_critics=self.K, hidden_sizes=hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.critic_tx = make_optimizer(lr)

    def init(self, rng: Array) -> TRPOLagState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        params = {"actor": self.actor.init(ka, obs),
                  "critics": self.critics.init(kc, obs)}
        return TRPOLagState(
            params=params,
            critic_opt_state=self.critic_tx.init(params["critics"]),
            lag=PIDLagrangianState.init(self.num_costs),
            last_ep_cost=jnp.zeros((self.num_costs,)),
            update_count=jnp.zeros((), jnp.int32),
            gradient_steps=jnp.zeros((), jnp.int32),
        )

    def act_fn(self, params, obs: Array, rng: Array):
        dist = self.actor.apply(params["actor"], obs)
        act = dist.sample(rng)
        return act, dist.log_prob(act)

    def act_fn_eval(self, params, obs: Array, rng: Array):
        dist = self.actor.apply(params["actor"], obs)
        act = dist.mode() if self.deterministic_eval else dist.sample(rng)
        return act, dist.log_prob(act)

    # ------------------------------------------------------------------
    def _actor_loss(self, actor_params, obs, act, logp_old, adv, lam_mult, resc):
        dist = self.actor.apply(actor_params, obs)
        ratio = jnp.exp(dist.log_prob(act) - logp_old)
        loss_rew = -jnp.mean(ratio * adv[:, 0])
        if self.hp["use_lagrangian"]:
            loss_safety = jnp.sum(
                lam_mult * jnp.mean(ratio[:, None] * adv[:, 1:], axis=0))
        else:
            loss_safety = 0.0
        return resc * (loss_rew + loss_safety)

    def natural_gradient_step(self, actor_params, obs, act, logp_old, adv,
                              lam_mult, resc):
        """One trust-region actor step on a (mini)batch; returns new actor
        params + diagnostics. Shared by TRPO-Lag (and reused conceptually by
        CPO which has its own dual)."""
        hp = self.hp
        flat0, unravel = ravel_pytree(actor_params)
        old_dist = self.actor.apply(actor_params, obs)

        def loss_flat(flat):
            return self._actor_loss(unravel(flat), obs, act, logp_old, adv,
                                    lam_mult, resc)

        def kl_flat(flat):
            # mean KL(old || new), reference kl_divergence(old_dist, dist)
            return jnp.mean(old_dist.kl(self.actor.apply(unravel(flat), obs)))

        loss0, g = jax.value_and_grad(loss_flat)(flat0)

        grad_kl = jax.grad(kl_flat)

        def fvp(v):
            _, hv = jax.jvp(grad_kl, (flat0,), (v,))
            return hv + hp["damping"] * v

        direction = -conjugate_gradient(fvp, g, hp["cg_iters"])
        shs = jnp.dot(direction, fvp(direction))
        step_size = jnp.sqrt(2 * hp["target_kl"] / jnp.maximum(shs, 1e-12))

        fracs = hp["backtrack_coeff"] ** jnp.arange(hp["max_backtracks"],
                                                    dtype=flat0.dtype)

        def eval_cand(frac):
            cand = flat0 + frac * step_size * direction
            kl = kl_flat(cand)
            loss = loss_flat(cand)
            ok = jnp.logical_and(kl < hp["target_kl"], loss < loss0)
            return ok, kl, loss

        oks, kls, losses = jax.vmap(eval_cand)(fracs)
        any_ok = jnp.any(oks)
        first = jnp.argmax(oks)
        # reference behavior: if every candidate fails, apply the smallest step
        idx = jnp.where(any_ok, first, hp["max_backtracks"] - 1)
        frac = fracs[idx]
        new_flat = flat0 + frac * step_size * direction
        info = dict(kl=kls[idx], step_size=frac * step_size,
                    line_search_ok=any_ok.astype(jnp.float32),
                    loss_actor_total=losses[idx], loss_actor_old=loss0)
        return unravel(new_flat), info

    # ------------------------------------------------------------------
    def update(
        self,
        state: TRPOLagState,
        tr: Transition,
        ep_cost_mean: Array,
        n_episodes: Array,
        rng: Array,
        cost_limit: Array | None = None,
    ) -> tuple[TRPOLagState, dict[str, Array]]:
        hp = self.hp
        # PID stepped only on fresh episodic data (see ppo_lag.py: stale
        # re-feeds would wind the integral several times per measurement)
        limit = self.cost_limit if cost_limit is None else cost_limit
        if hp["use_lagrangian"]:
            kp, ki, kd = hp["pid"]
            # EMA-filtered anti-windup controller (ops/lagrange.py): on-policy
            # collects average ~20 episodes so the filter lag is ~2 collects,
            # and the symmetric integral removes the late-training lambda
            # ratchet observed on the dense-cost nav "2" tasks
            lag = pid_controller_step(
                state.lag, ep_cost_mean, n_episodes, limit, kp, ki, kd,
                filtered=hp["pid_filter"], horizon=40.0)
        else:
            lag = state.lag
        # raw-measurement fallback when the Lagrangian (and so the filter)
        # is disabled; holds the previous value on episode-free collects
        cost_in = lag.cost_ema if hp["use_lagrangian"] else jnp.where(
            n_episodes > 0, ep_cost_mean, state.last_ep_cost)
        lam_mult = lag.multiplier
        resc = rescaling_factor(lam_mult, hp["rescaling"]) if hp["use_lagrangian"] \
            else jnp.ones(())

        batch = process_rollout(
            lambda p, o: self.critics.apply(p["critics"], o),
            state.params, tr, hp["gamma"], hp["gae_lambda"],
            episode_len=hp["episode_len"],
        )
        adv = normalize_adv(batch.adv) if hp["norm_adv"] else batch.adv

        # whole-batch natural gradient (reference default batch_size=99999)
        def repeat_body(carry, _):
            actor_params, critic_params, copt, gsteps = carry
            actor_params, info = self.natural_gradient_step(
                actor_params, batch.obs, batch.act, batch.logp_old, adv,
                lam_mult, resc,
            )

            def critic_step(c, _):
                cp, copt = c
                def closs(cp):
                    v = self.critics.apply(cp, batch.obs)
                    return jnp.sum(jnp.mean((batch.ret - v) ** 2, axis=0))
                loss, grads = jax.value_and_grad(closs)(cp)
                updates, copt = self.critic_tx.update(grads, copt, cp)
                cp = optax.apply_updates(cp, updates)
                return (cp, copt), loss

            (critic_params, copt), closses = jax.lax.scan(
                critic_step, (critic_params, copt), None,
                length=hp["optim_critic_iters"])
            info["loss_vf_total"] = closses[-1]
            gsteps = gsteps + hp["optim_critic_iters"]
            return (actor_params, critic_params, copt, gsteps), info

        (actor_params, critic_params, copt, gsteps), infos = jax.lax.scan(
            repeat_body,
            (state.params["actor"], state.params["critics"],
             state.critic_opt_state, state.gradient_steps),
            None, length=hp["repeat"],
        )

        metrics = {f"loss/{k}": jnp.mean(v) for k, v in infos.items()}
        metrics["loss/rescaling"] = resc
        for i in range(self.num_costs):
            metrics[f"loss/lagrangian{'' if i == 0 else '_' + str(i)}"] = lam_mult[i]

        new_state = TRPOLagState(
            params={"actor": actor_params, "critics": critic_params},
            critic_opt_state=copt, lag=lag, last_ep_cost=cost_in,
            update_count=state.update_count + 1, gradient_steps=gsteps,
        )
        return new_state, metrics
