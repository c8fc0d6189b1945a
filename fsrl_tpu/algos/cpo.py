"""Constrained Policy Optimization (CPO), TPU-native.

Re-derivation of the reference ``CPO`` (``fsrl/policy/cpo.py``; Achiam et al.
2017). Single constraint (the reference likewise uses only ``advs[..., 1]``).

Per update (cpo.py:234-351):
* objective  g-dir:   J = mean(ratio * advR)
* cost surrogate:     C = ave_ep_cost + mean(ratio*advC) - mean(advC)
  where ``ave_ep_cost`` is the collector's mean episodic cost (pre_update_fn,
  cpo.py:112-113); c = C - cost_limit
* CG solves H^-1 g and H^-1 b (b = grad(-C)); scalars q = g^T H^-1 g,
  r = g^T H^-1 b, s = b^T H^-1 b
* 4 optimization cases incl. infeasible recovery (case 0) exactly per
  cpo.py:259-304, with the NaN-lambda guard (cpo.py:312-313)
* step = (1/lambda)(H^-1 g + nu H^-1 b) (or recovery nu*H^-1 b), L2-normalized,
  then backtracking line search with the 3-part acceptance rule
  (KL<=delta, objective non-worsening if case>1, cost-surrogate increase
  <= max(-c, 0)) (cpo.py:317-333)
* critics: Adam + L2 regularization for ``optim_critic_iters`` steps
  (cpo.py:147-162)

All host control flow becomes `jnp.where` case arithmetic and a vmapped
candidate sweep — one jitted XLA program.
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
from fsrl_tpu.types import Transition

Array = jax.Array
EPS = 1e-8


@struct.dataclass
class CPOState:
    params: Any
    critic_opt_state: Any
    last_ep_cost: Array
    update_count: Array
    gradient_steps: Array


class CPO:
    """Constrained Policy Optimization: trust-region step with the 4-case
    dual solution, recovery step, and 3-condition backtracking line search
    (see module docstring; reference ``fsrl/policy/cpo.py``)."""

    name = "cpo"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float = 10.0,
        hidden_sizes=(128, 128),
        lr: float = 1e-3,
        target_kl: float = 0.01,
        backtrack_coeff: float = 0.8,
        max_backtracks: int = 100,
        optim_critic_iters: int = 10,
        l2_reg: float = 1e-3,
        gae_lambda: float = 0.95,
        advantage_normalization: bool = True,
        gamma: float = 0.99,
        unbounded: bool = False,
        last_layer_scale: bool = True,
        max_action: float = 1.0,
        cg_iters: int = 10,
        damping: float = 0.1,
        deterministic_eval: bool = True,
        repeat: int = 1,  # TR steps per collect (reference repeat_per_collect;
        #   cpo_cfg.py TrainCfg/MujocoBaseCfg default 4 — the velocity/mujoco
        #   protocol NEEDS >1: 20k-step collects give only 50 collects/1M)
        sigma_floor: float | None = None,  # entropy floor (documented deviation)
        compute_dtype: Any = None,   # jnp.bfloat16 -> MXU mixed-precision trunks
        episode_len: int | None = None,  # env truncation horizon -> 1-pass GAE critic
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = 1
        self.K = 2
        self.cost_limit = float(cost_limit)
        self.hp = dict(
            episode_len=episode_len,
            target_kl=target_kl, backtrack_coeff=backtrack_coeff,
            max_backtracks=max_backtracks, optim_critic_iters=optim_critic_iters,
            l2_reg=l2_reg, gae_lambda=gae_lambda,
            norm_adv=advantage_normalization, gamma=gamma, cg_iters=cg_iters,
            damping=damping, repeat=max(1, int(repeat)),
        )
        self.deterministic_eval = deterministic_eval
        self.actor = GaussianActor(
            act_dim=act_dim, hidden_sizes=hidden_sizes, max_action=max_action,
            unbounded=unbounded, conditioned_sigma=False,
            last_layer_scale=last_layer_scale, sigma_floor=sigma_floor,
            compute_dtype=compute_dtype,
        )
        self.critics = VCriticEnsemble(num_critics=2, hidden_sizes=hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.critic_tx = make_optimizer(lr)

    def init(self, rng: Array) -> CPOState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        params = {"actor": self.actor.init(ka, obs),
                  "critics": self.critics.init(kc, obs)}
        return CPOState(
            params=params,
            critic_opt_state=self.critic_tx.init(params["critics"]),
            last_ep_cost=jnp.zeros((1,)),
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
    def update(
        self,
        state: CPOState,
        tr: Transition,
        ep_cost_mean: Array,
        n_episodes: Array,
        rng: Array,
        cost_limit: Array | None = None,
    ) -> tuple[CPOState, dict[str, Array]]:
        hp = self.hp
        ave_cost = jnp.where(n_episodes > 0, ep_cost_mean,
                             state.last_ep_cost)[0]

        batch = process_rollout(
            lambda p, o: self.critics.apply(p["critics"], o),
            state.params, tr, hp["gamma"], hp["gae_lambda"],
            episode_len=hp["episode_len"],
        )
        adv = normalize_adv(batch.adv) if hp["norm_adv"] else batch.adv
        obs, act, logp_old = batch.obs, batch.act, batch.logp_old
        advR, advC = adv[:, 0], adv[:, 1]

        limit = self.cost_limit if cost_limit is None \
            else jnp.squeeze(cost_limit)
        delta = hp["target_kl"]

        # ---- one TR step + critic iters; repeated `repeat` times per
        # collect (reference learn() cpo.py:353-363: `for _ in range(repeat)`
        # with repeat_per_collect from the config). Each iteration recomputes
        # the trust region around the CURRENT params; logp_old / advantages
        # stay fixed at collect time, exactly like the reference.
        def tr_body(carry, _):
            actor_params, critic_params, copt = carry
            (actor_params, metrics) = self._tr_step(
                actor_params, obs, act, logp_old, advR, advC, ave_cost,
                limit, delta)

            # ---- critics: Adam + L2 reg (cpo.py:147-162) ----
            def critic_step(c, _):
                cp, copt = c
                def closs(cp):
                    v = self.critics.apply(cp, obs)
                    mse = jnp.sum(jnp.mean((batch.ret - v) ** 2, axis=0))
                    l2 = sum(jnp.sum(p ** 2) for p in jax.tree.leaves(cp))
                    return mse + hp["l2_reg"] * l2
                loss, grads = jax.value_and_grad(closs)(cp)
                updates, copt = self.critic_tx.update(grads, copt, cp)
                return (optax.apply_updates(cp, updates), copt), loss

            (critic_params, copt), closses = jax.lax.scan(
                critic_step, (critic_params, copt),
                None, length=hp["optim_critic_iters"])
            metrics["loss/vf_total"] = closses[-1]
            return (actor_params, critic_params, copt), metrics

        (actor_params, critic_params, copt), minfos = jax.lax.scan(
            tr_body,
            (state.params["actor"], state.params["critics"],
             state.critic_opt_state),
            None, length=hp["repeat"])
        metrics = {k: jnp.mean(v) for k, v in minfos.items()}

        new_state = CPOState(
            params={"actor": actor_params, "critics": critic_params},
            critic_opt_state=copt,
            last_ep_cost=jnp.where(n_episodes > 0, ep_cost_mean,
                                   state.last_ep_cost),
            update_count=state.update_count + 1,
            gradient_steps=state.gradient_steps
            + hp["repeat"] * hp["optim_critic_iters"],
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def _tr_step(self, actor_params, obs, act, logp_old, advR, advC,
                 ave_cost, limit, delta):
        """One CPO trust-region actor step (dual solve + line search)."""
        hp = self.hp
        flat0, unravel = ravel_pytree(actor_params)
        old_dist = self.actor.apply(actor_params, obs)

        def objective_flat(flat):
            dist = self.actor.apply(unravel(flat), obs)
            ratio = jnp.exp(dist.log_prob(act) - logp_old)
            return jnp.mean(ratio * advR)

        def cost_surrogate_flat(flat):
            dist = self.actor.apply(unravel(flat), obs)
            ratio = jnp.exp(dist.log_prob(act) - logp_old)
            return ave_cost + jnp.mean(ratio * advC) - jnp.mean(advC)

        def kl_flat(flat):
            return jnp.mean(old_dist.kl(self.actor.apply(unravel(flat), obs)))

        objective0, grad_g = jax.value_and_grad(objective_flat)(flat0)
        cost_surr0, grad_cost = jax.value_and_grad(cost_surrogate_flat)(flat0)
        grad_b = -grad_cost

        grad_kl = jax.grad(kl_flat)

        def fvp(v):
            _, hv = jax.jvp(grad_kl, (flat0,), (v,))
            return hv + hp["damping"] * v

        H_inv_g = conjugate_gradient(fvp, grad_g, hp["cg_iters"])
        H_inv_b = conjugate_gradient(fvp, grad_b, hp["cg_iters"])
        q = jnp.dot(fvp(H_inv_g), H_inv_g)
        r = jnp.dot(fvp(H_inv_g), H_inv_b)
        s = jnp.dot(fvp(H_inv_b), H_inv_b)
        c_value = cost_surr0 - limit

        # ---- 4-case dual solve (cpo.py:259-304) as branchless arithmetic ----
        b_negligible = jnp.logical_and(jnp.dot(grad_b, grad_b) <= EPS,
                                       c_value < 0)
        A = q - r**2 / jnp.maximum(s, EPS)
        B = 2 * delta - c_value**2 / jnp.maximum(s, EPS)
        optim_case = jnp.where(
            b_negligible, 4,
            jnp.where(jnp.logical_and(c_value < 0, B < 0), 3,
                      jnp.where(jnp.logical_and(c_value < 0, B >= 0), 2,
                                jnp.where(B >= 0, 1, 0))))

        # cases 3/4: lam = sqrt(q / 2 delta), nu = 0
        lam_34 = jnp.sqrt(jnp.maximum(q, 0.0) / (2 * delta))
        # cases 1/2: piecewise projection (cpo.py:290-301)
        r_over_c = r / jnp.where(jnp.abs(c_value) < EPS,
                                 jnp.sign(c_value) * EPS + EPS, c_value)
        lam_a_raw = jnp.sqrt(jnp.maximum(A, 0.0) / jnp.maximum(B, EPS))
        lam_b_raw = jnp.sqrt(jnp.maximum(q, 0.0) / (2 * delta))
        # LA=[0, r/c], LB=[r/c, inf] when c<0; swapped when c>=0
        neg_c = c_value < 0
        lam_a = jnp.where(neg_c,
                          jnp.clip(lam_a_raw, 0.0, r_over_c),
                          jnp.maximum(lam_a_raw, r_over_c))
        lam_b = jnp.where(neg_c,
                          jnp.maximum(lam_b_raw, r_over_c),
                          jnp.clip(lam_b_raw, 0.0, r_over_c))
        f_a = -0.5 * (A / (lam_a + EPS) + B * lam_a) - r * c_value / (s + EPS)
        f_b = -0.5 * (q / (lam_b + EPS) + 2 * delta * lam_b)
        lam_12 = jnp.where(f_a >= f_b, lam_a, lam_b)
        nu_12 = jnp.maximum(0.0, lam_12 * c_value - r) / (s + EPS)
        # case 0 (recovery): nu = sqrt(2 delta / s), lam = 0
        nu_0 = jnp.sqrt(2 * delta / (s + EPS))

        in_34 = optim_case >= 3
        in_12 = jnp.logical_and(optim_case >= 1, optim_case <= 2)
        lam = jnp.where(in_34, lam_34, jnp.where(in_12, lam_12, 0.0))
        nu = jnp.where(in_34, 0.0, jnp.where(in_12, nu_12, nu_0))

        step_dir = jnp.where(
            optim_case > 0,
            (1.0 / (lam + EPS)) * (H_inv_g + nu * H_inv_b),
            nu * H_inv_b,
        )
        step_dir = step_dir / jnp.maximum(jnp.linalg.norm(step_dir), EPS)

        # ---- line search (cpo.py:317-333) as early-exit while_loop ----
        # The direction is UNIT-NORM (not KL-calibrated like TRPO's), so a
        # failed search must back off very deep before the residual step is
        # harmless; the reference's cpo_cfg.py:23 default is max_backtracks
        # = 100 (0.8^99 ~ 2e-10 ~ rollback).  A shallow depth (e.g. 10)
        # leaves a 0.8^9 ~ 0.13-norm step APPLIED on exhaustion — a
        # guaranteed-destructive update whenever the search fails.
        coeff = jnp.asarray(hp["backtrack_coeff"], dtype=flat0.dtype)
        max_bt = hp["max_backtracks"]

        def cand_ok(i):
            cand = flat0 + coeff ** i * step_dir
            kl_ok = kl_flat(cand) <= delta
            obj_ok = jnp.where(optim_case > 1,
                               objective_flat(cand) > objective0, True)
            cost_ok = (cost_surrogate_flat(cand) - cost_surr0
                       <= jnp.maximum(-c_value, 0.0))
            return jnp.logical_and(kl_ok, jnp.logical_and(obj_ok, cost_ok))

        def ls_cond(carry):
            i, ok = carry
            return jnp.logical_and(jnp.logical_not(ok), i < max_bt)

        def ls_body(carry):
            i, _ = carry
            return i + 1, cand_ok(i.astype(flat0.dtype))

        n_tried, any_ok = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(0, jnp.int32), jnp.asarray(False)))
        # on total failure the reference's loop leaves the smallest candidate
        # APPLIED (cpo.py:317-333 — no rollback on exhaustion); reproduce that
        accept_idx = jnp.where(any_ok, n_tried - 1, max_bt - 1)
        beta = coeff ** accept_idx.astype(flat0.dtype)
        # NaN guard (cpo.py:312-313): skip the update entirely on NaN lambda
        lam_nan = jnp.isnan(lam)
        beta = jnp.where(lam_nan, 0.0, beta)
        new_flat = flat0 + beta * step_dir

        metrics = {
            "loss/kl": kl_flat(new_flat),
            "loss/rew_loss": objective0,
            "loss/cost_loss": cost_surr0,
            "loss/optim_A": A, "loss/optim_B": B, "loss/optim_C": c_value,
            "loss/optim_Q": q, "loss/optim_R": r, "loss/optim_S": s,
            "loss/optim_lam": lam, "loss/optim_nu": nu,
            "loss/optim_case": optim_case.astype(jnp.float32),
            "loss/step_size": beta,
            "loss/backtracks": accept_idx.astype(jnp.float32),
            "loss/ls_ok": any_ok.astype(jnp.float32),
            "update/line_search_ok": any_ok.astype(jnp.float32),
        }
        return unravel(new_flat), metrics
