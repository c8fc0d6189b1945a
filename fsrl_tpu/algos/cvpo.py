"""CVPO (Constrained Variational Policy Optimization), TPU-native.

Re-derivation of the reference ``CVPO`` (``fsrl/policy/cvpo.py``; Liu et al.
2022) — EM-style constrained RL:

* per-step qc threshold from the episodic limit:
  ``c * (1 - gamma^T) / (1 - gamma) / T`` (cvpo.py:128-133)
* **E-step**: sample K particles from the old actor, evaluate all (1+M)
  double-Q critics (min over heads), run ``estep_iter_num`` Adam steps on the
  logsumexp dual loss over (eta, lambda_i) (cvpo.py:278-287, 321-357), clamp
  duals to [eps, dual_max]; non-parametric target = softmax over particles of
  ``(Q0 - sum lambda_i Qc_i) / eta`` (cvpo.py:359-363)
* **M-step**: ``mstep_iter_num`` iterations of weighted-MLE with decoupled-KL
  regularization — dist1 = N(mu, std_old), dist2 = N(mu_old, std), KL dual
  variables (mu/std) updated by Adam on ``(eps_kl - kl)`` and clipped before
  the penalty (cvpo.py:369-420)
* M-step dual variables and their optimizer are re-initialized once per
  collect (``pre_update_fn``, cvpo.py:178-188) — modeled as a state-reset hook
* old actor hard-synced per collect (``post_update_fn``, cvpo.py:190-193);
  target critics Polyak-synced per gradient step (cvpo.py:202-204)
* n-step critic targets: CURRENT actor action at s', OLD critics min-Q, no
  entropy term (cvpo.py:206-214)

The K x B particle critic sweep — the reference's per-update hot spot
(SURVEY.md §7) — is a single batched ensemble evaluation here: (K*B, ...)
flattened through the stacked QCriticEnsemble, one MXU-friendly matmul chain.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fsrl_tpu.algos.common import make_optimizer, soft_update
from fsrl_tpu.algos.offpolicy_base import sample_nstep_batch
from fsrl_tpu.data.buffer import ReplayBuffer, ReplayBufferState
from fsrl_tpu.nets.distributions import DiagGaussian, gaussian_kl_decoupled
from fsrl_tpu.nets.mlp import GaussianActor, QCriticEnsemble
from fsrl_tpu.ops.lagrange import PIDLagrangianState, filtered_pid_step

Array = jax.Array
EPS = 1.1920929e-06  # float32 eps * 10, reference cvpo.py:163


@struct.dataclass
class CVPOState:
    params: Any                  # {"actor", "critics"}
    actor_old_params: Any
    target_critic_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    estep_dual: Array            # (1 + M,) — [eta, lambda_1..M]
    estep_opt_state: Any
    mstep_dual: Array            # (2,) — [dual_mu, dual_std]
    mstep_opt_state: Any
    lag: PIDLagrangianState      # realized-cost backstop dual (see E-step)
    last_ep_cost: Array
    update_count: Array
    gradient_steps: Array


class CVPO:
    """EM-style Constrained Variational Policy Optimization: E-step particle
    dual ascent + decoupled-KL M-step (see module docstring; reference
    ``fsrl/policy/cvpo.py``)."""

    name = "cvpo"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float | list = 10.0,
        num_costs: int = 1,
        max_episode_steps: int = 500,
        hidden_sizes=(128, 128),
        actor_lr: float = 5e-4,
        critic_lr: float = 1e-3,
        gamma: float = 0.98,          # reference CVPO default (cvpo_agent.py)
        n_step: int = 2,
        tau: float = 0.05,
        # E-step
        estep_iter_num: int = 1,
        estep_kl: float = 0.02,
        estep_dual_max: float = 20.0,
        estep_dual_lr: float = 0.02,
        sample_act_num: int = 16,
        # M-step
        mstep_iter_num: int = 1,
        mstep_kl_mu: float = 0.005,
        mstep_kl_std: float = 0.0005,
        mstep_dual_max: float = 0.5,
        mstep_dual_lr: float = 0.1,
        # Backstop gains: integral-dominated and SLOW by design — the
        # backstop exists for sustained critic-lag infeasibility, not for
        # transient spikes (kd=0: no derivative kick; small kp)
        lagrangian_pid=(0.01, 0.0005, 0.0),
        double_critic: bool = True,
        max_action: float = 1.0,
        batch_size: int = 256,
        deterministic_eval: bool = True,
        compute_dtype: Any = None,   # jnp.bfloat16 -> MXU mixed-precision trunks
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = num_costs
        self.K = 1 + num_costs
        cl = [cost_limit] * num_costs if jnp.isscalar(cost_limit) else list(cost_limit)
        # per-step qc threshold (cvpo.py:128-133)
        self._qc_coeff = (1 - gamma**max_episode_steps) / (1 - gamma) \
            / max_episode_steps
        self.cost_limit = jnp.asarray(cl, jnp.float32)  # episodic (PID backstop)
        self.qc_thres = jnp.asarray([c * self._qc_coeff for c in cl],
                                    jnp.float32)
        self.hp = dict(
            gamma=gamma, n_step=n_step, tau=tau,
            estep_iter_num=estep_iter_num, estep_kl=estep_kl,
            estep_dual_max=estep_dual_max, sample_act_num=sample_act_num,
            mstep_iter_num=mstep_iter_num, mstep_kl_mu=mstep_kl_mu,
            mstep_kl_std=mstep_kl_std, mstep_dual_max=mstep_dual_max,
            batch_size=batch_size, pid=tuple(lagrangian_pid),
        )
        self.deterministic_eval = deterministic_eval
        self.actor = GaussianActor(
            act_dim=act_dim, hidden_sizes=hidden_sizes, max_action=max_action,
            unbounded=False, conditioned_sigma=True, compute_dtype=compute_dtype,
        )
        self.critics = QCriticEnsemble(num_metrics=self.K,
                                       num_q=2 if double_critic else 1,
                                       hidden_sizes=hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.actor_tx = make_optimizer(actor_lr)
        self.critic_tx = make_optimizer(critic_lr)
        self.estep_tx = optax.adam(estep_dual_lr)
        self.mstep_tx = optax.adam(mstep_dual_lr)

    def init(self, rng: Array) -> CVPOState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.act_dim))
        params = {"actor": self.actor.init(ka, obs),
                  "critics": self.critics.init(kc, obs, act)}
        estep_dual = jnp.zeros((self.K,)).at[0].set(1.0)  # eta=1 (cvpo.py:142-143)
        mstep_dual = jnp.zeros((2,))
        return CVPOState(
            params=params,
            actor_old_params=jax.tree.map(lambda x: x, params["actor"]),
            target_critic_params=jax.tree.map(lambda x: x, params["critics"]),
            actor_opt_state=self.actor_tx.init(params["actor"]),
            critic_opt_state=self.critic_tx.init(params["critics"]),
            estep_dual=estep_dual,
            estep_opt_state=self.estep_tx.init(estep_dual),
            mstep_dual=mstep_dual,
            mstep_opt_state=self.mstep_tx.init(mstep_dual),
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
    def update_lagrangian(self, state: CVPOState, ep_cost_mean: Array,
                          n_episodes: Array,
                          cost_limit: Array | None = None) -> CVPOState:
        """Realized-cost backstop dual (deliberate extension of the
        reference, diagnosed in ``benchmarks/diag_cvpo.py``): the E-step
        dual reads the constraint exclusively through the cost CRITIC, and
        on fast-improving dense-reward tasks the critic lags realized cost
        ~3-5x — the dual then saturates/collapses in a limit cycle and the
        Button tasks never produce a feasible checkpoint. The filtered PID
        on REALIZED episodic cost (the same signal the Lagrangian family
        uses) provides a floor for the E-step lambda that cannot be fooled
        by critic lag; it is ~0 whenever the policy is actually feasible,
        leaving the E-step in control."""
        kp, ki, kd = self.hp["pid"]
        limit = self.cost_limit if cost_limit is None else cost_limit
        lag = filtered_pid_step(state.lag, ep_cost_mean, n_episodes, limit,
                                kp, ki, kd)
        return state.replace(lag=lag, last_ep_cost=lag.cost_ema)

    def pre_update(self, state: CVPOState) -> CVPOState:
        """Per-collect M-step dual + optimizer re-init (cvpo.py:178-188)."""
        mstep_dual = jnp.zeros((2,))
        return state.replace(mstep_dual=mstep_dual,
                             mstep_opt_state=self.mstep_tx.init(mstep_dual))

    def post_update(self, state: CVPOState) -> CVPOState:
        """Per-collect hard sync of the old actor (cvpo.py:190-193)."""
        return state.replace(
            actor_old_params=jax.tree.map(lambda x: x, state.params["actor"]))

    # ------------------------------------------------------------------
    def update_step(self, state: CVPOState, buffer: ReplayBuffer,
                    buf_state: ReplayBufferState, rng: Array,
                    cost_limit: Array | None = None, view=None,
                    ) -> tuple[CVPOState, dict[str, Array]]:
        hp = self.hp
        # runtime cost-limit override recomputes the per-step qc threshold
        # (reference update_cost_limit, cvpo.py:165-176)
        qc_thres = self.qc_thres if cost_limit is None \
            else cost_limit * self._qc_coeff
        rng_t, rng_p = jax.random.split(rng)

        # ---- critics: n-step targets, current actor + old critics ----
        def target_q_fn(term_batch):
            dist = self.actor.apply(state.params["actor"], term_batch.obs_next)
            a = dist.sample(rng_t)
            q = self.critics.apply(state.target_critic_params,
                                   term_batch.obs_next, a)
            # min over heads for the reward channel (anti-overestimation);
            # MEAN over heads for cost channels: min-head systematically
            # underestimates where the actor exploits it, while max-head
            # overshoots the small per-step qc threshold by the head spread
            # (both observed in diag_cvpo.py) — the unbiased mean plus the
            # realized-cost backstop (update_lagrangian) is the stable pair
            head_mask = (jnp.arange(self.K) == 0)
            return jnp.where(head_mask[None, :], jnp.min(q, axis=-1),
                             jnp.mean(q, axis=-1))  # (B, K)

        batch, rets = sample_nstep_batch(
            buffer, buf_state, rng, hp["batch_size"], hp["n_step"], hp["gamma"],
            target_q_fn, view=view,
        )
        # cost-to-go is nonnegative by definition (same clamp as sac_lag.py)
        rets = jnp.concatenate(
            [rets[:, :1], jnp.maximum(rets[:, 1:], 0.0)], axis=1)

        def closs(cp):
            q = self.critics.apply(cp, batch.obs, batch.act)    # (B, K, nq)
            td = q - rets[..., None]
            return jnp.sum(jnp.mean(td ** 2, axis=0))

        cl, cgrads = jax.value_and_grad(closs)(state.params["critics"])
        cupd, copt = self.critic_tx.update(cgrads, state.critic_opt_state,
                                           state.params["critics"])
        critics_new = optax.apply_updates(state.params["critics"], cupd)

        # ---- E-step ----
        Kp = hp["sample_act_num"]
        B = batch.obs.shape[0]
        old_dist = self.actor.apply(state.actor_old_params, batch.obs)
        keys = jax.random.split(rng_p, Kp)
        sample_act = jax.vmap(old_dist.sample)(keys)            # (Kp, B, A)
        exp_obs = jnp.broadcast_to(batch.obs, (Kp,) + batch.obs.shape)
        # one stacked ensemble eval over all Kp*B particle pairs (hot spot)
        q_all = self.critics.apply(
            critics_new,
            exp_obs.reshape(Kp * B, -1), sample_act.reshape(Kp * B, -1),
        )                                                        # (Kp*B, K, nq)
        # reward: min over heads; costs: mean over heads (see target_q_fn)
        q_min = jnp.min(q_all, axis=-1).reshape(Kp, B, self.K)
        q_mean = jnp.mean(q_all, axis=-1).reshape(Kp, B, self.K)
        q0 = jnp.transpose(q_min[..., 0], (1, 0))                # (B, Kp)
        qc = jnp.transpose(q_mean[..., 1:], (1, 0, 2))           # (B, Kp, M)

        def estep_loss_fn(dual):
            eta = dual[0]
            lam = dual[1:]
            combined = q0 - jnp.einsum("m,bkm->bk", lam, qc)
            loss = eta * hp["estep_kl"] + jnp.sum(lam * qc_thres)
            loss += eta * jnp.mean(
                jax.scipy.special.logsumexp(combined / eta, axis=1)
                - jnp.log(Kp))
            return loss

        def estep_iter(carry, _):
            dual, opt = carry
            el, g = jax.value_and_grad(estep_loss_fn)(dual)
            upd, opt = self.estep_tx.update(g, opt, dual)
            dual = optax.apply_updates(dual, upd)
            return (dual, opt), el

        (estep_dual, estep_opt), elosses = jax.lax.scan(
            estep_iter, (state.estep_dual, state.estep_opt_state), None,
            length=hp["estep_iter_num"])
        estep_dual = jnp.clip(estep_dual, EPS, hp["estep_dual_max"])

        eta = estep_dual[0]
        # realized-cost backstop: floor the critic-derived dual with the PID
        # multiplier (update_lagrangian docstring) — zero when feasible, so
        # the E-step stays in control except under critic lag. Unit caveat:
        # the PID multiplier is trained on EPISODIC cost error while the
        # E-step dual weights DISCOUNTED per-step Qc, so the floor is a
        # heuristic pressure term, not an exchange of equivalent duals; it is
        # therefore re-capped at estep_dual_max so sustained violation can
        # never push the effective dual past the configured E-step cap.
        lam = jnp.clip(jnp.maximum(estep_dual[1:], state.lag.multiplier),
                       EPS, hp["estep_dual_max"])
        combined = q0 - jnp.einsum("m,bkm->bk", lam, qc)          # (B, Kp)
        optimal_q = jax.nn.softmax(combined / eta, axis=1)        # (B, Kp)
        optimal_q = jax.lax.stop_gradient(optimal_q)

        # ---- M-step ----
        mu_old, std_old = old_dist.mean, old_dist.std             # (B, A)
        sample_act_bkA = jnp.transpose(sample_act, (1, 0, 2))     # (B, Kp, A)

        def mstep_iter(carry, _):
            ap, aopt, mdual, mopt = carry

            def mloss(ap, mdual_clipped):
                dist = self.actor.apply(ap, batch.obs)
                mu, std = dist.mean, dist.std
                d1 = DiagGaussian(mu[:, None, :], std_old[:, None, :])
                d2 = DiagGaussian(mu_old[:, None, :], std[:, None, :])
                like = d1.log_prob(sample_act_bkA) + d2.log_prob(sample_act_bkA)
                loss_mle = -jnp.mean(optimal_q * like)
                kl_mu, kl_std = gaussian_kl_decoupled(mu_old, std_old, mu, std)
                kl_mu, kl_std = jnp.mean(kl_mu), jnp.mean(kl_std)
                loss_kl = (mdual_clipped[0] * (kl_mu - hp["mstep_kl_mu"])
                           + mdual_clipped[1] * (kl_std - hp["mstep_kl_std"]))
                return loss_mle + loss_kl, (loss_mle, kl_mu, kl_std)

            # dual ascent on (eps - kl) first, like the reference ordering
            dist_now = self.actor.apply(ap, batch.obs)
            kl_mu_now, kl_std_now = gaussian_kl_decoupled(
                mu_old, std_old, dist_now.mean, dist_now.std)
            kl_now = jnp.array([jnp.mean(kl_mu_now), jnp.mean(kl_std_now)])
            targets = jnp.array([hp["mstep_kl_mu"], hp["mstep_kl_std"]])
            dual_grad = targets - kl_now   # d/d dual of dual*(eps - kl)
            mupd, mopt = self.mstep_tx.update(dual_grad, mopt, mdual)
            mdual = optax.apply_updates(mdual, mupd)
            mdual_clipped = jnp.clip(mdual, 0.0, hp["mstep_dual_max"])

            (al, aux), agrads = jax.value_and_grad(mloss, has_aux=True)(
                ap, mdual_clipped)
            aupd, aopt = self.actor_tx.update(agrads, aopt, ap)
            ap = optax.apply_updates(ap, aupd)
            return (ap, aopt, mdual, mopt), (al,) + aux

        (actor_new, aopt, mstep_dual, mopt), mouts = jax.lax.scan(
            mstep_iter,
            (state.params["actor"], state.actor_opt_state,
             state.mstep_dual, state.mstep_opt_state),
            None, length=hp["mstep_iter_num"])
        mloss_total, mloss_mle, kl_mu, kl_std = (jnp.mean(x) for x in mouts)

        target_critic = soft_update(state.target_critic_params, critics_new,
                                    hp["tau"])

        metrics = {
            "loss/q_total": cl, "loss/estep_loss": jnp.mean(elosses),
            "mstep/loss_total": mloss_total, "mstep/loss_mle": mloss_mle,
            "mstep/kl_mu": kl_mu, "mstep/kl_std": kl_std,
            "estep/eta": eta,
        }
        for i in range(self.num_costs):
            metrics[f"estep/lambda{i}"] = lam[i]
            metrics[f"estep/thres_q{i + 1}"] = qc_thres[i]

        return state.replace(
            params={"actor": actor_new, "critics": critics_new},
            target_critic_params=target_critic,
            actor_opt_state=aopt, critic_opt_state=copt,
            estep_dual=estep_dual, estep_opt_state=estep_opt,
            mstep_dual=mstep_dual, mstep_opt_state=mopt,
            update_count=state.update_count + 1,
            gradient_steps=state.gradient_steps + 1,
        ), metrics
