"""SAC-Lagrangian, TPU-native.

Re-derivation of the reference ``SACLagrangian`` (``fsrl/policy/sac_lag.py``):

* tanh-squashed state-conditioned Gaussian actor with closed-form log-prob
  correction (sac_lag.py:155-183); the squashed action is what gets stored and
  fed to critics
* per-metric DOUBLE-Q critics; target = min-Q(target net) - alpha * logp for
  every metric channel incl. costs (sac_lag.py:136-145)
* critic loss sums both Q heads' TD errors per metric (sac_lag.py:185-210)
* actor loss ``rescale * (alpha*logp - minQ0 + sum_i lambda_i minQc_i)``
  (sac_lag.py:212-235)
* auto-alpha entropy tuning with target entropy -act_dim
  (sac_lag.py:237-250, sac_lag_agent.py:175-179)
* only critics have target networks (sync_weight, sac_lag.py:132-134)
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
from fsrl_tpu.nets.mlp import GaussianActor, QCriticEnsemble
from fsrl_tpu.nets.distributions import TanhGaussian
from fsrl_tpu.ops.lagrange import (PIDLagrangianState, pid_controller_step,
                                   rescaling_factor)

Array = jax.Array


@struct.dataclass
class SACLagState:
    params: Any                # {"actor", "critics"}
    target_critic_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    log_alpha: Array
    alpha_opt_state: Any
    lag: PIDLagrangianState
    last_ep_cost: Array
    update_count: Array
    gradient_steps: Array


class SACLag:
    """Tanh-Gaussian SAC with per-metric double-Q critics, auto-alpha, and
    the filtered PID Lagrangian (see module docstring; reference
    ``fsrl/policy/sac_lag.py``)."""

    name = "sac_lag"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float | list = 10.0,
        num_costs: int = 1,
        hidden_sizes=(128, 128),
        actor_lr: float = 5e-4,
        critic_lr: float = 1e-3,
        alpha: float = 0.005,         # fixed alpha OR init when auto
        auto_alpha: bool = True,
        alpha_lr: float = 3e-4,
        tau: float = 0.05,
        n_step: int = 2,
        use_lagrangian: bool = True,
        pid_filter: bool = True,   # False = exact reference recurrence (ablation)
        reference_qc: bool = False,  # True = reference min-head/entropy-everywhere Qc (ablation)
        qc_ucb: float = 0.0,  # cost-Q disagreement bonus: penalize actor by
                              # max-head + qc_ucb*|q1-q2| (uncertainty-aware
                              # pessimism; Button1 attractor attempt, r5)
        lagrangian_pid=(0.05, 0.0005, 0.1),
        rescaling: bool = True,
        gamma: float = 0.99,
        max_action: float = 1.0,
        batch_size: int = 256,
        deterministic_eval: bool = False,   # reference default (sac_lag_agent.py:102)
        compute_dtype: Any = None,   # jnp.bfloat16 -> MXU mixed-precision trunks
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = num_costs
        self.K = 1 + num_costs
        cl = [cost_limit] * num_costs if jnp.isscalar(cost_limit) else list(cost_limit)
        self.cost_limit = jnp.asarray(cl, jnp.float32)
        self.hp = dict(
            tau=tau, n_step=n_step, use_lagrangian=use_lagrangian,
            pid=tuple(lagrangian_pid), pid_filter=pid_filter,
            reference_qc=reference_qc, qc_ucb=qc_ucb,
            rescaling=rescaling, gamma=gamma,
            batch_size=batch_size, auto_alpha=auto_alpha,
            target_entropy=-float(act_dim),
        )
        self.fixed_alpha = float(alpha)
        self.deterministic_eval = deterministic_eval
        # conditioned_sigma + unbounded — the SAC recipe (sac_lag_agent.py:126-135)
        self.actor = GaussianActor(
            act_dim=act_dim, hidden_sizes=hidden_sizes, max_action=max_action,
            unbounded=True, conditioned_sigma=True, compute_dtype=compute_dtype,
        )
        self.critics = QCriticEnsemble(num_metrics=self.K, num_q=2,
                                       hidden_sizes=hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.actor_tx = make_optimizer(actor_lr)
        self.critic_tx = make_optimizer(critic_lr)
        self.alpha_tx = optax.adam(alpha_lr)

    def init(self, rng: Array) -> SACLagState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.act_dim))
        params = {"actor": self.actor.init(ka, obs),
                  "critics": self.critics.init(kc, obs, act)}
        log_alpha = jnp.asarray(jnp.log(self.fixed_alpha)
                                if not self.hp["auto_alpha"] else 0.0)
        return SACLagState(
            params=params,
            target_critic_params=jax.tree.map(lambda x: x, params["critics"]),
            actor_opt_state=self.actor_tx.init(params["actor"]),
            critic_opt_state=self.critic_tx.init(params["critics"]),
            log_alpha=log_alpha,
            alpha_opt_state=self.alpha_tx.init(log_alpha),
            lag=PIDLagrangianState.init(self.num_costs),
            last_ep_cost=jnp.zeros((self.num_costs,)),
            update_count=jnp.zeros((), jnp.int32),
            gradient_steps=jnp.zeros((), jnp.int32),
        )

    def _dist(self, actor_params, obs: Array) -> TanhGaussian:
        d = self.actor.apply(actor_params, obs)
        return TanhGaussian(mean=d.mean, std=d.std)

    def act_fn(self, params, obs: Array, rng: Array):
        dist = self._dist(params["actor"], obs)
        act, logp = dist.sample_and_log_prob(rng)
        return act, logp

    def act_fn_eval(self, params, obs: Array, rng: Array):
        dist = self._dist(params["actor"], obs)
        if self.deterministic_eval:
            return dist.mode(), jnp.zeros(obs.shape[:-1])
        act, logp = dist.sample_and_log_prob(rng)
        return act, logp

    # ------------------------------------------------------------------
    def update_lagrangian(self, state: SACLagState, ep_cost_mean: Array,
                          n_episodes: Array,
                          cost_limit: Array | None = None) -> SACLagState:
        # EMA-filtered anti-windup PID (see ops/lagrange.py and
        # benchmarks/diag_sacl.py): the raw ~2-episode collect mean whipsawed
        # lambda 0<->25 per measurement spike and the relu'd integral
        # ratcheted to a policy-collapsing floor — the round-3 late-training
        # constraint divergence.
        if not self.hp["use_lagrangian"]:
            return state
        kp, ki, kd = self.hp["pid"]
        limit = self.cost_limit if cost_limit is None else cost_limit
        lag = pid_controller_step(state.lag, ep_cost_mean, n_episodes,
                                  limit, kp, ki, kd,
                                  filtered=self.hp["pid_filter"])
        return state.replace(lag=lag, last_ep_cost=lag.cost_ema)

    def update_step(self, state: SACLagState, buffer: ReplayBuffer,
                    buf_state: ReplayBufferState, rng: Array,
                    view=None,
                    ) -> tuple[SACLagState, dict[str, Array]]:
        hp = self.hp
        rng_t, rng_a = jax.random.split(rng)
        alpha = jnp.exp(state.log_alpha)

        def target_q_fn(term_batch):
            dist = self._dist(state.params["actor"], term_batch.obs_next)
            a, logp = dist.sample_and_log_prob(rng_t)
            q = self.critics.apply(state.target_critic_params,
                                   term_batch.obs_next, a)     # (B, K, 2)
            # reward: min over heads (anti-overestimation); costs: MAX over
            # heads — the actor seeks LOW cost, so the maximization-bias
            # argument flips and min-head cost bootstrap underestimates
            # exactly where the actor exploits it (see diag_cvpo.py)
            if hp["reference_qc"]:          # reference-parity ablation:
                minq = jnp.min(q, axis=-1)  # min-head for every metric
            else:
                head_mask = (jnp.arange(self.K) == 0)
                minq = jnp.where(head_mask[None, :], jnp.min(q, axis=-1),
                                 jnp.max(q, axis=-1))           # (B, K)
            # Entropy bonus only in the REWARD critic's target. The reference
            # subtracts alpha*logp from every critic (sac_lag.py:136-145),
            # which makes the cost critics estimate cost-to-go MINUS
            # alpha*entropy-to-go — at the large multipliers a
            # starts-infeasible task produces, lambda*Qc then optimizes
            # entropy instead of the constraint. Deliberate deviation: cost
            # critics estimate pure cost-to-go.
            if hp["reference_qc"]:   # alpha*logp in every head (sac_lag.py:136-145)
                return minq - alpha * logp[:, None]
            ent_mask = (jnp.arange(self.K) == 0).astype(minq.dtype)
            return minq - alpha * logp[:, None] * ent_mask

        batch, rets = sample_nstep_batch(
            buffer, buf_state, rng, hp["batch_size"], hp["n_step"], hp["gamma"],
            target_q_fn, view=view,
        )
        # Cost-to-go is nonnegative by definition; clamp the cost-channel
        # targets at 0 so bootstrap noise cannot drag the cost critics
        # negative. Unclamped, the actor's argmin of lambda*Qc exploits
        # negative-extrapolation regions and drives a self-reinforcing
        # spiral (diag_sacl.py observed Qc down to -122 mid-collapse).
        if not hp["reference_qc"]:
            rets = jnp.concatenate(
                [rets[:, :1], jnp.maximum(rets[:, 1:], 0.0)], axis=1)

        # ---- critics (both heads vs same target) ----
        def closs(cp):
            q = self.critics.apply(cp, batch.obs, batch.act)    # (B, K, 2)
            td = q - rets[..., None]
            return jnp.sum(jnp.mean(td ** 2, axis=0))

        cl, cgrads = jax.value_and_grad(closs)(state.params["critics"])
        cupd, copt = self.critic_tx.update(cgrads, state.critic_opt_state,
                                           state.params["critics"])
        critics_new = optax.apply_updates(state.params["critics"], cupd)

        # ---- actor ----
        lam_mult = state.lag.multiplier
        resc = rescaling_factor(lam_mult, hp["rescaling"]) if hp["use_lagrangian"] \
            else jnp.ones(())

        def aloss(ap):
            dist = self._dist(ap, batch.obs)
            a, logp = dist.sample_and_log_prob(rng_a)
            q_all = self.critics.apply(critics_new, batch.obs, a)  # (B, K, 2)
            if hp["reference_qc"]:
                q = jnp.min(q_all, axis=-1)                      # (B, K)
                qc_pen = q[:, 1:]
            else:
                head_mask = (jnp.arange(self.K) == 0)
                q = jnp.where(head_mask[None, :], jnp.min(q_all, axis=-1),
                              jnp.max(q_all, axis=-1))           # (B, K)
                # relu: a (transient) negative cost-Q is estimation artifact
                # — zero gradient there beats actively attracting the actor
                qc_pen = jax.nn.relu(q[:, 1:])
                if hp["qc_ucb"] > 0:
                    # head-disagreement pessimism: where the two cost heads
                    # disagree the critic is unreliable — push the actor
                    # away from uncertain-cost regions, not just known-bad
                    spread = jnp.abs(q_all[:, 1:, 0] - q_all[:, 1:, 1])
                    qc_pen = qc_pen + hp["qc_ucb"] * spread
            loss_rew = jnp.mean(alpha * logp - q[:, 0])
            loss_safety = jnp.sum(lam_mult * jnp.mean(qc_pen, axis=0)) \
                if hp["use_lagrangian"] else 0.0
            return resc * (loss_rew + loss_safety), (loss_rew, logp)

        (al, (loss_rew, logp)), agrads = jax.value_and_grad(
            aloss, has_aux=True)(state.params["actor"])
        aupd, aopt = self.actor_tx.update(agrads, state.actor_opt_state,
                                          state.params["actor"])
        actor_new = optax.apply_updates(state.params["actor"], aupd)

        # ---- auto alpha ----
        log_alpha, alpha_opt = state.log_alpha, state.alpha_opt_state
        alpha_loss = jnp.zeros(())
        if hp["auto_alpha"]:
            logp_d = jax.lax.stop_gradient(logp) + hp["target_entropy"]

            def al_loss(la):
                return -jnp.mean(la * logp_d)

            alpha_loss, agrad = jax.value_and_grad(al_loss)(log_alpha)
            aupd2, alpha_opt = self.alpha_tx.update(agrad, alpha_opt, log_alpha)
            log_alpha = optax.apply_updates(log_alpha, aupd2)
            # Bound alpha: when a high Lagrangian multiplier holds the policy
            # in a low-entropy regime, the unbounded alpha ascent otherwise
            # runs away and (via the -alpha*logp term in every critic target,
            # amplified ~1/(1-gamma) by bootstrapping) explodes all Q values.
            # The cap is far above any healthy alpha (reference runs settle at
            # alpha << 1) so it only clips the divergent regime.
            log_alpha = jnp.clip(log_alpha, -20.0, 2.0)

        target_critic = soft_update(state.target_critic_params, critics_new,
                                    hp["tau"])

        metrics = {"loss/q_total": cl, "loss/actor_total": al,
                   "loss/actor_rew": loss_rew, "loss/alpha_value": jnp.exp(log_alpha),
                   "loss/alpha_loss": alpha_loss, "loss/rescaling": resc}
        for i in range(self.num_costs):
            metrics[f"loss/lagrangian{'' if i == 0 else '_' + str(i)}"] = lam_mult[i]

        return state.replace(
            params={"actor": actor_new, "critics": critics_new},
            target_critic_params=target_critic,
            actor_opt_state=aopt, critic_opt_state=copt,
            log_alpha=log_alpha, alpha_opt_state=alpha_opt,
            update_count=state.update_count + 1,
            gradient_steps=state.gradient_steps + 1,
        ), metrics
