"""DDPG-Lagrangian, TPU-native.

Re-derivation of the reference ``DDPGLagrangian`` (``fsrl/policy/ddpg_lag.py``):
deterministic actor with Gaussian exploration noise (ddpg_lag.py:225-231),
per-metric single-Q critics with target networks + Polyak tau sync
(ddpg_lag.py:98-123), n-step targets through the target actor/critics
(ddpg_lag.py:125-139), actor loss ``rescale * (-Q0 + sum_i lambda_i Qc_i)``
(ddpg_lag.py:189-213). The "off-on" PID multiplier update consumes the fresh
collect's episodic cost (README.md:72, lagrangian_base.py:98-100).
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
from fsrl_tpu.nets.mlp import DeterministicActor, QCriticEnsemble
from fsrl_tpu.ops.lagrange import (PIDLagrangianState, pid_controller_step,
                                   rescaling_factor)

Array = jax.Array


@struct.dataclass
class DDPGLagState:
    params: Any                # {"actor", "critics"}
    target_params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    lag: PIDLagrangianState
    last_ep_cost: Array
    update_count: Array
    gradient_steps: Array


class DDPGLag:
    """Deterministic-actor Lagrangian DDPG with per-metric Q critics and the
    filtered PID multiplier (see module docstring; reference
    ``fsrl/policy/ddpg_lag.py``)."""

    name = "ddpg_lag"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float | list = 10.0,
        num_costs: int = 1,
        hidden_sizes=(128, 128),
        actor_lr: float = 1e-4,
        critic_lr: float = 1e-3,
        tau: float = 0.005,
        exploration_noise: float = 0.1,
        n_step: int = 3,
        use_lagrangian: bool = True,
        pid_filter: bool = True,   # False = exact reference recurrence (ablation)
        lagrangian_pid=(0.5, 0.001, 0.1),   # reference DDPG default (ddpg_lag_agent.py:84)
        rescaling: bool = True,
        gamma: float = 0.99,
        max_action: float = 1.0,
        batch_size: int = 256,
        deterministic_eval: bool = True,
        compute_dtype: Any = None,   # jnp.bfloat16 -> MXU mixed-precision trunks
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = num_costs
        self.K = 1 + num_costs
        cl = [cost_limit] * num_costs if jnp.isscalar(cost_limit) else list(cost_limit)
        self.cost_limit = jnp.asarray(cl, jnp.float32)
        self.hp = dict(
            tau=tau, noise=exploration_noise, n_step=n_step,
            use_lagrangian=use_lagrangian, pid=tuple(lagrangian_pid),
            pid_filter=pid_filter,
            rescaling=rescaling, gamma=gamma, batch_size=batch_size,
        )
        self.deterministic_eval = deterministic_eval
        self.actor = DeterministicActor(act_dim=act_dim, hidden_sizes=hidden_sizes,
                                        max_action=max_action,
                                        compute_dtype=compute_dtype)
        self.critics = QCriticEnsemble(num_metrics=self.K, num_q=1,
                                       hidden_sizes=hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.actor_tx = make_optimizer(actor_lr)
        self.critic_tx = make_optimizer(critic_lr)

    def init(self, rng: Array) -> DDPGLagState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.act_dim))
        params = {"actor": self.actor.init(ka, obs),
                  "critics": self.critics.init(kc, obs, act)}
        return DDPGLagState(
            params=params, target_params=jax.tree.map(lambda x: x, params),
            actor_opt_state=self.actor_tx.init(params["actor"]),
            critic_opt_state=self.critic_tx.init(params["critics"]),
            lag=PIDLagrangianState.init(self.num_costs),
            last_ep_cost=jnp.zeros((self.num_costs,)),
            update_count=jnp.zeros((), jnp.int32),
            gradient_steps=jnp.zeros((), jnp.int32),
        )

    # exploration: actor output + Gaussian noise (stored pre-clip, like the
    # reference which stores the noised action — fast_collector.py:283-286)
    def act_fn(self, params, obs: Array, rng: Array):
        act = self.actor.apply(params["actor"], obs)
        act = act + self.hp["noise"] * jax.random.normal(rng, act.shape)
        return act, jnp.zeros(act.shape[:-1])

    def act_fn_eval(self, params, obs: Array, rng: Array):
        act = self.actor.apply(params["actor"], obs)
        return act, jnp.zeros(act.shape[:-1])

    # ------------------------------------------------------------------
    def update_lagrangian(self, state: DDPGLagState, ep_cost_mean: Array,
                          n_episodes: Array,
                          cost_limit: Array | None = None) -> DDPGLagState:
        """pre_update_fn: PID step from the fresh collect (once per collect,
        not per gradient step — reference offpolicy trainer semantics), with
        the EMA-filtered anti-windup controller (``filtered_pid_step``; see
        ``benchmarks/diag_sacl.py`` for the raw-measurement whipsaw it
        fixes). Steps only when the collect finished >= 1 episode."""
        if not self.hp["use_lagrangian"]:
            return state
        kp, ki, kd = self.hp["pid"]
        limit = self.cost_limit if cost_limit is None else cost_limit
        lag = pid_controller_step(state.lag, ep_cost_mean, n_episodes,
                                  limit, kp, ki, kd,
                                  filtered=self.hp["pid_filter"])
        return state.replace(lag=lag, last_ep_cost=lag.cost_ema)

    def update_step(self, state: DDPGLagState, buffer: ReplayBuffer,
                    buf_state: ReplayBufferState, rng: Array,
                    view=None,
                    ) -> tuple[DDPGLagState, dict[str, Array]]:
        hp = self.hp

        def target_q_fn(term_batch):
            a = self.actor.apply(state.target_params["actor"], term_batch.obs_next)
            q = self.critics.apply(state.target_params["critics"],
                                   term_batch.obs_next, a)   # (B, K, 1)
            return q[..., 0]

        batch, rets = sample_nstep_batch(
            buffer, buf_state, rng, hp["batch_size"], hp["n_step"], hp["gamma"],
            target_q_fn, view=view,
        )
        # nonnegative cost-channel targets (see sac_lag.py — same rationale)
        rets = jnp.concatenate(
            [rets[:, :1], jnp.maximum(rets[:, 1:], 0.0)], axis=1)

        # ---- critics ----
        def closs(cp):
            q = self.critics.apply(cp, batch.obs, batch.act)[..., 0]  # (B, K)
            return jnp.sum(jnp.mean((q - rets) ** 2, axis=0))

        cl, cgrads = jax.value_and_grad(closs)(state.params["critics"])
        cupd, copt = self.critic_tx.update(cgrads, state.critic_opt_state,
                                           state.params["critics"])
        critics_new = optax.apply_updates(state.params["critics"], cupd)

        # ---- actor ----
        lam_mult = state.lag.multiplier
        resc = rescaling_factor(lam_mult, hp["rescaling"]) if hp["use_lagrangian"] \
            else jnp.ones(())

        def aloss(ap):
            a = self.actor.apply(ap, batch.obs)
            q = self.critics.apply(critics_new, batch.obs, a)[..., 0]  # (B, K)
            loss_rew = -jnp.mean(q[:, 0])
            loss_safety = jnp.sum(
                lam_mult * jnp.mean(jax.nn.relu(q[:, 1:]), axis=0)) \
                if hp["use_lagrangian"] else 0.0
            return resc * (loss_rew + loss_safety), loss_rew

        (al, loss_rew), agrads = jax.value_and_grad(aloss, has_aux=True)(
            state.params["actor"])
        aupd, aopt = self.actor_tx.update(agrads, state.actor_opt_state,
                                          state.params["actor"])
        actor_new = optax.apply_updates(state.params["actor"], aupd)

        params = {"actor": actor_new, "critics": critics_new}
        target_params = soft_update(state.target_params, params, hp["tau"])

        metrics = {"loss/q_total": cl, "loss/actor_total": al,
                   "loss/actor_rew": loss_rew, "loss/rescaling": resc}
        for i in range(self.num_costs):
            metrics[f"loss/lagrangian{'' if i == 0 else '_' + str(i)}"] = lam_mult[i]

        return state.replace(
            params=params, target_params=target_params,
            actor_opt_state=aopt, critic_opt_state=copt,
            update_count=state.update_count + 1,
            gradient_steps=state.gradient_steps + 1,
        ), metrics
