"""Recurrent PPO-Lagrangian — BPTT training for partially observable safe RL.

The reference plumbs RNN hidden state through its collector
(``fsrl/data/fast_collector.py:154-163, 255, 349-353``) but ships no working
recurrent TRAINING update — no sequence-aware minibatching, no BPTT. This module
closes that gap TPU-natively:

* the actor is a GRU (:class:`fsrl_tpu.nets.mlp.RecurrentGaussianActor`); the
  (1 + M) critics stay feedforward on observations (standard recurrent-PPO
  recipe — values only feed GAE, which is computed once per segment).
* minibatches are drawn over the **env axis** (whole T-step sequences stay
  contiguous) so truncated BPTT over the full segment is exact: the GRU is
  re-unrolled from the stored segment-start carry with per-step hidden resets
  at episode boundaries — bit-identical state evolution to collection time
  (``data/collector.py::make_rollout_fn`` recurrent path).
* everything else is the PPO-Lagrangian objective of ``algos/ppo_lag.py``
  (clipped surrogate + PID-Lagrangian safety loss with Stooke rescaling,
  reference ``fsrl/policy/ppo_lag.py:173-212``), KL early stop as masked
  no-op epochs inside ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fsrl_tpu.algos.common import make_optimizer, normalize_adv, select_tree
from fsrl_tpu.nets.distributions import DiagGaussian
from fsrl_tpu.nets.mlp import RecurrentGaussianActor, VCriticEnsemble
from fsrl_tpu.ops.gae import gae_advantages_pscan
from fsrl_tpu.ops.lagrange import (PIDLagrangianState, pid_controller_step,
                                   rescaling_factor)
from fsrl_tpu.types import Transition

Array = jax.Array


@struct.dataclass
class RecurrentPPOLagState:
    params: Any
    opt_state: Any
    lag: PIDLagrangianState
    last_ep_cost: Array
    update_count: Array
    gradient_steps: Array


class RecurrentPPOLag:
    """GRU actor + feedforward critic ensemble, trained with truncated BPTT
    over collected segments. API mirrors :class:`fsrl_tpu.algos.ppo_lag.PPOLag`
    except ``act_fn`` carries a hidden state and ``update`` takes the
    segment-start carry (``RolloutResult.init_hidden``)."""

    name = "ppo_lag_rnn"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float | list = 10.0,
        num_costs: int = 1,
        hidden_size: int = 128,
        critic_hidden_sizes=(128, 128),
        lr: float = 5e-4,
        target_kl: float = 0.02,
        vf_coef: float = 0.25,
        max_grad_norm: float | None = 0.5,
        gae_lambda: float = 0.95,
        eps_clip: float = 0.2,
        advantage_normalization: bool = True,
        use_lagrangian: bool = True,
        pid_filter: bool = True,   # False = exact reference recurrence (ablation)
        lagrangian_pid=(0.05, 0.0005, 0.1),
        rescaling: bool = True,
        gamma: float = 0.99,
        max_action: float = 1.0,
        repeat: int = 4,
        n_minibatches: int = 4,
        deterministic_eval: bool = True,
        compute_dtype: Any = None,   # bf16 critic trunks (GRU stays f32)
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = num_costs
        self.K = 1 + num_costs
        cl = [cost_limit] * num_costs if jnp.isscalar(cost_limit) else list(cost_limit)
        self.cost_limit = jnp.asarray(cl, jnp.float32)
        self.hidden_size = hidden_size
        self.hp = dict(
            lr=lr, target_kl=target_kl, vf_coef=vf_coef,
            max_grad_norm=max_grad_norm, gae_lambda=gae_lambda,
            eps_clip=eps_clip, norm_adv=advantage_normalization,
            use_lagrangian=use_lagrangian, pid=tuple(lagrangian_pid),
            pid_filter=pid_filter,
            rescaling=rescaling, gamma=gamma, repeat=repeat,
            n_minibatches=n_minibatches,
        )
        self.deterministic_eval = deterministic_eval
        self.actor = RecurrentGaussianActor(
            act_dim=act_dim, hidden_size=hidden_size, max_action=max_action)
        self.critics = VCriticEnsemble(num_critics=self.K,
                                       hidden_sizes=critic_hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.tx = make_optimizer(lr, max_grad_norm)

    # ---------------- init ----------------
    def init(self, rng: Array) -> RecurrentPPOLagState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        carry = jnp.zeros((1, self.hidden_size))
        params = {
            "actor": self.actor.init(ka, obs, carry),
            "critics": self.critics.init(kc, obs),
        }
        return RecurrentPPOLagState(
            params=params,
            opt_state=self.tx.init(params),
            lag=PIDLagrangianState.init(self.num_costs),
            last_ep_cost=jnp.zeros((self.num_costs,)),
            update_count=jnp.zeros((), jnp.int32),
            gradient_steps=jnp.zeros((), jnp.int32),
        )

    def init_hidden(self, n_envs: int) -> Array:
        return jnp.zeros((n_envs, self.hidden_size))

    # ---------------- acting (recurrent signature) ----------------
    def act_fn(self, params, obs: Array, hidden: Array, rng: Array):
        dist, hidden = self.actor.apply(params["actor"], obs, hidden)
        act = dist.sample(rng)
        return act, dist.log_prob(act), hidden

    def act_fn_eval(self, params, obs: Array, hidden: Array, rng: Array):
        dist, hidden = self.actor.apply(params["actor"], obs, hidden)
        act = dist.mode() if self.deterministic_eval else dist.sample(rng)
        return act, dist.log_prob(act), hidden

    def value_fn(self, params, obs: Array) -> Array:
        return self.critics.apply(params["critics"], obs)

    # ---------------- update (truncated BPTT) ----------------
    def _unroll(self, actor_params, obs: Array, done: Array, h0: Array):
        """Re-run the GRU over a (T, n) sequence block from carry ``h0`` with
        the collection-time per-step reset: hidden zeroes after a done step.
        Returns (mean, std) of shape (T, n, act_dim)."""

        def step(h, x):
            obs_t, done_t = x
            dist, h = self.actor.apply(actor_params, obs_t, h)
            h = jnp.where(done_t[:, None], 0.0, h)
            return h, (dist.mean, dist.std)

        _, (mean, std) = jax.lax.scan(step, h0, (obs, done))
        return mean, std

    def update(
        self,
        state: RecurrentPPOLagState,
        tr: Transition,          # (T, N, ...)
        init_hidden: Array,      # (N, H) carry at segment start
        ep_cost_mean: Array,     # (M,)
        n_episodes: Array,       # ()
        rng: Array,
        cost_limit: Array | None = None,
    ) -> tuple[RecurrentPPOLagState, dict[str, Array]]:
        hp = self.hp
        T, N = tr.reward.shape

        # PID stepped only on fresh episodic data (see ppo_lag.py)
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

        # --- GAE over the segment (feedforward critics, time-major) ---
        m = jnp.concatenate([tr.reward[..., None], tr.cost], axis=-1)
        values = self.critics.apply(state.params["critics"], tr.obs)
        values_next = self.critics.apply(state.params["critics"], tr.obs_next)
        mask = jnp.logical_not(tr.terminated).astype(values.dtype)[..., None]
        end_flag = jnp.logical_or(tr.terminated, tr.truncated)
        adv, ret = gae_advantages_pscan(m, values, values_next * mask, end_flag,
                                        hp["gamma"], hp["gae_lambda"])

        done = tr.done                                    # (T, N)

        def loss_fn(params, mb):
            # mb leaves are (T, n, ...) sequence blocks except h0 (n, H)
            mean, std = self._unroll(params["actor"], mb["obs"], mb["done"],
                                     mb["h0"])
            dist = DiagGaussian(mean=mean, std=std)
            log_p = dist.log_prob(mb["act"])              # (T, n)
            ratio = jnp.exp(log_p - mb["logp_old"])
            adv_mb = mb["adv"].reshape(-1, self.K)
            adv_mb = normalize_adv(adv_mb) if hp["norm_adv"] else adv_mb
            ratio_f = ratio.reshape(-1)

            rew_adv = adv_mb[:, 0]
            surr1 = ratio_f * rew_adv
            surr2 = jnp.clip(ratio_f, 1 - hp["eps_clip"],
                             1 + hp["eps_clip"]) * rew_adv
            loss_rew = -jnp.mean(jnp.minimum(surr1, surr2))

            if hp["use_lagrangian"]:
                cost_terms = jnp.mean(ratio_f[:, None] * adv_mb[:, 1:], axis=0)
                loss_safety = jnp.sum(lam_mult * cost_terms)
            else:
                loss_safety = 0.0
            loss_actor = resc * (loss_rew + loss_safety)

            v = self.critics.apply(params["critics"], mb["obs"])  # (T, n, K)
            loss_vf = jnp.sum(jnp.mean((mb["ret"] - v) ** 2, axis=(0, 1)))

            loss = loss_actor + hp["vf_coef"] * loss_vf
            approx_kl = jnp.mean(mb["logp_old"] - log_p)
            aux = dict(loss_actor_rew=loss_rew, loss_actor_total=loss_actor,
                       loss_vf_total=loss_vf, kl=approx_kl,
                       entropy=jnp.mean(dist.entropy()))
            return loss, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        n_mb = hp["n_minibatches"]
        envs_per_mb = N // n_mb

        def mb_body(carry, mb):
            params, opt_state, stopped, gsteps = carry
            (loss, aux), grads = grad_fn(params, mb)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params = select_tree(stopped, params, new_params)
            opt_state = select_tree(stopped, opt_state, new_opt)
            gsteps = gsteps + jnp.where(stopped, 0, 1)
            aux["loss_total"] = loss
            return (params, opt_state, stopped, gsteps), aux

        def epoch_body(carry, key):
            params, opt_state, stopped, gsteps = carry
            # shuffle whole sequences over the env axis
            perm = jax.random.permutation(key, N)[: n_mb * envs_per_mb]
            perm = perm.reshape(n_mb, envs_per_mb)
            mbs = {
                "obs": tr.obs[:, perm].transpose(1, 0, 2, 3),
                "act": tr.act[:, perm].transpose(1, 0, 2, 3),
                "logp_old": tr.logp[:, perm].transpose(1, 0, 2),
                "adv": adv[:, perm].transpose(1, 0, 2, 3),
                "ret": ret[:, perm].transpose(1, 0, 2, 3),
                "done": done[:, perm].transpose(1, 0, 2),
                "h0": init_hidden[perm],
            }
            (params, opt_state, stopped, gsteps), auxes = jax.lax.scan(
                mb_body, (params, opt_state, stopped, gsteps), mbs)
            kl_mean = jnp.mean(auxes["kl"])
            stopped = jnp.logical_or(stopped, kl_mean > 1.5 * hp["target_kl"])
            return (params, opt_state, stopped, gsteps), auxes

        keys = jax.random.split(rng, hp["repeat"])
        (params, opt_state, stopped, gsteps), auxes = jax.lax.scan(
            epoch_body, (state.params, state.opt_state, jnp.zeros((), bool),
                         state.gradient_steps), keys)

        metrics = {("loss/" + k if not k.startswith("loss") else
                    k.replace("_", "/", 1)): jnp.mean(v)
                   for k, v in auxes.items()}
        metrics["loss/kl"] = jnp.mean(auxes["kl"])
        metrics["loss/rescaling"] = resc
        for i in range(self.num_costs):
            metrics[f"loss/lagrangian{'' if i == 0 else '_' + str(i)}"] = lam_mult[i]
        metrics["update/early_stopped"] = stopped.astype(jnp.float32)

        new_state = RecurrentPPOLagState(
            params=params, opt_state=opt_state, lag=lag, last_ep_cost=cost_in,
            update_count=state.update_count + 1, gradient_steps=gsteps)
        return new_state, metrics
