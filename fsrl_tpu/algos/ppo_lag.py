"""PPO-Lagrangian, TPU-native.

Re-derivation of the reference ``PPOLagrangian`` (``fsrl/policy/ppo_lag.py``) as a
single jitted update over a rollout segment:

* clipped (optionally dual-clipped) surrogate on the reward advantage
  (``ppo_lag.py:184-193``)
* safety loss ``sum_i lambda_i * mean(ratio * advC_i)`` with Stooke rescaling
  ``1/(sum lambda + 1)`` (``ppo_lag.py:195-201``, ``lagrangian_base.py:145-166``)
* per-minibatch advantage normalization over ALL channels (``ppo_lag.py:178-182``)
* joint actor+critic Adam, grad-norm clip (``ppo_lag.py:233-241``)
* KL early stop at ``1.5 * target_kl`` after each epoch — implemented as masked
  no-op epochs inside ``lax.scan`` so shapes stay static (SURVEY.md §7)
* PID multiplier update from the collect's mean episodic cost
  (``lagrangian_base.py:98-100``; ``fsrl/utils/optim_util.py``)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fsrl_tpu.algos.common import (OnPolicyBatch, make_optimizer, normalize_adv,
                                   process_rollout, select_tree)
from fsrl_tpu.nets.mlp import (GaussianActor, VCriticEnsemble,
                               fused_pi_v_apply)
from fsrl_tpu.ops.lagrange import (PIDLagrangianState, pid_controller_step,
                                   rescaling_factor)
from fsrl_tpu.ops.fused_ppo_grad import ppo_grad_minibatch
from fsrl_tpu.types import Transition, minibatch_epochs_scan

Array = jax.Array


@struct.dataclass
class PPOLagState:
    params: Any
    opt_state: Any
    lag: PIDLagrangianState
    last_ep_cost: Array      # (M,) fallback PID input when a segment has no finished episode
    ret_rms: Any             # RunningMeanStd (K,) — reward_normalization stats
    update_count: Array
    gradient_steps: Array


class PPOLag:
    """Config + pure functions. All hyperparameters are static (baked into jit)."""

    name = "ppo_lag"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float | list = 10.0,
        num_costs: int = 1,
        hidden_sizes=(128, 128),
        lr: float = 5e-4,
        target_kl: float = 0.02,
        vf_coef: float = 0.25,
        max_grad_norm: float | None = 0.5,
        gae_lambda: float = 0.95,
        eps_clip: float = 0.2,
        dual_clip: float | None = None,
        value_clip: bool = False,
        advantage_normalization: bool = True,
        reward_normalization: bool = False,
        use_lagrangian: bool = True,
        pid_filter: bool = True,   # False = exact reference recurrence (ablation)
        lagrangian_pid=(0.05, 0.0005, 0.1),
        rescaling: bool = True,
        gamma: float = 0.99,
        unbounded: bool = False,
        last_layer_scale: bool = True,
        sigma_init: float = -0.5,
        max_action: float = 1.0,
        repeat: int = 4,
        n_minibatches: int = 4,
        deterministic_eval: bool = True,
        compute_dtype: Any = None,   # jnp.bfloat16 → MXU mixed precision trunks
        episode_len: int | None = None,  # env truncation horizon → 1-pass GAE critic
        gae_impl: str = "pscan",  # "pscan" | "scan" | "pallas" (TPU kernel)
        dp_blocks: int = 1,   # dp mesh size → block-local minibatch shuffle
        # fused TPU grad-step kernel (ops/fused_ppo_grad.py: wins in
        # isolation, loses in-pipeline to custom-call layout copies)
        use_pallas_grad: bool = False,
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = num_costs
        self.K = 1 + num_costs
        cl = [cost_limit] * num_costs if jnp.isscalar(cost_limit) else list(cost_limit)
        self.cost_limit = jnp.asarray(cl, jnp.float32)
        self.hp = dict(
            lr=lr, target_kl=target_kl, vf_coef=vf_coef, max_grad_norm=max_grad_norm,
            gae_lambda=gae_lambda, eps_clip=eps_clip, dual_clip=dual_clip,
            value_clip=value_clip, norm_adv=advantage_normalization,
            rew_norm=reward_normalization,
            use_lagrangian=use_lagrangian, pid=tuple(lagrangian_pid),
            pid_filter=pid_filter,
            rescaling=rescaling, gamma=gamma, repeat=repeat,
            n_minibatches=n_minibatches, episode_len=episode_len,
            gae_impl=gae_impl, dp_blocks=dp_blocks,
        )
        self.deterministic_eval = deterministic_eval
        self.actor = GaussianActor(
            act_dim=act_dim, hidden_sizes=hidden_sizes, max_action=max_action,
            unbounded=unbounded, conditioned_sigma=False,
            last_layer_scale=last_layer_scale, sigma_init=sigma_init,
            compute_dtype=compute_dtype,
        )
        self.critics = VCriticEnsemble(num_critics=self.K, hidden_sizes=hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.compute_dtype = compute_dtype
        # stacked actor+critic matmul chain in the update loss (identical
        # math, ~half the HBM-roundtripping ops per grad step); only the
        # standard PPO net recipe qualifies
        self.fused_forward = len(tuple(hidden_sizes)) == 2
        # monolithic pallas grad-step kernel (ops/fused_ppo_grad.py): the
        # update scan is latency-bound on ~150 small XLA kernels per grad
        # step; the fused kernel computes the whole minibatch gradient in
        # one launch. Envelope: the standard reference recipe only.
        self.use_pallas_grad = use_pallas_grad
        self._pallas_ok = (
            len(tuple(hidden_sizes)) == 2
            and dual_clip is None and not value_clip
            and advantage_normalization and not unbounded
            and max_action == 1.0 and dp_blocks == 1
        )
        self.tx = make_optimizer(lr, max_grad_norm, flat=True)

    # ---------------- init ----------------
    def init(self, rng: Array) -> PPOLagState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        params = {
            "actor": self.actor.init(ka, obs),
            "critics": self.critics.init(kc, obs),
        }
        from fsrl_tpu.ops.running_stats import RunningMeanStd
        return PPOLagState(
            params=params,
            opt_state=self.tx.init(params),
            lag=PIDLagrangianState.init(self.num_costs),
            last_ep_cost=jnp.zeros((self.num_costs,)),
            ret_rms=RunningMeanStd.init((self.K,)),
            update_count=jnp.zeros((), jnp.int32),
            gradient_steps=jnp.zeros((), jnp.int32),
        )

    # ---------------- acting ----------------
    def act_fn(self, params, obs: Array, rng: Array):
        dist = self.actor.apply(params["actor"], obs)
        act = dist.sample(rng)
        return act, dist.log_prob(act)

    def act_fn_eval(self, params, obs: Array, rng: Array):
        dist = self.actor.apply(params["actor"], obs)
        act = dist.mode() if self.deterministic_eval else dist.sample(rng)
        return act, dist.log_prob(act)

    def value_fn(self, params, obs: Array) -> Array:
        return self.critics.apply(params["critics"], obs)

    # ---------------- update ----------------
    def update(
        self,
        state: PPOLagState,
        tr: Transition,            # (T, N, ...)
        ep_cost_mean: Array,       # (M,) mean episodic cost of this collect
        n_episodes: Array,         # () int — episodes completed in this collect
        rng: Array,
        cost_limit: Array | None = None,   # runtime override (update_cost_limit)
    ) -> tuple[PPOLagState, dict[str, Array]]:
        hp = self.hp
        # --- PID multiplier from fresh on-policy episodic cost ---
        # Stepped only when this collect completed >=1 episode (reference
        # collects are episode-counted so each PID step sees fresh data,
        # lagrangian_base.py:98-100; re-feeding a stale cost would wind the
        # integral several times per measurement).
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
        # last_ep_cost tracks the filtered measurement; with the Lagrangian
        # disabled the filter never steps, so fall back to the raw collect
        # measurement (holding the previous value on episode-free collects)
        cost_in = lag.cost_ema if hp["use_lagrangian"] else jnp.where(
            n_episodes > 0, ep_cost_mean, state.last_ep_cost)

        if hp["rew_norm"]:
            batch, ret_rms = process_rollout(
                lambda p, o: self.critics.apply(p["critics"], o),
                state.params, tr, hp["gamma"], hp["gae_lambda"],
                gae_impl=hp["gae_impl"],
                ret_rms=state.ret_rms, episode_len=hp["episode_len"],
            )
        else:
            batch = process_rollout(
                lambda p, o: self.critics.apply(p["critics"], o),
                state.params, tr, hp["gamma"], hp["gae_lambda"],
                gae_impl=hp["gae_impl"], episode_len=hp["episode_len"],
            )
            ret_rms = state.ret_rms

        lam_mult = lag.multiplier
        resc = rescaling_factor(lam_mult, hp["rescaling"]) if hp["use_lagrangian"] \
            else jnp.ones(())

        def loss_fn(params, mb: OnPolicyBatch):
            if self.fused_forward:
                dist, values = fused_pi_v_apply(
                    params, mb.obs, act_dim=self.act_dim, num_critics=self.K,
                    max_action=self.actor.max_action,
                    unbounded=self.actor.unbounded,
                    compute_dtype=self.compute_dtype)
            else:
                dist = self.actor.apply(params["actor"], mb.obs)
                values = self.critics.apply(params["critics"], mb.obs)
            log_p = dist.log_prob(mb.act)
            ratio = jnp.exp(log_p - mb.logp_old)
            adv = normalize_adv(mb.adv) if hp["norm_adv"] else mb.adv

            rew_adv = adv[:, 0]
            surr1 = ratio * rew_adv
            surr2 = jnp.clip(ratio, 1 - hp["eps_clip"], 1 + hp["eps_clip"]) * rew_adv
            if hp["dual_clip"] is not None:
                clip1 = jnp.minimum(surr1, surr2)
                clip2 = jnp.maximum(clip1, hp["dual_clip"] * rew_adv)
                loss_rew = -jnp.mean(jnp.where(rew_adv < 0, clip2, clip1))
            else:
                loss_rew = -jnp.mean(jnp.minimum(surr1, surr2))

            if hp["use_lagrangian"]:
                cost_terms = jnp.mean(ratio[:, None] * adv[:, 1:], axis=0)  # (M,)
                loss_safety = jnp.sum(lam_mult * cost_terms)
            else:
                loss_safety = 0.0
            loss_actor = resc * (loss_rew + loss_safety)

            if hp["value_clip"]:
                v_clip = mb.value_old + jnp.clip(
                    values - mb.value_old, -hp["eps_clip"], hp["eps_clip"])
                vf = jnp.maximum((mb.ret - values) ** 2, (mb.ret - v_clip) ** 2)
            else:
                vf = (mb.ret - values) ** 2
            loss_vf = jnp.sum(jnp.mean(vf, axis=0))

            loss = loss_actor + hp["vf_coef"] * loss_vf
            approx_kl = jnp.mean(mb.logp_old - log_p)
            aux = dict(
                loss_actor_rew=loss_rew, loss_actor_total=loss_actor,
                loss_vf_total=loss_vf, kl=approx_kl,
                entropy=jnp.mean(dist.entropy()),
            )
            return loss, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        n_mb = hp["n_minibatches"]

        # minibatch row count the scan will produce (types.py tiling math);
        # the kernel needs a 128-divisible batch to tile the grid
        _rows = batch.obs.shape[0]
        _ts = max(1, _rows // 4096)
        _usable = ((_rows // _ts) // hp["n_minibatches"]) * hp["n_minibatches"]
        _mb_rows = (_usable // hp["n_minibatches"]) * _ts
        use_pallas = bool(self.use_pallas_grad) and self._pallas_ok and (
            _mb_rows % 128 == 0)

        def mb_body(carry, mb, is_end):
            params, opt_state, stopped, gsteps, kl_acc = carry
            if use_pallas:
                adv_n = normalize_adv(mb.adv) if hp["norm_adv"] else mb.adv
                loss, aux, grads = ppo_grad_minibatch.__wrapped__(
                    params, mb.obs, mb.act, mb.logp_old, adv_n, mb.ret,
                    lam_mult, resc, eps_clip=hp["eps_clip"],
                    vf_coef=hp["vf_coef"], compute_dtype=self.compute_dtype)
            else:
                (loss, aux), grads = grad_fn(params, mb)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            params = select_tree(stopped, params, new_params)
            opt_state = select_tree(stopped, opt_state, new_opt)
            gsteps = gsteps + jnp.where(stopped, 0, 1)
            # KL early stop at 1.5*target_kl, evaluated on the epoch's mean
            # KL at each epoch boundary (reference ppo_lag.py:249-255)
            kl_acc = kl_acc + aux["kl"]
            stopped = jnp.where(
                is_end,
                jnp.logical_or(stopped, kl_acc / n_mb > 1.5 * hp["target_kl"]),
                stopped)
            kl_acc = jnp.where(is_end, 0.0, kl_acc)
            aux["loss_total"] = loss
            return (params, opt_state, stopped, gsteps, kl_acc), aux

        # one flat scan over repeat*n_minibatches grad steps: the shuffle is
        # packed once and gathered for all epochs in one batched op, and one
        # epoch's worth of bodies is unrolled (bench_update_breakdown.py)
        (params, opt_state, stopped, gsteps, _), auxes = minibatch_epochs_scan(
            rng, batch, hp["repeat"], n_mb, mb_body,
            (state.params, state.opt_state, jnp.zeros((), bool),
             state.gradient_steps, jnp.zeros(())),
            n_blocks=hp["dp_blocks"], unroll=n_mb, per_leaf=use_pallas,
        )

        metrics = {("loss/" + k if not k.startswith("loss") else
                    k.replace("_", "/", 1)): jnp.mean(v) for k, v in auxes.items()}
        metrics["loss/kl"] = jnp.mean(auxes["kl"])
        metrics["loss/rescaling"] = resc
        for i in range(self.num_costs):
            metrics[f"loss/lagrangian{'' if i == 0 else '_' + str(i)}"] = lam_mult[i]
        metrics["update/early_stopped"] = stopped.astype(jnp.float32)

        new_state = PPOLagState(
            params=params, opt_state=opt_state, lag=lag,
            last_ep_cost=cost_in, ret_rms=ret_rms,
            update_count=state.update_count + 1,
            gradient_steps=gsteps,
        )
        return new_state, metrics
