"""FOCOPS (First-Order Constrained Optimization in Policy Space), TPU-native.

Re-derivation of the reference ``FOCOPS`` (``fsrl/policy/focops.py``; Zhang et
al. 2020):

* scalar nu multiplier: ``nu <- clip(nu - nu_lr * (cost_limit - avg_cost),
  0, nu_max)`` once per update (focops.py:155-160)
* non-parametric projection actor loss
  ``mean[ (KL(new||old) - (1/tem_lambda) * ratio * (advR - nu*advC))
          * 1[KL <= eta] ]`` (focops.py:195-202)
* per-minibatch advantage normalization over all channels (focops.py:189-193)
* critics: Adam + L2 reg each minibatch (focops.py:162-178)
* KL early stop at ``delta`` after each epoch (focops.py:243-249), realized as
  masked no-op epochs inside ``lax.scan``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fsrl_tpu.algos.common import (make_optimizer, normalize_adv,
                                   process_rollout, select_tree)
from fsrl_tpu.nets.distributions import DiagGaussian
from fsrl_tpu.nets.mlp import GaussianActor, VCriticEnsemble
from fsrl_tpu.types import Transition, minibatch_scan

Array = jax.Array


@struct.dataclass
class FOCOPSState:
    params: Any
    actor_opt_state: Any
    critic_opt_state: Any
    nu: Array                # () scalar multiplier
    last_ep_cost: Array
    update_count: Array
    gradient_steps: Array


class FOCOPS:
    """First-Order Constrained Optimization in Policy Space: non-parametric
    projection with a learned nu multiplier (see module docstring; reference
    ``fsrl/policy/focops.py``)."""

    name = "focops"

    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        *,
        cost_limit: float = 10.0,
        hidden_sizes=(128, 128),
        actor_lr: float = 3e-4,
        critic_lr: float = 3e-4,
        # auto-nu tuple (nu_max, nu_lr, nu_init) — reference default
        # (focops_agent.py:94-97)
        nu_max: float = 2.0,
        nu_lr: float = 1e-2,
        nu_init: float = 0.01,
        l2_reg: float = 1e-3,
        delta: float = 0.02,          # early-stop KL
        eta: float = 0.02,            # indicator KL bound
        tem_lambda: float = 0.95,     # temperature 1/lambda factor
        max_grad_norm: float | None = None,
        gae_lambda: float = 0.95,
        advantage_normalization: bool = True,
        gamma: float = 0.99,
        unbounded: bool = False,
        last_layer_scale: bool = True,
        max_action: float = 1.0,
        repeat: int = 4,
        n_minibatches: int = 4,
        deterministic_eval: bool = True,
        compute_dtype: Any = None,   # jnp.bfloat16 -> MXU mixed-precision trunks
        episode_len: int | None = None,  # env truncation horizon -> 1-pass GAE critic
        dp_blocks: int = 1,   # dp mesh size -> block-local minibatch shuffle
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.num_costs = 1
        self.K = 2
        self.cost_limit = float(cost_limit)
        self.hp = dict(
            episode_len=episode_len,
            dp_blocks=dp_blocks,
            nu_max=nu_max, nu_lr=nu_lr, l2_reg=l2_reg, delta=delta, eta=eta,
            tem_lambda=tem_lambda, gae_lambda=gae_lambda,
            norm_adv=advantage_normalization, gamma=gamma, repeat=repeat,
            n_minibatches=n_minibatches,
        )
        self.nu_init = float(nu_init)
        self.deterministic_eval = deterministic_eval
        self.actor = GaussianActor(
            act_dim=act_dim, hidden_sizes=hidden_sizes, max_action=max_action,
            unbounded=unbounded, conditioned_sigma=False,
            last_layer_scale=last_layer_scale, compute_dtype=compute_dtype,
        )
        self.critics = VCriticEnsemble(num_critics=2, hidden_sizes=hidden_sizes,
                                       compute_dtype=compute_dtype)
        self.actor_tx = make_optimizer(actor_lr, max_grad_norm)
        self.critic_tx = make_optimizer(critic_lr)

    def init(self, rng: Array) -> FOCOPSState:
        ka, kc = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        params = {"actor": self.actor.init(ka, obs),
                  "critics": self.critics.init(kc, obs)}
        return FOCOPSState(
            params=params,
            actor_opt_state=self.actor_tx.init(params["actor"]),
            critic_opt_state=self.critic_tx.init(params["critics"]),
            nu=jnp.asarray(self.nu_init),
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
        state: FOCOPSState,
        tr: Transition,
        ep_cost_mean: Array,
        n_episodes: Array,
        rng: Array,
        cost_limit: Array | None = None,
    ) -> tuple[FOCOPSState, dict[str, Array]]:
        hp = self.hp
        avg_cost = jnp.where(n_episodes > 0, ep_cost_mean,
                             state.last_ep_cost)[0]
        limit = self.cost_limit if cost_limit is None \
            else jnp.squeeze(cost_limit)
        # nu update (focops.py:155-160), stepped only on fresh episodic data
        # (stale re-feeds would drift nu several times per measurement)
        loss_nu = limit - avg_cost
        nu_new = jnp.clip(state.nu - hp["nu_lr"] * loss_nu, 0.0, hp["nu_max"])
        nu = jnp.where(n_episodes > 0, nu_new, state.nu)

        batch = process_rollout(
            lambda p, o: self.critics.apply(p["critics"], o),
            state.params, tr, hp["gamma"], hp["gae_lambda"],
            episode_len=hp["episode_len"],
        )
        # old dist params for exact KL (reference stores mean_old/std_old)
        old_dist_all = self.actor.apply(state.params["actor"], batch.obs)

        full = {
            "obs": batch.obs, "act": batch.act, "logp_old": batch.logp_old,
            "adv": batch.adv, "ret": batch.ret,
            "mean_old": old_dist_all.mean, "std_old": old_dist_all.std,
        }

        def mb_body(carry, mb):
            ap, aopt, cp, copt, stopped, gsteps = carry

            def closs(cp):
                v = self.critics.apply(cp, mb["obs"])
                mse = jnp.sum(jnp.mean((mb["ret"] - v) ** 2, axis=0))
                l2 = sum(jnp.sum(p ** 2) for p in jax.tree.leaves(cp))
                return mse + hp["l2_reg"] * l2

            cl, cgrads = jax.value_and_grad(closs)(cp)
            cupd, new_copt = self.critic_tx.update(cgrads, copt, cp)
            new_cp = optax.apply_updates(cp, cupd)

            def aloss(ap):
                dist = self.actor.apply(ap, mb["obs"])
                log_p = dist.log_prob(mb["act"])
                ratio = jnp.exp(log_p - mb["logp_old"])
                old = DiagGaussian(mb["mean_old"], mb["std_old"])
                kl_new_old = dist.kl(old)
                adv = normalize_adv(mb["adv"]) if hp["norm_adv"] else mb["adv"]
                inner = kl_new_old - (1.0 / hp["tem_lambda"]) * ratio * (
                    adv[:, 0] - nu * adv[:, 1])
                gate = (jax.lax.stop_gradient(kl_new_old) <= hp["eta"])
                loss = jnp.mean(inner * gate)
                return loss, (jnp.mean(kl_new_old), jnp.mean(dist.entropy()))

            (al, (kl, ent)), agrads = jax.value_and_grad(aloss, has_aux=True)(ap)
            aupd, new_aopt = self.actor_tx.update(agrads, aopt, ap)
            new_ap = optax.apply_updates(ap, aupd)

            ap = select_tree(stopped, ap, new_ap)
            aopt = select_tree(stopped, aopt, new_aopt)
            cp = select_tree(stopped, cp, new_cp)
            copt = select_tree(stopped, copt, new_copt)
            gsteps = gsteps + jnp.where(stopped, 0, 1)
            aux = dict(actor_loss=al, vf_total=cl, kl=kl, entropy=ent)
            return (ap, aopt, cp, copt, stopped, gsteps), aux

        def epoch_body(carry, key):
            ap, aopt, cp, copt, stopped, gsteps = carry
            (ap, aopt, cp, copt, stopped, gsteps), auxes = minibatch_scan(
                key, full, hp["n_minibatches"], mb_body,
                (ap, aopt, cp, copt, stopped, gsteps),
                n_blocks=hp["dp_blocks"])
            stopped = jnp.logical_or(stopped,
                                     jnp.mean(auxes["kl"]) > hp["delta"])
            return (ap, aopt, cp, copt, stopped, gsteps), auxes

        keys = jax.random.split(rng, hp["repeat"])
        (ap, aopt, cp, copt, stopped, gsteps), auxes = jax.lax.scan(
            epoch_body,
            (state.params["actor"], state.actor_opt_state,
             state.params["critics"], state.critic_opt_state,
             jnp.zeros((), bool), state.gradient_steps),
            keys,
        )

        metrics = {f"loss/{k}": jnp.mean(v) for k, v in auxes.items()}
        metrics["loss/nu_value"] = nu
        metrics["loss/nu_loss"] = loss_nu
        metrics["update/early_stopped"] = stopped.astype(jnp.float32)

        new_state = FOCOPSState(
            params={"actor": ap, "critics": cp},
            actor_opt_state=aopt, critic_opt_state=copt, nu=nu,
            last_ep_cost=jnp.where(n_episodes > 0, ep_cost_mean,
                                   state.last_ep_cost),
            update_count=state.update_count + 1, gradient_steps=gsteps,
        )
        return new_state, metrics
