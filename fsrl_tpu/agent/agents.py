"""Agent layer: algorithm factories + convenience learn/evaluate (reference L4,
``fsrl/agent/``). Each agent builds its algorithm with the reference's default
recipe (net sizes, learning rates, PID gains — per-agent citations below) and
wires the matching trainer, exactly like ``BaseAgent.learn``
(``fsrl/agent/base_agent.py:108-324``): train/test envs, buffer by env kind,
``stop_fn = reward > threshold and cost < limit``, checkpoint hook.
"""

from __future__ import annotations

from typing import Optional, Union

import jax

from fsrl_tpu.algos.cpo import CPO
from fsrl_tpu.algos.cvpo import CVPO
from fsrl_tpu.algos.ddpg_lag import DDPGLag
from fsrl_tpu.algos.focops import FOCOPS
from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.algos.ppo_lag_rnn import RecurrentPPOLag
from fsrl_tpu.algos.sac_lag import SACLag
from fsrl_tpu.algos.trpo_lag import TRPOLag
from fsrl_tpu.data.collector import evaluate
from fsrl_tpu.envs.base import SafeEnv, make
from fsrl_tpu.trainer.trainer import OffpolicyTrainerTPU, OnpolicyTrainerTPU
from fsrl_tpu.utils.logger import BaseLogger, DummyLogger


class BaseAgentTPU:
    """Policy factory + convenience ``learn``/``evaluate``, mirroring the
    reference ``BaseAgent`` API (``fsrl/agent/base_agent.py:14-93``)."""

    name = "BaseAgent"
    algo_cls = None
    onpolicy = True

    def __init__(
        self,
        env: Union[str, SafeEnv],
        logger: Optional[BaseLogger] = None,
        cost_limit: float = 10.0,
        seed: int = 10,
        **algo_kwargs,
    ):
        self.env = make(env) if isinstance(env, str) else env
        self.logger = logger or DummyLogger()
        self.cost_limit = cost_limit
        self.seed = seed
        self.algo = self._build_algo(cost_limit, **algo_kwargs)
        # jit the init: eagerly building params issues hundreds of tiny
        # device ops, which costs ~a minute through a tunneled TPU; one
        # compiled program is seconds (and caches across seeds)
        self.state = jax.jit(self.algo.init)(jax.random.PRNGKey(seed))
        self.trainer = None

    # algorithms that support M>1 constraints (CPO/FOCOPS are single-constraint
    # in the reference too — cpo.py uses advs[..., 1] only)
    multi_constraint = True

    def _build_algo(self, cost_limit, **kw):
        import inspect
        if self.multi_constraint:
            kw.setdefault("num_costs", self.env.num_costs)
        params = inspect.signature(self.algo_cls.__init__).parameters
        if "episode_len" in params:
            # lets process_rollout bound the truncation-bootstrap rows and
            # run the GAE critic in one (T+1)-row pass instead of two
            kw.setdefault("episode_len", self.env.max_episode_steps)
        return self.algo_cls(self.env.observation_size, self.env.action_size,
                             cost_limit=cost_limit, **kw)

    # ------------------------------------------------------------------
    def learn(
        self,
        epochs: int = 100,
        step_per_epoch: int = 10000,
        n_envs: int = 20,
        steps_per_collect: int = 125,
        episode_per_test: int = 10,
        save_model_interval: int = 4,
        reward_threshold: Optional[float] = None,
        buffer_size: int = 100000,
        update_per_step: float = 0.2,
        mesh=None,
        verbose: bool = False,
        **trainer_kwargs,   # e.g. fuse_iters / update_chunk / log_every
    ) -> dict:
        stop_fn = None
        if reward_threshold is not None:
            import numpy as _np
            limit = float(_np.sum(self.cost_limit))
            stop_fn = lambda rew, cost: rew > reward_threshold and cost < limit
        common = dict(
            epochs=epochs, step_per_epoch=step_per_epoch, n_envs=n_envs,
            steps_per_collect=steps_per_collect,
            episode_per_test=episode_per_test, cost_limit=self.cost_limit,
            save_model_interval=save_model_interval, stop_fn=stop_fn,
            mesh=mesh, seed=self.seed, verbose=verbose, **trainer_kwargs,
        )
        if self.onpolicy:
            self.trainer = OnpolicyTrainerTPU(self.algo, self.env, self.logger,
                                              **common)
        else:
            self.trainer = OffpolicyTrainerTPU(
                self.algo, self.env, self.logger, buffer_size=buffer_size,
                update_per_step=update_per_step, **common)
        from fsrl_tpu.trainer.trainer import decache
        self.trainer.state = decache(self.state)
        info = self.trainer.run()
        self.state = self.trainer.state
        return info

    def evaluate(self, n_episodes: int = 10, state=None, seed: int = 0
                 ) -> tuple[float, float, float]:
        """Returns (mean reward, mean length, mean cost) — the reference eval
        triple (``base_agent.py:53-88``)."""
        st = state if state is not None else self.state
        cache = getattr(self, "_eval_cache", {})
        if n_episodes not in cache:
            ih = getattr(self.algo, "init_hidden", None)
            cache[n_episodes] = jax.jit(
                lambda p, r: evaluate(self.env, self.algo.act_fn_eval, p, r,
                                      n_episodes, init_hidden=ih))
            self._eval_cache = cache
        out = jax.device_get(cache[n_episodes](st.params,
                                               jax.random.PRNGKey(seed)))
        return float(out["reward"]), float(out["length"]), float(out["cost"])


class PPOLagAgent(BaseAgentTPU):
    """Defaults: ``fsrl/agent/ppo_lag_agent.py`` (Net(128,128), joint Adam
    lr=5e-4, PID (0.05, 0.0005, 0.1))."""
    name = "PPOLagAgent"
    algo_cls = PPOLag
    onpolicy = True


class RecurrentPPOLagAgent(BaseAgentTPU):
    """GRU-actor PPO-Lagrangian trained with truncated BPTT — beyond-parity
    (the reference plumbs RNN hidden state through its collector,
    ``fast_collector.py:154-163``, but ships no recurrent training)."""
    name = "RecurrentPPOLagAgent"
    algo_cls = RecurrentPPOLag
    onpolicy = True


class TRPOLagAgent(BaseAgentTPU):
    """Defaults: ``fsrl/agent/trpo_lag_agent.py`` (target_kl=0.001, 20 critic
    iters, whole-batch natural gradient)."""
    name = "TRPOLagAgent"
    algo_cls = TRPOLag
    onpolicy = True


class CPOAgent(BaseAgentTPU):
    """Defaults: ``fsrl/agent/cpo_agent.py`` (target_kl=0.01, lr=1e-3, 10
    critic iters)."""
    name = "CPOAgent"
    algo_cls = CPO
    onpolicy = True
    multi_constraint = False


class FOCOPSAgent(BaseAgentTPU):
    """Defaults: ``fsrl/agent/focops_agent.py`` (auto-nu (2.0, 1e-2, 0.01))."""
    name = "FOCOPSAgent"
    algo_cls = FOCOPS
    onpolicy = True
    multi_constraint = False


class DDPGLagAgent(BaseAgentTPU):
    """Defaults: ``fsrl/agent/ddpg_lag_agent.py`` (n_step=3, tau=0.005, PID
    (0.5, 0.001, 0.1))."""
    name = "DDPGLagAgent"
    algo_cls = DDPGLag
    onpolicy = False


class SACLagAgent(BaseAgentTPU):
    """Defaults: ``fsrl/agent/sac_lag_agent.py`` (double critics, auto-alpha,
    conditioned sigma, stochastic eval)."""
    name = "SACLagAgent"
    algo_cls = SACLag
    onpolicy = False


class CVPOAgent(BaseAgentTPU):
    """Defaults: ``fsrl/agent/cvpo_agent.py`` (gamma=0.98, K=16 particles,
    E/M-step duals; requires the env's max_episode_steps for the qc
    threshold, cvpo_agent.py:136-138)."""
    name = "CVPOAgent"
    algo_cls = CVPO
    onpolicy = False

    def _build_algo(self, cost_limit, **kw):
        kw.setdefault("max_episode_steps", self.env.max_episode_steps)
        kw.setdefault("num_costs", self.env.num_costs)
        return CVPO(self.env.observation_size, self.env.action_size,
                    cost_limit=cost_limit, **kw)
