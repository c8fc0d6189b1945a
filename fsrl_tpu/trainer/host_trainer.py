"""Host-environment training loop.

Trains any of the algorithms against REAL external Gymnasium environments
(MuJoCo velocity tasks, Bullet-Safety-Gym, anything emitting ``info["cost"]``)
— the reference's primary execution mode (host envs + device learner,
SURVEY.md §3.1). The device-native path (``trainer.py``) is the fast path;
this one exists for parity validation and for environments that cannot be
expressed in JAX.

Structure: the policy forward is jitted and batched over envs; the env steps
run on host threads; each collected (T, N) segment is shipped to device once
and fed to the same jitted ``algo.update`` used by the native path.

Host-inference fast path: the per-step policy forward is dispatched to the
process's LOCAL CPU jax device (params copied host-side once per collect,
re-used for all T steps) rather than the accelerator. Through a tunneled TPU
every act_fn call is otherwise a blocking ~24 ms round trip — 500-step
collects cap the loop at ~2k env-steps/s regardless of model size, while an
MLP forward on local CPU is ~100 us. Updates still run on the accelerator.
"""

from __future__ import annotations

import os.path as osp
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.envs.host_env import HostCollector, HostVectorEnv
from fsrl_tpu.trainer.trainer import decache, perf_is_better
from fsrl_tpu.types import Transition
from fsrl_tpu.utils.checkpoint import save_checkpoint
from fsrl_tpu.utils.logger import BaseLogger, DummyLogger


class HostOnpolicyTrainer:
    """On-policy trainer over host (CPU gymnasium) envs: host rollout with
    local-CPU inference fast path + jitted whole-segment update — used for
    the real-MuJoCo velocity suite."""

    def __init__(
        self,
        algo,
        venv: HostVectorEnv,
        test_venv: Optional[HostVectorEnv] = None,
        logger: Optional[BaseLogger] = None,
        *,
        epochs: int = 100,
        step_per_epoch: int = 10000,
        steps_per_collect: int = 500,
        episode_per_test: int = 4,
        cost_limit: float = 10.0,
        save_model_interval: int = 4,
        stop_fn: Optional[Callable[[float, float], bool]] = None,
        seed: int = 0,
        verbose: bool = True,
    ):
        self.algo, self.venv = algo, venv
        self.test_venv = test_venv or venv
        self.logger = logger or DummyLogger()
        self.epochs, self.step_per_epoch = epochs, step_per_epoch
        self.T = steps_per_collect
        self.episode_per_test = episode_per_test
        self.cost_limit = cost_limit
        self.save_model_interval = save_model_interval
        self.stop_fn = stop_fn
        self.verbose = verbose

        self.rng = jax.random.PRNGKey(seed)
        self.rng, k = jax.random.split(self.rng)
        if type(self) is HostOnpolicyTrainer:
            assert hasattr(algo, "update"), (
                f"{type(algo).__name__} is an off-policy algorithm "
                "(no whole-segment update) — use HostOffpolicyTrainer")
        self.state = decache(algo.init(k))
        self.act_fn = jax.jit(algo.act_fn)
        self.update_fn = jax.jit(algo.update) if hasattr(algo, "update") \
            else None
        # local-CPU inference device (None -> fall back to default device)
        try:
            self._cpu = jax.devices("cpu")[0]
        except RuntimeError:
            self._cpu = None
        if self._cpu is not None and jax.default_backend() == "cpu":
            self._cpu = None   # already local; skip the extra copies
        self._host_params = None
        self.obs = venv.reset(seed=seed)
        self.ep_r = np.zeros(venv.n)
        self.ep_c = np.zeros(venv.n)
        self.epoch = 0
        self.env_step = 0
        self.best_rew, self.best_cost = -np.inf, np.inf
        self.has_best = False
        self.start_time = time.time()
        self.collector = HostCollector(self.test_venv)

    # ------------------------------------------------------------------
    def _inference_params(self):
        """CPU-resident param copy for per-step inference; refreshed lazily
        after every update (one device->host transfer per collect, not one
        blocking accelerator round trip per env step)."""
        if self._cpu is None:
            return self.state.params
        if self._host_params is None:
            self._host_params = jax.device_put(self.state.params, self._cpu)
        return self._host_params

    def _inference_key(self):
        """Split one collect-scoped key onto the CPU device so the per-step
        splits/sampling stay local."""
        self.rng, k = jax.random.split(self.rng)
        return jax.device_put(k, self._cpu) if self._cpu is not None else k

    def collect_segment(self):
        """T host steps across N envs → (Transition, mean episodic cost,
        n episodes)."""
        venv, T, N = self.venv, self.T, self.venv.n
        obs_l, act_l, obsn_l, rew_l, cost_l, term_l, trunc_l, logp_l = \
            ([] for _ in range(8))
        sum_c, n_ep = 0.0, 0
        params = self._inference_params()
        kc = self._inference_key()
        for _ in range(T):
            kc, k = jax.random.split(kc)
            # numpy obs: placed directly on the execution device by jit
            act, logp = self.act_fn(
                params, np.asarray(self.obs, np.float32), k)
            act = np.asarray(act)
            scaled = venv.action_low + (venv.action_high - venv.action_low) * \
                (np.clip(act, -1, 1) + 1.0) / 2.0
            obs_n, rew, cost, term, trunc = venv.step(scaled)
            obs_l.append(self.obs); act_l.append(act); obsn_l.append(obs_n)
            rew_l.append(rew); cost_l.append(cost)
            term_l.append(term); trunc_l.append(trunc)
            logp_l.append(np.asarray(logp))
            self.ep_r += rew
            self.ep_c += cost
            done = term | trunc
            for i in np.nonzero(done)[0]:
                sum_c += self.ep_c[i]
                n_ep += 1
                self.logger.store(tab="train", reward=self.ep_r[i],
                                  cost=self.ep_c[i])
                self.ep_r[i] = self.ep_c[i] = 0.0
                obs_n[i] = venv.reset(ids=[i])[0]
            self.obs = obs_n
        tr = Transition(
            obs=jnp.asarray(np.stack(obs_l)),
            act=jnp.asarray(np.stack(act_l)),
            obs_next=jnp.asarray(np.stack(obsn_l)),
            reward=jnp.asarray(np.stack(rew_l), jnp.float32),
            cost=jnp.asarray(np.stack(cost_l), jnp.float32)[..., None],
            terminated=jnp.asarray(np.stack(term_l)),
            truncated=jnp.asarray(np.stack(trunc_l)),
            logp=jnp.asarray(np.stack(logp_l)),
        )
        mean_c = jnp.asarray([sum_c / max(n_ep, 1)], jnp.float32)
        return tr, mean_c, jnp.asarray(n_ep, jnp.int32)

    # ------------------------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self):
        if self.epoch >= self.epochs:
            raise StopIteration
        self.epoch += 1
        steps = 0
        while steps < self.step_per_epoch:
            tr, mean_c, n_ep = self.collect_segment()
            self.rng, k = jax.random.split(self.rng)
            self.state, metrics = self.update_fn(self.state, tr, mean_c,
                                                 n_ep, k)
            self._host_params = None   # refresh inference copy next collect
            steps += self.T * self.venv.n
            self.env_step += self.T * self.venv.n

        stats = self.collector.collect(
            jax.jit(self.algo.act_fn_eval), self._inference_params(),
            self.episode_per_test, self._inference_key())
        rew, cost = stats["rew"], stats["cost"]
        self.logger.store(tab="test", reward=rew, cost=cost,
                          length=stats["len"])
        if perf_is_better(rew, cost, self.best_rew, self.best_cost,
                          self.cost_limit) or not self.has_best:
            self.best_rew, self.best_cost = rew, cost
            self.has_best = True
            if self.logger.log_dir:
                save_checkpoint(osp.join(self.logger.log_dir, "checkpoint",
                                         "model_best"), self.state)
        dur = time.time() - self.start_time
        info = dict(epoch=self.epoch, env_step=self.env_step,
                    best_reward=self.best_rew, best_cost=self.best_cost,
                    test_reward=rew, test_cost=cost,
                    speed=self.env_step / max(dur, 1e-9))
        epoch_stats = dict(self.logger.stats_mean())
        self.logger.write(self.env_step, display=self.verbose)
        if self.stop_fn and self.stop_fn(self.best_rew, self.best_cost):
            self.epoch = self.epochs
        return self.epoch, epoch_stats, info

    def run(self) -> dict:
        info = {}
        for _, _, info in self:
            pass
        return info


class HostOffpolicyTrainer(HostOnpolicyTrainer):
    """Off-policy variant of the host-env loop: segments append into the
    device ring buffer; ``round(update_per_step * collected)`` sampled-
    minibatch gradient steps per collect (reference
    ``fsrl/trainer/offpolicy.py:93-106``)."""

    def __init__(self, algo, venv, test_venv=None, logger=None, *,
                 buffer_size: int = 100000, update_per_step: float = 0.2,
                 steps_per_collect: int = 100, **kwargs):
        from fsrl_tpu.data.buffer import ReplayBuffer
        assert hasattr(algo, "update_step"), (
            f"{type(algo).__name__} is an on-policy algorithm "
            "(no update_step) — use HostOnpolicyTrainer")
        super().__init__(algo, venv, test_venv, logger,
                         steps_per_collect=steps_per_collect, **kwargs)
        self.buffer = ReplayBuffer(
            capacity_per_env=max(buffer_size // venv.n, steps_per_collect),
            n_envs=venv.n)
        self.buf_state = decache(self.buffer.init(
            venv.observation_size, venv.action_size, venv.num_costs))
        self.n_updates = max(1, int(round(
            update_per_step * steps_per_collect * venv.n)))
        algo_ = algo
        buffer = self.buffer
        has_pre = hasattr(algo_, "pre_update")
        has_post = hasattr(algo_, "post_update")

        def update_block(state, buf_state, mean_c, n_ep, rng):
            if hasattr(algo_, "update_lagrangian"):
                state = algo_.update_lagrangian(state, mean_c, n_ep)
            if has_pre:
                state = algo_.pre_update(state)

            def upd(s, key):
                return algo_.update_step(s, buffer, buf_state, key)

            state, ms = jax.lax.scan(
                upd, state, jax.random.split(rng, self.n_updates))
            if has_post:
                state = algo_.post_update(state)
            return state, jax.tree.map(lambda x: x[-1], ms)

        self.update_block = jax.jit(update_block, donate_argnums=(0,))

    def __next__(self):
        if self.epoch >= self.epochs:
            raise StopIteration
        self.epoch += 1
        steps = 0
        while steps < self.step_per_epoch:
            tr, mean_c, n_ep = self.collect_segment()
            self.buf_state = self.buffer.add_segment(self.buf_state, tr)
            self.rng, k = jax.random.split(self.rng)
            self.state, metrics = self.update_block(
                self.state, self.buf_state, mean_c, n_ep, k)
            self._host_params = None   # refresh inference copy next collect
            steps += self.T * self.venv.n
            self.env_step += self.T * self.venv.n

        stats = self.collector.collect(
            jax.jit(self.algo.act_fn_eval), self._inference_params(),
            self.episode_per_test, self._inference_key())
        rew, cost = stats["rew"], stats["cost"]
        self.logger.store(tab="test", reward=rew, cost=cost,
                          length=stats["len"])
        if perf_is_better(rew, cost, self.best_rew, self.best_cost,
                          self.cost_limit) or not self.has_best:
            self.best_rew, self.best_cost = rew, cost
            self.has_best = True
            if self.logger.log_dir:
                save_checkpoint(osp.join(self.logger.log_dir, "checkpoint",
                                         "model_best"), self.state)
        dur = time.time() - self.start_time
        info = dict(epoch=self.epoch, env_step=self.env_step,
                    best_reward=self.best_rew, best_cost=self.best_cost,
                    test_reward=rew, test_cost=cost,
                    speed=self.env_step / max(dur, 1e-9))
        epoch_stats = dict(self.logger.stats_mean())
        self.logger.write(self.env_step, display=self.verbose)
        if self.stop_fn and self.stop_fn(self.best_rew, self.best_cost):
            self.epoch = self.epochs
        return self.epoch, epoch_stats, info
