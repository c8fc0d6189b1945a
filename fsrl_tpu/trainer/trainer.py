"""Trainer layer: epoch-driven training loops (reference L3, ``fsrl/trainer/``).

Structure mirrors the reference ``BaseTrainer``/``OnpolicyTrainer``/
``OffpolicyTrainer`` semantics — epoch iterator, collect→update inner loop until
``step_per_epoch``, periodic test, feasibility-first best-checkpoint rule,
``stop_fn`` early stop, speed counters (``base_trainer.py:177-356``) — but the
whole collect+update inner step is ONE jitted XLA program (rollout scan + policy
update fused), and the host loop only orchestrates epochs, logging and
checkpoints.

Multi-chip: pass a ``jax.sharding.Mesh``; env state is sharded across the
``dp`` axis, params replicated, and GSPMD inserts the gradient/stat all-reduces
(see ``fsrl_tpu/parallel/mesh.py``).
"""

from __future__ import annotations

import os.path as osp
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.data.buffer import ReplayBuffer
from fsrl_tpu.data.collector import evaluate, make_rollout_fn
from fsrl_tpu.envs.base import SafeEnv
from fsrl_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_state
from fsrl_tpu.types import EpisodeStats
from fsrl_tpu.utils.checkpoint import save_checkpoint
from fsrl_tpu.utils.logger import BaseLogger, DummyLogger


def decache(tree):
    """Force every leaf onto its own buffer. jit constant-folding dedupes
    identical zero arrays, so freshly-initialized pytrees can alias leaves
    (e.g. the PID state's three zero vectors) — fatal with donate_argnums
    ("attempt to donate the same buffer twice")."""
    return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)


def perf_is_better(new_rew, new_cost, old_rew, old_cost, cost_limit) -> bool:
    """Feasibility-first comparison (reference ``base_trainer.py:247-262``):
    a feasible policy (every cost <= its limit) beats any infeasible one;
    within the same feasibility class higher reward wins. ``cost_limit`` may be
    a scalar or per-constraint list; scalar costs compare against the sum."""
    limit = np.atleast_1d(np.asarray(cost_limit, dtype=float))
    def feasible(c):
        c = np.atleast_1d(np.asarray(c, dtype=float))
        if c.shape != limit.shape:
            return float(np.sum(c)) <= float(np.sum(limit))
        return bool(np.all(c <= limit))
    new_feas, old_feas = feasible(new_cost), feasible(old_cost)
    if new_feas and not old_feas:
        return True
    if old_feas and not new_feas:
        return False
    return new_rew > old_rew


class BaseTrainerTPU:
    """Epoch-iterator trainer skeleton (reference ``BaseTrainer``,
    ``base_trainer.py:177-245``): inner loop of jitted train iterations to
    ``step_per_epoch``, then episode-exact test, feasibility-first best
    checkpointing, ``stop_fn`` early stop, and speed counters."""

    def __init__(
        self,
        algo,
        env: SafeEnv,
        logger: Optional[BaseLogger] = None,
        *,
        epochs: int = 100,
        step_per_epoch: int = 10000,
        n_envs: int = 20,
        steps_per_collect: int = 125,
        episode_per_test: int = 10,
        cost_limit: float = 10.0,
        save_model_interval: int = 1,
        stop_fn: Optional[Callable[[float, float], bool]] = None,
        mesh=None,
        use_default_mesh: bool = False,
        seed: int = 0,
        verbose: bool = True,
        resume_from: Optional[str] = None,
        log_every: int = 1,
    ):
        self.algo, self.env = algo, env
        self.logger = logger or DummyLogger()
        self.epochs, self.step_per_epoch = epochs, step_per_epoch
        self.n_envs, self.T = n_envs, steps_per_collect
        self.episode_per_test = episode_per_test
        self.cost_limit = cost_limit
        self.save_model_interval = save_model_interval
        self.stop_fn = stop_fn
        self.verbose = verbose
        # fetch train metrics to host every log_every collect iterations.
        # Each _log_train is a blocking device_get (~24 ms through a TPU
        # tunnel); with small collects that sync dominates wall clock, and
        # log_every>1 lets iterations queue asynchronously between fetches.
        self.log_every = max(1, int(log_every))
        self._iter_count = 0
        self.mesh = mesh or (make_mesh() if use_default_mesh else None)

        self.rng = jax.random.PRNGKey(seed)
        self.rng, k_init, k_env = jax.random.split(self.rng, 3)
        self.state = decache(algo.init(k_init))
        # staggered episode clocks: steady episodic-cost measurements for the
        # PID multiplier instead of lockstep truncation bursts
        self.env_state = decache(env.reset_vec(k_env, n_envs, stagger=True))
        self.stats = decache(EpisodeStats.init(n_envs, env.num_costs))
        if self.mesh is not None:
            self.env_state = shard_env_state(self.mesh, self.env_state)
            self.state = replicate_tree(self.mesh, self.state)
            self.stats = shard_env_state(self.mesh, self.stats)

        self.epoch = 0
        self.env_step = 0
        if resume_from:
            # restore the full TrainState + step counters (the reference's
            # resume_from_log is an unfinished TODO, base_trainer.py:160-164;
            # here the one-pytree state makes it trivial)
            from fsrl_tpu.utils.checkpoint import load_checkpoint
            self.state = load_checkpoint(resume_from, self.state)
            epoch, env_step, _ = self.logger.restore_data()
            self.epoch, self.env_step = epoch, env_step
        self.best_rew, self.best_cost = -np.inf, np.inf
        self.has_best = False
        self.start_time = time.time()
        self.collect_time = 0.0
        _ih = getattr(algo, "init_hidden", None)   # recurrent eval support
        self.test_fn = jax.jit(
            lambda params, rng: evaluate(env, algo.act_fn_eval, params, rng,
                                         episode_per_test, init_hidden=_ih))
        self._build()  # subclass: builds self.train_iter

    # ------------------------------------------------------------------
    def _build(self):
        raise NotImplementedError

    def _params(self):
        return self.state.params

    # ------------------------------------------------------------------
    def test_step(self) -> tuple[float, float, float]:
        self.rng, k = jax.random.split(self.rng)
        out = jax.device_get(self.test_fn(self._params(), k))  # one transfer
        rew = float(out["reward"]); cost = float(out["cost"])
        length = float(out["length"])
        self.logger.store(tab="test", reward=rew, cost=cost, length=length)
        return rew, cost, length

    def checkpoint(self):
        if self.logger.log_dir:
            save_checkpoint(
                osp.join(self.logger.log_dir, "checkpoint", "model"), self.state)

    def checkpoint_best(self):
        if self.logger.log_dir:
            save_checkpoint(
                osp.join(self.logger.log_dir, "checkpoint", "model_best"),
                self.state)

    # ------------------------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self):
        if self.epoch >= self.epochs:
            raise StopIteration
        self.epoch += 1
        t0 = time.time()
        steps_this_epoch = 0
        steps_per_iter = self.T * self.n_envs * getattr(self, "fuse_iters", 1)
        while steps_this_epoch < self.step_per_epoch:
            metrics = self._run_iter()
            steps_this_epoch += steps_per_iter
            self.env_step += steps_per_iter
        self.collect_time += time.time() - t0

        rew, cost, length = self.test_step()
        if perf_is_better(rew, cost, self.best_rew, self.best_cost,
                          self.cost_limit) or not self.has_best:
            self.best_rew, self.best_cost = rew, cost
            self.has_best = True
            self.checkpoint_best()
        if self.epoch % self.save_model_interval == 0:
            self.checkpoint()

        dur = time.time() - self.start_time
        speed = self.env_step / max(dur, 1e-9)
        grad_steps = getattr(self.state, "gradient_steps", None)
        self.logger.store(
            tab="update", env_step=self.env_step, speed=speed, duration=dur,
            epoch=self.epoch,
            gradient_step=0 if grad_steps is None else int(
                jax.device_get(grad_steps)))
        info = dict(epoch=self.epoch, env_step=self.env_step,
                    best_reward=self.best_rew, best_cost=self.best_cost,
                    test_reward=rew, test_cost=cost, test_length=length,
                    speed=speed)
        epoch_stats = dict(self.logger.stats_mean())
        self.logger.write(self.env_step, display=self.verbose)

        stop = bool(self.stop_fn and self.stop_fn(self.best_rew, self.best_cost))
        if stop:
            self.epoch = self.epochs  # exhaust
        return self.epoch, epoch_stats, info

    def run(self) -> dict:
        info = {}
        for _, _, info in self:
            pass
        return info

    # shared metric push
    def _log_train(self, stats: EpisodeStats, metrics: dict):
        self._iter_count += 1
        if self._iter_count % self.log_every:
            return  # skip the blocking device_get; iterations queue async
        # ONE device->host transfer for everything: per-scalar float() calls
        # each pay a full device roundtrip (24+ ms through a TPU tunnel),
        # which capped the whole trainer loop at ~10k env-steps/s.
        host = jax.device_get({
            "n_ep": stats.n_episodes, "rew": stats.mean_reward,
            "cost": jnp.sum(stats.mean_cost), "len": stats.mean_length,
            "metrics": metrics,
        })
        n_ep = int(host["n_ep"])
        if n_ep > 0:
            self.logger.store(
                tab="train",
                reward=float(host["rew"]),
                cost=float(host["cost"]),
                length=float(host["len"]),
                num_episodes=n_ep,
            )
        for k, v in host["metrics"].items():
            try:
                val = float(v)
            except (TypeError, ValueError):
                continue
            if "/" in k:
                tab, name = k.split("/", 1)
                self.logger.store(tab=tab, **{name: val})
            else:
                self.logger.store(**{k: val})


class OnpolicyTrainerTPU(BaseTrainerTPU):
    """collect segment → PID pre-update → whole-segment policy update →
    (implicit) buffer reset: the reference on-policy schedule
    (``fsrl/trainer/onpolicy.py:92-110``) with the collect+update fused in jit.

    Recurrent algorithms (``algo.init_hidden`` present, e.g.
    :class:`fsrl_tpu.algos.ppo_lag_rnn.RecurrentPPOLag`) are handled
    transparently: the hidden state carries across collect segments and the
    BPTT update receives the segment-start carry.

    ``fuse_iters=k`` wraps k collect+update iterations in ONE jitted
    ``lax.scan`` program, so per-dispatch latency (the measured bound on the
    fused step — bench.py roofline: ~21 ms dispatched vs ~4 ms HBM lower
    bound) is amortized k-fold. Semantically identical to k sequential
    iterations; train metrics/stats surface from the last iteration of each
    dispatch (set ``log_every`` accordingly)."""

    def __init__(self, *args, fuse_iters: int = 1, rollout_unroll: int = 1,
                 **kwargs):
        self.fuse_iters = max(1, int(fuse_iters))
        # lax.scan unroll for the rollout loop: replicates the step body in
        # the compiled loop, amortizing per-iteration overhead when the
        # rollout is latency-bound (measured in benchmarks/bench_phases.py)
        self.rollout_unroll = max(1, int(rollout_unroll))
        super().__init__(*args, **kwargs)

    def _build(self):
        assert hasattr(self.algo, "update"), (
            f"{type(self.algo).__name__} has no whole-segment update — "
            "use OffpolicyTrainerTPU")
        algo = self.algo
        self.recurrent = hasattr(algo, "init_hidden")
        if self.recurrent:
            rollout = make_rollout_fn(self.env, algo.act_fn, self.T,
                                      init_hidden=algo.init_hidden)
            self.hidden = decache(algo.init_hidden(self.n_envs))
            if self.mesh is not None:
                self.hidden = shard_env_state(self.mesh, self.hidden)

            def train_iter(state, env_state, stats, hidden, rng):
                rng, k1, k2 = jax.random.split(rng, 3)
                res = rollout(state.params, env_state,
                              stats.reset_aggregates(), k1, hidden=hidden)
                state, metrics = algo.update(
                    state, res.transitions, res.init_hidden,
                    res.stats.mean_cost, res.stats.n_episodes, k2)
                return (state, res.env_state, res.stats, res.hidden, rng,
                        metrics)

            self.train_iter = jax.jit(train_iter, donate_argnums=(0, 1, 2, 3))
        else:
            rollout = make_rollout_fn(self.env, algo.act_fn, self.T,
                                      unroll=self.rollout_unroll)

            def train_iter(state, env_state, stats, rng):
                rng, k1, k2 = jax.random.split(rng, 3)
                res = rollout(state.params, env_state,
                              stats.reset_aggregates(), k1)
                state, metrics = algo.update(
                    state, res.transitions, res.stats.mean_cost,
                    res.stats.n_episodes, k2)
                return state, res.env_state, res.stats, rng, metrics

            if self.fuse_iters > 1:
                def train_iter_fused(state, env_state, stats, rng):
                    def body(carry, _):
                        state, env_state, stats, rng = carry
                        state, env_state, stats, rng, metrics = train_iter(
                            state, env_state, stats, rng)
                        return (state, env_state, stats, rng), metrics

                    (state, env_state, stats, rng), ms = jax.lax.scan(
                        body, (state, env_state, stats, rng), None,
                        length=self.fuse_iters)
                    return state, env_state, stats, rng, jax.tree.map(
                        lambda x: x[-1], ms)

                self.train_iter = jax.jit(train_iter_fused,
                                          donate_argnums=(0, 1, 2))
            else:
                self.train_iter = jax.jit(train_iter, donate_argnums=(0, 1, 2))

    def _run_iter(self):
        if self.recurrent:
            (self.state, self.env_state, self.stats, self.hidden, self.rng,
             metrics) = self.train_iter(self.state, self.env_state, self.stats,
                                        self.hidden, self.rng)
        else:
            self.state, self.env_state, self.stats, self.rng, metrics = \
                self.train_iter(self.state, self.env_state, self.stats,
                                self.rng)
        self._log_train(self.stats, metrics)
        return metrics


class OffpolicyTrainerTPU(BaseTrainerTPU):
    """collect segment → PID pre-update → ``round(update_per_step * steps)``
    sampled-minibatch gradient steps against the persistent ring buffer
    (``fsrl/trainer/offpolicy.py:93-106``).

    Dispatch structure: ONE jitted collect program (rollout + buffer append +
    PID/pre hooks + n-step view build) plus a jitted ``update_chunk`` program
    scanning ``update_chunk`` gradient steps, dispatched ceil(n_updates/chunk)
    times per collect. A single fused rollout+scan(n_updates) graph is
    avoided deliberately: at the reference schedule (e.g. 160 updates per
    800-step collect) that monolith took XLA ~5 minutes to compile on TPU,
    while the chunked programs compile in seconds and the host-side chunk
    loop costs nothing — dispatches are async and only the metric fetch
    (every ``log_every`` collects) synchronizes.

    With ``fuse_iters=k`` (k collect+update cycles in one jitted scan) the
    semantics match k sequential cycles, but — as in the on-policy trainer —
    train metrics/stats surface only from the LAST cycle of each dispatch:
    each collect resets the episode aggregates, so roughly (k-1)/k of
    finished training episodes never reach the ``train/`` tab and epoch
    train reward/cost means are a 1/k subsample. Test-tab curves are
    unaffected (evaluation is episode-exact)."""

    def __init__(self, *args, buffer_size: int = 100000,
                 update_per_step: float = 0.2, update_chunk: int = 32,
                 fuse_iters: int = 1, **kwargs):
        self.buffer_size = buffer_size
        self.update_per_step = update_per_step
        self.update_chunk = update_chunk
        # fuse_iters=k wraps k (collect + update chunks) cycles in ONE jitted
        # scan — same dispatch-amortization trick as the on-policy trainer.
        # Essential through a high-latency TPU tunnel, where per-dispatch
        # round trips otherwise dominate (each collect is only T*n_envs steps).
        self.fuse_iters = max(1, int(fuse_iters))
        super().__init__(*args, **kwargs)

    def _build(self):
        from functools import partial

        env, algo = self.env, self.algo
        assert hasattr(algo, "update_step"), (
            f"{type(algo).__name__} has no update_step — "
            "use OnpolicyTrainerTPU")
        self.buffer = ReplayBuffer(
            capacity_per_env=max(self.buffer_size // self.n_envs, self.T),
            n_envs=self.n_envs)
        self.buf_state = decache(self.buffer.init(
            env.observation_size, env.action_size, env.num_costs))
        if self.mesh is not None:
            # buffer rows live with their env's shard: axis 1 = env axis
            from jax.sharding import NamedSharding, PartitionSpec as P
            def place(x):
                spec = P(*( [None, "dp"] + [None] * (x.ndim - 2)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))
            self.buf_state = self.buf_state.replace(
                data=jax.tree.map(place, self.buf_state.data))
        self.n_updates = max(1, int(round(
            self.update_per_step * self.T * self.n_envs)))
        chunk = max(1, min(self.n_updates, self.update_chunk))
        self.chunk_sizes = [chunk] * (self.n_updates // chunk)
        if self.n_updates % chunk:
            self.chunk_sizes.append(self.n_updates % chunk)
        rollout = make_rollout_fn(env, algo.act_fn, self.T)
        buffer = self.buffer
        has_pre = hasattr(algo, "pre_update")        # CVPO-style hooks
        has_lag = hasattr(algo, "update_lagrangian")

        from fsrl_tpu.algos.offpolicy_base import make_nstep_view

        def collect_fn(state, env_state, stats, buf_state, rng):
            rng, k1 = jax.random.split(rng)
            res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
            buf_state = buffer.add_segment(buf_state, res.transitions)
            if has_lag:
                state = algo.update_lagrangian(
                    state, res.stats.mean_cost, res.stats.n_episodes)
            if has_pre:
                state = algo.pre_update(state)
            view = make_nstep_view(buffer, buf_state)   # once per collect
            return state, res.env_state, res.stats, buf_state, view, rng

        def update_chunk_fn(state, buf_state, view, rng, n):
            def upd(s, key):
                return algo.update_step(s, buffer, buf_state, key, view=view)
            state, ms = jax.lax.scan(upd, state, jax.random.split(rng, n))
            return state, jax.tree.map(lambda x: x[-1], ms)

        self.collect_fn = jax.jit(collect_fn, donate_argnums=(0, 1, 2, 3))
        self.update_chunk_fns = {
            n: jax.jit(partial(update_chunk_fn, n=n), donate_argnums=(0,))
            for n in set(self.chunk_sizes)}
        self.post_fn = (jax.jit(algo.post_update, donate_argnums=(0,))
                        if hasattr(algo, "post_update") else None)

        if self.fuse_iters > 1:
            chunk_sizes = self.chunk_sizes

            def cycle_body(carry, _):
                state, env_state, stats, buf_state, rng = carry
                state, env_state, stats, buf_state, view, rng = collect_fn(
                    state, env_state, stats, buf_state, rng)
                rng, k = jax.random.split(rng)
                keys = jax.random.split(k, len(chunk_sizes))
                metrics = {}
                for i, n in enumerate(chunk_sizes):
                    state, metrics = update_chunk_fn(
                        state, buf_state, view, keys[i], n)
                if hasattr(algo, "post_update"):
                    state = algo.post_update(state)
                return (state, env_state, stats, buf_state, rng), metrics

            def fused(state, env_state, stats, buf_state, rng):
                (state, env_state, stats, buf_state, rng), ms = jax.lax.scan(
                    cycle_body, (state, env_state, stats, buf_state, rng),
                    None, length=self.fuse_iters)
                return state, env_state, stats, buf_state, rng, jax.tree.map(
                    lambda x: x[-1], ms)

            self.fused_fn = jax.jit(fused, donate_argnums=(0, 1, 2, 3))

    def _run_iter(self):
        if self.fuse_iters > 1:
            (self.state, self.env_state, self.stats, self.buf_state,
             self.rng, metrics) = self.fused_fn(
                self.state, self.env_state, self.stats, self.buf_state,
                self.rng)
            self._log_train(self.stats, metrics)
            return metrics
        (self.state, self.env_state, self.stats, self.buf_state, view,
         self.rng) = self.collect_fn(self.state, self.env_state, self.stats,
                                     self.buf_state, self.rng)
        self.rng, k = jax.random.split(self.rng)
        keys = jax.random.split(k, len(self.chunk_sizes))
        metrics = {}
        for i, n in enumerate(self.chunk_sizes):
            self.state, metrics = self.update_chunk_fns[n](
                self.state, self.buf_state, view, keys[i])
        if self.post_fn is not None:
            self.state = self.post_fn(self.state)
        self._log_train(self.stats, metrics)
        return metrics


def onpolicy_trainer(*args, **kwargs) -> dict:
    """Functional wrapper (reference ``fsrl/trainer/onpolicy.py:113-120``)."""
    return OnpolicyTrainerTPU(*args, **kwargs).run()


def offpolicy_trainer(*args, **kwargs) -> dict:
    """Functional wrapper (reference ``fsrl/trainer/offpolicy.py:109-116``)."""
    return OffpolicyTrainerTPU(*args, **kwargs).run()
