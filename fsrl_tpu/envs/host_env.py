"""Host (Gymnasium) environment adapter + episode-exact host collector.

The primary path of this framework is JAX-native on-device envs; this module is
the parity escape hatch (SURVEY.md §7.2): run REAL external envs
(Bullet-Safety-Gym / Safety-Gymnasium / any Gymnasium env that reports its
safety signal via ``info["cost"]``) behind the same cost-aware API so learned
policies and learning curves can be validated against the true simulators.

``HostVectorEnv`` replaces the reference's Dummy/Subproc/ShmemVectorEnv family
(Tianshou workers selected by config string, SURVEY.md §2.9): a thread pool is
the right tool here because MuJoCo/Bullet steps release the GIL, giving
Shmem-like throughput without process plumbing.

``HostCollector`` reproduces ``FastCollector``'s episode-count-exact collection
(``fsrl/data/fast_collector.py:192-232``) including the surplus-env masking for
unbiased n_episode statistics (``fast_collector.py:355-363``).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence

import numpy as np


class HostVectorEnv:
    """Thread-pooled vectorized host (gymnasium) env — the escape hatch for
    real-physics envs (reference Shmem/SubprocVectorEnv analog; threads
    instead of processes because MuJoCo releases the GIL)."""

    def __init__(self, env_fns: Sequence[Callable], num_threads: int = 8):
        self.envs = [fn() for fn in env_fns]
        self.n = len(self.envs)
        self.pool = ThreadPoolExecutor(max_workers=min(num_threads, self.n))
        space = self.envs[0].observation_space
        self.observation_size = int(np.prod(space.shape))
        aspace = self.envs[0].action_space
        self.discrete = not hasattr(aspace, "low")
        self.action_size = int(np.prod(aspace.shape)) if aspace.shape else 1
        self.action_low = np.asarray(getattr(aspace, "low", 0.0))
        self.action_high = np.asarray(
            getattr(aspace, "high", getattr(aspace, "n", 2) - 1))
        spec = getattr(self.envs[0], "spec", None)
        self.max_episode_steps = getattr(spec, "max_episode_steps", None) or 1000
        self.num_costs = 1

    def reset(self, seed: Optional[int] = None, ids: Optional[Sequence[int]] = None
              ) -> np.ndarray:
        ids = range(self.n) if ids is None else ids

        def _reset(i):
            kw = {"seed": seed + i} if seed is not None else {}
            obs, _ = self.envs[i].reset(**kw)
            return np.asarray(obs, np.float32).ravel()

        return np.stack(list(self.pool.map(_reset, ids)))

    def step(self, actions: np.ndarray, ids: Optional[Sequence[int]] = None):
        """Returns (obs, reward, cost, terminated, truncated) over ``ids``.
        Cost is extracted from ``info["cost"]`` exactly like the reference
        (``fast_collector.py:325-327``); missing key → 0."""
        ids = list(range(self.n)) if ids is None else list(ids)
        if self.discrete:
            actions = np.round(np.asarray(actions)).astype(np.int64).ravel()

        def _step(k):
            i = ids[k]
            out = self.envs[i].step(actions[k])
            if len(out) == 5:
                obs, rew, term, trunc, info = out
            else:  # old 4-tuple API compat (fast_collector.py:286-303)
                obs, rew, done, info = out
                trunc = bool(info.get("TimeLimit.truncated", False))
                term = bool(done) and not trunc
            cost = float(info.get("cost", 0.0))
            return (np.asarray(obs, np.float32).ravel(), float(rew), cost,
                    bool(term), bool(trunc))

        res = list(self.pool.map(_step, range(len(ids))))
        obs, rew, cost, term, trunc = map(np.array, zip(*res))
        return obs.astype(np.float32), rew, cost, term, trunc

    def close(self):
        for e in self.envs:
            e.close()


class HostCollector:
    """Episode-exact collection from host envs with a (possibly jitted) policy
    ``act_fn(params, obs_batch, rng) -> (actions, logp)`` in [-1, 1] that gets
    rescaled to the env bounds."""

    def __init__(self, venv: HostVectorEnv):
        self.venv = venv

    def collect(self, act_fn, params, n_episode: int, rng,
                max_steps: Optional[int] = None) -> dict:
        import jax
        venv = self.venv
        N = venv.n
        obs = venv.reset()
        alive = np.ones(N, bool)
        # surplus-env masking: only the first (n_episode mod N) ... reference
        # masks surplus envs so exactly n_episode episodes count, unbiased
        remaining = n_episode
        ep_r = np.zeros(N); ep_c = np.zeros(N); ep_len = np.zeros(N, int)
        R, C, L, n_term, n_trunc = [], [], [], 0, 0
        max_steps = max_steps or (venv.max_episode_steps * (n_episode // N + 2))
        for _ in range(max_steps):
            if remaining <= 0:
                break
            rng, k = jax.random.split(rng)
            act, _ = act_fn(params, obs, k)
            act = np.asarray(act)
            act = np.clip(act, -1.0, 1.0)
            scaled = venv.action_low + (venv.action_high - venv.action_low) * \
                (act + 1.0) / 2.0
            obs_n, rew, cost, term, trunc = venv.step(scaled)
            ep_r += rew * alive
            ep_c += cost * alive
            ep_len += alive.astype(int)
            done = (term | trunc) & alive
            for i in np.nonzero(done)[0]:
                if remaining > 0:
                    R.append(ep_r[i]); C.append(ep_c[i]); L.append(ep_len[i])
                    n_term += int(term[i]); n_trunc += int(trunc[i])
                    remaining -= 1
                ep_r[i] = ep_c[i] = 0.0
                ep_len[i] = 0
                obs_n[i] = self.venv.reset(ids=[i])[0]
                if remaining < int(alive.sum()):
                    # surplus-env masking: stop counting more envs than
                    # episodes still needed (unbiased n_episode stats,
                    # reference fast_collector.py:355-363)
                    alive[i] = False
            obs = obs_n
        return {
            "n/ep": len(R), "n/st": int(np.sum(L)),
            "rew": float(np.mean(R)) if R else 0.0,
            "cost": float(np.mean(C)) if C else 0.0,
            "len": float(np.mean(L)) if L else 0.0,
            "terminated": n_term, "truncated": n_trunc,
        }
