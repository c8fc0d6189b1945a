"""Off-policy throughput benchmark: sustained env-steps/s of the fused
collect + scanned-update iteration for SAC-Lag / DDPG-Lag / CVPO.

The reference schedule (``fsrl/trainer/offpolicy.py:93-106``) performs
``round(update_per_step * collected_steps)`` gradient steps of ``batch_size``
samples per collect; this harness keeps that update:env-step ratio while
sweeping the collect width, so numbers are directly comparable to the
reference's ~2k env-steps/s on 4 CPUs (README.md:56).

Usage:
    python benchmarks/bench_offpolicy.py [--algos sacl,ddpgl,cvpo]
        [--n_envs 32] [--T 100] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def bench_one(key: str, n_envs: int, T: int, iters: int,
              update_per_step: float, batch_size: int,
              fuse_iters: int = 8) -> dict:
    from fsrl_tpu.agent import CVPOAgent, DDPGLagAgent, SACLagAgent
    from fsrl_tpu.trainer.trainer import OffpolicyTrainerTPU, decache

    agent_cls = {"sacl": SACLagAgent, "ddpgl": DDPGLagAgent,
                 "cvpo": CVPOAgent}[key]
    kw = {} if key != "sacl" else {}
    agent = agent_cls("SafetyBallCircle-v0", cost_limit=25.0, seed=0, **kw)
    # iters counts FUSED dispatches when fuse_iters>1 (each = fuse_iters
    # collect+update cycles); throughput accounting scales below
    tr = OffpolicyTrainerTPU(
        agent.algo, agent.env, agent.logger, cost_limit=25.0, seed=0,
        n_envs=n_envs, steps_per_collect=T, update_per_step=update_per_step,
        epochs=1, step_per_epoch=10 ** 9, verbose=False, log_every=10 ** 9,
        update_chunk=256, fuse_iters=fuse_iters,
    )
    tr.state = decache(agent.state)
    # warmup/compile
    for _ in range(2):
        tr._run_iter()
    jax.block_until_ready(tr.state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        tr._run_iter()
    jax.block_until_ready(tr.state.params)
    dt = time.perf_counter() - t0
    steps = iters * T * n_envs * tr.fuse_iters
    return {
        "algo": key, "n_envs": n_envs, "T": T, "fuse_iters": tr.fuse_iters,
        "update_per_step": update_per_step,
        "updates_per_collect": tr.n_updates,
        "env_steps_per_s": round(steps / dt, 1),
        "vs_fsrl_2k": round(steps / dt / 2000.0, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--algos", default="sacl,ddpgl,cvpo")
    p.add_argument("--n_envs", type=int, default=32)
    p.add_argument("--T", type=int, default=100)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--update_per_step", type=float, default=0.2)
    p.add_argument("--batch_size", type=int, default=256)
    args = p.parse_args()
    for key in args.algos.split(","):
        r = bench_one(key, args.n_envs, args.T, args.iters,
                      args.update_per_step, args.batch_size)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
