"""Micro-benchmark: the three GAE implementations on the current backend.

    python benchmarks/bench_gae.py [T] [N] [K]

Compares sequential ``lax.scan``, log-depth associative scan, and the Pallas
single-pass kernel (TPU only) and checks numerical agreement.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fsrl_tpu.ops.gae import gae_advantages, gae_advantages_pscan


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    rng = np.random.RandomState(0)
    m = jnp.asarray(rng.randn(T, N, K), jnp.float32)
    v = jnp.asarray(rng.randn(T, N, K), jnp.float32)
    vn = jnp.asarray(rng.randn(T, N, K), jnp.float32)
    end = jnp.asarray(rng.rand(T, N) < 0.02)

    impls = {
        "scan": jax.jit(lambda *a: gae_advantages(*a, 0.99, 0.95)),
        "pscan": jax.jit(lambda *a: gae_advantages_pscan(*a, 0.99, 0.95)),
    }
    if jax.devices()[0].platform == "tpu":
        from fsrl_tpu.ops.pallas_gae import gae_advantages_pallas
        impls["pallas"] = jax.jit(
            lambda *a: gae_advantages_pallas(*a, 0.99, 0.95))

    ref = None
    nbytes = T * N * K * 4
    print(f"GAE (T={T}, N={N}, K={K}) on {jax.devices()[0].platform}; "
          f"payload {3 * nbytes / 1e6:.1f} MB")
    for name, fn in impls.items():
        dt, out = timeit(fn, m, v, vn, end)
        adv = np.asarray(out[0])
        if ref is None:
            ref = adv
            err = 0.0
        else:
            err = float(np.max(np.abs(adv - ref)))
        bw = 3 * nbytes / dt / 1e9
        print(f"  {name:7s} {dt * 1e6:9.1f} us   {bw:7.1f} GB/s   "
              f"max|Δ| vs scan: {err:.2e}")


if __name__ == "__main__":
    main()
