"""Compute kernels (reference numba/torch internals): GAE and n-step scans,
PID Lagrangian, conjugate gradient / Fisher-vector products, Welford stats."""
