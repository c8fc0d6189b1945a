"""FSRL-TPU: a TPU-native safe reinforcement learning framework.

A from-scratch JAX/XLA re-design of the capability surface of liuzuxin/FSRL
(constrained RL: PPO/TRPO/DDPG/SAC-Lagrangian, CPO, FOCOPS, CVPO) built for TPU:
on-device vectorized environments stepped under ``lax.scan``, device-resident
buffers with first-class cost channels, fully jitted policy + multiplier updates,
and ``jax.sharding``-based scaling across chips.
"""

__version__ = "0.1.0"
