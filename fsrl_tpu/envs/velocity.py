"""Safety-Gymnasium velocity-constrained MuJoCo tasks (host path).

The reference's velocity suite (``docs/tutorials/benchmark.rst:47-78``):
standard MuJoCo locomotion with a safety cost ``1[x_velocity > limit]``.
True MuJoCo physics cannot run on-device in this image (no mjx), so these are
HOST envs: real gymnasium MuJoCo dynamics + a cost wrapper emitting
``info["cost"]``, consumed through :class:`fsrl_tpu.envs.host_env.HostVectorEnv`.

Velocity thresholds are the published safety-gymnasium values (calibrated as
50% of an unconstrained PPO expert's speed).
"""

from __future__ import annotations


# published safety-gymnasium velocity limits (m/s)
VELOCITY_LIMITS = {
    "SafetyHalfCheetahVelocity-v1": ("HalfCheetah-v5", 3.2096),
    "SafetyHopperVelocity-v1": ("Hopper-v5", 0.7402),
    "SafetyWalker2dVelocity-v1": ("Walker2d-v5", 2.3415),
    "SafetySwimmerVelocity-v1": ("Swimmer-v5", 0.2282),
    "SafetyAntVelocity-v1": ("Ant-v5", 2.6222),
    "SafetyHumanoidVelocity-v1": ("Humanoid-v5", 1.4149),
}


def make_velocity_env(task: str):
    """Build one host velocity env; returns a gymnasium env whose
    ``info["cost"]`` mirrors the Safety-Gymnasium velocity constraint."""
    import gymnasium as gym

    base, limit = VELOCITY_LIMITS[task]

    class VelocityCostWrapper(gym.Wrapper):
        def step(self, action):
            obs, rew, term, trunc, info = self.env.step(action)
            vel = info.get("x_velocity", 0.0)
            info["cost"] = float(abs(vel) > limit)
            info["velocity"] = vel
            return obs, rew, term, trunc, info

    return VelocityCostWrapper(gym.make(base))


def make_velocity_vector_env(task: str, n_envs: int = 10):
    """HostVectorEnv over n_envs instances of a velocity task."""
    from fsrl_tpu.envs.host_env import HostVectorEnv
    return HostVectorEnv([lambda: make_velocity_env(task)
                          for _ in range(n_envs)])


def velocity_tasks() -> list[str]:
    """Available Safety-Gymnasium velocity task names (host MuJoCo)."""
    return sorted(VELOCITY_LIMITS)
