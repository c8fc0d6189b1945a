"""Train PPO-Lagrangian on a REAL Safety-Gymnasium-style MuJoCo velocity task
through the host-environment path (true MuJoCo physics, jitted learner)."""

from dataclasses import dataclass

from fsrl_tpu.algos.ppo_lag import PPOLag
from fsrl_tpu.config.cli import cli
from fsrl_tpu.envs.velocity import make_velocity_vector_env, velocity_tasks
from fsrl_tpu.trainer.host_trainer import HostOnpolicyTrainer
from fsrl_tpu.utils.logger import TensorboardLogger


@dataclass
class VelCfg:
    task: str = "SafetyHalfCheetahVelocity-v1"
    cost_limit: float = 25.0
    epochs: int = 100
    step_per_epoch: int = 20000
    n_envs: int = 10
    steps_per_collect: int = 500
    episode_per_test: int = 4
    seed: int = 0
    logdir: str = "logs/velocity"


@cli(VelCfg)
def main(cfg: VelCfg):
    assert cfg.task in velocity_tasks(), f"choose from {velocity_tasks()}"
    venv = make_velocity_vector_env(cfg.task, n_envs=cfg.n_envs)
    algo = PPOLag(venv.observation_size, venv.action_size,
                  cost_limit=cfg.cost_limit)
    logger = TensorboardLogger(cfg.logdir, name=f"ppol-{cfg.task}")
    trainer = HostOnpolicyTrainer(
        algo, venv, logger=logger, epochs=cfg.epochs,
        step_per_epoch=cfg.step_per_epoch,
        steps_per_collect=cfg.steps_per_collect,
        episode_per_test=cfg.episode_per_test, cost_limit=cfg.cost_limit,
        seed=cfg.seed,
    )
    info = trainer.run()
    print("done:", info)
    venv.close()


if __name__ == "__main__":
    main()
