"""On-device RL training loops (counterpart of the reference's examples/)."""

from .ppo import PPOConfig, make_ppo_train_step, ppo_init

__all__ = ["PPOConfig", "make_ppo_train_step", "ppo_init"]
