"""Policy/value networks for training on envpool_tpu batches.

The reference ships torch models in its examples tier
(``examples/ppo_atari/``, ``envpool/atari/atari_network.py``); here they are
flax modules designed for the MXU: bfloat16 activations, channel counts in
multiples of 128, NHWC conv layout.
"""

from .nets import (
  AtariCNN, GaussianMLPActorCritic, MLPActorCritic, SokobanCNN,
)

__all__ = [
  "SokobanCNN", "AtariCNN", "MLPActorCritic", "GaussianMLPActorCritic",
]
