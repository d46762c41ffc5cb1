"""Actor-critic networks (flax), MXU-first.

Design notes (TPU):
- activations in bfloat16, params in float32 (matmuls hit the MXU in bf16,
  the optimizer state stays fp32);
- channels padded to multiples of the 128-lane register width;
- NHWC layout (XLA's native conv layout on TPU);
- obs dtypes follow the env specs (uint8 images are normalized on-device,
  so HBM traffic from the env to the net is 1 byte/pixel).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SokobanCNN(nn.Module):
  """Conv actor-critic for [B, 3, D, D] uint8 sokoban observations.

  Architecture in the spirit of the DRC/ResNet baselines used on boxoban;
  compute dtype bfloat16.
  """

  num_actions: int = 4
  channels: Sequence[int] = (128, 128, 128)
  dtype: jnp.dtype = jnp.bfloat16

  @nn.compact
  def __call__(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    x = obs.astype(self.dtype) / 255.0
    x = jnp.transpose(x, (0, 2, 3, 1))  # CHW -> HWC
    for ch in self.channels:
      x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
      x = nn.relu(x)
    x = x.reshape(x.shape[0], -1)
    x = nn.Dense(256, dtype=self.dtype)(x)
    x = nn.relu(x)
    logits = nn.Dense(self.num_actions, dtype=jnp.float32)(x)
    value = nn.Dense(1, dtype=jnp.float32)(x)[..., 0]
    return logits, value


class AtariCNN(nn.Module):
  """Nature-CNN actor-critic for [B, stack, 84, 84] uint8 frames.

  Mirrors the reference's example network
  (``envpool/atari/atari_network.py``) with TPU dtypes/layout.
  """

  num_actions: int
  dtype: jnp.dtype = jnp.bfloat16

  @nn.compact
  def __call__(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    x = obs.astype(self.dtype) / 255.0
    x = jnp.transpose(x, (0, 2, 3, 1))
    x = nn.relu(nn.Conv(32, (8, 8), (4, 4), dtype=self.dtype)(x))
    x = nn.relu(nn.Conv(64, (4, 4), (2, 2), dtype=self.dtype)(x))
    x = nn.relu(nn.Conv(64, (3, 3), (1, 1), dtype=self.dtype)(x))
    x = x.reshape(x.shape[0], -1)
    x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
    logits = nn.Dense(self.num_actions, dtype=jnp.float32)(x)
    value = nn.Dense(1, dtype=jnp.float32)(x)[..., 0]
    return logits, value


class MLPActorCritic(nn.Module):
  """MLP actor-critic for low-dimensional observations (classic control)."""

  num_actions: int
  hidden: Sequence[int] = (256, 256)
  dtype: jnp.dtype = jnp.bfloat16

  @nn.compact
  def __call__(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    x = obs.astype(self.dtype)
    for h in self.hidden:
      x = nn.tanh(nn.Dense(h, dtype=self.dtype)(x))
    logits = nn.Dense(self.num_actions, dtype=jnp.float32)(x)
    value = nn.Dense(1, dtype=jnp.float32)(x)[..., 0]
    return logits, value


class GaussianMLPActorCritic(nn.Module):
  """MLP actor-critic with a diagonal-Gaussian policy head (continuous
  control: the on-device MuJoCo tier). Returns ((mean, log_std), value);
  log_std is a state-independent learnable vector (cleanrl convention).
  """

  action_dim: int
  hidden: Sequence[int] = (256, 256)
  dtype: jnp.dtype = jnp.bfloat16

  @nn.compact
  def __call__(
    self, obs: jax.Array
  ) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    x = obs.astype(self.dtype)
    for h in self.hidden:
      x = nn.tanh(nn.Dense(h, dtype=self.dtype)(x))
    mean = nn.Dense(self.action_dim, dtype=jnp.float32)(x)
    log_std = self.param(
      "log_std", nn.initializers.zeros, (self.action_dim,), jnp.float32
    )
    value = nn.Dense(1, dtype=jnp.float32)(x)[..., 0]
    return (mean, jnp.broadcast_to(log_std, mean.shape)), value
