"""In-jit env stepping (counterpart of ``examples/xla_step.py``).

The reference's XLA interface threads an envpool handle through custom
calls with a host round-trip per step; here the entire rollout stays
compiled on-device: ``env.xla()`` returns pure (handle, recv, send, step)
and ``lax.scan`` runs the loop inside one XLA program.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp

import envpool_tpu


def main() -> None:
  num_envs = 4096
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=num_envs, seed=0)
  env.reset()
  handle, recv, send, step = env.xla()

  def policy(states):
    # a trivial "policy": push right when the pole leans right
    obs = states[env._state_keys.index("obs")]
    return (obs[:, 2] > 0).astype(jnp.int32)

  def rollout(handle, num_steps: int):
    def body(handle, _):
      handle, states = recv(handle)
      action = policy(states)
      handle = send(handle, action)
      return handle, states[env._state_keys.index("reward")]

    return jax.lax.scan(body, handle, None, length=num_steps)

  handle, rewards = jax.jit(rollout, static_argnums=1)(handle, 1000)
  print("mean reward per step:", float(jnp.mean(rewards)))


if __name__ == "__main__":
  main()
