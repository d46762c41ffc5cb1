"""PPO, fully on-device, sharded over a mesh.

The reference trains PPO through the host: C++ pool -> numpy -> torch
(``examples/ppo_atari/ppo.py``). Here the ENTIRE iteration — rollout
(lax.scan over the env advance), GAE, minibatched clipped-surrogate update —
is one jitted SPMD program: envs are data-parallel over the mesh ``env``
axis, parameters are replicated, and XLA emits the gradient all-reduce over
ICI. Nothing touches the host between iterations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from envpool_tpu.core.pool import TpuEnvPool, XlaHandle


def _gauss_logp(x, mean, log_std):
  """Diagonal-Gaussian log-density, summed over the action dim."""
  z = (x - mean) * jnp.exp(-log_std)
  return jnp.sum(
    -0.5 * jnp.square(z) - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1
  )


@dataclasses.dataclass(frozen=True)
class PPOConfig:
  num_steps: int = 32          # rollout length T
  continuous: bool = False     # diagonal-Gaussian policy (net returns
                               # ((mean, log_std), value)); actions f32
  gamma: float = 0.99
  gae_lambda: float = 0.95
  clip_eps: float = 0.2
  vf_coef: float = 0.5
  ent_coef: float = 0.01
  lr: float = 2.5e-4
  update_epochs: int = 2
  num_minibatches: int = 4
  max_grad_norm: float = 0.5


class PPOState(NamedTuple):
  handle: Any          # XlaHandle — on-device pool state
  params: Any
  opt_state: Any
  key: jax.Array


def ppo_init(
  pool: TpuEnvPool,
  net: Any,
  cfg: PPOConfig,
  seed: int = 0,
) -> Tuple[PPOState, optax.GradientTransformation]:
  """Initialize params/optimizer and capture the pool's xla handle."""
  handle, _, _, _ = pool.xla()
  obs_spec = pool.spec.state_array_spec["obs"]
  dummy_obs = jnp.zeros(
    (int(pool.config["batch_size"]), *obs_spec.static_shape), obs_spec.dtype
  )
  key = jax.random.PRNGKey(seed)
  key, sub = jax.random.split(key)
  params = net.init(sub, dummy_obs)
  tx = optax.chain(
    optax.clip_by_global_norm(cfg.max_grad_norm),
    optax.adam(cfg.lr),
  )
  opt_state = tx.init(params)
  return PPOState(handle, params, opt_state, key), tx


def make_ppo_train_step(
  pool: TpuEnvPool,
  net: Any,
  cfg: PPOConfig,
  tx: optax.GradientTransformation,
  mesh: Optional[Mesh] = None,
  axis_name: str = "env",
  model_axis: Optional[str] = None,
) -> Callable[[PPOState], Tuple[PPOState, dict]]:
  """Build the jitted one-iteration training step.

  With ``mesh`` given, observations/actions are constrained to the env
  axis (data parallelism over envs); parameters are replicated, or — when
  ``model_axis`` names a second mesh axis — dense kernels are sharded
  over it (tensor parallelism: XLA inserts the activation collectives).
  Pass the result through ``jax.jit`` exactly once.
  """
  _, recv, send, _ = pool.xla()
  obs_idx = pool._state_keys.index("obs")
  rew_idx = pool._state_keys.index("reward")
  done_idx = pool._state_keys.index("done")

  if mesh is not None:
    batch_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def constrain_batch(x):
      return jax.lax.with_sharding_constraint(x, batch_sharding)

    def _param_sharding(x):
      if model_axis is not None and x.ndim >= 2:
        # shard the output-features dim of dense/conv kernels over the
        # model axis (megatron-style column parallelism)
        spec = [None] * (x.ndim - 1) + [model_axis]
        return NamedSharding(mesh, P(*spec))
      return replicated

    def constrain_replicated(tree):
      return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, _param_sharding(x)),
        tree,
      )
  else:
    def constrain_batch(x):
      return x

    def constrain_replicated(tree):
      return tree

  def _sample(params, obs, key):
    """-> (action, logp) under the configured policy family."""
    out, value = net.apply(params, obs)
    if cfg.continuous:
      mean, log_std = out
      std = jnp.exp(log_std)
      action = mean + std * jax.random.normal(key, mean.shape)
      logp = _gauss_logp(action, mean, log_std)
    else:
      action = jax.random.categorical(key, out)
      logp = jax.nn.log_softmax(out)[jnp.arange(out.shape[0]), action]
    return action, logp, value

  def rollout(handle: XlaHandle, params: Any, key: jax.Array):
    def body(carry, _):
      handle, key = carry
      _, states = recv(handle)
      obs = constrain_batch(states[obs_idx])
      key, sub = jax.random.split(key)
      action, logp, value = _sample(params, obs, sub)
      handle = send(
        handle,
        action.astype(jnp.float32 if cfg.continuous else jnp.int32),
      )
      _, nxt = recv(handle)
      transition = {
        "obs": obs,
        "action": action,
        "logp": logp,
        "value": value,
        "reward": nxt[rew_idx],
        "done": nxt[done_idx],
      }
      return (handle, key), transition

    (handle, key), traj = jax.lax.scan(
      body, (handle, key), None, length=cfg.num_steps
    )
    # bootstrap value for the final observation
    _, states = recv(handle)
    _, last_value = net.apply(params, constrain_batch(states[obs_idx]))
    return handle, key, traj, last_value

  def compute_gae(traj: dict, last_value: jax.Array):
    def body(carry, t):
      gae, next_value = carry
      not_done = 1.0 - t["done"].astype(jnp.float32)
      delta = (
        t["reward"] + cfg.gamma * next_value * not_done - t["value"]
      )
      gae = delta + cfg.gamma * cfg.gae_lambda * not_done * gae
      return (gae, t["value"]), gae

    (_, _), adv = jax.lax.scan(
      body,
      (jnp.zeros_like(last_value), last_value),
      traj,
      reverse=True,
    )
    returns = adv + traj["value"]
    return adv, returns

  def loss_fn(params, batch):
    out, value = net.apply(params, batch["obs"])
    if cfg.continuous:
      mean, log_std = out
      logp = _gauss_logp(batch["action"], mean, log_std)
      entropy = jnp.sum(
        log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1
      ).mean()
    else:
      logp_all = jax.nn.log_softmax(out)
      logp = logp_all[jnp.arange(out.shape[0]), batch["action"]]
      entropy = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
    ratio = jnp.exp(logp - batch["logp"])
    adv = batch["adv"]
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg1 = ratio * adv
    pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
    pg_loss = -jnp.minimum(pg1, pg2).mean()
    v_loss = 0.5 * jnp.square(value - batch["returns"]).mean()
    total = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * entropy
    return total, {
      "pg_loss": pg_loss, "v_loss": v_loss, "entropy": entropy
    }

  def train_step(state: PPOState) -> Tuple[PPOState, dict]:
    handle, key, traj, last_value = rollout(
      state.handle, state.params, state.key
    )
    adv, returns = compute_gae(traj, last_value)
    flat = {
      "obs": traj["obs"].reshape(-1, *traj["obs"].shape[2:]),
      "action": traj["action"].reshape(
        -1, *traj["action"].shape[2:]
      ) if cfg.continuous else traj["action"].reshape(-1),
      "logp": traj["logp"].reshape(-1),
      "adv": adv.reshape(-1),
      "returns": returns.reshape(-1),
    }
    n = flat["logp"].shape[0]
    mb = n // cfg.num_minibatches
    params, opt_state = state.params, state.opt_state

    def epoch(carry, _):
      params, opt_state, key = carry
      key, sub = jax.random.split(key)
      perm = jax.random.permutation(sub, n)
      shuffled = jax.tree_util.tree_map(lambda x: x[perm], flat)

      def minibatch(carry, i):
        params, opt_state = carry
        batch = jax.tree_util.tree_map(
          lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb), shuffled
        )
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
          params, batch
        )
        grads = constrain_replicated(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = constrain_replicated(optax.apply_updates(params, updates))
        return (params, opt_state), aux

      (params, opt_state), aux = jax.lax.scan(
        minibatch, (params, opt_state), jnp.arange(cfg.num_minibatches)
      )
      return (params, opt_state, key), aux

    (params, opt_state, key), aux = jax.lax.scan(
      epoch, (params, opt_state, key), None, length=cfg.update_epochs
    )
    metrics = {
      k: v.mean() for k, v in aux.items()
    }
    metrics["mean_reward"] = traj["reward"].mean()
    return PPOState(handle, params, opt_state, key), metrics

  return train_step
