"""Sharded env execution over a device mesh.

TPU-native counterpart of the reference's NUMA-sharded pools
(``envpool/core/async_envpool.h:131-142``, ``benchmark/README.md:151-160``,
one pool per NUMA node): instead of pinning worker threads to cores, the
``[num_envs, ...]`` state pytree is sharded over the ``env`` axis of a
``jax.sharding.Mesh`` and the whole advance is ONE pjit-compiled SPMD
program — each chip steps its shard, cross-chip traffic only appears if a
consumer requests a different sharding (XLA then emits all-gathers on ICI).

Multi-host: the same program runs under ``jax.distributed`` with each
process feeding its addressable shard; per-host actions/states use
``jax.make_array_from_single_device_arrays``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from envpool_tpu.core.env_spec import EnvSpec
from envpool_tpu.core.pool import PoolState, TpuEnvPool


def initialize_distributed(**kwargs: Any) -> None:
  """Multi-host entry: thin wrapper over ``jax.distributed.initialize``.

  The reference has no multi-node layer at all (SURVEY §1); this is the
  added capability: call once per host process before building pools.
  """
  jax.distributed.initialize(**kwargs)


def make_mesh(
  n_devices: Optional[int] = None,
  axis_name: str = "env",
  devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
  """Build a 1-D device mesh with a single env-sharding axis."""
  if devices is None:
    devices = jax.devices()
    if n_devices is not None:
      devices = devices[:n_devices]
  return Mesh(np.asarray(devices), (axis_name,))


class ShardedEnvPool(TpuEnvPool):
  """TpuEnvPool whose state/outputs are sharded over a mesh's env axis.

  The env axis size must divide num_envs. All the host-facing API
  (send/recv/step/reset, dialects) is inherited unchanged — only the
  placement of the compiled programs differs.
  """

  def __init__(self, spec: EnvSpec, mesh: Optional[Mesh] = None,
               axis_name: str = "env") -> None:
    self._mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    self._axis_name = axis_name
    n_shards = int(np.prod(self._mesh.devices.shape))
    if int(spec.config.num_envs) % n_shards != 0:
      raise ValueError(
        f"num_envs={spec.config.num_envs} must be divisible by the mesh "
        f"size {n_shards}"
      )
    super().__init__(spec)
    self._reshard()

  # shardings ---------------------------------------------------------------

  def _sharding(self, batched: bool = True) -> NamedSharding:
    spec = P(self._axis_name) if batched else P()
    return NamedSharding(self._mesh, spec)

  def _reshard(self) -> None:
    """Re-jit the engine entry points with env-axis shardings and move the
    current state onto the mesh."""
    shard = self._sharding()

    def state_shardings(ps: PoolState) -> PoolState:
      return jax.tree_util.tree_map(lambda _: shard, ps)

    ps_shard = state_shardings(self._state)
    out_shard = [shard] * len(self._state_keys)
    adv = self._jit_advance_full.__wrapped__
    rst = self._jit_reset_all.__wrapped__
    self._jit_advance_full = jax.jit(
      adv,
      donate_argnums=0,
      in_shardings=(ps_shard, {k: shard for k in self._env_action_keys}),
      out_shardings=(ps_shard, out_shard),
    )
    self._jit_reset_all = jax.jit(
      rst,
      donate_argnums=0,
      in_shardings=(ps_shard,),
      out_shardings=(ps_shard, out_shard),
    )
    # masked/cohort paths involve data-dependent gathers; leave their
    # placement to the compiler (still correct, used by async mode only).
    self._state = jax.device_put(self._state, ps_shard)

  # in-jit rollout ----------------------------------------------------------

  def rollout(
    self,
    policy_fn: Callable[[Any, Tuple[jax.Array, ...]], Any],
    policy_state: Any,
    num_steps: int,
  ) -> Tuple[Any, Any]:
    """Run ``num_steps`` fully on device: scan(policy -> step) on the mesh.

    ``policy_fn(policy_state, state_list) -> (policy_state, action)`` must be
    jittable. Returns (final XlaHandle pool state, stacked state lists).
    This is the TPU replacement for the reference's async send/recv loop —
    zero host involvement per step (contrast ``envpool/core/xla.h:132-209``,
    which does a host round-trip per step).
    """
    handle0, recv, send, step_fn = self.xla()

    def body(carry, _):
      handle, pstate = carry
      _, states = recv(handle)
      pstate, action = policy_fn(pstate, states)
      handle = send(handle, action)
      return (handle, pstate), states

    (handle, policy_state), traj = jax.lax.scan(
      body, (handle0, policy_state), None, length=num_steps
    )
    return (handle, policy_state), traj
