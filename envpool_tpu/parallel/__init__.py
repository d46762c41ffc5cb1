"""Device-mesh parallelism for envpool_tpu.

The reference's parallelism is thread-level inside one process (SURVEY §2.2);
here it is SPMD over a ``jax.sharding.Mesh``: the env batch axis is sharded
across chips, XLA emits the ICI collectives, and multi-host runs reuse the
same program under ``jax.distributed``.
"""

from .sharded import (
  ShardedEnvPool,
  make_mesh,
  initialize_distributed,
)

__all__ = ["ShardedEnvPool", "make_mesh", "initialize_distributed"]
