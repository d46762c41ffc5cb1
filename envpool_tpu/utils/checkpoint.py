"""Checkpoint/resume for env-pool state.

The reference CANNOT checkpoint env state — it lives in opaque C++ objects
(SURVEY §5.4). In this build the pool state is a JAX pytree, so snapshots
are plain array trees; these helpers persist them with orbax when
available, falling back to numpy archives.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_pool_state(pool: Any, path: str) -> None:
  """Persist a TpuEnvPool's full on-device state to ``path``."""
  state = pool.save_state()
  try:
    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
  except Exception:
    flat, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path + ".npz", "wb") as f:
      np.savez(f, *[np.asarray(x) for x in flat])
    with open(path + ".treedef", "wb") as f:
      pickle.dump(treedef, f)


def load_pool_state(pool: Any, path: str) -> None:
  """Restore a snapshot produced by ``save_pool_state`` into ``pool``."""
  try:
    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    state = ckpt.restore(os.path.abspath(path))
    pool.load_state(state)
    return
  except Exception:
    pass
  with open(path + ".npz", "rb") as f:
    data = np.load(f)
    flat = [data[k] for k in data.files]
  with open(path + ".treedef", "rb") as f:
    treedef = pickle.load(f)
  pool.load_state(jax.tree_util.tree_unflatten(treedef, flat))
