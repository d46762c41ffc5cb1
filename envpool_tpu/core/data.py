# Portions derived from EnvPool (https://github.com/sail-sg/envpool),
# Copyright 2021 Garena Online Private Limited, licensed under the
# Apache License, Version 2.0 (http://www.apache.org/licenses/LICENSE-2.0).
# Modifications Copyright 2026 the envpool_tpu authors, same license.
"""Flat-key <-> tree conversion and RL-API spec/space transforms.

Provenance: ``to_nested_dict``/``to_namedtuple``, the dm/gym/gymnasium spec
transforms (incl. the discrete-space heuristic
``prod(|shape|)==1 && min==0 && max < 2**20``) and the
``dm_structure``/``gym_structure`` treespec builders are adapted from the
reference's backend-agnostic Python layer, ``envpool/python/data.py:31-152``
(Apache-2.0) — this conversion glue has no TPU-specific design to invert,
so it is carried over with local changes (lazy ``gym``/``dm_env`` imports,
a factored ``_is_discrete`` helper, ``ArraySpec`` instead of the pybind
spec tuples). The old ``gym`` package is optional in this build (the
reference imports it unconditionally); its transform raises a clear error
if gym is missing.
"""

from __future__ import annotations

from collections import namedtuple
from typing import Any, Dict, List, Tuple, Type

import numpy as np
import optree

from .spec import ArraySpec

ACTION_THRESHOLD = 2**20


def to_nested_dict(flatten_dict: Dict[str, Any],
                   generator: Type = dict) -> Dict[str, Any]:
  """Convert ``{"a.b": x}`` style flat dicts into ``{"a": {"b": x}}``."""
  ret: Dict[str, Any] = generator()
  for k, v in flatten_dict.items():
    segments = k.split(".")
    ptr = ret
    for s in segments[:-1]:
      if s not in ptr:
        ptr[s] = generator()
      ptr = ptr[s]
    ptr[segments[-1]] = v
  return ret


def to_namedtuple(name: str, hdict: Dict) -> Tuple:
  """Recursively convert a hierarchical dict into a namedtuple."""
  return namedtuple(name, hdict.keys())(
    *[
      to_namedtuple(k, v) if isinstance(v, dict) else v
      for k, v in hdict.items()
    ]
  )


def _is_discrete(spec: ArraySpec) -> bool:
  """Discrete-space heuristic shared by all three dialects."""
  return (
    np.prod(np.abs(spec.shape)) == 1 and np.isclose(spec.minimum, 0) and
    spec.maximum < ACTION_THRESHOLD
  )


def dm_spec_transform(name: str, spec: ArraySpec, spec_type: str) -> Any:
  """ArraySpec -> dm_env specs."""
  import dm_env.specs
  if _is_discrete(spec):
    return dm_env.specs.DiscreteArray(
      name=name,
      dtype=spec.dtype,
      num_values=int(spec.maximum - spec.minimum + 1),
    )
  return dm_env.specs.BoundedArray(
    name=name,
    shape=[s for s in spec.shape if s != -1],
    dtype=spec.dtype,
    minimum=spec.minimum,
    maximum=spec.maximum,
  )


def gym_spec_transform(name: str, spec: ArraySpec, spec_type: str) -> Any:
  """ArraySpec -> (legacy) gym spaces. Requires the optional gym package."""
  try:
    import gym
  except ImportError as e:  # pragma: no cover - env-dependent
    raise ImportError(
      "the legacy `gym` package is not installed; use the gymnasium or "
      "dm_env dialect, or install gym"
    ) from e
  if _is_discrete(spec):
    discrete_range = int(spec.maximum - spec.minimum + 1)
    try:
      return gym.spaces.Discrete(n=discrete_range, start=int(spec.minimum))
    except TypeError:  # old gym has no `start`
      return gym.spaces.Discrete(n=discrete_range)
  return gym.spaces.Box(
    shape=[s for s in spec.shape if s != -1],
    dtype=spec.dtype,
    low=spec.minimum,
    high=spec.maximum,
  )


def gymnasium_spec_transform(name: str, spec: ArraySpec,
                             spec_type: str) -> Any:
  """ArraySpec -> gymnasium spaces."""
  import gymnasium
  if _is_discrete(spec):
    discrete_range = int(spec.maximum - spec.minimum + 1)
    return gymnasium.spaces.Discrete(
      n=discrete_range, start=int(spec.minimum)
    )
  return gymnasium.spaces.Box(
    shape=[s for s in spec.shape if s != -1],
    dtype=spec.dtype,
    low=spec.minimum,
    high=spec.maximum,
  )


def dm_structure(
  root_name: str,
  keys: List[str],
) -> Tuple[List[Tuple[int, ...]], List[int], Any]:
  """Treespec for the dm_env dialect (obs and info merged under the root).

  Same key-rewriting rules as ``envpool/python/data.py:126-147``.
  """
  new_keys = []
  for key in keys:
    if key in ["obs", "info"]:  # single-node obs/info
      key = f"obs:{key}"
    key = key.replace("info:", "obs:")  # merge obs and info together
    key = key.replace("obs:", f"{root_name}:")
    new_keys.append(key.replace(":", "."))
  dict_tree = to_nested_dict(dict(zip(new_keys, list(range(len(new_keys))))))
  structure = to_namedtuple(root_name, dict_tree)
  paths, indices, treespec = optree.tree_flatten_with_path(structure)
  return paths, indices, treespec


def gym_structure(
  keys: List[str]
) -> Tuple[List[Tuple[str, ...]], List[int], Any]:
  """Treespec for the gym/gymnasium dialects (plain nested dict)."""
  keys = [k.replace(":", ".") for k in keys]
  dict_tree = to_nested_dict(dict(zip(keys, list(range(len(keys))))))
  paths, indices, treespec = optree.tree_flatten_with_path(dict_tree)
  return paths, indices, treespec


gymnasium_structure = gym_structure


def check_key_duplication(cls: Any, keytype: str, keys: List[str]) -> None:
  """Raise if any key appears twice in a schema."""
  ukeys, counts = np.unique(np.asarray(keys), return_counts=True)
  if not np.all(counts == 1):
    dup_keys = ukeys[counts > 1]
    raise SystemError(
      f"{cls} schema error. {keytype} keys {list(dup_keys)} are duplicated."
    )
