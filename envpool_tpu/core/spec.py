"""Array / environment schema specs.

TPU-native re-design of the reference spec system:
- reference: compile-time C++ ``Spec<D>`` with dtype+shape+bounds
  (``envpool/core/spec.h:37-110``) surfaced to Python as ``ArraySpec``
  (``envpool/python/protocol.py:100-124``).
- here: a plain Python dataclass carrying the same information. Shapes may
  contain a leading ``-1`` meaning "dynamic per-player dimension", exactly as
  in the reference; the pool folds it to the batch dimension for
  single-player envs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import numpy as np

__all__ = ["ArraySpec", "spec_like", "zeros_from_spec"]


@dataclasses.dataclass
class ArraySpec:
  """dtype + shape + bounds description of one state/action field.

  Mirrors the reference ``ArraySpec`` (``envpool/python/protocol.py:100-124``):
  ``minimum``/``maximum`` may be scalars or (element-wise) arrays.
  """

  dtype: Any
  shape: Tuple[int, ...]
  minimum: Any = None
  maximum: Any = None

  def __post_init__(self) -> None:
    self.dtype = np.dtype(self.dtype)
    self.shape = tuple(int(s) for s in self.shape)
    if self.minimum is None:
      self.minimum = _default_min(self.dtype)
    if self.maximum is None:
      self.maximum = _default_max(self.dtype)
    if isinstance(self.minimum, (list, tuple, np.ndarray)):
      self.minimum = np.asarray(self.minimum, dtype=self.dtype)
    if isinstance(self.maximum, (list, tuple, np.ndarray)):
      self.maximum = np.asarray(self.maximum, dtype=self.dtype)

  @property
  def static_shape(self) -> Tuple[int, ...]:
    """Shape with dynamic (-1) player dims removed."""
    return tuple(s for s in self.shape if s != -1)

  def __repr__(self) -> str:
    return (
      f"ArraySpec(shape={list(self.shape)}, dtype={self.dtype}, "
      f"minimum={self.minimum}, maximum={self.maximum})"
    )


def _default_min(dtype: np.dtype) -> Any:
  if dtype == np.bool_:
    return False
  if np.issubdtype(dtype, np.floating):
    return float(np.finfo(dtype).min)
  return int(np.iinfo(dtype).min)


def _default_max(dtype: np.dtype) -> Any:
  if dtype == np.bool_:
    return True
  if np.issubdtype(dtype, np.floating):
    return float(np.finfo(dtype).max)
  return int(np.iinfo(dtype).max)


def spec_like(dtype: Any, shape: Tuple[int, ...], low: Any = None,
              high: Any = None) -> ArraySpec:
  """Shorthand constructor."""
  return ArraySpec(dtype, shape, low, high)


def zeros_from_spec(spec: ArraySpec, batch: int) -> np.ndarray:
  """Allocate a zero-filled batched host array for a spec."""
  return np.zeros((batch, *spec.static_shape), dtype=spec.dtype)
