"""Native (C++) components, loaded via ctypes.

The reference keeps its performance-critical host-side code native
(``envpool/sokoban/level_loader.cc``, ``sokoban_node.cc``); here the same
tier is a small C++ library compiled on first use with the system g++ and
bound through ctypes (no pybind11). Everything has a pure-Python fallback,
so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sokoban_native.cpp")
_LIB = os.path.join(_DIR, "libsokoban.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
  try:
    subprocess.run(
      ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
      check=True, capture_output=True, timeout=120,
    )
    return True
  except Exception:
    return False


def _load() -> Optional[ctypes.CDLL]:
  global _lib, _tried
  with _lock:
    if _lib is not None or _tried:
      return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
      os.path.exists(_SRC)
      and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
      if not _build():
        return None
    try:
      lib = ctypes.CDLL(_LIB)
    except OSError:
      return None
    lib.sokoban_parse_file.restype = ctypes.c_int
    lib.sokoban_parse_file.argtypes = [
      ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
      ctypes.c_int,
    ]
    lib.sokoban_solve.restype = ctypes.c_int
    lib.sokoban_solve.argtypes = [
      ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
      ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.sokoban_last_error.restype = ctypes.c_char_p
    _lib = lib
    return _lib


def available() -> bool:
  return _load() is not None


def parse_file(path: str, dim: int,
               max_levels: int = 100_000) -> Optional[np.ndarray]:
  """Parse a level file natively -> [n, dim, dim] uint8, or None."""
  lib = _load()
  if lib is None:
    return None
  out = np.empty((max_levels, dim, dim), dtype=np.uint8)
  n = lib.sokoban_parse_file(
    path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    max_levels, dim,
  )
  if n < 0:
    return None
  return np.copy(out[:n])


def solve(level: np.ndarray,
          node_limit: int = 1_000_000) -> Optional[List[int]]:
  """A* solve a [dim, dim] level natively -> env action list, or None."""
  lib = _load()
  if lib is None:
    return None
  level = np.ascontiguousarray(level, dtype=np.uint8)
  dim = level.shape[0]
  max_actions = 4096
  actions = np.empty(max_actions, dtype=np.int32)
  n = lib.sokoban_solve(
    level.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dim,
    node_limit, actions.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    max_actions,
  )
  if n < 0:
    return None
  return actions[:n].tolist()
