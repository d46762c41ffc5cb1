"""A minimal stand-in for the legacy ``gym`` package, used in tests.

The legacy ``gym`` wheel is not installable in this build environment, but
the gym-dialect conversion code (``GymConvertMixin``, ``gym_spec_transform``,
the registry's gym-version-aware ``gym_reset_return_info`` defaulting) must
still be exercised — it is a supported dialect of the reference
(``envpool/atari/api_test.py:33-316`` tests all three). This shim provides
exactly the surface that code consumes — ``__version__``, ``spaces.Box``,
``spaces.Discrete``, ``spaces.Dict``, ``Env`` — backed by gymnasium's
API-identical space classes.

Only installs itself when the real gym is absent; never shadows a real one.
"""

import sys
import types

import gymnasium


def install(version: str = "0.26.2") -> types.ModuleType:
  """Install (or re-version) the fake gym module; returns it."""
  existing = sys.modules.get("gym")
  if existing is not None and not getattr(existing, "__fake_gym__", False):
    return existing  # a real gym is installed; leave it alone
  gym = types.ModuleType("gym")
  gym.__fake_gym__ = True
  gym.__version__ = version
  gym.spaces = gymnasium.spaces
  gym.Env = gymnasium.Env
  sys.modules["gym"] = gym
  return gym


def uninstall() -> None:
  mod = sys.modules.get("gym")
  if mod is not None and getattr(mod, "__fake_gym__", False):
    del sys.modules["gym"]
