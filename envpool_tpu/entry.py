"""Entry point importing every family's registration.

Mirrors ``envpool/entry.py:17-55``: optional families are guarded so a broken
optional dependency never takes down the package; sokoban (the flagship
family of the fork) is imported unconditionally.
"""

try:
  import envpool_tpu.envs.dummy.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.classic_control.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.toy_text.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.box2d.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.atari.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.mujoco.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.minigrid.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.procgen.registration  # noqa: F401
except ImportError:
  pass

try:
  import envpool_tpu.envs.vizdoom.registration  # noqa: F401
except ImportError:
  pass

import envpool_tpu.envs.sokoban.registration  # noqa: F401
