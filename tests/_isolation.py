"""Subprocess isolation for tests that compile very large XLA CPU programs.

This image's jaxlib CPU backend corrupts process state once it has
compiled one sufficiently large program (the device engine's contact
Newton-solve scans): the NEXT large compile in the same process dies
with SIGSEGV/SIGABRT inside XLA — observed both in
``backend_compile_and_load`` and in compilation-cache deserialization
(``get_executable_and_time``), and reproduced at commit f191a48 with a
cold cache by running just
``test_walker_parity_through_contacts + test_hopper_parity_and_touch``
in either order (the second one crashes). Round-2 runs were green only
because a warm /tmp compilation cache made the second compile a cache
read from a healthy writer.

Until jaxlib is fixed, each ``@isolated`` test re-executes itself in a
fresh interpreter, so no process ever performs more than one of these
compile sequences. Children enable the persistent compilation cache
(see tests/conftest.py): entries are then always written by a process
that has done at most one large compile, which keeps them healthy, and
warm-cache reruns of the suite stay fast.
"""

from __future__ import annotations

import functools
import inspect
import os
import subprocess
import sys

_IN_CHILD = "ENVPOOL_TPU_ISOLATED_CHILD"
_TIMEOUT_S = 2400


def isolated(fn):
  """Run the decorated test in its own pytest subprocess.

  The wrapper pulls the exact nodeid (including parametrization) from
  the ``request`` fixture, so parametrized tests re-run only their own
  parameter in the child.
  """
  orig_sig = inspect.signature(fn)
  needs_request = "request" not in orig_sig.parameters

  @functools.wraps(fn)
  def wrapper(**kwargs):
    request = kwargs.pop("request") if needs_request else kwargs["request"]
    if os.environ.get(_IN_CHILD):
      return fn(**kwargs)
    nodeid = request.node.nodeid
    env = dict(os.environ)
    env[_IN_CHILD] = "1"
    proc = subprocess.run(
      [sys.executable, "-m", "pytest", "-q", "-x",
       "-p", "no:cacheprovider", nodeid],
      env=env, cwd=str(request.config.rootpath),
      capture_output=True, text=True, timeout=_TIMEOUT_S,
    )
    if proc.returncode != 0:
      raise AssertionError(
        f"isolated subprocess for {nodeid} failed "
        f"(rc={proc.returncode}):\n"
        + proc.stdout[-4000:] + "\n" + proc.stderr[-2000:]
      )

  if needs_request:
    params = [
      inspect.Parameter("request", inspect.Parameter.POSITIONAL_OR_KEYWORD)
    ] + list(orig_sig.parameters.values())
    wrapper.__signature__ = orig_sig.replace(parameters=params)
  return wrapper
