"""HostEnvPool — batched execution engine for host-native env families.

Some reference families wrap irreducibly host-side C libraries (MuJoCo's
``mj_step``, ALE's 6502 emulator, ViZDoom): no XLA rewrite can absorb a
CPU-only emulator, and the reference itself runs them on worker threads
(``envpool/core/async_envpool.h:42-191``). This engine is the TPU build's
counterpart of that tier: stateful per-env Python objects stepped by a
thread pool (the wrapped C libraries release the GIL, so threads scale the
same way the reference's do), behind the SAME EnvSpec/dialect API as the
on-device TpuEnvPool — plus an ``xla()`` interface via
``jax.experimental.io_callback`` mirroring the reference's XLA custom-call
host bridge (``envpool/core/xla.h:113-210``).

Semantics reproduced from the reference runtime:
- sync mode (batch_size == num_envs): recv returns all envs ordered by
  their position in the send batch (``envpool/core/state_buffer.h:94-97``);
- async mode (batch_size < num_envs): recv returns the first batch_size
  FINISHERS in completion order — true latency hiding, not an emulation
  (``envpool/core/state_buffer_queue.h:116-130``);
- auto-reset: a done env's next scheduled step becomes Reset
  (``envpool/core/env.h:162-172``);
- common fields done/discount/step_type/trunc/elapsed_step/env_id exactly
  as ``envpool/core/env.h:196-222``;
- per-env RNG: numpy MT19937(seed + env_id), the same generator family as
  the reference's ``std::mt19937`` (``envpool/core/env.h:90-95``);
- worker sizing: num_threads config, default min(batch_size, cores)
  (``envpool/core/async_envpool.h:114-116``).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from .env import FuncEnv
from .env_spec import EnvSpec
from .spec import ArraySpec


class HostEnv:
  """Base class for host-native stateful env families.

  Class-level schema hooks are identical to ``FuncEnv`` (default_config /
  state_spec / action_spec / name); instances hold per-env mutable state
  like the reference's ``Env<Spec>`` subclasses and implement:

    reset(self) -> (obs, info_dict)
    step(self, action) -> (obs, reward, term, info_dict)

  ``obs`` is an array for single-"obs" specs or a dict keyed without the
  "obs:" prefix. Time-limit truncation is handled by the pool.
  """

  name: str = "Host"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    raise NotImplementedError

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    raise NotImplementedError

  def __init__(self, cfg: Any, env_id: int) -> None:
    self.cfg = cfg
    self.env_id = env_id
    # same generator family as std::mt19937(seed + env_id)
    self.gen = np.random.Generator(np.random.MT19937(int(cfg.seed) + env_id))

  def reset(self) -> Tuple[Any, Dict[str, Any]]:
    raise NotImplementedError

  def step(self, action: Any) -> Tuple[Any, float, bool, Dict[str, Any]]:
    raise NotImplementedError


class HostEnvPool:
  """Thread-pool batched engine with envpool's send/recv/reset protocol."""

  _spec: EnvSpec

  def __init__(self, spec: EnvSpec) -> None:
    self._spec = spec
    self.spec = spec
    cfg = spec.config
    self._cfg = cfg
    self._num_envs = int(cfg.num_envs)
    self._batch_size = int(cfg.batch_size) or self._num_envs
    if int(cfg.max_num_players) != 1:
      raise NotImplementedError("multi-player host envs not supported yet")
    self._is_sync = self._batch_size == self._num_envs
    num_threads = int(cfg.num_threads)
    if num_threads <= 0:
      num_threads = min(self._batch_size, os.cpu_count() or 1)
    self._n_workers = num_threads
    env_cls = spec._env_cls

    # parallel env construction, like the init ThreadPool in
    # AsyncEnvPool's ctor (async_envpool.h:104-113)
    with ThreadPoolExecutor(max_workers=num_threads) as ctor_pool:
      self._envs: List[HostEnv] = list(
        ctor_pool.map(lambda i: env_cls(cfg, i), range(self._num_envs))
      )
    self._executor = ThreadPoolExecutor(max_workers=num_threads)
    self._locks = [threading.Lock() for _ in range(self._num_envs)]
    self._done = np.ones(self._num_envs, dtype=bool)   # auto-reset on first
    self._elapsed = np.zeros(self._num_envs, dtype=np.int64)
    self._completions: "queue.SimpleQueue" = queue.SimpleQueue()
    self._inflight = 0

    self._state_keys = spec._state_keys
    self._action_keys = spec._action_keys
    self._env_action_keys = [
      k for k in self._action_keys if k not in ("env_id", "players.env_id")
    ]
    self._env_state_keys = [
      k for k in self._state_keys
      if k not in (
        "info:env_id", "info:players.env_id", "elapsed_step", "done",
        "reward", "discount", "step_type", "trunc"
      )
    ]

  def __del__(self) -> None:
    try:
      ex = getattr(self, "_executor", None)
      if ex is not None:
        ex.shutdown(wait=False, cancel_futures=True)
    except Exception:
      pass  # interpreter teardown: queue module may already be gone

  # ------------------------------------------------------------------ worker

  def _job(self, env_id: int, order: int, action: Any,
           force_reset: bool) -> None:
    """One env's step/reset, writing a complete state row at the end."""
    try:
      with self._locks[env_id]:
        env = self._envs[env_id]
        reset = force_reset or self._done[env_id]
        max_steps = int(self._cfg.max_episode_steps)
        if reset:
          obs, info = env.reset()
          reward = 0.0
          elapsed = 0
          term = False
        else:
          obs, reward, term, info = env.step(action)
          elapsed = int(self._elapsed[env_id]) + 1
        done = bool(term) or elapsed >= max_steps
        self._done[env_id] = done
        self._elapsed[env_id] = elapsed
        row: Dict[str, Any] = {
          "info:env_id": np.int32(env_id),
          "info:players.env_id": np.int32(env_id),
          "elapsed_step": np.int32(elapsed),
          "done": np.bool_(done),
          "reward": np.float32(reward),
          "discount": np.float32(not done),
          "step_type": np.int32(0 if elapsed == 0 else (2 if done else 1)),
          "trunc": np.bool_(done and elapsed >= max_steps),
        }
        for k in self._env_state_keys:
          if k == "obs":
            row[k] = obs
          elif k.startswith("obs:"):
            row[k] = obs[k[4:]]
          elif k.startswith("info:"):
            row[k] = info[k[5:]]
          else:
            row[k] = info[k]
        # envs may override common fields (e.g. atari's episodic-life
        # elapsed_step/trunc/discount rewrites, atari_env.h:210-250)
        override = info.get("_override") if isinstance(info, dict) else None
        if override:
          row.update(override)
          if "done" in override:
            self._done[env_id] = bool(override["done"])
          if "elapsed_step" in override:
            self._elapsed[env_id] = int(override["elapsed_step"])
      self._completions.put((order, env_id, row))
    except BaseException as e:  # surface worker errors at recv
      self._completions.put((order, env_id, e))

  # ------------------------------------------------------------- protocol

  def _send(self, action_list: List[np.ndarray]) -> None:
    adict = dict(zip(self._action_keys, action_list))
    env_ids = np.asarray(adict["env_id"], dtype=np.int64)
    single = len(self._env_action_keys) == 1

    def act_of(order: int):
      if single:
        return adict[self._env_action_keys[0]][order]
      return {k: adict[k][order] for k in self._env_action_keys}

    n = len(env_ids)
    self._inflight += n
    # per-env dispatch: row building is GIL-bound either way, and
    # per-env tasks keep the first-finishers/async semantics uniform
    # (chunked dispatch measured slower on mj_step-class envs)
    for order, eid in enumerate(env_ids):
      self._executor.submit(self._job, int(eid), order, act_of(order),
                            False)

  def _reset(self, env_id: np.ndarray) -> None:
    env_id = np.asarray(env_id)
    for order, eid in enumerate(env_id):
      self._inflight += 1
      self._executor.submit(self._job, int(eid), order, None, True)

  def _recv(self) -> List[np.ndarray]:
    n = self._batch_size if not self._is_sync else min(
      self._inflight, self._num_envs
    )
    if self._inflight == 0:
      raise RuntimeError("recv called with no pending send/reset")
    rows = []
    for _ in range(n):
      rows.append(self._completions.get())
      self._inflight -= 1
    errs = [r for r in rows if isinstance(r[2], BaseException)]
    if errs:
      raise errs[0][2]
    if self._is_sync:
      rows.sort(key=lambda r: r[0])  # ordered writes (state_buffer.h:94-97)
    batch: List[np.ndarray] = []
    for k in self._state_keys:
      batch.append(np.stack([np.asarray(r[2][k]) for r in rows]))
    return batch

  # ------------------------------------------------------------------ extras

  def xla(self) -> Tuple[Any, Callable, Callable, Callable]:
    """In-jit step via host callback (the reference's custom-call design).

    Unlike TpuEnvPool.xla() (fully on-device), this crosses the device
    boundary each step, exactly like ``envpool/core/xla.h:132-209`` — the
    cost the host tier cannot avoid.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import io_callback

    out_shapes = [
      jax.ShapeDtypeStruct((self._batch_size, *s.static_shape), s.dtype)
      for s in self._spec._state_spec
    ]
    act_specs = {
      k: self._spec.action_array_spec[k] for k in self._env_action_keys
    }

    def host_step(action_np, env_id_np):
      alist = []
      for k in self._action_keys:
        if k == "env_id":
          alist.append(np.asarray(env_id_np, np.int32))
        elif k == "players.env_id":
          alist.append(np.asarray(env_id_np, np.int32))
        else:
          alist.append(np.asarray(action_np[k]))
      self._send(alist)
      return tuple(self._recv())

    all_ids = jnp.arange(self._num_envs, dtype=jnp.int32)

    def send(handle, action, env_id=None):
      if not isinstance(action, dict):
        action = {self._env_action_keys[0]: action}
      ids = all_ids if env_id is None else env_id
      out = io_callback(
        host_step, tuple(out_shapes), action, ids, ordered=True
      )
      return (handle[0] + 1, out)

    def recv(handle):
      return handle, handle[1]

    def step(handle, action, env_id=None):
      handle = send(handle, action, env_id)
      return recv(handle)

    del act_specs
    handle0 = (
      jnp.int32(0),
      tuple(jnp.zeros(s.shape, s.dtype) for s in out_shapes),
    )
    return handle0, recv, send, step

  # ---------------------------------------------------------------- properties

  @property
  def config(self) -> Dict[str, Any]:
    return dict(zip(self._spec._config_keys, self._spec._config_values))
