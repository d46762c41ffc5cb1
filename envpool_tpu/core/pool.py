"""TpuEnvPool — the on-device batched execution engine.

This replaces the reference's entire native runtime tier — worker threads,
lock-free action queue, state-buffer ring
(``envpool/core/async_envpool.h:42-191``,
``envpool/core/action_buffer_queue.h``, ``envpool/core/state_buffer_queue.h``) —
with ONE fused XLA program: env state is a pytree of ``[num_envs, ...]`` arrays
living in device HBM, ``step = jit(vmap(pure_step))``, auto-reset is a
``jnp.where`` select on the per-env done flag, and partial batches are env-id
masks. The "scheduler" is the XLA compiler; the "queues" are JAX's async
dispatch stream.

Semantics reproduced exactly (see tests/):
- auto-reset: a done env's next scheduled step becomes Reset
  (``envpool/core/env.h:162-172``), producing a FIRST timestep with
  reward 0, done False, elapsed_step 0.
- common field writes: done / discount=(1-done) / step_type FIRST=0 MID=1
  LAST=2 / trunc = done && elapsed >= max_episode_steps / info:env_id /
  elapsed_step (``envpool/core/env.h:196-222``).
- sync mode: batch_size == num_envs steps all envs in lockstep; sending a
  subset of env_id steps only those (phantom-done partial batches,
  ``envpool/core/async_envpool.h:163-175``).
- async mode (batch_size < num_envs): ``send(action, env_id)`` immediately
  dispatches a masked on-device step for that cohort (JAX async dispatch
  hides the latency — the device is stepping while Python runs the policy),
  the result is queued, and ``recv`` pops in FIFO order. Per-env FIFO
  ordering is preserved, matching ``envpool/core/state_buffer_queue.h``'s
  contract from the consumer's point of view.
- per-env RNG: key_i = fold_in(PRNGKey(seed), env_id), the functional
  analogue of per-env ``std::mt19937(seed + env_id)``
  (``envpool/core/env.h:90-95``).
"""

from __future__ import annotations

from collections import deque, namedtuple
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .env import FuncEnv
from .env_spec import EnvSpec
from .spec import ContainerSpec

# Pool-level per-env bookkeeping carried between steps. ``env`` is the
# batched env-state pytree; ``done`` means "this lane auto-resets on its next
# scheduled step" (the C++ ``IsDone()`` contract).
PoolState = namedtuple("PoolState", ["env", "rng", "elapsed", "done"])

# The functional in-jit interface returned by ``xla()``: handle carries the
# pool state plus the most recent batch of outputs, so ``recv`` is pure.
XlaHandle = namedtuple("XlaHandle", ["pool", "out"])


def _select(mask: jax.Array, a: Any, b: Any) -> Any:
  """Per-lane tree select: mask[i] ? a[i] : b[i] with right-broadcast."""

  def sel(x, y):
    m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
    return jnp.where(m, x, y)

  return jax.tree_util.tree_map(sel, a, b)


def _split_keys(rng: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """Advance a [N, 2] batch of PRNG keys, returning (carry, use)."""
  both = jax.vmap(lambda k: jax.random.split(k, 2))(rng)
  return both[:, 0], both[:, 1]


class TpuEnvPool:
  """Batched env pool with envpool's send/recv/step/reset API on TPU.

  The engine compiles three entry points:
    * full-batch advance (sync hot path, no scatter/gather),
    * masked advance for an env-id cohort (async + partial sync),
    * forced reset (full or masked).
  """

  _spec: EnvSpec

  def __init__(self, spec: EnvSpec) -> None:
    self._spec = spec
    self.spec = spec
    cfg = spec.config
    self._cfg = cfg
    self._env_cls: FuncEnv = spec._env_cls
    self._num_envs = int(cfg.num_envs)
    self._batch_size = int(cfg.batch_size) or self._num_envs
    self._max_players = int(cfg.max_num_players)
    self._multi_player = self._max_players > 1
    if self._multi_player:
      if not getattr(self._env_cls, "multi_player", False):
        raise ValueError(
          f"{self._env_cls.name} does not support max_num_players > 1"
        )
      if getattr(self._env_cls, "env_resets", False):
        raise NotImplementedError(
          "env-side auto-reset + multi-player is not supported"
        )
      # async multiplayer (batch_size < num_envs) is supported: cohorts
      # of envs step through the masked path with player-padded actions,
      # matching the reference's dynamic player offsets
      # (state_buffer.h:87-93) with static shapes + compaction instead.
    self._container_keys = {
      k for k, s in zip(spec._state_keys, spec._state_spec)
      if isinstance(s, ContainerSpec)
    }
    if self._container_keys and self._multi_player:
      # the reference packs per-player containers dynamically
      # (dummy_envpool.h:146-158); the static-shape engine supports
      # container fields for single-player envs only
      raise NotImplementedError(
        "container specs are not supported with max_num_players > 1"
      )
    self._state_keys: List[str] = spec._state_keys
    self._env_state_keys = [
      k for k in self._state_keys
      if k not in (
        "info:env_id", "info:players.env_id", "elapsed_step", "done",
        "reward", "discount", "step_type", "trunc"
      )
    ]
    self._action_keys: List[str] = spec._action_keys
    self._env_action_keys = [
      k for k in self._action_keys if k not in ("env_id", "players.env_id")
    ]
    self._action_array_spec = spec.action_array_spec

    self._build_engine()
    self._state: PoolState = self._jit_init(int(cfg.seed))
    # FIFO of (env_id ndarray | None, device out list) pending recv
    self._pending: deque = deque()
    self._last_out: Optional[List[jax.Array]] = None

  # ------------------------------------------------------------------ engine

  def _build_engine(self) -> None:
    env_cls = self._env_cls
    cfg = self._cfg
    n = self._num_envs

    reset_v = jax.vmap(lambda s, k: env_cls.reset(cfg, s, k))
    step_v = jax.vmap(lambda s, a, k: env_cls.step(cfg, s, a, k))
    cap_v = jax.vmap(lambda s: env_cls.episode_cap(cfg, s))
    init_v = jax.vmap(lambda i, k: env_cls.init(cfg, i, k))
    env_ids = jnp.arange(n, dtype=jnp.int32)

    def init(seed: int) -> PoolState:
      base = jax.random.PRNGKey(seed)
      keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(env_ids)
      keys, sub = _split_keys(keys)
      env_state = init_v(env_ids, sub)
      return PoolState(
        env=env_state,
        rng=keys,
        elapsed=jnp.zeros(n, jnp.int32),
        # all envs report done so the first scheduled step auto-resets,
        # mirroring elapsed_step_ = max+1, done_=true initialization
        # (``envpool/classic_control/cartpole.h:70-73``).
        done=jnp.ones(n, jnp.bool_),
      )

    def _unpack_action(action_full: Dict[str, jax.Array]) -> Any:
      if len(self._env_action_keys) == 1:
        return action_full[self._env_action_keys[0]]
      return action_full

    env_resets = bool(getattr(env_cls, "env_resets", False))

    def advance(
      ps: PoolState,
      action_full: Dict[str, jax.Array],
      mask: Optional[jax.Array],
      force_reset: bool,
    ) -> Tuple[PoolState, List[jax.Array]]:
      rng, sub = _split_keys(ps.rng)
      need_reset = (
        jnp.ones(n, jnp.bool_) if force_reset else ps.done
      )

      def _merge_resets(st_env, st_obs, st_info):
        """Select reset-branch values into lanes that need a reset.

        Wrapped in a batch-level cond: when NO lane resets this step
        (the steady state for env-side-auto-reset families, and any step
        without terminations elsewhere) the whole reset computation is
        skipped at runtime. RNG consumption is identical either way —
        reset_v and step_v share the same ``sub`` keys.
        """
        if force_reset:
          rs_env, rs_obs, rs_info = reset_v(ps.env, sub)
          return (
            _select(need_reset, rs_env, st_env),
            _select(need_reset, rs_obs, st_obs),
            _select(need_reset, rs_info, st_info),
          )

        def do_reset(st3):
          st_env, st_obs, st_info = st3
          rs_env, rs_obs, rs_info = reset_v(ps.env, sub)
          return (
            _select(need_reset, rs_env, st_env),
            _select(need_reset, rs_obs, st_obs),
            _select(need_reset, rs_info, st_info),
          )

        return jax.lax.cond(
          jnp.any(need_reset), do_reset, lambda st3: st3,
          (st_env, st_obs, st_info),
        )

      if env_resets:
        # env-side auto-reset: step already returns done/trunc and the
        # post-internal-reset state/obs on terminal transitions.
        st_env, st_obs, st_rew, st_done, st_trunc, st_info = step_v(
          ps.env, _unpack_action(action_full), sub
        )
        env2, obs, info = _merge_resets(st_env, st_obs, st_info)
        if "elapsed_step" in info:
          # env-side-reset families report the finishing episode's step
          # counter through this reserved info key (it restarts after the
          # in-step auto-reset and freezes on noops — the pool cannot know
          # either), matching elapsed_step = current_step_ written BEFORE
          # ResetWithoutWrite (sokoban_envpool.cc:177-216, env.h:209).
          elapsed = jnp.where(need_reset, 0, info.pop("elapsed_step"))
        else:
          elapsed = jnp.where(need_reset, 0, ps.elapsed + 1)
        done = jnp.where(need_reset, False, st_done.astype(jnp.bool_))
        trunc = jnp.where(need_reset, False, st_trunc.astype(jnp.bool_))
        reward = jnp.where(need_reset, 0.0, st_rew).astype(jnp.float32)
        # FIRST only right after an explicit reset; terminal steps are LAST
        # but the env has already moved on (envpool/core/env.h:205-210 with
        # IsDone() false post-WriteState-reset).
        step_type = jnp.where(
          elapsed == 0, 0, jnp.where(done, 2, 1)
        ).astype(jnp.int32)
        # the carried done flag never triggers a pool auto-reset
        done_carry = jnp.zeros(n, jnp.bool_)
      else:
        st_env, st_obs, st_rew, st_term, st_info = step_v(
          ps.env, _unpack_action(action_full), sub
        )
        env2, obs, info = _merge_resets(st_env, st_obs, st_info)
        elapsed = jnp.where(need_reset, 0, ps.elapsed + 1)
        cap = cap_v(env2)
        term = jnp.where(need_reset, False, st_term.astype(jnp.bool_))
        done = jnp.where(need_reset, False, term | (elapsed >= cap))
        trunc = done & (elapsed >= cap)
        # st_rew is [n] single-player or [n, P] multiplayer
        nr = need_reset.reshape(
          need_reset.shape + (1,) * (st_rew.ndim - 1)
        )
        reward = jnp.where(nr, 0.0, st_rew).astype(jnp.float32)
        step_type = jnp.where(
          need_reset, 0, jnp.where(done, 2, 1)
        ).astype(jnp.int32)
        done_carry = done
      discount = (~done).astype(jnp.float32)
      if "discount" in info:
        # reserved info key: the env supplies its own discount (the
        # dm_control semantics — 1 at the time limit, 0 only on early
        # task termination; counterpart of the host tier's
        # info["_override"] channel, core/host_pool.py). Single-player
        # only: the multiplayer branch below recomputes per-player.
        discount = info.pop("discount").astype(jnp.float32)

      if mask is not None:
        env2 = _select(mask, env2, ps.env)
        obs = _select(mask, obs, obs)  # gathered below; full value fine
        rng = jnp.where(mask[:, None], rng, ps.rng)
        elapsed2 = jnp.where(mask, elapsed, ps.elapsed)
        done2 = jnp.where(mask, done_carry, ps.done)
      else:
        elapsed2, done2 = elapsed, done_carry

      if self._multi_player:
        # static-shape multiplayer (SURVEY P6): every per-player field is
        # padded to max_num_players; the env tracks the live player count
        # in state["num_players"], the pool masks rewards/discounts, and
        # the host boundary compacts padded rows away (the reference packs
        # players dynamically instead, envpool/core/state_buffer.h:87-93).
        p = self._max_players
        npl = env2["num_players"]
        pmask = jnp.arange(p)[None, :] < npl[:, None]
        rew_pp = jnp.where(need_reset[:, None], 0.0, st_rew)
        reward = jnp.where(pmask, rew_pp, 0.0).astype(jnp.float32)
        discount = (pmask & (~done)[:, None]).astype(jnp.float32)
        players_env_id = jnp.broadcast_to(env_ids[:, None], (n, p))
      else:
        npl = None
        players_env_id = env_ids
      new_ps = PoolState(env=env2, rng=rng, elapsed=elapsed2, done=done2)

      out: Dict[str, jax.Array] = {
        "info:env_id": env_ids,
        "info:players.env_id": players_env_id,
        "elapsed_step": elapsed,
        "done": done,
        "reward": reward,
        "discount": discount,
        "step_type": step_type,
        "trunc": trunc,
      }
      for k in self._env_state_keys:
        if k == "obs":
          out[k] = obs
        elif k.startswith("obs:"):
          out[k] = obs[k[4:]]
        elif k.startswith("info:"):
          out[k] = info[k[5:]]
        else:  # bare env-specific top-level key
          out[k] = info[k]
      outs = [out[k] for k in self._state_keys]
      if self._multi_player:
        outs.append(npl)  # live player counts, for host-side compaction
      return new_ps, outs

    def action_field_shape(spec) -> tuple:
      # per-player action fields (leading -1) get the padded player axis
      if self._multi_player and spec.shape and spec.shape[0] == -1:
        return (self._max_players, *spec.static_shape)
      return spec.static_shape

    zero_action = {
      k: jnp.zeros(
        (n, *action_field_shape(self._action_array_spec[k])),
        dtype=self._action_array_spec[k].dtype,
      )
      for k in self._env_action_keys
    }

    def advance_full(ps: PoolState, action_full: Dict[str, jax.Array]):
      return advance(ps, action_full, None, False)

    def advance_masked(
      ps: PoolState, action_b: Dict[str, jax.Array], env_id: jax.Array
    ):
      action_full = {
        k: zero_action[k].at[env_id].set(action_b[k])
        for k in self._env_action_keys
      }
      mask = jnp.zeros(n, jnp.bool_).at[env_id].set(True)
      new_ps, outs = advance(ps, action_full, mask, False)
      return new_ps, jax.tree_util.tree_map(lambda o: o[env_id], outs)

    def reset_all(ps: PoolState):
      return advance(ps, zero_action, None, True)

    def reset_masked(ps: PoolState, env_id: jax.Array):
      mask = jnp.zeros(n, jnp.bool_).at[env_id].set(True)
      # force-reset only masked lanes: merge into pool done flag first
      forced = PoolState(
        env=ps.env,
        rng=ps.rng,
        elapsed=ps.elapsed,
        done=jnp.where(mask, True, ps.done),
      )
      new_ps, outs = advance(forced, zero_action, mask, False)
      return new_ps, jax.tree_util.tree_map(lambda o: o[env_id], outs)

    self._jit_init = jax.jit(init, static_argnums=0)
    self._jit_advance_full = jax.jit(advance_full, donate_argnums=0)
    self._jit_advance_masked = jax.jit(advance_masked, donate_argnums=0)
    self._jit_reset_all = jax.jit(reset_all, donate_argnums=0)
    self._jit_reset_masked = jax.jit(reset_masked, donate_argnums=0)
    self._advance_pure = advance  # for xla()/sharded paths
    self._zero_action = zero_action

  # ----------------------------------------------------------- low-level API

  def _send(self, action_list: List[np.ndarray]) -> None:
    """Dispatch one masked/full on-device step for the given action batch.

    ``action_list`` is ordered by ``_action_keys`` (env_id, players.env_id,
    *env actions), the layout produced by ``EnvPoolMixin._from``.
    """
    adict = dict(zip(self._action_keys, action_list))
    env_id = np.asarray(adict["env_id"])
    if self._multi_player:
      adict = self._scatter_player_actions(adict)
    action_b = {k: jnp.asarray(adict[k]) for k in self._env_action_keys}
    if len(env_id) == self._num_envs and np.array_equal(
      env_id, np.arange(self._num_envs, dtype=env_id.dtype)
    ):
      self._state, outs = self._jit_advance_full(self._state, action_b)
      self._pending.append((None, outs))
    else:
      dev_env_id = jnp.asarray(env_id, dtype=jnp.int32)
      self._state, outs = self._jit_advance_masked(
        self._state, action_b, dev_env_id
      )
      self._pending.append((env_id, outs))
    self._last_out = outs

  def _scatter_player_actions(self, adict: Dict[str, Any]) -> Dict[str, Any]:
    """[total_players, ...] per-player action rows -> [n, P, ...] padded.

    Counterpart of ``Env::ParseAction``'s player gathering
    (``envpool/core/env.h:124-159``), done once on the host instead of
    per-env on worker threads. Rows for the same env fill consecutive
    player slots in arrival order. The result is ordered by the send's
    env_id cohort, so it feeds both the full-batch path (env_id ==
    arange -> identity) and the masked async path ([B, P, ...] rows).
    """
    players = np.asarray(adict["players.env_id"], dtype=np.int64)
    cohort = np.asarray(adict["env_id"], dtype=np.int64)
    # slot of each row within its env (stable cumcount)
    slots = np.zeros(len(players), dtype=np.int64)
    counts: Dict[int, int] = {}
    for i, e in enumerate(players):
      c = counts.get(int(e), 0)
      slots[i] = c
      counts[int(e)] = c + 1
    out = dict(adict)
    for k in self._env_action_keys:
      spec = self._action_array_spec[k]
      if spec.shape and spec.shape[0] == -1:
        rows = np.asarray(adict[k])
        full = np.zeros(
          (self._num_envs, self._max_players, *spec.static_shape),
          dtype=spec.dtype,
        )
        full[players, slots] = rows
        out[k] = full[cohort]
    return out

  def _compact_players(self, outs: List[np.ndarray]) -> List[np.ndarray]:
    """Drop padded player rows at the host boundary: [B, P, ...] fields
    with a per-player spec become [total_players, ...]."""
    *state_vals, npl = outs
    npl = np.asarray(npl)
    p = self._max_players
    keep = (np.arange(p)[None, :] < npl[:, None]).ravel()
    compacted = []
    for val, spec in zip(state_vals, self._spec._state_spec):
      if spec.shape and spec.shape[0] == -1:
        val = np.asarray(val)
        flat = val.reshape(val.shape[0] * p, *val.shape[2:])
        compacted.append(flat[keep])
      else:
        compacted.append(val)
    return compacted

  def _recv(self) -> List[np.ndarray]:
    """Pop the oldest pending batch and transfer it to host."""
    if not self._pending:
      raise RuntimeError("recv called with no pending send/reset")
    _, outs = self._pending.popleft()
    host = []
    # multiplayer appends a live-player-count column past the state keys
    keys = self._state_keys + [""] * (len(outs) - len(self._state_keys))
    for k, o in zip(keys, jax.device_get(outs)):
      if k in self._container_keys:
        # padded (data, shape) -> ragged object column: each env's value
        # sliced to its actual dims, the reference's container surface
        # (``envpool/core/py_envpool.h``'s object-array conversion)
        data, shp = np.asarray(o[0]), np.asarray(o[1])
        col = np.empty(len(data), dtype=object)
        for i in range(len(data)):
          col[i] = data[i][tuple(slice(int(d)) for d in shp[i])]
        host.append(col)
      else:
        host.append(np.asarray(o))
    if self._multi_player:
      host = self._compact_players(host)
    return host

  def _reset(self, env_id: np.ndarray) -> None:
    """Enqueue a forced reset for the given env ids.

    Counterpart of ``AsyncEnvPool::Reset`` (``envpool/core/async_envpool.h:
    177-190``). In async mode the ids are split into batch_size cohorts so
    each recv returns one batch, matching the StateBufferQueue behavior.
    """
    env_id = np.asarray(env_id, dtype=np.int32)
    if len(env_id) == self._num_envs and self._batch_size == self._num_envs:
      self._state, outs = self._jit_reset_all(self._state)
      self._pending.append((None, outs))
      self._last_out = outs
      return
    bs = self._batch_size
    for i in range(0, len(env_id), bs):
      chunk = env_id[i:i + bs]
      dev = jnp.asarray(chunk)
      self._state, outs = self._jit_reset_masked(self._state, dev)
      self._pending.append((chunk, outs))
      self._last_out = outs

  # ------------------------------------------------------------- pure in-jit

  def xla(self) -> Tuple[Any, Callable, Callable, Callable]:
    """Return ``(handle, recv, send, step)`` usable inside ``jit``.

    The reference's XLA interface threads an opaque object pointer through
    custom calls and performs a host round-trip per step
    (``envpool/core/xla.h:113-210``). Here the handle IS the on-device pool
    state (a pytree), and send/recv/step are pure jittable functions — the
    whole rollout stays compiled on-chip with zero host traffic.

      handle = send(handle, action, env_id=None)
      handle, states = recv(handle)
      handle, states = step(handle, action, env_id=None)
    """
    if self._multi_player:
      # same gate as the reference (envpool/core/py_envpool.h:220-238)
      raise RuntimeError("xla() does not support multi-player envs")
    if self._container_keys:
      # same gate as the reference (py_envpool.h:226-231 "Xla interface
      # does not support container type")
      raise RuntimeError("xla() does not support container-type specs")
    n = self._num_envs
    advance = self._advance_pure
    zero_action = self._zero_action
    env_action_keys = self._env_action_keys

    def _adict(action: Any) -> Dict[str, jax.Array]:
      if isinstance(action, dict):
        return {k: action[k] for k in env_action_keys}
      return {env_action_keys[0]: action}

    def send(handle: XlaHandle, action: Any, env_id=None) -> XlaHandle:
      action_b = _adict(action)
      if env_id is None:
        new_ps, outs = advance(handle.pool, action_b, None, False)
      else:
        env_id = env_id.astype(jnp.int32)
        action_full = {
          k: zero_action[k].at[env_id].set(action_b[k])
          for k in env_action_keys
        }
        mask = jnp.zeros(n, jnp.bool_).at[env_id].set(True)
        new_ps, outs = advance(handle.pool, action_full, mask, False)
        outs = [o[env_id] for o in outs]
      return XlaHandle(pool=new_ps, out=tuple(outs))

    def recv(handle: XlaHandle) -> Tuple[XlaHandle, Tuple[jax.Array, ...]]:
      return handle, handle.out

    def step(handle: XlaHandle, action: Any, env_id=None):
      handle = send(handle, action, env_id)
      return recv(handle)

    # NOTE (behavioral difference vs the reference, documented): the
    # reference's xla send/recv mutate the SAME C++ pool the host API
    # sees (they share the object pointer threaded through the custom
    # call, ``envpool/core/xla.h:113-210``). Here the handle is an
    # immutable snapshot — host-API sends after ``xla()`` do not affect
    # the handle, and in-jit steps do not affect the host pool — which
    # is what makes the whole rollout pure and fusible. To fold an
    # in-jit rollout's final state back into the host-side pool, call
    # ``pool.commit(handle)``.

    if self._last_out is not None and len(
      self._last_out[0]
    ) == self._batch_size:
      out0 = tuple(self._last_out)
    else:
      # zero-filled output slot shaped like one recv batch
      out0 = tuple(
        jnp.zeros((self._batch_size, *s.static_shape), dtype=s.dtype)
        for s in self._spec._state_spec
      )
    # snapshot (copy) so later host-API donation can't invalidate the handle
    pool0 = jax.tree_util.tree_map(jnp.copy, self._state)
    handle0 = XlaHandle(pool=pool0, out=out0)
    return handle0, recv, send, step

  def commit(self, handle: XlaHandle) -> None:
    """Adopt an ``xla()`` handle's pool state as the host-side state.

    Closes the host/in-jit divergence described in ``xla()``: after a
    jitted rollout, ``pool.commit(final_handle)`` makes subsequent host
    API ``step``/``recv`` continue from where the rollout left off (the
    reference gets this implicitly by mutating one shared C++ pool).
    """
    if self._multi_player:
      raise RuntimeError("commit() does not support multi-player envs")
    # copy: the handle may be donated/reused by the caller's jit
    self._state = jax.tree_util.tree_map(jnp.copy, handle.pool)
    self._pending.clear()
    self._last_out = None

  # --------------------------------------------------------------- properties

  @property
  def config(self) -> Dict[str, Any]:
    return dict(zip(self._spec._config_keys, self._spec._config_values))

  @property
  def _state_pytree(self) -> PoolState:
    """Current on-device pool state (checkpointable pytree)."""
    return self._state

  def save_state(self) -> Any:
    """Snapshot the full pool state as a host pytree (checkpointing).

    The reference cannot do this at all — its env state lives in opaque C++
    objects (SURVEY §5.4). Here it is a pytree of arrays.
    """
    return jax.device_get(jax.tree_util.tree_map(jnp.copy, self._state))

  def load_state(self, state: Any) -> None:
    """Restore a pool state snapshot produced by ``save_state``."""
    if isinstance(state, dict) and set(state) == set(PoolState._fields):
      # checkpointers (orbax) may round-trip the namedtuple as a dict
      state = PoolState(**state)
    self._state = jax.tree_util.tree_map(jnp.asarray, state)
    self._pending.clear()
