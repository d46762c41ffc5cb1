"""On-device dm_control-suite domains (``...Jax-v1``): vmapped TPU physics.

The host tier (``domains.py``) runs the dm_control Task/Physics protocol
over raw ``mj_step`` per env (the reference's worker-thread design,
``envpool/mujoco/dmc/mujoco_env.{h,cc}``). These classes are the TPU-first
alternative: identical task semantics — episode initialization, observation
layout and ``tolerance``-based rewards of ``envpool/mujoco/dmc/<domain>.h``
— over the pure-JAX engine in ``device_engine.py``, stepped entirely
on-device by ``TpuEnvPool``: thousands of suite envs per chip with no
per-step host traffic.

dm_control control semantics reproduced here:

- ControlStep = set ctrl -> n_sub_steps x mj_step -> reward
  (``mujoco_env.cc:79-99``); the engine's ``step_smooth`` chain plays the
  substeps and observations are recomputed from (q, v) — the equivalent of
  the trailing ``mj_step1`` forward pass;
- episodes never terminate early in these domains, so the reserved
  ``discount`` info key is pinned to 1.0: the time limit truncates with
  dm discount 1, never 0 (``mujoco_env.cc:88-97``);
- episode initialization (RandomizeLimitedAndRotationalJoints and the
  per-domain draws) uses jax.random streams — identically *distributed*
  to the host tier's MT19937, not bit-identical (SURVEY §7 hard part #1);
  point_mass "hard"'s rejection loop for actuator-gain directions is
  replaced by an exact draw on the acceptance region (loop-free).

Model constants come from the same MJCF replicas (``assets.py``) via
``extract_model_string`` — device and host tier share one model source.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

from .. import device_engine as de
from . import assets
from .device_rewards import tolerance
from .rewards import LINEAR, QUADRATIC

_INF = float("inf")
_SLIDE, _HINGE = 2, 3  # mjtJoint


@functools.lru_cache(maxsize=32)
def _dmodel(xml: str) -> de.DeviceModel:
  return de.extract_model_string(xml)


def randomize_limited_and_rotational_joints(
  mdl: de.DeviceModel, q: jax.Array, key: jax.Array,
  limited_only: bool = False,
) -> jax.Array:
  """JAX counterpart of the suite's joint randomizer (``base.py:147-176``)
  for hinge/slide models: limited joints uniform in range, unlimited
  hinges uniform(-pi, pi). Static loop over the (tiny) joint table.

  ``limited_only=True`` reproduces the episode inits that randomize
  *only* limited joints and leave unlimited root joints at 0 (e.g.
  cheetah, ``envpool/mujoco/dmc/cheetah.h:83-98``). Unlimited FREE
  roots get a uniform random orientation (normalized 4-normal, the
  suite's free-joint branch, ``base.py:173-176``)."""
  _FREE = 0
  for j, jt in enumerate(mdl.jnt_type):
    qa = mdl.jnt_qadr[j]
    if jt == _FREE:
      if not mdl.jnt_limited[j] and not limited_only:
        key, sub = jax.random.split(key)
        quat = jax.random.normal(sub, (4,), q.dtype)
        quat = quat / jnp.sqrt(quat @ quat)
        q = q.at[qa + 3:qa + 7].set(quat)
      continue
    if jt not in (_SLIDE, _HINGE):
      continue
    if mdl.jnt_limited[j]:
      key, sub = jax.random.split(key)
      lo, hi = float(mdl.jnt_range[j, 0]), float(mdl.jnt_range[j, 1])
      q = q.at[qa].set(jax.random.uniform(sub, (), q.dtype, lo, hi))
    elif jt == _HINGE and not limited_only:
      key, sub = jax.random.split(key)
      q = q.at[qa].set(
        jax.random.uniform(sub, (), q.dtype, -math.pi, math.pi)
      )
  return q


class DmcDeviceEnv(FuncEnv):
  """Shared scaffolding: state = {q, v}; ControlStep = engine x n_sub_steps.

  ``model_xml`` may be a callable(task_name) -> MJCF string (cartpole's
  pole-count templating, ``dmc/cartpole.h:39-48``).
  """

  model_xml: Any = ""

  @classmethod
  def mdl(cls, cfg: Any) -> de.DeviceModel:
    xml = cls.model_xml
    if callable(xml):
      xml = xml(str(cfg.task_name))
    return _dmodel(xml)

  @classmethod
  def _physics(cls, cfg: Any, state, action, tau=None):
    q, v = de.step_smooth(
      cls.mdl(cfg), state["q"], state["v"], action,
      nstep=int(cfg.frame_skip), tau=tau,
    )
    return {"q": q, "v": v}

  @classmethod
  def _reset_qv(cls, cfg: Any):
    mdl = cls.mdl(cfg)
    return (
      jnp.asarray(mdl.init_qpos, jnp.float32), jnp.zeros(mdl.nv, jnp.float32)
    )

  # dm discount: 1 at the time limit, 0 only on early termination — these
  # domains never terminate early (``mujoco_env.cc:88-97``).
  _DISCOUNT_INFO = {"discount": np.float32(1.0)}


class DmcPendulumJaxEnv(DmcDeviceEnv):
  """dmc pendulum swingup on-device (``envpool/mujoco/dmc/pendulum.h``)."""

  name = "DmcPendulumJax"
  model_xml = assets.PENDULUM_XML
  _COS_BOUND = math.cos(8.0 / 180 * math.pi)

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 1, "task_name": "swingup"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) != "swingup":
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc pendulum."
      )
    return {
      "obs:orientation": ArraySpec(np.float32, (2,)),
      "obs:velocity": ArraySpec(np.float32, (1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 1), -1.0, 1.0)}

  @classmethod
  def _obs(cls, cfg, state):
    xmat = de.body_xmat(cls.mdl(cfg), state["q"], "pole")
    return {
      "orientation": jnp.stack([xmat[2, 2], xmat[0, 2]]),
      "velocity": state["v"],
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    q, v = cls._reset_qv(cfg)
    q = q.at[0].set(jax.random.uniform(key, (), q.dtype, -math.pi, math.pi))
    state = {"q": q, "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    state = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    zz = de.body_xmat(cls.mdl(cfg), state["q"], "pole")[2, 2]
    reward = tolerance(zz, cls._COS_BOUND, 1.0)
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class DmcCartpoleJaxEnv(DmcDeviceEnv):
  """dmc cartpole on-device (``envpool/mujoco/dmc/cartpole.h``): balance /
  balance_sparse / swingup / swingup_sparse / two_poles / three_poles.
  The cart-box x pole-capsule candidate pairs run through the real
  box-capsule narrow phase (r3 masked them off for lack of a box
  collider); they only activate under deep multi-pole interpenetration,
  never reached from suite inits."""

  name = "DmcCartpoleJax"
  model_xml = staticmethod(assets.cartpole_xml)

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 1, "task_name": "balance"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    task = str(cfg.task_name)
    n = {"two_poles": 2, "three_poles": 3}.get(task, 1)
    if task not in (
      "balance", "balance_sparse", "swingup", "swingup_sparse",
      "two_poles", "three_poles",
    ):
      raise RuntimeError(f"Unknown task_name {task} for dmc cartpole.")
    return {
      "obs:position": ArraySpec(np.float32, (1 + 2 * n,)),
      "obs:velocity": ArraySpec(np.float32, (1 + n,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 1), -1.0, 1.0)}

  @classmethod
  def _pole_cosines(cls, cfg, state):
    """zz and xz entries of every pole body's xmat (bodies 2..nbody)."""
    mdl = cls.mdl(cfg)
    xpos, xmat, _, _ = de.fk(mdl, state["q"])
    zz = jnp.stack([xmat[b][2, 2] for b in range(2, mdl.nbody)])
    xz = jnp.stack([xmat[b][0, 2] for b in range(2, mdl.nbody)])
    return zz, xz

  @classmethod
  def _obs(cls, cfg, state):
    zz, xz = cls._pole_cosines(cfg, state)
    pos = [state["q"][:1]]
    for i in range(zz.shape[0]):
      pos.append(jnp.stack([zz[i], xz[i]]))
    return {
      "position": jnp.concatenate(pos),
      "velocity": state["v"],
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    q, _ = cls._reset_qv(cfg)
    task = str(cfg.task_name)
    kq, kr, kv = jax.random.split(key, 3)
    if task in ("swingup", "swingup_sparse", "two_poles", "three_poles"):
      # cartpole.h:121-129
      q = q.at[0].set(0.01 * jax.random.normal(kq, (), q.dtype))
      q = q.at[1].set(
        math.pi + 0.01 * jax.random.normal(kr, (), q.dtype)
      )
      if mdl.nq > 2:
        krest = jax.random.split(kr, 1)[0]
        q = q.at[2:].set(
          0.01 * jax.random.normal(krest, (mdl.nq - 2,), q.dtype)
        )
    else:
      # cartpole.h:131-137
      q = q.at[0].set(jax.random.uniform(kq, (), q.dtype, -0.1, 0.1))
      q = q.at[1:].set(
        jax.random.uniform(kr, (mdl.nq - 1,), q.dtype, -0.034, 0.034)
      )
    v = 0.01 * jax.random.normal(kv, (mdl.nv,), q.dtype)
    state = {"q": q, "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    action = jnp.asarray(action, jnp.float32)
    state = cls._physics(cfg, state, action)
    task = str(cfg.task_name)
    zz, _ = cls._pole_cosines(cfg, state)
    cart = state["q"][0]
    if task in ("balance_sparse", "swingup_sparse"):
      # cartpole.h:152-160
      cart_in_bounds = tolerance(cart, -0.25, 0.25)
      angle_in_bounds = jnp.prod(tolerance(zz, 0.995, 1.0))
      reward = cart_in_bounds * angle_in_bounds
    else:
      # cartpole.h:162-183
      upright = jnp.mean((zz + 1) / 2)
      centered = (1 + tolerance(cart, 0.0, 0.0, 2.0)) / 2
      # mj_fwdActuation clamps data_->ctrl in place, so the reference's
      # small_control (cartpole.h:169) sees the ctrlrange-clamped value
      mdl = cls.mdl(cfg)
      ctrl0 = jnp.clip(
        action[0], float(mdl.ctrl_range[0, 0]), float(mdl.ctrl_range[0, 1])
      )
      small_control = (
        tolerance(ctrl0, 0.0, 0.0, 1.0, 0.0, QUADRATIC) + 4
      ) / 5
      small_velocity = (
        jnp.min(tolerance(state["v"][1:], 0.0, 0.0, 5.0)) + 1
      ) / 2
      reward = upright * small_control * small_velocity * centered
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class DmcAcrobotJaxEnv(DmcDeviceEnv):
  """dmc acrobot swingup(_sparse) on-device
  (``envpool/mujoco/dmc/acrobot.h``)."""

  name = "DmcAcrobotJax"
  model_xml = assets.ACROBOT_XML

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 1, "task_name": "swingup"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in ("swingup", "swingup_sparse"):
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc acrobot."
      )
    return {
      "obs:orientations": ArraySpec(np.float32, (4,)),
      "obs:velocity": ArraySpec(np.float32, (2,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 1), -1.0, 1.0)}

  @classmethod
  def _obs(cls, cfg, state):
    mdl = cls.mdl(cfg)
    _, xmat, _, _ = de.fk(mdl, state["q"])
    xu = xmat[mdl.body_name2id["upper_arm"]]
    xl = xmat[mdl.body_name2id["lower_arm"]]
    return {
      "orientations": jnp.stack(
        [xu[0, 2], xl[0, 2], xu[2, 2], xl[2, 2]]
      ),
      "velocity": state["v"],
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    q, v = cls._reset_qv(cfg)
    ks, ke = jax.random.split(key)
    q = q.at[0].set(jax.random.uniform(ks, (), q.dtype, -math.pi, math.pi))
    q = q.at[1].set(jax.random.uniform(ke, (), q.dtype, -math.pi, math.pi))
    state = {"q": q, "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    state = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    mdl = cls.mdl(cfg)
    target_radius = float(
      mdl.site_size[mdl.site_name2id["target"], 0]
    )
    d = jnp.linalg.norm(
      de.site_xpos(mdl, state["q"], "target")
      - de.site_xpos(mdl, state["q"], "tip")
    )
    sparse = str(cfg.task_name) == "swingup_sparse"
    reward = tolerance(d, 0.0, target_radius, 0.0 if sparse else 1.0)
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class DmcReacherJaxEnv(DmcDeviceEnv):
  """dmc reacher easy/hard on-device (``envpool/mujoco/dmc/reacher.h``).

  The host tier moves the target *geom* per episode (a model mutation);
  here the target position is env state and ``to_target``/reward read it
  directly — same observable semantics, static model."""

  name = "DmcReacherJax"
  model_xml = assets.REACHER_XML
  _BIG_TARGET = 0.05
  _SMALL_TARGET = 0.015

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 1, "task_name": "easy"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in ("easy", "hard"):
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc reacher."
      )
    return {
      "obs:position": ArraySpec(np.float32, (2,)),
      "obs:to_target": ArraySpec(np.float32, (2,)),
      "obs:velocity": ArraySpec(np.float32, (2,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 2), -1.0, 1.0)}

  @classmethod
  def _target_size(cls, cfg) -> float:
    return (
      cls._BIG_TARGET if str(cfg.task_name) == "easy"
      else cls._SMALL_TARGET
    )

  @classmethod
  def _to_target(cls, cfg, state):
    finger = de.geom_xpos(cls.mdl(cfg), state["q"], "finger")
    return state["target"] - finger[:2]

  @classmethod
  def _obs(cls, cfg, state):
    return {
      "position": state["q"],
      "to_target": cls._to_target(cfg, state),
      "velocity": state["v"],
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    kj, ka, kr = jax.random.split(key, 3)
    q, v = cls._reset_qv(cfg)
    q = randomize_limited_and_rotational_joints(mdl, q, kj)
    # reacher.h:96-101: target at uniform angle, radius U(0.05, 0.2)
    angle = jax.random.uniform(ka, (), q.dtype, 0.0, 2 * math.pi)
    radius = jax.random.uniform(kr, (), q.dtype, 0.05, 0.2)
    target = jnp.stack([radius * jnp.sin(angle), radius * jnp.cos(angle)])
    state = {"q": q, "v": v, "target": target}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    new = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    state = {**state, **new}
    mdl = cls.mdl(cfg)
    radii = cls._target_size(cfg) + float(
      mdl.geom_size[mdl.geom_name2id["finger"], 0]
    )
    reward = tolerance(
      jnp.linalg.norm(cls._to_target(cfg, state)), 0.0, radii
    )
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


def _pick_collision_free(oks, dists, gates):
  """Index of the first collision-free init candidate.

  The host reference rejection-samples unboundedly (e.g.
  ``envpool/mujoco/dmc/humanoid.h:98-110``); the device tier draws a
  static K candidates. When all K collide (P(single draw collides) is
  small but model-dependent — ADVICE r4), fall back to the LEAST
  penetrating candidate (max over candidates of the min gated contact
  distance) instead of silently taking candidate 0.
  """
  oks_v = jnp.stack(oks)
  mindist = jnp.stack([
    jnp.min(jnp.where(g, d, jnp.inf)) for d, g in zip(dists, gates)
  ])
  return jnp.where(
    jnp.any(oks_v), jnp.argmax(oks_v), jnp.argmax(mindist)
  )


def _point_mass_device_xml() -> str:
  """The point_mass replica with its tendon-transmission actuators
  stripped — the env computes the tendon torques itself (the engine
  supports joint-transmission actuators only)."""
  xml = assets.POINT_MASS_XML
  return xml.split("<tendon>")[0] + "</mujoco>\n"


class DmcPointMassJaxEnv(DmcDeviceEnv):
  """dmc point_mass easy/hard on-device
  (``envpool/mujoco/dmc/point_mass.h``).

  The two motors act through fixed tendons whose joint coefficients form
  a 2x2 mixing matrix W (rows = tendon directions; identity for "easy",
  randomized per episode for "hard" via ``wrap_prm``). W lives in env
  state and the generalized force is ``tau = gear * W^T ctrl`` — exactly
  mjModel's fixed-tendon moment arm algebra."""

  name = "DmcPointMassJax"
  model_xml = staticmethod(lambda task_name: _point_mass_device_xml())
  _GEAR = 0.1  # <motor gear> of both tendon actuators

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 1, "task_name": "easy"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in ("easy", "hard"):
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc point_mass."
      )
    return {
      "obs:position": ArraySpec(np.float32, (2,)),
      "obs:velocity": ArraySpec(np.float32, (2,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 2), -1.0, 1.0)}

  @classmethod
  def _obs(cls, cfg, state):
    return {"position": state["q"], "velocity": state["v"]}

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    kj, k1, k2 = jax.random.split(key, 3)
    q, v = cls._reset_qv(cfg)
    q = randomize_limited_and_rotational_joints(mdl, q, kj)
    if str(cfg.task_name) == "hard":
      # point_mass.h randomize_gains: dir1 uniform on the circle; dir2
      # uniform on {d: |dir1 . d| <= 0.9}. The host rejection loop is an
      # exact draw of the angle offset from the acceptance set
      # [a, pi-a] u [pi+a, 2pi-a], a = acos(0.9).
      a1 = jax.random.uniform(k1, (), jnp.float32, 0.0, 2 * math.pi)
      acc = math.acos(0.9)
      u = jax.random.uniform(k2, (), jnp.float32)
      width = math.pi - 2 * acc
      delta = jnp.where(
        u < 0.5,
        acc + (u * 2.0) * width,
        math.pi + acc + ((u - 0.5) * 2.0) * width,
      )
      a2 = a1 + delta
      wrap = jnp.stack([
        jnp.stack([jnp.cos(a1), jnp.sin(a1)]),
        jnp.stack([jnp.cos(a2), jnp.sin(a2)]),
      ])
    else:
      wrap = jnp.eye(2, dtype=jnp.float32)
    state = {"q": q, "v": v, "wrap": wrap}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    ctrl = jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)
    tau = cls._GEAR * (state["wrap"].T @ ctrl)
    new = cls._physics(cfg, state, None, tau=tau)
    state = {**state, **new}
    mdl = cls.mdl(cfg)
    target_size = float(mdl.geom_size[mdl.geom_name2id["target"], 0])
    d = (
      de.geom_xpos(mdl, state["q"], "target")
      - de.geom_xpos(mdl, state["q"], "pointmass")
    )
    near = tolerance(jnp.linalg.norm(d), 0.0, target_size, target_size)
    control = (
      tolerance(ctrl[0], 0.0, 0.0, 1.0, 0.0, QUADRATIC)
      + tolerance(ctrl[1], 0.0, 0.0, 1.0, 0.0, QUADRATIC)
    ) / 2
    reward = near * ((control + 4) / 5)
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


def _site_vel_gyro(mdl, q, v, site: str):
  """Velocimeter + gyro sensor values at a named site (site frame ==
  body frame in these replicas): the body's Plucker velocity moved to
  the site point, rotated into the body frame (mj_sensorVel)."""
  xpos, xmat, anchors, axes = de.fk(mdl, q)
  S = de._motion_subspaces(mdl, anchors, axes)
  vel = de.body_velocities(mdl, v, S)
  s = mdl.site_name2id[site]
  b = mdl.site_body[s]
  w, v0 = vel[b][:3], vel[b][3:]
  x = xpos[b] + xmat[b] @ jnp.asarray(mdl.site_pos[s], q.dtype)
  return xmat[b].T @ (v0 + jnp.cross(w, x)), xmat[b].T @ w


class DmcSwimmerJaxEnv(DmcDeviceEnv):
  """dmc swimmer swimmer6/swimmer15 on-device
  (``envpool/mujoco/dmc/swimmer.h``) — the n-link chain in a viscous
  fluid (the engine's inertia-box medium forces), per-link velocimeter +
  gyro observations, target position in env state."""

  name = "DmcSwimmerJax"
  model_xml = staticmethod(assets.swimmer_xml)

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 15, "task_name": "swimmer6"}

  @staticmethod
  def _n(cfg) -> int:
    n = {"swimmer6": 6, "swimmer15": 15}.get(str(cfg.task_name))
    if n is None:
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc swimmer."
      )
    return n

  @classmethod
  def state_spec(cls, cfg: Any) -> Dict[str, ArraySpec]:
    n = cls._n(cfg)
    return {
      "obs:joints": ArraySpec(np.float32, (n - 1,)),
      "obs:to_target": ArraySpec(np.float32, (2,)),
      "obs:body_velocities": ArraySpec(np.float32, (3 * n,)),
    }

  @classmethod
  def action_spec(cls, cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, cls._n(cfg) - 1), -1., 1.)}

  @classmethod
  def _to_target(cls, cfg, state):
    mdl = cls.mdl(cfg)
    q = state["q"]
    target = jnp.concatenate([
      state["target"],
      jnp.asarray(mdl.geom_pos[mdl.geom_name2id["target"], 2], q.dtype)[
        None
      ],
    ])
    nose = de.geom_xpos(mdl, q, "nose")
    head = de.body_xmat(mdl, q, "head")
    return (head.T @ (target - nose))[:2]

  @classmethod
  def _obs(cls, cfg, state):
    mdl = cls.mdl(cfg)
    n = cls._n(cfg)
    q, v = state["q"], state["v"]
    sites = ["head_site"] + [f"site_{i}" for i in range(n - 1)]
    vels = []
    for s in sites:
      lin, gyr = _site_vel_gyro(mdl, q, v, s)
      vels += [lin[0], lin[1], gyr[2]]
    return {
      "joints": q[3:],
      "to_target": cls._to_target(cfg, state),
      "body_velocities": jnp.stack(vels),
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    kj, kp, kx, ky = jax.random.split(key, 4)
    q, v = cls._reset_qv(cfg)
    q = randomize_limited_and_rotational_joints(mdl, q, kj)
    # target uniform in a 2x2 box, or a 0.3 box with probability 0.2
    box = jnp.where(
      jax.random.uniform(kp, (), jnp.float32) < 0.2, 0.3, 2.0
    )
    target = jnp.stack([
      jax.random.uniform(kx, (), jnp.float32, -1.0, 1.0) * box,
      jax.random.uniform(ky, (), jnp.float32, -1.0, 1.0) * box,
    ])
    state = {"q": q, "v": v, "target": target}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    new = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    state = {**state, **new}
    mdl = cls.mdl(cfg)
    target_size = float(mdl.geom_size[mdl.geom_name2id["target"], 0])
    d = jnp.linalg.norm(cls._to_target(cfg, state))
    from .rewards import LONG_TAIL
    reward = tolerance(
      d, 0.0, target_size, 5 * target_size, 0.1, LONG_TAIL
    )
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class DmcFishJaxEnv(DmcDeviceEnv):
  """dmc fish upright/swim on-device (``envpool/mujoco/dmc/fish.h``):
  quaternion free root in a zero-gravity viscous medium."""

  name = "DmcFishJax"
  model_xml = assets.FISH_XML
  _JOINTS = (
    "tail1", "tail_twist", "tail2", "finright_roll", "finright_pitch",
    "finleft_roll", "finleft_pitch",
  )

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 10, "task_name": "upright"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in ("upright", "swim"):
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc fish."
      )
    return {
      "obs:joint_angles": ArraySpec(np.float32, (7,)),
      "obs:upright": ArraySpec(np.float32, ()),
      "obs:velocity": ArraySpec(np.float32, (13,)),
      "obs:target": ArraySpec(np.float32, (3,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 5), -1.0, 1.0)}

  @classmethod
  def _joint_qadr(cls, mdl):
    # joints appear in model order after the free root (adr 0..6);
    # resolve by walking the joint table: hinge joints in declaration
    # order match _JOINTS (the replica declares them in this order)
    return [
      mdl.jnt_qadr[j] for j, t in enumerate(mdl.jnt_type) if t == _HINGE
    ]

  @classmethod
  def _upright(cls, cfg, state):
    return de.body_xmat(cls.mdl(cfg), state["q"], "torso")[2, 2]

  @classmethod
  def _mouth_to_target(cls, cfg, state):
    mdl = cls.mdl(cfg)
    q = state["q"]
    d = state["target"] - de.geom_xpos(mdl, q, "mouth")
    return de.body_xmat(mdl, q, "torso").T @ d

  @classmethod
  def _obs(cls, cfg, state):
    qadr = cls._joint_qadr(cls.mdl(cfg))
    q = state["q"]
    target = (
      cls._mouth_to_target(cfg, state)
      if str(cfg.task_name) == "swim" else jnp.zeros(3, q.dtype)
    )
    return {
      "joint_angles": jnp.stack([q[a] for a in qadr]),
      "upright": cls._upright(cfg, state),
      "velocity": state["v"],
      "target": target,
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    kq, kj, kt = jax.random.split(key, 3)
    q, v = cls._reset_qv(cfg)
    quat = jax.random.normal(kq, (4,), q.dtype)
    q = q.at[3:7].set(quat / jnp.linalg.norm(quat))
    qadr = cls._joint_qadr(mdl)
    draws = jax.random.uniform(kj, (len(qadr),), q.dtype, -0.2, 0.2)
    for i, a in enumerate(qadr):
      q = q.at[a].set(draws[i])
    if str(cfg.task_name) == "swim":
      t = jax.random.uniform(kt, (3,), jnp.float32)
      target = jnp.stack([
        -0.4 + 0.8 * t[0], -0.4 + 0.8 * t[1], 0.1 + 0.2 * t[2]
      ])
    else:
      g = mdl.geom_name2id["target"]
      target = jnp.asarray(
        mdl.body_pos[mdl.geom_body[g]] * 0 + mdl.geom_pos[g], jnp.float32
      )
    state = {"q": q, "v": v, "target": target}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    new = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    state = {**state, **new}
    mdl = cls.mdl(cfg)
    upright = cls._upright(cfg, state)
    if str(cfg.task_name) == "swim":
      radii = float(
        mdl.geom_size[mdl.geom_name2id["mouth"], 0]
        + mdl.geom_size[mdl.geom_name2id["target"], 0]
      )
      d = jnp.linalg.norm(cls._mouth_to_target(cfg, state))
      in_target = tolerance(d, 0.0, radii, 2 * radii)
      reward = (7 * in_target + 0.5 * (upright + 1)) / 8
    else:
      reward = tolerance(upright, 1.0, 1.0, 1.0)
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class DmcFingerJaxEnv(DmcDeviceEnv):
  """dmc finger spin/turn_easy/turn_hard on-device
  (``envpool/mujoco/dmc/finger.h``) — capsule-capsule contacts between
  the planar finger and the spinner, log1p touch observations, and the
  collision-free episode-init redraw expressed as a static K-candidate
  selection instead of the host's rejection loop (finger.h:202-218)."""

  name = "DmcFingerJax"
  _EASY_TARGET = 0.07
  _HARD_TARGET = 0.03
  _SPIN_VELOCITY = 15.0
  # candidate joint draws per episode init. The reference rejection-
  # samples up to 1000 times and throws on failure (finger.h:202-218);
  # the static-shape analogue draws a fixed candidate set and takes the
  # first collision-free one. Measured against real mujoco over 1e5
  # uniform joint draws on this model, not one produced an active
  # contact (rate < 1e-5), so P(all 8 colliding) < 1e-40 — the
  # candidate-0 fallback is unreachable in practice.
  _INIT_DRAWS = 8

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 2, "task_name": "spin"}

  @classmethod
  def mdl(cls, cfg: Any) -> de.DeviceModel:
    base = _dmodel(assets.FINGER_XML)
    if str(cfg.task_name) == "spin":
      # finger.h:123-125: spin lowers the spinner hinge damping to 0.03
      # (a model mutation; task_name is static config, so bake it in)
      hinge = [
        j for j in range(len(base.jnt_type)) if not base.jnt_limited[j]
      ][0]
      damping = np.array(base.dof_damping, copy=True)
      damping[base.jnt_dof[hinge]] = 0.03
      base = base._replace(dof_damping=damping)
    return base

  @classmethod
  def _is_spin(cls, cfg: Any) -> bool:
    task = str(cfg.task_name)
    if task not in ("spin", "turn_easy", "turn_hard"):
      raise RuntimeError(f"Unknown task_name {task} for dmc finger.")
    return task == "spin"

  @classmethod
  def _target_size(cls, cfg: Any) -> float:
    """Effective target site radius: the per-task mutation for turn
    tasks (finger.h:138), the replica's default site size for spin."""
    task = str(cfg.task_name)
    if task == "turn_easy":
      return cls._EASY_TARGET
    if task == "turn_hard":
      return cls._HARD_TARGET
    mdl = cls.mdl(cfg)
    return float(mdl.site_size[mdl.site_name2id["target"], 0])

  @classmethod
  def state_spec(cls, cfg: Any) -> Dict[str, ArraySpec]:
    # like the reference spec (finger.h:48-56) and the host tier, the
    # target keys are present for ALL tasks; spin simply never moves the
    # target site, so they report the default site position
    cls._is_spin(cfg)  # validates task_name
    return {
      "obs:position": ArraySpec(np.float32, (4,)),
      "obs:velocity": ArraySpec(np.float32, (3,)),
      "obs:touch": ArraySpec(np.float32, (2,)),
      "obs:target_position": ArraySpec(np.float32, (2,)),
      "obs:dist_to_target": ArraySpec(np.float32, ()),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 2), -1.0, 1.0)}

  @classmethod
  def _site_xz(cls, mdl, xpos, xmat, name):
    s = mdl.site_name2id[name]
    b = mdl.site_body[s]
    p = xpos[b] + xmat[b] @ jnp.asarray(mdl.site_pos[s], xpos[b].dtype)
    return jnp.stack([p[0], p[2]])

  @classmethod
  def _obs(cls, cfg, state):
    mdl = cls.mdl(cfg)
    q, v = state["q"], state["v"]
    xpos, xmat, _, _ = de.fk(mdl, q)
    spinner = cls._site_xz(mdl, xpos, xmat, "spinner_site")
    tip = cls._site_xz(mdl, xpos, xmat, "tip") - spinner
    target = state["target"] - spinner
    if cls._is_spin(cfg):
      # the reference writes target_position/dist_to_target for turn
      # tasks ONLY; for spin the zero-filled Allocate() leaves them 0
      # (finger.h:187-195)
      target = jnp.zeros_like(target)
      dist = jnp.zeros((), q.dtype)
    else:
      dist = jnp.linalg.norm(target - tip) - cls._target_size(cfg)
    return {
      "position": jnp.concatenate([q[:2], tip]),
      "velocity": v,
      "touch": jnp.log1p(state["touch"]),
      "target_position": target,
      "dist_to_target": dist,
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    from .. import device_collision as dc
    mdl = cls.mdl(cfg)
    cd = mdl.contacts
    kt, kj = jax.random.split(key)
    q0, v = cls._reset_qv(cfg)
    # collision-free random joint angles: draw K candidates, take the
    # first with every contact candidate separated (ncon == 0)
    qs, oks, dists, gates = [], [], [], []
    for k in jax.random.split(kj, cls._INIT_DRAWS):
      qc = randomize_limited_and_rotational_joints(mdl, q0, k)
      xpos, xmat, _, _ = de.fk(mdl, qc)
      _, dist, _, _, _, gate = dc.contact_points(cd, xpos, xmat, qc.dtype)
      oks.append(jnp.all((dist >= 0) | ~gate))
      qs.append(qc)
      dists.append(dist)
      gates.append(gate)
    pick = _pick_collision_free(oks, dists, gates)
    q = jnp.stack(qs)[pick]
    state = {"q": q, "v": v, "touch": jnp.zeros(2, q.dtype)}
    if cls._is_spin(cfg):
      # spin never moves the target site: world position of the
      # (worldbody) "target" site, constant
      s = mdl.site_name2id["target"]
      state["target"] = jnp.asarray(
        mdl.site_pos[s][[0, 2]], q.dtype
      )
    else:
      # finger.h:127-139: target on the circle of radius
      # sum(geom_size[cap1]) about the (static) hinge anchor
      g = mdl.geom_name2id["cap1"]
      radius = float(np.sum(mdl.geom_size[g]))
      b = mdl.geom_body[g]
      anchor = mdl.body_pos[b]  # spinner body: world-fixed, jnt_pos 0
      angle = jax.random.uniform(kt, (), q.dtype, -math.pi, math.pi)
      state["target"] = jnp.stack([
        float(anchor[0]) + radius * jnp.sin(angle),
        float(anchor[2]) + radius * jnp.cos(angle),
      ])
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl(cfg)
    ctrl = jnp.asarray(action, jnp.float32)
    q, v, aux = de.step_smooth(
      mdl, state["q"], state["v"], ctrl,
      nstep=int(cfg.frame_skip), want_aux=True,
    )
    q_fwd, _, _, f_rows = aux
    touch = site_touch_forces(
      mdl, q_fwd, f_rows, ["touchtop_site", "touchbottom_site"]
    )
    state = {**state, "q": q, "v": v, "touch": touch}
    obs = cls._obs(cfg, state)
    if cls._is_spin(cfg):
      reward = (v[2] <= -cls._SPIN_VELOCITY).astype(jnp.float32)
    else:
      reward = (obs["dist_to_target"] <= 0).astype(jnp.float32)
    return state, obs, reward, jnp.bool_(False), dict(cls._DISCOUNT_INFO)


def _point_normal_forces(cd, f_rows):
  """Per-candidate-point contact normal force [P] from the solved efc
  row forces (row layout mirrors assemble_rows: limits, condim-1 points,
  then 4 pyramid facets per condim-3 point — a facet sum is
  mj_contactForce's normal component)."""
  L = len(cd.lim_dof) + cd.ten_site_body.shape[0]  # rows before contacts
  one = np.where(cd.point_condim == 1)[0]
  pyr = np.where(cd.point_condim == 3)[0]
  normal = jnp.zeros((cd.point_b1.shape[0],), f_rows.dtype)
  if len(one):
    normal = normal.at[one].set(f_rows[L:L + len(one)])
  if len(pyr):
    lam = f_rows[L + len(one):].reshape(len(pyr), 4)
    normal = normal.at[pyr].set(jnp.sum(lam, axis=1))
  return normal


def site_touch_forces(mdl, q, f_rows, site_names, mut=None):
  """mj touch sensors (mjSENS_TOUCH): per site, the sum of contact
  normal forces for contacts on the site's body whose RAY — cast from
  the contact point along the contact normal oriented AWAY from that
  body (toward the other body) — intersects the (sphere) site zone
  (mj's ``mju_rayGeom`` test, not point-in-sphere). The orientation was
  pinned empirically against mujoco 3.10: over 4000 random finger
  states the away-from-sensor-body ray reproduces sensordata exactly
  (4000/4000, 291 with nonzero touch) while toward-the-body mismatches
  396 of them (r3's red ``test_finger_parity_all_tasks``).
  ``q``/``f_rows`` are the last forward evaluation's state and efc
  forces from ``step_smooth(want_aux=True)`` — exactly the state
  mjData's sensordata was computed at."""
  from .. import device_collision as dc
  cd = mdl.contacts
  xpos, xmat, _, _ = de.fk(mdl, q, mut)
  pos, _, n, _, _, _ = dc.contact_points(cd, xpos, xmat, q.dtype)
  normal = _point_normal_forces(cd, f_rows)
  out = []
  for name in site_names:
    s = mdl.site_name2id[name]
    b = mdl.site_body[s]
    center = xpos[b] + xmat[b] @ jnp.asarray(mdl.site_pos[s], q.dtype)
    radius = float(mdl.site_size[s, 0])
    on_b1 = jnp.asarray(cd.point_b1 == b)
    on_body = on_b1 | jnp.asarray(cd.point_b2 == b)
    # normals point body1 -> body2 = away from b1: keep for b1-sites,
    # flip for b2-sites so the ray leaves the sensor body
    ray = jnp.where(on_b1[:, None], n, -n)
    pc = pos - center[None, :]
    bq = jnp.sum(ray * pc, axis=1)
    cc = jnp.sum(pc * pc, axis=1) - radius * radius
    hit = (cc <= 0) | ((bq <= 0) & (bq * bq >= cc))
    out.append(jnp.where(on_body & hit, normal, 0.0).sum())
  return jnp.stack(out)


class DmcHopperJaxEnv(DmcDeviceEnv):
  """dmc hopper stand/hop on-device (``envpool/mujoco/dmc/hopper.h``) —
  contacts + the two log1p touch observations via ``site_touch_forces``."""

  name = "DmcHopperJax"
  model_xml = assets.DMC_HOPPER_XML
  _STAND_HEIGHT = 0.6
  _HOP_SPEED = 2.0

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 4, "task_name": "stand"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in ("stand", "hop"):
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc hopper."
      )
    return {
      "obs:position": ArraySpec(np.float32, (6,)),
      "obs:velocity": ArraySpec(np.float32, (7,)),
      "obs:touch": ArraySpec(np.float32, (2,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 4), -1.0, 1.0)}

  @classmethod
  def _obs(cls, cfg, state):
    return {
      "position": state["q"][1:],
      "velocity": state["v"],
      "touch": jnp.log1p(state["touch"]),
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    q, v = cls._reset_qv(cfg)
    q = randomize_limited_and_rotational_joints(mdl, q, key)
    # unlimited root slides stay 0 => the foot starts airborne: touch 0
    state = {"q": q, "v": v, "touch": jnp.zeros(2, q.dtype)}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl(cfg)
    ctrl = jnp.asarray(action, jnp.float32)
    q, v, aux = de.step_smooth(
      mdl, state["q"], state["v"], ctrl,
      nstep=int(cfg.frame_skip), want_aux=True,
    )
    q_fwd, _, _, f_rows = aux
    touch = site_touch_forces(mdl, q_fwd, f_rows, ["toe_site", "heel_site"])
    state = {"q": q, "v": v, "touch": touch}
    height = (
      de.body_xipos(mdl, q, "torso")[2] - de.body_xipos(mdl, q, "foot")[2]
    )
    standing = tolerance(height, cls._STAND_HEIGHT, 2.0)
    if str(cfg.task_name) == "hop":
      speed = de.subtree_linvel(mdl, q, v, "torso")[0]
      hop = tolerance(
        speed, cls._HOP_SPEED, _INF, cls._HOP_SPEED / 2, 0.5, LINEAR
      )
      reward = standing * hop
    else:
      # reference reads the ctrlrange-clamped data_->ctrl (hopper.h:125)
      clamped = jnp.clip(
        ctrl,
        jnp.asarray(mdl.ctrl_range[:, 0], ctrl.dtype),
        jnp.asarray(mdl.ctrl_range[:, 1], ctrl.dtype),
      )
      small_control = (
        jnp.mean(tolerance(clamped, 0.0, 0.0, 1.0, 0.0, QUADRATIC)) + 4
      ) / 5
      reward = standing * small_control
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class DmcWalkerJaxEnv(DmcDeviceEnv):
  """dmc walker stand/walk/run on-device
  (``envpool/mujoco/dmc/walker.h``)."""

  name = "DmcWalkerJax"
  model_xml = assets.DMC_WALKER_XML
  _STAND_HEIGHT = 1.2
  _SPEEDS = {"stand": 0.0, "walk": 1.0, "run": 8.0}

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 10, "task_name": "stand"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in ("stand", "walk", "run"):
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc walker."
      )
    return {
      "obs:orientations": ArraySpec(np.float32, (14,)),
      "obs:height": ArraySpec(np.float32, (-1,)),
      "obs:velocity": ArraySpec(np.float32, (9,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 6), -1.0, 1.0)}

  @classmethod
  def _obs(cls, cfg, state):
    mdl = cls.mdl(cfg)
    xpos, xmat, _, _ = de.fk(mdl, state["q"])
    orient = []
    for b in range(1, 8):
      orient += [xmat[b][0, 0], xmat[b][0, 2]]
    return {
      "orientations": jnp.stack(orient),
      "height": xpos[mdl.body_name2id["torso"]][2],
      "velocity": state["v"],
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    q, v = cls._reset_qv(cfg)
    q = randomize_limited_and_rotational_joints(mdl, q, key)
    state = {"q": q, "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    state = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    mdl = cls.mdl(cfg)
    q, v = state["q"], state["v"]
    xpos, xmat, _, _ = de.fk(mdl, q)
    torso = mdl.body_name2id["torso"]
    height = xpos[torso][2]
    upright = (1 + xmat[torso][2, 2]) / 2
    standing = tolerance(
      height, cls._STAND_HEIGHT, _INF, cls._STAND_HEIGHT / 2
    )
    stand_reward = (3 * standing + upright) / 4
    move_speed = cls._SPEEDS[str(cfg.task_name)]
    if move_speed == 0:
      reward = stand_reward
    else:
      move = tolerance(
        de.subtree_linvel(mdl, q, v, "torso")[0],
        move_speed, _INF, move_speed / 2, 0.5, LINEAR,
      )
      reward = stand_reward * (5 * move + 1) / 6
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class DmcCheetahJaxEnv(DmcDeviceEnv):
  """dmc cheetah run on-device (``envpool/mujoco/dmc/cheetah.h``) — the
  full contact pipeline (plane/capsule, pyramidal Newton) in-jit. Episode
  init randomizes limited joints then settles 200 physics steps
  (cheetah.h:86-100), expressed as a ``lax.scan`` inside reset."""

  name = "DmcCheetahJax"
  model_xml = assets.CHEETAH_XML
  _RUN_SPEED = 10.0
  _SETTLE_STEPS = 200

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 1, "task_name": "run"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) != "run":
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc cheetah."
      )
    return {
      "obs:position": ArraySpec(np.float32, (8,)),
      "obs:velocity": ArraySpec(np.float32, (9,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 6), -1.0, 1.0)}

  @classmethod
  def _obs(cls, cfg, state):
    return {"position": state["q"][1:], "velocity": state["v"]}

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl(cfg)
    q, v = cls._reset_qv(cfg)
    # cheetah.h:83-98 randomizes LIMITED joints only; the unlimited
    # rootx/rootz/rooty stay 0 (torso level) before the 200-step settle.
    q = randomize_limited_and_rotational_joints(
      mdl, q, key, limited_only=True
    )
    # settle: 200 passive steps (ctrl = 0), one scanned engine substep
    q, v = de.step_smooth(
      mdl, q, v, jnp.zeros(len(mdl.act_dof), q.dtype),
      nstep=cls._SETTLE_STEPS,
    )
    state = {"q": q, "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    state = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    mdl = cls.mdl(cfg)
    speed = de.subtree_linvel(mdl, state["q"], state["v"], "torso")[0]
    reward = tolerance(
      speed, cls._RUN_SPEED, _INF, cls._RUN_SPEED, 0.0, LINEAR
    )
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )

class DmcBallInCupJaxEnv(DmcDeviceEnv):
  """dmc ball_in_cup catch on-device
  (``envpool/mujoco/dmc/ball_in_cup.h``): sphere-capsule contacts plus
  the string as a limited spatial tendon constraint row (the first
  tendon-constrained device model; parity vs ``mj_step`` incl. the taut
  string is ~1e-13/step, ``tests/test_device_dmc.py``)."""

  name = "DmcBallInCupJax"
  model_xml = assets.BALL_IN_CUP_XML
  _INIT_DRAWS = 8  # candidate ball drops; see DmcFingerJaxEnv._INIT_DRAWS

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 10, "task_name": "catch"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) != "catch":
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc ball_in_cup."
      )
    return {
      "obs:position": ArraySpec(np.float32, (4,)),
      "obs:velocity": ArraySpec(np.float32, (4,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 2), -1.0, 1.0)}

  @classmethod
  def _obs(cls, cfg, state):
    return {"position": state["q"], "velocity": state["v"]}

  @classmethod
  def _in_target(cls, cfg, state):
    """Ball center inside the target box site, shrunk by the ball
    radius (ball_in_cup.h:142-152)."""
    mdl = cls.mdl(cfg)
    xpos, xmat, _, _ = de.fk(mdl, state["q"])
    s = mdl.site_name2id["target"]
    b = mdl.site_body[s]
    tpos = xpos[b] + xmat[b] @ jnp.asarray(
      mdl.site_pos[s], state["q"].dtype
    )
    ball = xpos[mdl.body_name2id["ball"]]
    d = jnp.abs(jnp.stack([tpos[0] - ball[0], tpos[2] - ball[2]]))
    size = np.asarray(mdl.site_size[s])[[0, 2]]
    ball_size = float(
      mdl.geom_size[mdl.geom_name2id["ball"], 0]
    )
    lim = jnp.asarray(size - ball_size, d.dtype)
    return jnp.all(d < lim)

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    from .. import device_collision as dc
    mdl = cls.mdl(cfg)
    cd = mdl.contacts
    q0, v = cls._reset_qv(cfg)
    # collision-free random ball drop (ball_in_cup.h:86-97): K
    # candidate (x, z) draws, first with every contact separated
    qs, oks, dists, gates = [], [], [], []
    for k in jax.random.split(key, cls._INIT_DRAWS):
      kx, kz = jax.random.split(k)
      qc = q0.at[2].set(jax.random.uniform(kx, (), q0.dtype, -0.2, 0.2))
      qc = qc.at[3].set(jax.random.uniform(kz, (), q0.dtype, 0.2, 0.5))
      xpos, xmat, _, _ = de.fk(mdl, qc)
      _, dist, _, _, _, gate = dc.contact_points(cd, xpos, xmat, qc.dtype)
      oks.append(jnp.all((dist >= 0) | ~gate))
      qs.append(qc)
      dists.append(dist)
      gates.append(gate)
    pick = _pick_collision_free(oks, dists, gates)
    state = {"q": jnp.stack(qs)[pick], "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    state = cls._physics(cfg, state, jnp.asarray(action, jnp.float32))
    reward = cls._in_target(cfg, state).astype(jnp.float32)
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )


class _DmcHumanoidRewardMixin:
  """Shared humanoid reward recipe (humanoid.h:144-178 and
  humanoid_CMU.h's identical structure): standing x upright x
  small-control, times dont_move (speed 0) or the (5*move+1)/6 term."""

  @classmethod
  def _reward(cls, cfg, state, ctrl, head_z, upright_v, comv):
    standing = tolerance(
      head_z, cls._STAND_HEIGHT, _INF, cls._STAND_HEIGHT / 4
    )
    upright = tolerance(upright_v, 0.9, _INF, 1.9, 0.0, LINEAR)
    stand_reward = standing * upright
    small_control = jnp.mean(
      tolerance(ctrl, 0.0, 0.0, 1.0, 0.0, QUADRATIC)
    )
    small_control = (small_control + 4.0) / 5.0
    speed_target = cls._SPEEDS[str(cfg.task_name)]
    if speed_target == 0.0:
      dont_move = (
        0.5 * tolerance(comv[0], 0.0, 0.0, 2.0)
        + 0.5 * tolerance(comv[1], 0.0, 0.0, 2.0)
      )
      return small_control * stand_reward * dont_move
    speed = jnp.hypot(comv[0], comv[1])
    move = tolerance(speed, speed_target, _INF, speed_target, 0.0, LINEAR)
    move = (5.0 * move + 1.0) / 6.0
    return small_control * stand_reward * move


class DmcHumanoidJaxEnv(_DmcHumanoidRewardMixin, DmcDeviceEnv):
  """dmc humanoid stand/walk/run/run_pure_state on-device
  (``envpool/mujoco/dmc/humanoid.h``): free quaternion root, 21 hinges,
  box feet on the floor via the plane-box corner narrow phase."""

  name = "DmcHumanoidJax"
  model_xml = assets.DMC_HUMANOID_XML
  _STAND_HEIGHT = 1.4
  _SPEEDS = {
    "stand": 0.0, "walk": 1.0, "run": 10.0, "run_pure_state": 10.0,
  }
  # collision-free draw acceptance is far lower than the planar models
  # (random root orientation vs the floor); the host rejection loop
  # tries up to 100 (humanoid.h:98-110)
  _INIT_DRAWS = 16

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 5, "task_name": "stand"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in DmcHumanoidJaxEnv._SPEEDS:
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc humanoid."
      )
    return {
      "obs:joint_angles": ArraySpec(np.float32, (21,)),
      "obs:head_height": ArraySpec(np.float32, ()),
      "obs:extremities": ArraySpec(np.float32, (12,)),
      "obs:torso_vertical": ArraySpec(np.float32, (3,)),
      "obs:com_velocity": ArraySpec(np.float32, (3,)),
      "obs:position": ArraySpec(np.float32, (28,)),
      "obs:velocity": ArraySpec(np.float32, (27,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 21), -1.0, 1.0)}

  _EXT_BODIES = ("left_hand", "left_foot", "right_hand", "right_foot")

  @classmethod
  def _obs(cls, cfg, state):
    mdl = cls.mdl(cfg)
    q, v = state["q"], state["v"]
    dt = q.dtype
    xpos, xmat, _, _ = de.fk(mdl, q)
    torso = mdl.body_name2id["torso"]
    frame = xmat[torso]
    tpos = xpos[torso]
    comv = de.subtree_linvel(mdl, q, v, "torso")
    if str(cfg.task_name) == "run_pure_state":
      # the reference writes position+velocity only; the pixels-era
      # fields stay zero-filled (humanoid.h:188-201)
      return {
        "joint_angles": jnp.zeros(21, dt),
        "head_height": jnp.zeros((), dt),
        "extremities": jnp.zeros(12, dt),
        "torso_vertical": jnp.zeros(3, dt),
        "com_velocity": jnp.zeros(3, dt),
        "position": q,
        "velocity": v,
      }
    ext = []
    for b in cls._EXT_BODIES:
      ext.append((xpos[mdl.body_name2id[b]] - tpos) @ frame)
    return {
      "joint_angles": q[7:],
      "head_height": xpos[mdl.body_name2id["head"]][2],
      "extremities": jnp.concatenate(ext),
      "torso_vertical": frame[2],
      "com_velocity": comv,
      "position": jnp.zeros(28, dt),
      "velocity": v,
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    from .. import device_collision as dc
    mdl = cls.mdl(cfg)
    cd = mdl.contacts
    q0, v = cls._reset_qv(cfg)
    qs, oks, dists, gates = [], [], [], []
    for k in jax.random.split(key, cls._INIT_DRAWS):
      qc = randomize_limited_and_rotational_joints(mdl, q0, k)
      xpos, xmat, _, _ = de.fk(mdl, qc)
      _, dist, _, _, _, gate = dc.contact_points(cd, xpos, xmat, qc.dtype)
      oks.append(jnp.all((dist >= 0) | ~gate))
      qs.append(qc)
      dists.append(dist)
      gates.append(gate)
    pick = _pick_collision_free(oks, dists, gates)
    state = {"q": jnp.stack(qs)[pick], "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    ctrl = jnp.asarray(action, jnp.float32)
    state = cls._physics(cfg, state, ctrl)
    mdl = cls.mdl(cfg)
    q, v = state["q"], state["v"]
    xpos, xmat, _, _ = de.fk(mdl, q)
    # mj clamps ctrl before writing data.ctrl; the reward reads the
    # clamped value
    ctrl_cl = jnp.clip(ctrl, -1.0, 1.0)
    reward = cls._reward(
      cfg, state, ctrl_cl,
      xpos[mdl.body_name2id["head"]][2],
      xmat[mdl.body_name2id["torso"]][2, 2],
      de.subtree_linvel(mdl, q, v, "torso"),
    )
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )

class DmcManipulatorJaxEnv(DmcDeviceEnv):
  """dmc manipulator bring_ball/bring_peg/insert_ball/insert_peg
  on-device (``envpool/mujoco/dmc/manipulator.h``): planar arm with a
  two-finger gripper (fixed-tendon grasp actuator), props with
  sphere/capsule-box contacts against the receptacles, and per-episode
  receptacle/target poses carried in env state and applied through the
  engine's body-pose override (``de.fk(mut=...)``) — the reference
  mutates mjModel body_pos/body_quat instead (manipulator.h:186-210)."""

  name = "DmcManipulatorJax"
  model_xml = staticmethod(assets.manipulator_xml)
  _CLOSE = 0.01
  _P_IN_TARGET = 0.1
  _P_IN_HAND = 0.1
  _ARM_JOINTS = (
    "arm_root", "arm_shoulder", "arm_elbow", "arm_wrist",
    "finger", "fingertip", "thumb", "thumbtip",
  )
  _TOUCH_SITES = (
    "palm_site", "finger_site", "thumb_site", "fingertip_site",
    "thumbtip_site",
  )
  _INIT_DRAWS = 8

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 10, "task_name": "bring_ball"}

  @classmethod
  def _use_peg(cls, cfg) -> bool:
    return str(cfg.task_name) in ("bring_peg", "insert_peg")

  @classmethod
  def _insert(cls, cfg) -> bool:
    return str(cfg.task_name) in ("insert_ball", "insert_peg")

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in (
      "bring_ball", "bring_peg", "insert_ball", "insert_peg"
    ):
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc manipulator."
      )
    return {
      "obs:arm_pos": ArraySpec(np.float32, (8, 2)),
      "obs:arm_vel": ArraySpec(np.float32, (8,)),
      "obs:touch": ArraySpec(np.float32, (5,)),
      "obs:hand_pos": ArraySpec(np.float32, (4,)),
      "obs:object_pos": ArraySpec(np.float32, (4,)),
      "obs:object_vel": ArraySpec(np.float32, (3,)),
      "obs:target_pos": ArraySpec(np.float32, (4,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 5), -1.0, 1.0)}

  # ---------------------------------------------------------- helpers

  @classmethod
  def _mut(cls, cfg, target):
    """Body-pose overrides from the episode target (x, z, angle)."""
    mdl = cls.mdl(cfg)
    tx, tz, ang = target[0], target[1], target[2]
    c, s = jnp.cos(ang), jnp.sin(ang)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rot = jnp.stack([
      jnp.stack([c, zero, s]),
      jnp.stack([zero, one, zero]),
      jnp.stack([-s, zero, c]),
    ])
    mut = {}
    tgt = "target_peg" if cls._use_peg(cfg) else "target_ball"
    b = mdl.body_name2id[tgt]
    base = mdl.body_pos[b]
    pos = jnp.stack([tx, jnp.asarray(base[1], tx.dtype) * one, tz])
    mut[b] = (pos, rot)
    if cls._insert(cfg):
      recep = "slot" if cls._use_peg(cfg) else "cup"
      br = mdl.body_name2id[recep]
      baser = mdl.body_pos[br]
      posr = jnp.stack([tx, jnp.asarray(baser[1], tx.dtype) * one, tz])
      mut[br] = (posr, rot)
    return mut

  @classmethod
  def _qadr(cls, cfg):
    """qpos addresses: 8 arm joints then object x/z/y — the replica
    declares joints in exactly this order, so addresses are 0..10."""
    mdl = cls.mdl(cfg)
    assert mdl.nq == 11
    return list(range(8)), [8, 9, 10]

  @classmethod
  def _site_pose(cls, mdl, xpos, xmat, name, dtype):
    s = mdl.site_name2id[name]
    b = mdl.site_body[s]
    return xpos[b] + xmat[b] @ jnp.asarray(mdl.site_pos[s], dtype)

  @classmethod
  def _obs(cls, cfg, state):
    mdl = cls.mdl(cfg)
    q, v = state["q"], state["v"]
    dt = q.dtype
    arm_adr, obj_adr = cls._qadr(cfg)
    mut = cls._mut(cfg, state["target"])
    xpos, xmat, _, _ = de.fk(mdl, q, mut)
    arm_q = q[jnp.asarray(arm_adr)]
    arm_pos = jnp.stack([jnp.sin(arm_q), jnp.cos(arm_q)], axis=1)
    # planar model: every body rotation is about +y, so xquat's (qw, qy)
    # pair is the half-angle of the SUMMED joint angles (mj composes
    # joint quats without wrapping; manipulator.h Body2dPose)
    hand_phi = q[0] + q[1] + q[2] + q[3]
    obj = "peg" if cls._use_peg(cfg) else "ball"
    hand_b = mdl.body_name2id["hand"]
    obj_b = mdl.body_name2id[obj]
    obj_phi = q[obj_adr[2]]
    tgt_ang = state["target"][2]
    def pose2d(b, phi):
      return jnp.stack([
        xpos[b][0], xpos[b][2], jnp.cos(phi / 2), jnp.sin(phi / 2)
      ])
    tgt_b = mdl.body_name2id[
      "target_peg" if cls._use_peg(cfg) else "target_ball"
    ]
    return {
      "arm_pos": arm_pos,
      "arm_vel": v[jnp.asarray(arm_adr)],
      "touch": jnp.log1p(state["touch"]),
      "hand_pos": pose2d(hand_b, hand_phi),
      "object_pos": pose2d(obj_b, obj_phi),
      "object_vel": v[jnp.asarray(obj_adr)],
      "target_pos": pose2d(tgt_b, tgt_ang),
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    from .. import device_collision as dc
    mdl = cls.mdl(cfg)
    cd = mdl.contacts
    q0, v0 = cls._reset_qv(cfg)
    arm_adr, obj_adr = cls._qadr(cfg)
    insert = cls._insert(cfg)
    qs, targets, vels, oks, dists, gates = [], [], [], [], [], []
    for k in jax.random.split(key, cls._INIT_DRAWS):
      ks = jax.random.split(k, 10)
      qc = q0
      for i, a in enumerate(arm_adr):
        j = cls._arm_jnt_index(mdl, i)
        if mdl.jnt_limited[j]:
          lo, hi = float(mdl.jnt_range[j, 0]), float(mdl.jnt_range[j, 1])
        else:
          lo, hi = -math.pi, math.pi
        qc = qc.at[a].set(jax.random.uniform(ks[i % 8], (), q0.dtype, lo, hi))
      # finger := thumb (manipulator.h:178)
      qc = qc.at[arm_adr[4]].set(qc[arm_adr[6]])
      tx = jax.random.uniform(ks[8], (), q0.dtype, -0.4, 0.4)
      kz, ka, kc, kx2, kz2, kang, kvx = jax.random.split(ks[9], 7)
      tz = jax.random.uniform(kz, (), q0.dtype, 0.1, 0.4)
      if insert:
        ang = jax.random.uniform(
          ka, (), q0.dtype, -math.pi / 3, math.pi / 3
        )
      else:
        ang = jax.random.uniform(ka, (), q0.dtype, -math.pi, math.pi)
      target = jnp.stack([tx, tz, ang])
      # object init: in_target (p=.1) / in_hand (p=.1) / uniform
      choice = jax.random.uniform(kc, (), q0.dtype)
      xpos_c, xmat_c, _, _ = de.fk(mdl, qc)
      grasp = cls._site_pose(mdl, xpos_c, xmat_c, "grasp", q0.dtype)
      hb = mdl.body_name2id["hand"]
      gdir = xmat_c[hb]
      hand_angle = math.pi - jnp.arctan2(gdir[2, 0], gdir[0, 0])
      ux = jax.random.uniform(kx2, (), q0.dtype, -0.5, 0.5)
      uz = jax.random.uniform(kz2, (), q0.dtype, 0.0, 0.7)
      uang = jax.random.uniform(kang, (), q0.dtype, 0.0, 2 * math.pi)
      uvx = jax.random.uniform(kvx, (), q0.dtype, -5.0, 5.0)
      in_tgt = choice <= cls._P_IN_TARGET
      in_hand = (~in_tgt) & (choice <= cls._P_IN_TARGET + cls._P_IN_HAND)
      ox = jnp.where(in_tgt, tx, jnp.where(in_hand, grasp[0], ux))
      oz = jnp.where(in_tgt, tz, jnp.where(in_hand, grasp[2], uz))
      oang = jnp.where(in_tgt, ang, jnp.where(in_hand, hand_angle, uang))
      qc = qc.at[obj_adr[0]].set(ox)
      qc = qc.at[obj_adr[1]].set(oz)
      qc = qc.at[obj_adr[2]].set(oang)
      vc = v0.at[obj_adr[0]].set(
        jnp.where(in_tgt | in_hand, 0.0, uvx)
      )
      mut = cls._mut(cfg, target)
      xp, xm, _, _ = de.fk(mdl, qc, mut)
      _, dist, _, _, _, gate = dc.contact_points(cd, xp, xm, qc.dtype)
      oks.append(jnp.all((dist >= 0) | ~gate))
      qs.append(qc)
      targets.append(target)
      vels.append(vc)
      dists.append(dist)
      gates.append(gate)
    pick = _pick_collision_free(oks, dists, gates)
    state = {
      "q": jnp.stack(qs)[pick],
      "v": jnp.stack(vels)[pick],
      "touch": jnp.zeros(5, q0.dtype),
      "target": jnp.stack(targets)[pick],
    }
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @staticmethod
  def _arm_jnt_index(mdl, i):
    """Joint table index of the i-th arm joint (declaration order)."""
    return i

  @classmethod
  def _reward(cls, cfg, state):
    mdl = cls.mdl(cfg)
    q = state["q"]
    mut = cls._mut(cfg, state["target"])
    xpos, xmat, _, _ = de.fk(mdl, q, mut)

    def sdist(a, b):
      pa = cls._site_pose(mdl, xpos, xmat, a, q.dtype)
      pb = cls._site_pose(mdl, xpos, xmat, b, q.dtype)
      return jnp.linalg.norm(pa - pb)

    def is_close(d):
      return tolerance(d, 0.0, cls._CLOSE, cls._CLOSE * 2)

    if cls._use_peg(cfg):
      grasping = (
        is_close(sdist("peg_grasp", "grasp"))
        + is_close(sdist("peg_pinch", "pinch"))
      ) / 2.0
      bringing = (
        is_close(sdist("peg", "target_peg"))
        + is_close(sdist("target_peg_tip", "peg_tip"))
      ) / 2.0
      return jnp.maximum(bringing, grasping / 3.0)
    return is_close(sdist("ball", "target_ball"))

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl(cfg)
    ctrl = jnp.asarray(action, jnp.float32)
    mut = cls._mut(cfg, state["target"])
    q, v, aux = de.step_smooth(
      mdl, state["q"], state["v"], ctrl,
      nstep=int(cfg.frame_skip), want_aux=True, mut=mut,
    )
    q_fwd, _, _, f_rows = aux
    touch = site_touch_forces(
      mdl, q_fwd, f_rows, list(cls._TOUCH_SITES), mut=mut
    )
    state = {**state, "q": q, "v": v, "touch": touch}
    reward = cls._reward(cfg, state)
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )

class DmcHumanoidCMUJaxEnv(_DmcHumanoidRewardMixin, DmcDeviceEnv):
  """dmc humanoid_CMU stand/run on-device
  (``envpool/mujoco/dmc/humanoid_CMU.h``): the 56-actuated-DOF CMU
  skeleton replica (nv=62) — the widest device model; reward is the
  humanoid recipe on thorax/head with the thorax zy upright term."""

  name = "DmcHumanoidCMUJax"
  model_xml = assets.humanoid_cmu_xml()
  _STAND_HEIGHT = 1.4
  _SPEEDS = {"stand": 0.0, "run": 10.0}
  _INIT_DRAWS = 16

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"frame_skip": 10, "task_name": "stand"}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    if str(cfg.task_name) not in DmcHumanoidCMUJaxEnv._SPEEDS:
      raise RuntimeError(
        f"Unknown task_name {cfg.task_name} for dmc humanoid_CMU."
      )
    return {
      "obs:joint_angles": ArraySpec(np.float32, (56,)),
      "obs:head_height": ArraySpec(np.float32, ()),
      "obs:extremities": ArraySpec(np.float32, (12,)),
      "obs:torso_vertical": ArraySpec(np.float32, (3,)),
      "obs:com_velocity": ArraySpec(np.float32, (3,)),
      "obs:velocity": ArraySpec(np.float32, (62,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 56), -1.0, 1.0)}

  _EXT_BODIES = ("lhand", "lfoot", "rhand", "rfoot")

  @classmethod
  def _obs(cls, cfg, state):
    mdl = cls.mdl(cfg)
    q, v = state["q"], state["v"]
    xpos, xmat, _, _ = de.fk(mdl, q)
    thorax = mdl.body_name2id["thorax"]
    frame = xmat[thorax]
    tpos = xpos[thorax]
    ext = []
    for b in cls._EXT_BODIES:
      ext.append((xpos[mdl.body_name2id[b]] - tpos) @ frame)
    return {
      "joint_angles": q[7:],
      "head_height": xpos[mdl.body_name2id["head"]][2],
      "extremities": jnp.concatenate(ext),
      "torso_vertical": frame[2],
      "com_velocity": de.subtree_linvel(mdl, q, v, "thorax"),
      "velocity": v,
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    from .. import device_collision as dc
    mdl = cls.mdl(cfg)
    cd = mdl.contacts
    q0, v = cls._reset_qv(cfg)
    qs, oks, dists, gates = [], [], [], []
    for k in jax.random.split(key, cls._INIT_DRAWS):
      qc = randomize_limited_and_rotational_joints(mdl, q0, k)
      xpos, xmat, _, _ = de.fk(mdl, qc)
      _, dist, _, _, _, gate = dc.contact_points(cd, xpos, xmat, qc.dtype)
      oks.append(jnp.all((dist >= 0) | ~gate))
      qs.append(qc)
      dists.append(dist)
      gates.append(gate)
    pick = _pick_collision_free(oks, dists, gates)
    state = {"q": jnp.stack(qs)[pick], "v": v}
    return state, cls._obs(cfg, state), dict(cls._DISCOUNT_INFO)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    ctrl = jnp.asarray(action, jnp.float32)
    state = cls._physics(cfg, state, ctrl)
    mdl = cls.mdl(cfg)
    q, v = state["q"], state["v"]
    xpos, xmat, _, _ = de.fk(mdl, q)
    # humanoid_CMU.h:199-202: upright = thorax zy component
    reward = cls._reward(
      cfg, state, jnp.clip(ctrl, -1.0, 1.0),
      xpos[mdl.body_name2id["head"]][2],
      xmat[mdl.body_name2id["thorax"]][2, 1],
      de.subtree_linvel(mdl, q, v, "thorax"),
    )
    return state, cls._obs(cfg, state), reward, jnp.bool_(False), dict(
      cls._DISCOUNT_INFO
    )
