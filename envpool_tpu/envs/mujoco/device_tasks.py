"""On-device MuJoCo gym tasks (`-Jax-v4`): vmapped TPU-resident physics.

The host tier (``gym_tasks.py``) mirrors the reference's worker-thread
design over raw ``mj_step`` (``envpool/mujoco/gym/mujoco_env.h:44-94``);
these classes are the TPU-first alternative: the same gym task semantics
(obs/reward/termination/reset-noise per the v4 generation, matching
``envpool/mujoco/gym/{reacher,inverted_pendulum,inverted_double_pendulum}.h``)
over the pure-JAX smooth-dynamics engine in ``device_engine.py``, stepped
entirely on-device by ``TpuEnvPool`` — thousands of MuJoCo envs per chip
with no per-step host traffic.

Registered ids: ``ReacherJax-v4``, ``InvertedPendulumJax-v4``,
``InvertedDoublePendulumJax-v4``, ``SwimmerJax-v4`` (contact-free), plus
the contact-rich locomotion tasks ``HalfCheetahJax-v4``,
``HopperJax-v4``, ``Walker2dJax-v4``, ``AntJax-v4`` (free quaternion
root), ``HumanoidJax-v4`` and ``HumanoidStandupJax-v4`` (23 dofs,
all-pairs collision, the 376-dim com-frame observation) — these run
MuJoCo's full contact pipeline (plane/sphere/capsule collision,
pyramidal friction, Newton solve) on device via
``device_collision.py``. Swimmer exercises the engine's fluid
model (density/viscosity medium forces) and RK4 integration
(``envpool/mujoco/gym/swimmer.h`` semantics).

Known deviations from the host/gym implementation (documented contract):
- RNG streams are jax.random, not MT19937 — reset noise is identically
  *distributed*, not bit-identical (SURVEY §7 hard part #1);
- Reacher's goal rejection-sampling loop is replaced by an exact uniform
  polar draw on the same open disk (identical distribution, no loop);
- InvertedDoublePendulum's ``qfrc_constraint`` obs slice is computed at
  the post-step state; gym reports the value MuJoCo cached from the last
  substep's pre-integration forward pass. Both are exactly zero whenever
  the cart's rail limit is inactive, i.e. in the entire healthy regime.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

from . import device_engine as de

_INF = float(np.finfo(np.float32).max)


def _asset(name: str) -> str:
  import gymnasium
  return os.path.join(
    os.path.dirname(gymnasium.__file__), "envs", "mujoco", "assets", name
  )


@functools.lru_cache(maxsize=8)
def _model(xml_name: str) -> de.DeviceModel:
  return de.extract_model(_asset(xml_name))


class DeviceMujocoEnv(FuncEnv):
  """Shared scaffolding: state = {q, v}; step = engine x frame_skip."""

  xml_file: str = ""
  frame_skip: int = 2

  @classmethod
  def mdl(cls) -> de.DeviceModel:
    return _model(cls.xml_file)

  @classmethod
  def _physics(cls, state, action):
    mdl = cls.mdl()
    q, v = state["q"], state["v"]
    return de.step_smooth(mdl, q, v, action, nstep=cls.frame_skip)


class ReacherJaxEnv(DeviceMujocoEnv):
  """Reacher-v4 on-device (``envpool/mujoco/gym/reacher.h`` semantics)."""

  name = "ReacherJax"
  xml_file = "reacher.xml"
  frame_skip = 2

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": -3.75,
      "reset_qpos_scale": 0.1, "reset_qvel_scale": 0.005,
      "reset_goal_scale": 0.2,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (11,), -_INF, _INF),
      "info:reward_dist": ArraySpec(np.float32, (-1,)),
      "info:reward_ctrl": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 2), -1.0, 1.0)}

  @classmethod
  def _obs(cls, state):
    mdl = cls.mdl()
    q, v = state["q"], state["v"]
    theta = q[:2]
    vec = (
      de.body_xpos(mdl, q, "fingertip") - de.body_xpos(mdl, q, "target")
    )
    return jnp.concatenate(
      [jnp.cos(theta), jnp.sin(theta), q[2:], v[:2], vec]
    )

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kg, kr, kv = jax.random.split(key, 4)
    qs = float(cfg.reset_qpos_scale)
    gs = float(cfg.reset_goal_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -qs, qs
    )
    # exact uniform draw on the open goal disk (same distribution as
    # gym's rejection loop, loop-free)
    r = gs * jnp.sqrt(jax.random.uniform(kg, (), jnp.float32))
    ang = jax.random.uniform(kr, (), jnp.float32, 0.0, 2 * np.pi)
    q = q.at[-2].set(r * jnp.cos(ang)).at[-1].set(r * jnp.sin(ang))
    v = jax.random.uniform(
      kv, (mdl.nv,), jnp.float32,
      -float(cfg.reset_qvel_scale), float(cfg.reset_qvel_scale),
    )
    v = v.at[-2:].set(0.0)
    state = {"q": q, "v": v}
    zero = jnp.float32(0.0)
    return state, cls._obs(state), {
      "reward_dist": zero, "reward_ctrl": zero
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    q = state["q"]
    vec = (
      de.body_xpos(mdl, q, "fingertip") - de.body_xpos(mdl, q, "target")
    )
    reward_dist = -jnp.linalg.norm(vec)
    reward_ctrl = -jnp.sum(jnp.square(action))
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    reward = reward_dist + reward_ctrl
    return state, cls._obs(state), reward, jnp.bool_(False), {
      "reward_dist": reward_dist, "reward_ctrl": reward_ctrl
    }


class InvertedPendulumJaxEnv(DeviceMujocoEnv):
  """InvertedPendulum-v4 on-device
  (``envpool/mujoco/gym/inverted_pendulum.h`` semantics)."""

  name = "InvertedPendulumJax"
  xml_file = "inverted_pendulum.xml"
  frame_skip = 2

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 950.0, "healthy_reward": 1.0,
      "healthy_z_min": -0.2, "healthy_z_max": 0.2,
      "reset_noise_scale": 0.01,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"obs": ArraySpec(np.float32, (4,), -_INF, _INF)}

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 1), -3.0, 3.0)}

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    v = jax.random.uniform(kv, (mdl.nv,), jnp.float32, -s, s)
    state = {"q": q, "v": v}
    return state, jnp.concatenate([q, v]), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    action = jnp.asarray(action, jnp.float32)
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    obs = jnp.concatenate([q1, v1])
    term = (~jnp.all(jnp.isfinite(obs))) | (
      jnp.abs(obs[1]) > float(cfg.healthy_z_max)
    )
    return state, obs, jnp.float32(cfg.healthy_reward), term, {}


class InvertedDoublePendulumJaxEnv(DeviceMujocoEnv):
  """InvertedDoublePendulum-v4 on-device
  (``envpool/mujoco/gym/inverted_double_pendulum.h`` semantics)."""

  name = "InvertedDoublePendulumJax"
  xml_file = "inverted_double_pendulum.xml"
  frame_skip = 5

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 9100.0, "healthy_reward": 10.0,
      "observation_min": -10.0, "observation_max": 10.0,
      "reset_noise_scale": 0.1,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"obs": ArraySpec(np.float32, (11,), -_INF, _INF)}

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 1), -1.0, 1.0)}

  @classmethod
  def _obs(cls, state):
    mdl = cls.mdl()
    q, v = state["q"], state["v"]
    # qfrc_constraint at the current state (see module docstring)
    tau = jnp.zeros(mdl.nv, q.dtype)
    M, qfrc_smooth, _ = de._qacc_smooth_parts(mdl, q, v, tau)
    qacc_sm = de._solve_psd(M, qfrc_smooth)
    qfrc_con = de.limit_constraint_force(
      mdl, q, v, de._minv(mdl, M), qacc_sm
    )
    return jnp.concatenate([
      q[:1], jnp.sin(q[1:]), jnp.cos(q[1:]),
      jnp.clip(v, float(-10.0), float(10.0)),
      jnp.clip(qfrc_con, float(-10.0), float(10.0)),
    ])

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    v = jax.random.normal(kv, (mdl.nv,), jnp.float32) * s
    state = {"q": q, "v": v}
    return state, cls._obs(state), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    tip = de.site_xpos(mdl, q1, "tip")
    x, y = tip[0], tip[2]
    dist_penalty = 0.01 * x * x + (y - 2.0) ** 2
    v1_, v2_ = v1[1], v1[2]
    vel_penalty = 1e-3 * v1_ * v1_ + 5e-3 * v2_ * v2_
    reward = float(cfg.healthy_reward) - dist_penalty - vel_penalty
    term = y <= 1.0
    return state, cls._obs(state), reward, term, {}


class SwimmerJaxEnv(DeviceMujocoEnv):
  """Swimmer-v4 on-device (``envpool/mujoco/gym/swimmer.h:33-160``).

  First task through the engine's fluid-force path: swimmer.xml sets
  density=4000 viscosity=0.1, so the medium forces (inertia-box model)
  ARE the dynamics — gravity is irrelevant in-plane and there are no
  contacts. Also the first 3-joint body (2 slides + 1 hinge on the
  torso) and the first RK4-integrated task.
  """

  name = "SwimmerJax"
  xml_file = "swimmer.xml"
  frame_skip = 4

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 360.0,
      "forward_reward_weight": 1.0,
      "ctrl_cost_weight": 1e-4,
      "reset_noise_scale": 0.1,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (8,), -_INF, _INF),
      "info:reward_fwd": ArraySpec(np.float32, (-1,)),
      "info:reward_ctrl": ArraySpec(np.float32, (-1,)),
      "info:x_position": ArraySpec(np.float32, (-1,)),
      "info:y_position": ArraySpec(np.float32, (-1,)),
      "info:distance_from_origin": ArraySpec(np.float32, (-1,)),
      "info:x_velocity": ArraySpec(np.float32, (-1,)),
      "info:y_velocity": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 2), -1.0, 1.0)}

  @staticmethod
  def _obs(state):
    q, v = state["q"], state["v"]
    return jnp.concatenate([q[2:], v])

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    v = jax.random.uniform(kv, (mdl.nv,), jnp.float32, -s, s)
    state = {"q": q, "v": v}
    zero = jnp.float32(0.0)
    return state, cls._obs(state), {
      "reward_fwd": zero, "reward_ctrl": zero,
      "x_position": q[0], "y_position": q[1],
      "distance_from_origin": jnp.sqrt(q[0] ** 2 + q[1] ** 2),
      "x_velocity": zero, "y_velocity": zero,
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    x0, y0 = state["q"][0], state["q"][1]
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    dt = cls.frame_skip * mdl.timestep
    xv = (q1[0] - x0) / dt
    yv = (q1[1] - y0) / dt
    reward_fwd = float(cfg.forward_reward_weight) * xv
    ctrl_cost = float(cfg.ctrl_cost_weight) * jnp.sum(jnp.square(action))
    reward = reward_fwd - ctrl_cost
    return state, cls._obs(state), reward, jnp.bool_(False), {
      "reward_fwd": reward_fwd, "reward_ctrl": -ctrl_cost,
      "x_position": q1[0], "y_position": q1[1],
      "distance_from_origin": jnp.sqrt(q1[0] ** 2 + q1[1] ** 2),
      "x_velocity": xv, "y_velocity": yv,
    }


class HalfCheetahJaxEnv(DeviceMujocoEnv):
  """HalfCheetah-v4 on-device (``envpool/mujoco/gym/half_cheetah.h``).

  First contact-rich task through the device engine: 8 capsule-vs-plane
  candidate contacts with pyramidal friction, solved by the on-device
  Newton iteration (device_collision.py) at every Euler substep.
  """

  name = "HalfCheetahJax"
  xml_file = "half_cheetah.xml"
  frame_skip = 5

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 4800.0,
      "forward_reward_weight": 1.0,
      "ctrl_cost_weight": 0.1,
      "reset_noise_scale": 0.1,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (17,), -_INF, _INF),
      "info:reward_run": ArraySpec(np.float32, (-1,)),
      "info:reward_ctrl": ArraySpec(np.float32, (-1,)),
      "info:x_position": ArraySpec(np.float32, (-1,)),
      "info:x_velocity": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 6), -1.0, 1.0)}

  @staticmethod
  def _obs(state):
    return jnp.concatenate([state["q"][1:], state["v"]])

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    # gym's HalfCheetah uses NORMAL velocity noise (uniform positions)
    v = s * jax.random.normal(kv, (mdl.nv,), jnp.float32)
    state = {"q": q, "v": v}
    zero = jnp.float32(0.0)
    return state, cls._obs(state), {
      "reward_run": zero, "reward_ctrl": zero,
      "x_position": q[0], "x_velocity": zero,
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    x0 = state["q"][0]
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    dt = cls.frame_skip * mdl.timestep
    xv = (q1[0] - x0) / dt
    reward_run = float(cfg.forward_reward_weight) * xv
    ctrl_cost = float(cfg.ctrl_cost_weight) * jnp.sum(jnp.square(action))
    reward = reward_run - ctrl_cost
    return state, cls._obs(state), reward, jnp.bool_(False), {
      "reward_run": reward_run, "reward_ctrl": -ctrl_cost,
      "x_position": q1[0], "x_velocity": xv,
    }


class HopperJaxEnv(DeviceMujocoEnv):
  """Hopper-v4 on-device (``envpool/mujoco/gym/hopper.h``).

  RK4-integrated with contacts resolved at every stage (mj_RungeKutta
  evaluates the full constrained forward dynamics four times per
  substep); healthy-state termination per the v4 generation.
  """

  name = "HopperJax"
  xml_file = "hopper.xml"
  frame_skip = 4

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 6000.0,
      "terminate_when_unhealthy": True,
      "forward_reward_weight": 1.0,
      "ctrl_cost_weight": 1e-3,
      "healthy_reward": 1.0,
      "velocity_min": -10.0, "velocity_max": 10.0,
      "healthy_state_min": -100.0, "healthy_state_max": 100.0,
      "healthy_angle_min": -0.2, "healthy_angle_max": 0.2,
      "healthy_z_min": 0.7,
      "reset_noise_scale": 5e-3,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (11,), -_INF, _INF),
      "info:x_position": ArraySpec(np.float32, (-1,)),
      "info:x_velocity": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 3), -1.0, 1.0)}

  @classmethod
  def _obs_of(cls, cfg, state):
    return jnp.concatenate([
      state["q"][1:],
      jnp.clip(
        state["v"], float(cfg.velocity_min), float(cfg.velocity_max)
      ),
    ])

  @classmethod
  def _healthy(cls, cfg, state):
    q, v = state["q"], state["v"]
    z, angle = q[1], q[2]
    lo, hi = float(cfg.healthy_state_min), float(cfg.healthy_state_max)
    st = jnp.concatenate([q[2:], v])
    return (
      (z > float(cfg.healthy_z_min))
      & (angle > float(cfg.healthy_angle_min))
      & (angle < float(cfg.healthy_angle_max))
      & jnp.all((st > lo) & (st < hi))
    )

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    v = jax.random.uniform(kv, (mdl.nv,), jnp.float32, -s, s)
    state = {"q": q, "v": v}
    return state, cls._obs_of(cfg, state), {
      "x_position": q[0], "x_velocity": jnp.float32(0.0),
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    x0 = state["q"][0]
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    dt = cls.frame_skip * mdl.timestep
    xv = (q1[0] - x0) / dt
    ctrl_cost = float(cfg.ctrl_cost_weight) * jnp.sum(jnp.square(action))
    healthy = cls._healthy(cfg, state)
    if bool(cfg.terminate_when_unhealthy):
      survive = jnp.float32(float(cfg.healthy_reward))
      term = ~healthy
    else:
      survive = jnp.where(healthy, float(cfg.healthy_reward), 0.0)
      term = jnp.bool_(False)
    reward = float(cfg.forward_reward_weight) * xv + survive - ctrl_cost
    return state, cls._obs_of(cfg, state), reward, term, {
      "x_position": q1[0], "x_velocity": xv,
    }


class Walker2dJaxEnv(HopperJaxEnv):
  """Walker2d-v4 on-device (``envpool/mujoco/gym/walker2d.h``)."""

  name = "Walker2dJax"
  xml_file = "walker2d.xml"
  frame_skip = 4

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "terminate_when_unhealthy": True,
      "forward_reward_weight": 1.0,
      "ctrl_cost_weight": 1e-3,
      "healthy_reward": 1.0,
      "velocity_min": -10.0, "velocity_max": 10.0,
      "healthy_z_min": 0.8, "healthy_z_max": 2.0,
      "healthy_angle_min": -1.0, "healthy_angle_max": 1.0,
      "reset_noise_scale": 5e-3,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (17,), -_INF, _INF),
      "info:x_position": ArraySpec(np.float32, (-1,)),
      "info:x_velocity": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 6), -1.0, 1.0)}

  @classmethod
  def _healthy(cls, cfg, state):
    z, angle = state["q"][1], state["q"][2]
    return (
      (z >= float(cfg.healthy_z_min))
      & (z <= float(cfg.healthy_z_max))
      & (angle >= float(cfg.healthy_angle_min))
      & (angle <= float(cfg.healthy_angle_max))
    )


class AntJaxEnv(DeviceMujocoEnv):
  """Ant-v4 on-device (``envpool/mujoco/gym/ant.h:30-226``).

  First free-joint (quaternion root) task through the device engine:
  RK4 over 3D rigid-body dynamics with 25 candidate plane contacts
  (8 leg capsules x 2 endpoints + torso sphere + 8 ankle capsules x 2)
  resolved by the on-device Newton solve each stage. The gym v4 default
  ``use_contact_forces=False`` observation (27-dim) is implemented;
  cfrc_ext observations are not (host tier covers that variant).
  """

  name = "AntJax"
  xml_file = "ant.xml"
  frame_skip = 5

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 6000.0,
      "terminate_when_unhealthy": True,
      "forward_reward_weight": 1.0,
      "ctrl_cost_weight": 0.5,
      "healthy_reward": 1.0,
      "healthy_z_min": 0.2, "healthy_z_max": 1.0,
      "reset_noise_scale": 0.1,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (27,), -_INF, _INF),
      "info:reward_forward": ArraySpec(np.float32, (-1,)),
      "info:reward_ctrl": ArraySpec(np.float32, (-1,)),
      "info:reward_survive": ArraySpec(np.float32, (-1,)),
      "info:x_position": ArraySpec(np.float32, (-1,)),
      "info:y_position": ArraySpec(np.float32, (-1,)),
      "info:distance_from_origin": ArraySpec(np.float32, (-1,)),
      "info:x_velocity": ArraySpec(np.float32, (-1,)),
      "info:y_velocity": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 8), -1.0, 1.0)}

  @staticmethod
  def _obs(state):
    return jnp.concatenate([state["q"][2:], state["v"]])

  @classmethod
  def _healthy(cls, cfg, state):
    z = state["q"][2]
    finite = jnp.all(jnp.isfinite(state["q"])) & jnp.all(
      jnp.isfinite(state["v"])
    )
    return (
      finite
      & (z >= float(cfg.healthy_z_min))
      & (z <= float(cfg.healthy_z_max))
    )

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    v = s * jax.random.normal(kv, (mdl.nv,), jnp.float32)
    state = {"q": q, "v": v}
    zero = jnp.float32(0.0)
    return state, cls._obs(state), {
      "reward_forward": zero, "reward_ctrl": zero, "reward_survive": zero,
      "x_position": q[0], "y_position": q[1],
      "distance_from_origin": jnp.sqrt(q[0] ** 2 + q[1] ** 2),
      "x_velocity": zero, "y_velocity": zero,
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    x0, y0 = state["q"][0], state["q"][1]
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    dt = cls.frame_skip * mdl.timestep
    xv = (q1[0] - x0) / dt
    yv = (q1[1] - y0) / dt
    reward_forward = float(cfg.forward_reward_weight) * xv
    ctrl_cost = float(cfg.ctrl_cost_weight) * jnp.sum(jnp.square(action))
    healthy = cls._healthy(cfg, state)
    if bool(cfg.terminate_when_unhealthy):
      survive = jnp.float32(float(cfg.healthy_reward))
      term = ~healthy
    else:
      survive = jnp.where(healthy, float(cfg.healthy_reward), 0.0)
      term = jnp.bool_(False)
    reward = reward_forward + survive - ctrl_cost
    return state, cls._obs(state), reward, term, {
      "reward_forward": reward_forward, "reward_ctrl": -ctrl_cost,
      "reward_survive": survive,
      "x_position": q1[0], "y_position": q1[1],
      "distance_from_origin": jnp.sqrt(q1[0] ** 2 + q1[1] ** 2),
      "x_velocity": xv, "y_velocity": yv,
    }


class HumanoidJaxEnv(DeviceMujocoEnv):
  """Humanoid-v4 on-device (``envpool/mujoco/gym/humanoid.h``).

  The heaviest device task: 23 dofs, 140 candidate contact points
  (all-pairs filtering: frictionless body-body + pyramidal plane
  contacts), and the full 376-dim v4 observation — cinert/cvel are the
  com-frame quantities of ``de.com_quantities`` and cfrc_ext comes from
  the constraint solver's contact forces. Matching gymnasium exactly,
  the derived observation parts and the mass-center reward use the
  LAST FORWARD state (RK4 stage 4 of the final substep) that mjData
  retains after ``mj_step`` — not the integrated qpos (see
  ``step_smooth(want_aux=True)``); qpos/qvel in the observation are the
  fresh post-step values, as in gym.
  """

  name = "HumanoidJax"
  xml_file = "humanoid.xml"
  frame_skip = 5

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "forward_reward_weight": 1.25,
      "terminate_when_unhealthy": True,
      "ctrl_cost_weight": 0.1,
      "healthy_reward": 5.0,
      "healthy_z_min": 1.0, "healthy_z_max": 2.0,
      "reset_noise_scale": 1e-2,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (376,), -_INF, _INF),
      "info:reward_linvel": ArraySpec(np.float32, (-1,)),
      "info:reward_quadctrl": ArraySpec(np.float32, (-1,)),
      "info:reward_alive": ArraySpec(np.float32, (-1,)),
      "info:x_position": ArraySpec(np.float32, (-1,)),
      "info:y_position": ArraySpec(np.float32, (-1,)),
      "info:distance_from_origin": ArraySpec(np.float32, (-1,)),
      "info:x_velocity": ArraySpec(np.float32, (-1,)),
      "info:y_velocity": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 17), -0.4, 0.4)}

  @classmethod
  def _mass_center(cls, xipos):
    mdl = cls.mdl()
    mass = jnp.asarray(mdl.body_mass, xipos.dtype)
    return (mass[:, None] * xipos).sum(0)[:2] / mass.sum()

  @classmethod
  def _derived(cls, qf, vf, fext):
    """(mc, cinert, cvel, cfrc_ext) at the last-forward state."""
    mdl = cls.mdl()
    com0, xipos, cinert, cvel = de.com_quantities(mdl, qf, vf)
    F = fext[:, 3:]
    trq = fext[:, :3] - jnp.cross(com0[None, :], F)
    cfrc = jnp.concatenate([trq, F], axis=1)
    return cls._mass_center(xipos), cinert, cvel, cfrc

  @classmethod
  def _obs_of(cls, q, v, cinert, cvel, qfrc_act, cfrc):
    return jnp.concatenate([
      q[2:], v, cinert.ravel(), cvel.ravel(), qfrc_act, cfrc.ravel()
    ])

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    v = jax.random.uniform(kv, (mdl.nv,), jnp.float32, -s, s)
    # at reset mjData's derived fields are FRESH (set_state forwards) and
    # cfrc_ext / qfrc_actuator are zero
    com0, xipos, cinert, cvel = de.com_quantities(mdl, q, v)
    mc = cls._mass_center(xipos)
    zeros_frc = jnp.zeros((mdl.nbody, 6), jnp.float32)
    obs = cls._obs_of(
      q, v, cinert, cvel, jnp.zeros(mdl.nv, jnp.float32), zeros_frc
    )
    state = {"q": q, "v": v, "mc": mc}
    zero = jnp.float32(0.0)
    return state, obs, {
      "reward_linvel": zero, "reward_quadctrl": zero, "reward_alive": zero,
      "x_position": mc[0], "y_position": mc[1],
      "distance_from_origin": jnp.sqrt(mc[0] ** 2 + mc[1] ** 2),
      "x_velocity": zero, "y_velocity": zero,
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    q1, v1, (qf, vf, fext, _f) = de.step_smooth(
      mdl, state["q"], state["v"], action, nstep=cls.frame_skip,
      want_aux=True,
    )
    mc, cinert, cvel, cfrc = cls._derived(qf, vf, fext)
    dt = cls.frame_skip * mdl.timestep
    xv = (mc[0] - state["mc"][0]) / dt
    yv = (mc[1] - state["mc"][1]) / dt
    state = {"q": q1, "v": v1, "mc": mc}
    qfrc_act = de.actuator_force(mdl, action)
    obs = cls._obs_of(q1, v1, cinert, cvel, qfrc_act, cfrc)
    reward_linvel = float(cfg.forward_reward_weight) * xv
    ctrl_cost = float(cfg.ctrl_cost_weight) * jnp.sum(jnp.square(action))
    healthy = (q1[2] > float(cfg.healthy_z_min)) & (
      q1[2] < float(cfg.healthy_z_max)
    )
    if bool(cfg.terminate_when_unhealthy):
      survive = jnp.float32(float(cfg.healthy_reward))
      term = ~healthy
    else:
      survive = jnp.where(healthy, float(cfg.healthy_reward), 0.0)
      term = jnp.bool_(False)
    reward = reward_linvel + survive - ctrl_cost
    return state, obs, reward, term, {
      "reward_linvel": reward_linvel, "reward_quadctrl": -ctrl_cost,
      "reward_alive": survive,
      "x_position": mc[0], "y_position": mc[1],
      "distance_from_origin": jnp.sqrt(mc[0] ** 2 + mc[1] ** 2),
      "x_velocity": xv, "y_velocity": yv,
    }


class HumanoidStandupJaxEnv(HumanoidJaxEnv):
  """HumanoidStandup-v4 on-device
  (``envpool/mujoco/gym/humanoid_standup.h``)."""

  name = "HumanoidStandupJax"
  xml_file = "humanoidstandup.xml"
  frame_skip = 5

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "forward_reward_weight": 1.0,
      "ctrl_cost_weight": 0.1,
      "contact_cost_weight": 5e-7, "contact_cost_max": 10.0,
      "healthy_reward": 1.0,
      "reset_noise_scale": 1e-2,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (376,), -_INF, _INF),
      "info:reward_linup": ArraySpec(np.float32, (-1,)),
      "info:reward_quadctrl": ArraySpec(np.float32, (-1,)),
      "info:reward_impact": ArraySpec(np.float32, (-1,)),
      "info:reward_alive": ArraySpec(np.float32, (-1,)),
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kq, kv = jax.random.split(key)
    s = float(cfg.reset_noise_scale)
    q = jnp.asarray(mdl.init_qpos, jnp.float32) + jax.random.uniform(
      kq, (mdl.nq,), jnp.float32, -s, s
    )
    v = jax.random.uniform(kv, (mdl.nv,), jnp.float32, -s, s)
    com0, xipos, cinert, cvel = de.com_quantities(mdl, q, v)
    obs = cls._obs_of(
      q, v, cinert, cvel, jnp.zeros(mdl.nv, jnp.float32),
      jnp.zeros((mdl.nbody, 6), jnp.float32),
    )
    state = {"q": q, "v": v, "mc": cls._mass_center(xipos)}
    zero = jnp.float32(0.0)
    return state, obs, {
      "reward_linup": zero, "reward_quadctrl": zero,
      "reward_impact": zero, "reward_alive": zero,
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    q1, v1, (qf, vf, fext, _f) = de.step_smooth(
      mdl, state["q"], state["v"], action, nstep=cls.frame_skip,
      want_aux=True,
    )
    mc, cinert, cvel, cfrc = cls._derived(qf, vf, fext)
    state = {"q": q1, "v": v1, "mc": mc}
    qfrc_act = de.actuator_force(mdl, action)
    obs = cls._obs_of(q1, v1, cinert, cvel, qfrc_act, cfrc)
    uph = q1[2] / jnp.float32(mdl.timestep)
    reward_linup = float(cfg.forward_reward_weight) * uph
    ctrl_cost = float(cfg.ctrl_cost_weight) * jnp.sum(jnp.square(action))
    impact = jnp.minimum(
      float(cfg.contact_cost_weight) * jnp.sum(jnp.square(cfrc)),
      float(cfg.contact_cost_max),
    )
    survive = jnp.float32(float(cfg.healthy_reward))
    reward = reward_linup + survive - ctrl_cost - impact
    return state, obs, reward, jnp.bool_(False), {
      "reward_linup": reward_linup, "reward_quadctrl": -ctrl_cost,
      "reward_impact": -impact, "reward_alive": survive,
    }


class PusherJaxEnv(DeviceMujocoEnv):
  """Pusher-v4 on-device (``envpool/mujoco/gym/pusher.h`` semantics).

  Exercises the engine's cylinder contacts (plane-cylinder face/edge/
  side regimes + capsule-cylinder closest-point, all condim-1) — the
  last gym MuJoCo task family to come on-device. Rewards match the
  reference: pre-step near/dist costs from body frame origins
  (``data_->xpos``), weights 0.5/1.0/0.1.

  Deviation contract: MuJoCo>=3 routes capsule-cylinder through its
  iterative native-CCD (multi-point manifolds); this engine reproduces
  the single-contact MPR behavior of the MuJoCo 2.x generation that
  gym's Pusher-v4 and the reference pin (gym refuses Pusher-v4 on
  mujoco>=3 outright). See ``tests/test_device_pusher.py``.
  """

  name = "PusherJax"
  xml_file = "pusher.xml"
  frame_skip = 5

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 0.0,
      "ctrl_cost_weight": 0.1,
      "dist_cost_weight": 1.0,
      "near_cost_weight": 0.5,
      "reset_qvel_scale": 0.005,
      "cylinder_x_min": -0.3, "cylinder_x_max": 0.0,
      "cylinder_y_min": -0.2, "cylinder_y_max": 0.2,
      "cylinder_dist_min": 0.17,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (23,), -_INF, _INF),
      "info:reward_dist": ArraySpec(np.float32, (-1,)),
      "info:reward_ctrl": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 7), -2.0, 2.0)}

  @classmethod
  def _obs(cls, state):
    mdl = cls.mdl()
    q, v = state["q"], state["v"]
    return jnp.concatenate([
      q[:7], v[:7],
      de.body_xpos(mdl, q, "tips_arm"),
      de.body_xpos(mdl, q, "object"),
      de.body_xpos(mdl, q, "goal"),
    ])

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    mdl = cls.mdl()
    kc, kv = jax.random.split(key)
    q = jnp.asarray(mdl.init_qpos, jnp.float32)
    # gym's rejection loop: uniform on the cylinder box conditioned on
    # hypot(x, y) > dist_min (same distribution, device while_loop)
    xlo, xhi = float(cfg.cylinder_x_min), float(cfg.cylinder_x_max)
    ylo, yhi = float(cfg.cylinder_y_min), float(cfg.cylinder_y_max)
    dmin = float(cfg.cylinder_dist_min)

    def _cond(c):
      return ~c[3]

    def _draw(c):
      k = c[0]
      k, k1, k2 = jax.random.split(k, 3)
      x = jax.random.uniform(k1, (), jnp.float32, xlo, xhi)
      y = jax.random.uniform(k2, (), jnp.float32, ylo, yhi)
      return k, x, y, jnp.hypot(x, y) > dmin

    _, x, y, _ = jax.lax.while_loop(
      _cond, _draw, (kc, jnp.float32(0.0), jnp.float32(0.0), jnp.bool_(False))
    )
    q = q.at[-4].set(x).at[-3].set(y).at[-2].set(0.0).at[-1].set(0.0)
    s = float(cfg.reset_qvel_scale)
    v = jax.random.uniform(kv, (mdl.nv,), jnp.float32, -s, s)
    v = v.at[-4:].set(0.0)
    state = {"q": q, "v": v}
    zero = jnp.float32(0.0)
    return state, cls._obs(state), {
      "reward_dist": zero, "reward_ctrl": zero
    }

  @classmethod
  def step(cls, cfg: Any, state: Any, action: Any, key: jax.Array):
    del key
    mdl = cls.mdl()
    action = jnp.asarray(action, jnp.float32)
    q = state["q"]
    x_obj = de.body_xpos(mdl, q, "object")
    near_cost = jnp.linalg.norm(x_obj - de.body_xpos(mdl, q, "tips_arm"))
    dist_cost = jnp.linalg.norm(x_obj - de.body_xpos(mdl, q, "goal"))
    q1, v1 = cls._physics(state, action)
    state = {"q": q1, "v": v1}
    ctrl_cost = jnp.sum(jnp.square(action))
    reward = -(
      float(cfg.dist_cost_weight) * dist_cost
      + float(cfg.ctrl_cost_weight) * ctrl_cost
      + float(cfg.near_cost_weight) * near_cost
    )
    return state, cls._obs(state), reward, jnp.bool_(False), {
      "reward_dist": -dist_cost, "reward_ctrl": -ctrl_cost
    }
