"""On-device Pusher: cylinder-contact parity vs MuJoCo + API smoke.

Covers the two new narrow phases in ``device_collision.py``:

* plane-cylinder — reverse-engineered analytic regimes (deepest rim
  point / +-120 deg face rims below 45 deg tilt / far side-line
  endpoint); asserted row-for-row against ``mjData.efc_*`` like the
  other contact models (reference methodology:
  ``envpool/mujoco/gym/mujoco_gym_align_test.py:42-60``).
* capsule-cylinder — analytic single closest-point contact. MuJoCo 2.x
  (the generation gym's Pusher-v4 and the reference envpool pin) used
  libccd MPR: ONE contact per convex pair, which is what this engine
  reproduces; MuJoCo >= 3 (installed here) runs an iterative native-CCD
  that emits multi-point manifolds and refuses Pusher-v4 in gym
  entirely. Deviation contract asserted below: bit-parity whenever no
  capsule-cylinder contact is active (the overwhelming majority of
  Pusher states), bounded sub-millimeter drift through sustained
  finger-object contact episodes.
"""

import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
import gymnasium  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import envpool_tpu  # noqa: E402
from envpool_tpu.envs.mujoco import device_collision as dc  # noqa: E402
from envpool_tpu.envs.mujoco import device_engine as de  # noqa: E402
from _isolation import isolated  # noqa: E402


def _asset(n):
  return os.path.join(
    os.path.dirname(gymnasium.__file__), "envs", "mujoco", "assets", n
  )


_CYL_XML = """
<mujoco>
  <option cone="pyramidal"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1" condim="1"/>
    <body name="cyl" pos="0 0 0.2"><freejoint/>
      <geom name="c" type="cylinder" size="0.05 0.05" condim="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def _sorted_rows(J, aref, D):
  key = np.round(np.concatenate([J, aref[:, None], D[:, None]], 1), 6)
  idx = np.lexsort(key.T[::-1])
  return J[idx], aref[idx], D[idx]


def _assert_rows_match(mdl, m, d, q, v, tol):
  d.qpos[:] = q
  d.qvel[:] = v
  mujoco.mj_forward(m, d)
  qj, vj = jnp.asarray(q), jnp.asarray(v)
  ctx = de._kin_ctx(mdl, qj)
  J, aref, D, mask = dc.assemble_rows(mdl, mdl.contacts, qj, vj, ctx)
  mk = np.asarray(mask)
  J = np.asarray(J)[mk]
  aref = np.asarray(aref)[mk]
  D = np.asarray(D)[mk]
  nefc = d.nefc
  assert nefc == J.shape[0], (nefc, J.shape[0])
  if nefc == 0:
    return
  J1, a1, D1 = _sorted_rows(
    d.efc_J.reshape(nefc, m.nv), d.efc_aref[:nefc].copy(),
    d.efc_D[:nefc].copy(),
  )
  J2, a2, D2 = _sorted_rows(J, aref, D)
  assert np.abs(J1 - J2).max() < tol
  assert np.abs(a1 - a2).max() < tol
  assert np.abs(D1 / np.maximum(D2, 1e-30) - 1).max() < tol


@isolated
def test_pusher_extraction() -> None:
  """Pusher extracts: 3 plane-capsule pairs, 1 plane-cylinder (4
  candidates), 3 capsule-cylinder, 11 joint limits, all condim-1."""
  mdl = de.extract_model(_asset("pusher.xml"))
  cd = mdl.contacts
  assert len(cd.pc_plane) == 3
  assert len(cd.pcy_plane) == 1
  assert len(cd.cyc_cap) == 3
  assert len(cd.lim_dof) == 11
  assert cd.nrows == 24
  assert np.all(cd.point_condim == 1)


@isolated
def test_plane_cylinder_rows_match_efc(tmp_path) -> None:
  """All three mjc_PlaneCylinder regimes (face/edge/side) produce the
  same active rows as mjData.efc over random free-body poses."""
  xml = tmp_path / "cyl.xml"
  xml.write_text(_CYL_XML)
  with jax.enable_x64(True):
    mdl = de.extract_model(str(xml))
    m = mujoco.MjModel.from_xml_path(str(xml))
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    for _ in range(80):
      q = m.qpos0.copy()
      q[:2] = rng.uniform(-0.1, 0.1, 2)
      q[2] = rng.uniform(0.02, 0.12)
      quat = rng.normal(size=4)
      q[3:7] = quat / np.linalg.norm(quat)
      v = rng.uniform(-1, 1, 6)
      _assert_rows_match(mdl, m, d, q, v, 1e-8)


@isolated
def test_pusher_rows_match_efc() -> None:
  """Full Pusher model: arm-random states produce mj's exact efc rows
  (plane-capsule, plane-cylinder, joint limits; 4.6e-13 measured)."""
  with jax.enable_x64(True):
    mdl = de.extract_model(_asset("pusher.xml"))
    m = mujoco.MjModel.from_xml_path(_asset("pusher.xml"))
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    d = mujoco.MjData(m)
    rng = np.random.default_rng(1)
    for _ in range(40):
      q = m.qpos0 + rng.uniform(-0.3, 0.3, m.nq)
      q[-2:] = 0.0
      v = rng.uniform(-1, 1, m.nv)
      _assert_rows_match(mdl, m, d, q, v, 1e-6)


def _grounded_arm_pose(m, d, rng):
  """Random arm pose whose finger capsule reaches table height."""
  lo, hi = m.jnt_range[:7, 0], m.jnt_range[:7, 1]
  while True:
    q = m.qpos0.copy()
    q[:7] = rng.uniform(lo, hi)
    d.qpos[:] = q
    mujoco.mj_forward(m, d)
    if -0.30 < d.geom_xpos[13][2] < -0.24:
      return q


@isolated
def test_pusher_rollout_parity_no_finger_contact() -> None:
  """100 control steps (500 mj substeps) from qpos0 with a moving arm:
  machine-precision parity while only plane contacts are active."""
  with jax.enable_x64(True):
    mdl = de.extract_model(_asset("pusher.xml"))
    m = mujoco.MjModel.from_xml_path(_asset("pusher.xml"))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    q0 = m.qpos0.copy()
    q0[-4], q0[-3] = -0.2, 0.1
    v0 = rng.uniform(-0.005, 0.005, m.nv)
    v0[-4:] = 0
    d.qpos[:] = q0
    d.qvel[:] = v0
    step = jax.jit(lambda q, v, u: de.step_smooth(mdl, q, v, u, nstep=5))
    qj, vj = jnp.asarray(q0), jnp.asarray(v0)
    for t in range(100):
      u = 0.4 * np.sin(0.05 * t + np.arange(7))
      d.ctrl[:] = u
      for _ in range(5):
        mujoco.mj_step(m, d)
      qj, vj = step(qj, vj, jnp.asarray(u))
    assert np.abs(np.asarray(qj) - d.qpos).max() < 1e-10
    assert np.abs(np.asarray(vj) - d.qvel).max() < 1e-10


@isolated
def test_pusher_finger_object_contact_bounded_drift() -> None:
  """Sustained finger-object (capsule-cylinder) contact: mj>=3's
  multi-point native-CCD vs this engine's single MPR-style contact
  drift stays sub-millimeter over 40 control steps (measured 5e-4)."""
  with jax.enable_x64(True):
    mdl = de.extract_model(_asset("pusher.xml"))
    m = mujoco.MjModel.from_xml_path(_asset("pusher.xml"))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(3)
    step = jax.jit(lambda q, v, u: de.step_smooth(mdl, q, v, u, nstep=5))
    contact_steps = 0
    for _ in range(4):
      q0 = _grounded_arm_pose(m, d, rng)
      # drop the object cylinder 60mm from the finger capsule center
      # (object slide joints: qpos[-4] is the y axis, qpos[-3] the x)
      g13 = d.geom_xpos[13].copy()
      base19 = d.geom_xpos[19] - np.array([q0[-3], q0[-4], 0.0])
      ang = rng.uniform(0, 2 * np.pi)
      target = g13[:2] + 0.06 * np.array([np.cos(ang), np.sin(ang)])
      q0[-3] = target[0] - base19[0]
      q0[-4] = target[1] - base19[1]
      q0[-2:] = 0.0
      d.qpos[:] = q0
      d.qvel[:] = 0
      mujoco.mj_forward(m, d)
      qj, vj = jnp.asarray(q0), jnp.asarray(np.zeros(m.nv))
      u = rng.uniform(-0.5, 0.5, 7)
      div = 0.0
      for _t in range(40):
        d.ctrl[:] = u
        for _ in range(5):
          mujoco.mj_step(m, d)
        for i in range(d.ncon):
          c = d.contact[i]
          ts = {int(m.geom_type[c.geom1]), int(m.geom_type[c.geom2])}
          if ts == {3, 5}:
            contact_steps += 1
        qj, vj = step(qj, vj, jnp.asarray(u))
        div = max(
          div,
          float(np.abs(np.asarray(qj) - d.qpos).max()),
          float(np.abs(np.asarray(vj) - d.qvel).max()),
        )
      assert div < 5e-3, div
    assert contact_steps > 0  # the scenario must actually exercise CCD


@isolated
def test_pusher_jax_through_pool() -> None:
  """PusherJax-v4 steps through TpuEnvPool: spec, shapes, reward sign,
  and the reset rejection region (hypot(obj xy) > 0.17)."""
  env = envpool_tpu.make(
    "PusherJax-v4", env_type="gymnasium", num_envs=16, seed=7
  )
  obs, _ = env.reset()
  assert obs.shape == (16, 23)
  assert np.isfinite(obs).all()
  # body positions are the last 9 obs entries: tips_arm, object, goal
  objp = obs[:, 17:20]
  goal = obs[:, 20:23]
  # goal body sits at its model position (slide joints reset to 0)
  assert np.allclose(goal, goal[0], atol=1e-6)
  # object and goal bodies share their model xy, so the object-goal xy
  # distance equals hypot(qpos[-3], qpos[-4]) — the rejection threshold
  d0 = np.linalg.norm((objp - goal)[:, :2], axis=1)
  assert (d0 > 0.168).all()
  for _ in range(5):
    act = np.random.default_rng(0).uniform(-1, 1, (16, 7)).astype(np.float32)
    obs, rew, term, trunc, info = env.step(act)
  assert obs.shape == (16, 23)
  assert (rew < 0).all()  # pusher reward is a sum of negated costs
  assert not term.any()
