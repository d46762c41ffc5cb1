"""On-device contact pipeline: row-level + dynamics parity vs MuJoCo.

The strongest oracle available: ``mjData.efc_*`` exposes MuJoCo's own
constraint rows (Jacobian, reference acceleration, inverse regularizer),
so the assembly is asserted row-for-row, then the Newton solve against
``qacc``/``qfrc_constraint``, then full ``mj_step`` rollouts. Mirrors the
reference's alignment strategy (``mujoco_gym_align_test.py:42-60``) one
level deeper than its qpos checks.
"""

import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
import gymnasium  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from envpool_tpu.envs.mujoco import device_collision as dc  # noqa: E402
from envpool_tpu.envs.mujoco import device_engine as de  # noqa: E402
from _isolation import isolated  # noqa: E402

CONTACT_MODELS = ["half_cheetah.xml", "hopper.xml", "walker2d.xml",
                  "ant.xml"]


def _asset(n):
  return os.path.join(
    os.path.dirname(gymnasium.__file__), "envs", "mujoco", "assets", n
  )


def _x64():
  return jax.enable_x64(True)


def _mj(xml):
  m = mujoco.MjModel.from_xml_path(_asset(xml))
  # disable warmstart so mj's Newton solves from qacc_smooth like ours
  m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
  return m


def _random_state(m, rng, xml):
  # root height: mix grounded / penetrating / airborne states
  if xml == "ant.xml":
    q = m.qpos0.copy()
    q[:2] += rng.uniform(-0.3, 0.3, 2)
    q[2] = rng.uniform(0.2, 0.8)
    quat = (
      np.array([1.0, *rng.uniform(-0.2, 0.2, 3)])
      if rng.random() < 0.5 else rng.normal(size=4)
    )
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] += rng.uniform(-0.3, 0.3, 8)
  else:
    q = m.qpos0 + rng.uniform(-0.2, 0.2, m.nq)
    q[1] = rng.uniform(-0.45, 0.1) if xml == "half_cheetah.xml" else (
      rng.uniform(0.55, 1.1)
    )
  v = rng.uniform(-1.0, 1.0, m.nv)
  ctrl = rng.uniform(-1.0, 1.0, m.nu)
  return q, v, ctrl


def _sorted_rows(J, aref, D):
  """Canonical row order for set-wise comparison (row order is
  physically irrelevant; mj's differs from ours)."""
  key = np.round(np.concatenate([J, aref[:, None], D[:, None]], 1), 6)
  idx = np.lexsort(key.T[::-1])
  return J[idx], aref[idx], D[idx]


@pytest.mark.parametrize("xml", CONTACT_MODELS)
@isolated
def test_constraint_rows_match_efc(xml) -> None:
  """Active rows == mjData.efc rows: J/aref/D to ~1e-9."""
  with _x64():
    mdl = de.extract_model(_asset(xml))
    m = _mj(xml)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    saw_contacts = 0
    for _ in range(8):
      q, v, ctrl = _random_state(m, rng, xml)
      d.qpos[:] = q
      d.qvel[:] = v
      d.ctrl[:] = ctrl
      mujoco.mj_forward(m, d)
      saw_contacts += d.ncon
      qj, vj = jnp.asarray(q), jnp.asarray(v)
      J, aref, D, mask = map(
        np.asarray,
        dc.assemble_rows(mdl, mdl.contacts, qj, vj, de._kin_ctx(mdl, qj)),
      )
      act = np.where(mask)[0]
      assert len(act) == d.nefc
      if not d.nefc:
        continue
      Jmj = d.efc_J[: d.nefc * m.nv].reshape(d.nefc, m.nv)
      a_ours = _sorted_rows(J[act], aref[act], D[act])
      a_mj = _sorted_rows(Jmj, d.efc_aref[: d.nefc], d.efc_D[: d.nefc])
      for ours, ref in zip(a_ours, a_mj):
        scale = max(1.0, np.abs(ref).max())
        assert np.abs(ours - ref).max() < 1e-9 * scale
    assert saw_contacts > 10  # states really exercised the narrow phase


@pytest.mark.parametrize("xml", CONTACT_MODELS)
@isolated
def test_qacc_and_constraint_force_match(xml) -> None:
  """Newton solve: qacc + qfrc_constraint vs mj_forward.

  Hopper/Walker2d land at ~1e-12 relative; HalfCheetah's deep-penetration
  extremes expose the two solvers' 1e-8 tolerance floors, amplified to
  ~1e-5 worst-case — both are converged optima of the same QP.
  """
  with _x64():
    mdl = de.extract_model(_asset(xml))
    m = _mj(xml)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(1)
    for _ in range(10):
      q, v, ctrl = _random_state(m, rng, xml)
      d.qpos[:] = q
      d.qvel[:] = v
      d.ctrl[:] = ctrl
      mujoco.mj_forward(m, d)
      qj, vj = jnp.asarray(q), jnp.asarray(v)
      tau = de.actuator_force(mdl, jnp.asarray(ctrl))
      M, qfs, ctx = de._qacc_smooth_parts(mdl, qj, vj, tau)
      qacc, qfrc_con, _ = de._contact_solve(mdl, qj, vj, M, qfs, ctx)
      qe = np.abs(np.asarray(qacc) - d.qacc).max()
      fe = np.abs(np.asarray(qfrc_con) - d.qfrc_constraint).max()
      assert qe < 1e-4 * max(1.0, np.abs(d.qacc).max())
      assert fe < 1e-4 * max(1.0, np.abs(d.qfrc_constraint).max())


@isolated
def test_includemargin_matches_mujoco() -> None:
  """Margins ADD across the geom pair (hopper: 0.001+0.001)."""
  mdl = de.extract_model(_asset("hopper.xml"))
  m = mujoco.MjModel.from_xml_path(_asset("hopper.xml"))
  d = mujoco.MjData(m)
  d.qpos[:] = m.qpos0
  d.qpos[1] = 0.8
  mujoco.mj_forward(m, d)
  assert d.ncon > 0
  assert np.allclose(mdl.contacts.point_incmargin[0],
                     d.contact[0].includemargin)


@pytest.mark.parametrize(
  "xml,tol",
  [
    # RK4 tasks track mj bit-for-bit; Euler cheetah accumulates the
    # solver-tolerance difference through stiff contact events
    ("hopper.xml", 1e-10),
    ("walker2d.xml", 1e-10),
    ("ant.xml", 1e-10),
    ("half_cheetah.xml", 1e-4),
  ],
)
@isolated
def test_100_step_contact_rollout_parity(xml, tol) -> None:
  with _x64():
    mdl = de.extract_model(_asset(xml))
    m = _mj(xml)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(2)
    ctrl = rng.uniform(-0.5, 0.5, m.nu)
    d.qpos[:] = m.qpos0
    d.qvel[:] = 0
    d.ctrl[:] = ctrl
    q1 = jnp.asarray(m.qpos0.copy())
    v1 = jnp.zeros(m.nv, q1.dtype)
    cj = jnp.asarray(ctrl)
    step = jax.jit(lambda a, b: de.step_smooth(mdl, a, b, cj))
    ncon_seen = 0
    for _ in range(100):
      mujoco.mj_step(m, d)
      ncon_seen = max(ncon_seen, d.ncon)
      q1, v1 = step(q1, v1)
    assert ncon_seen >= 1  # contacts really happened
    assert np.abs(np.asarray(q1) - d.qpos).max() < tol


@isolated
def test_limit_rows_match_efc_unclamped_timeconst() -> None:
  """Reacher (timestep 0.01 < solref tc): the un-clamped K/B branch.

  Guards the tc_eff = max(tc, 2*timestep) rule from both sides together
  with the inverted-pendulum test in test_device_mujoco.py (ts == tc/1:
  clamped branch)."""
  with _x64():
    xml = "reacher.xml"
    mdl = de.extract_model(_asset(xml))
    m = _mj(xml)
    d = mujoco.MjData(m)
    d.qpos[:] = m.qpos0
    d.qpos[1] = m.jnt_range[1, 1] + 0.02
    d.qvel[:] = 0
    d.qvel[1] = 0.5
    mujoco.mj_forward(m, d)
    assert d.nefc == 1
    tau = de.actuator_force(mdl, jnp.zeros(m.nu))
    q = jnp.asarray(d.qpos.copy())
    v = jnp.asarray(d.qvel.copy())
    mm = de.mass_matrix(mdl, q)
    qacc_sm = de._qacc_smooth(mdl, q, v, tau)
    qfrc = np.asarray(
      de.limit_constraint_force(
        mdl, q, v, de._limit_minv_cols(mdl, mm), qacc_sm
      )
    )
    ref = np.asarray(d.qfrc_constraint)
    assert np.abs(qfrc - ref).max() < 1e-6 * np.abs(ref).max()


@pytest.mark.parametrize(
  "task,gym_id,adim,steps",
  [
    ("HalfCheetahJax-v4", "HalfCheetah-v4", 6, 10),
    ("HopperJax-v4", "Hopper-v4", 3, 10),
    ("Walker2dJax-v4", "Walker2d-v4", 6, 10),
    ("AntJax-v4", "Ant-v4", 8, 10),
  ],
)
@isolated
def test_contact_env_aligns_with_gymnasium(task, gym_id, adim, steps):
  """Force gymnasium into OUR reset state, step both with identical
  actions: obs/reward agree to f32-contact-rollout tolerance."""
  import envpool_tpu
  from envpool_tpu.envs.mujoco import device_tasks as dt

  env_cls = {
    "HalfCheetahJax-v4": dt.HalfCheetahJaxEnv,
    "HopperJax-v4": dt.HopperJaxEnv,
    "Walker2dJax-v4": dt.Walker2dJaxEnv,
    "AntJax-v4": dt.AntJaxEnv,
  }[task]
  spec = envpool_tpu.make_spec(task, num_envs=1, seed=0)
  cfg = spec.config
  state, obs0, _ = env_cls.reset(cfg, None, jax.random.PRNGKey(3))

  genv = gymnasium.make(gym_id, disable_env_checker=True)
  genv.reset(seed=0)
  genv.unwrapped.set_state(
    np.asarray(state["q"], np.float64), np.asarray(state["v"], np.float64)
  )
  skip = 2 if task == "AntJax-v4" else 1
  gobs0 = np.concatenate([
    np.asarray(state["q"])[skip:],
    np.clip(np.asarray(state["v"]), -10, 10),
  ])
  assert np.abs(np.asarray(obs0, np.float64) - gobs0).max() < 1e-5

  rng = np.random.default_rng(5)
  step = jax.jit(
    lambda s, a: env_cls.step(cfg, s, a, jax.random.PRNGKey(0))
  )
  for t in range(steps):
    a = rng.uniform(-0.3, 0.3, adim).astype(np.float32)
    gobs, gr, gterm, _, _ = genv.step(np.asarray(a, np.float64))
    state, obs, r, term, info = step(state, jnp.asarray(a))
    err = np.abs(np.asarray(obs, np.float64) - gobs).max()
    assert err < 5e-2, (t, err)
    assert abs(float(r) - float(gr)) < 2e-2 + 5e-2 * abs(float(gr))
    assert bool(term) == bool(gterm)
    if gterm:
      break


@isolated
def test_contact_tasks_through_pool() -> None:
  """Registry round-trip: reset/step through TpuEnvPool, finite outputs."""
  import envpool_tpu

  for task, adim in [
    ("HalfCheetahJax-v4", 6), ("HopperJax-v4", 3), ("Walker2dJax-v4", 6),
    ("AntJax-v4", 8),
  ]:
    env = envpool_tpu.make_gymnasium(task, num_envs=4, seed=0)
    obs, _ = env.reset()
    for _ in range(3):
      obs, rew, term, trunc, info = env.step(
        np.zeros((4, adim), np.float32)
      )
    assert np.isfinite(obs).all() and np.isfinite(rew).all()


@pytest.mark.parametrize("xml", ["ant.xml", "hopper.xml", "half_cheetah.xml"])
@isolated
def test_warmstart_chain_parity(xml) -> None:
  """step_smooth(nstep=N) warm-chains solves like mjData.qacc_warmstart:
  one 60-substep chain tracks mj WITH warmstart (gym's real semantics)."""
  with _x64():
    mdl = de.extract_model(_asset(xml))
    m = mujoco.MjModel.from_xml_path(_asset(xml))  # warmstart ENABLED
    d = mujoco.MjData(m)
    rng = np.random.default_rng(4)
    ctrl = rng.uniform(-0.5, 0.5, m.nu)
    d.qpos[:] = m.qpos0
    d.ctrl[:] = ctrl
    cj = jnp.asarray(ctrl)
    q1, v1 = de.step_smooth(
      mdl, jnp.asarray(m.qpos0.copy()), jnp.zeros(m.nv), cj, nstep=60
    )
    for _ in range(60):
      mujoco.mj_step(m, d)
    tol = 1e-4 if xml == "half_cheetah.xml" else 1e-9
    assert np.abs(np.asarray(q1) - d.qpos).max() < tol
