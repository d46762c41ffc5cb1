"""On-device Humanoid: c-frame quantities, cfrc_ext, obs/reward parity.

Humanoid is the heaviest device task (nv=23, 140 contact candidates,
376-dim observation). These tests pin the mjData conventions the obs
machinery decodes: cinert/cvel (com-frame quantities), cfrc_ext (contact
wrenches, populated only by an explicit mj_rnePostConstraint — which
gymnasium calls after stepping), and gym's stale-derived-state quirk
(obs/mass-center use the last forward's state, not the integrated qpos).
"""

import os

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
import gymnasium  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from envpool_tpu.envs.mujoco import device_engine as de  # noqa: E402
from _isolation import isolated  # noqa: E402


def _asset(n):
  return os.path.join(
    os.path.dirname(gymnasium.__file__), "envs", "mujoco", "assets", n
  )


def _x64():
  return jax.enable_x64(True)


def _rand_state(m, rng, zlo=0.4, zhi=1.4):
  q = m.qpos0.copy()
  q[:2] += rng.uniform(-0.3, 0.3, 2)
  q[2] = rng.uniform(zlo, zhi)
  quat = (
    np.array([1.0, *rng.uniform(-0.3, 0.3, 3)])
    if rng.random() < 0.5 else rng.normal(size=4)
  )
  q[3:7] = quat / np.linalg.norm(quat)
  q[7:] += rng.uniform(-0.3, 0.3, m.nq - 7)
  return q, rng.uniform(-1, 1, m.nv)


@isolated
def test_com_quantities_match_mjdata() -> None:
  """cinert/cvel/subtree_com[0] element-exact vs mjData."""
  with _x64():
    xml = _asset("humanoid.xml")
    mdl = de.extract_model(xml)
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(3)
    for _ in range(5):
      q, v = _rand_state(m, rng)
      d.qpos[:] = q
      d.qvel[:] = v
      mujoco.mj_forward(m, d)
      com0, xipos, cinert, cvel = de.com_quantities(
        mdl, jnp.asarray(q), jnp.asarray(v)
      )
      assert np.abs(np.asarray(com0) - d.subtree_com[0]).max() < 1e-12
      assert np.abs(np.asarray(xipos) - d.xipos).max() < 1e-12
      assert np.abs(np.asarray(cinert) - d.cinert).max() < 1e-11
      assert np.abs(np.asarray(cvel) - d.cvel).max() < 1e-11


@isolated
def test_cfrc_ext_matches_rne_post_constraint() -> None:
  """Contact-wrench accumulation vs mj_rnePostConstraint's cfrc_ext
  (world body excluded; torque about subtree_com[0])."""
  with _x64():
    xml = _asset("humanoid.xml")
    mdl = de.extract_model(xml)
    m = mujoco.MjModel.from_xml_path(xml)
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
    d = mujoco.MjData(m)
    rng = np.random.default_rng(3)
    ncon = 0
    for _ in range(8):
      q, v = _rand_state(m, rng, zlo=0.4, zhi=1.0)
      d.qpos[:] = q
      d.qvel[:] = v
      d.ctrl[:] = rng.uniform(-0.4, 0.4, m.nu)
      mujoco.mj_forward(m, d)
      mujoco.mj_rnePostConstraint(m, d)
      ncon += d.ncon
      qj, vj = jnp.asarray(q), jnp.asarray(v)
      tau = de.actuator_force(mdl, jnp.asarray(d.ctrl.copy()))
      _, fext, _f = de._qacc_full(mdl, qj, vj, tau, want_fext=True)
      com0, *_ = de.com_quantities(mdl, qj, vj)
      F = np.asarray(fext[:, 3:])
      T = np.asarray(fext[:, :3]) - np.cross(np.asarray(com0), F)
      ours = np.concatenate([T, F], axis=1)
      scale = max(1.0, np.abs(d.cfrc_ext).max())
      assert np.abs(ours - d.cfrc_ext).max() < 2e-2 * scale
    assert ncon > 10


@isolated
def test_100_step_rollout_parity_humanoidstandup() -> None:
  """Standup starts lying on the floor: contacts from step one.

  100 RK4 steps with warmstart chains on both sides. Tolerance reflects
  the two solvers' 1e-8-grade termination gap accumulating through a
  many-contact frictionless pile (per-solve residual is
  iteration-independent — it is mj's stopping criterion, not ours)."""
  with _x64():
    xml = _asset("humanoidstandup.xml")
    mdl = de.extract_model(xml)
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    rng = np.random.default_rng(2)
    ctrl = rng.uniform(-0.3, 0.3, m.nu)
    d.qpos[:] = m.qpos0
    d.ctrl[:] = ctrl
    cj = jnp.asarray(ctrl)
    q1, v1 = de.step_smooth(
      mdl, jnp.asarray(m.qpos0.copy()), jnp.zeros(m.nv), cj, nstep=100
    )
    for _ in range(100):
      mujoco.mj_step(m, d)
    assert d.ncon > 0
    assert np.abs(np.asarray(q1) - d.qpos).max() < 2e-3


@pytest.mark.parametrize(
  "task,gym_id",
  [
    ("HumanoidJax-v4", "Humanoid-v4"),
    ("HumanoidStandupJax-v4", "HumanoidStandup-v4"),
  ],
)
@isolated
def test_humanoid_env_aligns_with_gymnasium(task, gym_id) -> None:
  """Force gymnasium into OUR reset state; 376-dim obs + reward agree
  per step (cfrc block compared at force scale)."""
  import envpool_tpu
  from envpool_tpu.envs.mujoco import device_tasks as dt

  env_cls = {
    "HumanoidJax-v4": dt.HumanoidJaxEnv,
    "HumanoidStandupJax-v4": dt.HumanoidStandupJaxEnv,
  }[task]
  spec = envpool_tpu.make_spec(task, num_envs=1, seed=0)
  cfg = spec.config
  state, obs0, _ = env_cls.reset(cfg, None, jax.random.PRNGKey(3))

  genv = gymnasium.make(gym_id, disable_env_checker=True)
  genv.reset(seed=0)
  genv.unwrapped.set_state(
    np.asarray(state["q"], np.float64), np.asarray(state["v"], np.float64)
  )
  rng = np.random.default_rng(5)
  step = jax.jit(
    lambda s, a: env_cls.step(cfg, s, a, jax.random.PRNGKey(0))
  )
  for t in range(8):
    a = rng.uniform(-0.2, 0.2, 17).astype(np.float32)
    gobs, gr, gterm, _, _ = genv.step(np.asarray(a, np.float64))
    state, obs, r, term, info = step(state, jnp.asarray(a))
    obs = np.asarray(obs, np.float64)
    # blocks: qpos/qvel (45), cinert (140), cvel (84), qfrc (23), cfrc (84)
    assert np.abs(obs[:45] - gobs[:45]).max() < 5e-2, t
    assert np.abs(obs[45:185] - gobs[45:185]).max() < 5e-2, t
    assert np.abs(obs[185:269] - gobs[185:269]).max() < 2e-1, t
    assert np.abs(obs[269:292] - gobs[269:292]).max() < 1e-3, t
    cfrc_scale = max(10.0, np.abs(gobs[292:]).max())
    assert np.abs(obs[292:] - gobs[292:]).max() < 0.1 * cfrc_scale, t
    assert abs(float(r) - float(gr)) < 0.05 + 0.05 * abs(float(gr)), t
    assert bool(term) == bool(gterm), t
    if gterm:
      break


@isolated
def test_humanoid_through_pool() -> None:
  import envpool_tpu

  for task in ["HumanoidJax-v4", "HumanoidStandupJax-v4"]:
    env = envpool_tpu.make_gymnasium(task, num_envs=2, seed=0)
    obs, _ = env.reset()
    assert obs.shape == (2, 376)
    for _ in range(2):
      obs, rew, term, trunc, info = env.step(
        np.zeros((2, 17), np.float32)
      )
    assert np.isfinite(obs).all() and np.isfinite(rew).all()
