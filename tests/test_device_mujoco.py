"""On-device MuJoCo engine: numerical parity vs real mj_step.

Mirrors the reference's mujoco alignment strategy (force both sims into
the same state, step side-by-side; ``mujoco_gym_align_test.py:42-60``) —
but against raw ``mj_step`` at machine precision, since the device engine
re-implements the physics itself rather than wrapping libmujoco.
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

MODELS = ["reacher.xml", "inverted_pendulum.xml",
          "inverted_double_pendulum.xml", "swimmer.xml"]


def _asset(n):
  return os.path.join(
    os.path.dirname(gymnasium.__file__), "envs", "mujoco", "assets", n
  )


def _x64():
  return jax.enable_x64(True)


@pytest.mark.parametrize("xml", MODELS)
@isolated
def test_mass_matrix_and_bias_match_mujoco(xml) -> None:
  """CRB mass matrix and RNE bias forces match mj_fullM / qfrc_bias."""
  with _x64():
    mdl = de.extract_model(_asset(xml))
    m = mujoco.MjModel.from_xml_path(_asset(xml))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(1)
    for _ in range(3):
      q = m.qpos0 + rng.uniform(-0.4, 0.4, m.nq)
      v = rng.uniform(-1.0, 1.0, m.nv)
      d.qpos[:] = q
      d.qvel[:] = v
      mujoco.mj_forward(m, d)
      m_ref = np.zeros((m.nv, m.nv))
      mujoco.mj_fullM(m, d, m_ref)
      m_ours = np.asarray(de.mass_matrix(mdl, jnp.asarray(q)))
      assert np.abs(m_ours - m_ref).max() < 1e-12
      bias = np.asarray(de.bias_forces(mdl, jnp.asarray(q), jnp.asarray(v)))
      assert np.abs(bias - d.qfrc_bias).max() < 1e-10


@pytest.mark.parametrize("xml", MODELS)
@isolated
def test_single_step_matches_mj_step(xml) -> None:
  """One mj_step (RK4, smooth regime): qpos/qvel parity to ~1e-14."""
  with _x64():
    mdl = de.extract_model(_asset(xml))
    m = mujoco.MjModel.from_xml_path(_asset(xml))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(2)
    for _ in range(3):
      q = m.qpos0 + rng.uniform(-0.05, 0.05, m.nq)
      v = rng.uniform(-0.1, 0.1, m.nv)
      ctrl = rng.uniform(-0.5, 0.5, m.nu)
      d.qpos[:] = q
      d.qvel[:] = v
      d.ctrl[:] = ctrl
      mujoco.mj_step(m, d)
      q1, v1 = de.step_smooth(
        mdl, jnp.asarray(q), jnp.asarray(v), jnp.asarray(ctrl)
      )
      assert np.abs(np.asarray(q1) - d.qpos).max() < 1e-13
      assert np.abs(np.asarray(v1) - d.qvel).max() < 1e-12


@isolated
def test_limit_constraint_force_matches_mujoco() -> None:
  """Rail-limit violation: qfrc_constraint parity to <1e-3 relative.

  (MuJoCo regularizes with an internal diagonal approximation that
  differs from the exact Minv diagonal by ~4e-5 relative; the resulting
  force deviation is ~2e-7 relative — see device_engine docstring.)
  """
  with _x64():
    mdl = de.extract_model(_asset("inverted_pendulum.xml"))
    m = mujoco.MjModel.from_xml_path(_asset("inverted_pendulum.xml"))
    d = mujoco.MjData(m)
    d.qpos[:] = [1.002, 0.01]
    d.qvel[:] = [0.5, 0.0]
    d.ctrl[:] = 0.0
    mujoco.mj_forward(m, d)
    q = jnp.asarray(d.qpos.copy())
    v = jnp.asarray(d.qvel.copy())
    tau = de.actuator_force(mdl, jnp.zeros(1))
    mm = de.mass_matrix(mdl, q)
    qacc_sm = de._qacc_smooth(mdl, q, v, tau)
    qfrc = np.asarray(de.limit_constraint_force(
      mdl, q, v, de._minv(mdl, mm), qacc_sm
    ))
    ref = np.asarray(d.qfrc_constraint)
    assert np.abs(qfrc - ref).max() < 1e-3 * np.abs(ref).max()
    assert qfrc[0] < -100  # rail pushes the cart back hard


@isolated
def test_100_step_rollout_parity_inverted_double_pendulum() -> None:
  """100 constraint-free steps: trajectory parity at machine precision."""
  with _x64():
    xml = "inverted_double_pendulum.xml"
    mdl = de.extract_model(_asset(xml))
    m = mujoco.MjModel.from_xml_path(_asset(xml))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    q = m.qpos0 + rng.uniform(-0.05, 0.05, m.nq)
    v = rng.uniform(-0.1, 0.1, m.nv)
    ctrl = rng.uniform(-0.3, 0.3, m.nu)
    d.qpos[:] = q
    d.qvel[:] = v
    d.ctrl[:] = ctrl
    q1, v1 = jnp.asarray(q), jnp.asarray(v)
    cj = jnp.asarray(ctrl)
    step = jax.jit(lambda a, b: de.step_smooth(mdl, a, b, cj))
    for _ in range(100):
      mujoco.mj_step(m, d)
      q1, v1 = step(q1, v1)
    assert d.ncon == 0
    assert np.abs(np.asarray(q1) - d.qpos).max() < 1e-10
    assert np.abs(np.asarray(v1) - d.qvel).max() < 1e-9


@isolated
def test_300_step_rollout_through_limit_events() -> None:
  """Reacher under persistent torque drives joint1 into its +-3 limit;

  trajectories stay within 1e-1 through repeated limit contacts (exact
  in the smooth regime, small bounded offsets injected at events)."""
  with _x64():
    xml = "reacher.xml"
    mdl = de.extract_model(_asset(xml))
    m = mujoco.MjModel.from_xml_path(_asset(xml))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(0)
    q = m.qpos0 + rng.uniform(-0.05, 0.05, m.nq)
    v = rng.uniform(-0.1, 0.1, m.nv)
    ctrl = rng.uniform(-0.5, 0.5, m.nu)
    d.qpos[:] = q
    d.qvel[:] = v
    d.ctrl[:] = ctrl
    q1, v1 = jnp.asarray(q), jnp.asarray(v)
    cj = jnp.asarray(ctrl)
    step = jax.jit(lambda a, b: de.step_smooth(mdl, a, b, cj))
    hit = 0
    for _ in range(300):
      mujoco.mj_step(m, d)
      hit = max(hit, d.nefc)
      q1, v1 = step(q1, v1)
    assert hit >= 1  # the limit really was exercised
    assert np.abs(np.asarray(q1) - d.qpos).max() < 1e-1


def _force_gym_state(env, q, v):
  env.unwrapped.set_state(np.asarray(q, np.float64), np.asarray(v, np.float64))


@pytest.mark.parametrize(
  "task,gym_id,adim",
  [
    ("ReacherJax-v4", "Reacher-v4", 2),
    ("InvertedPendulumJax-v4", "InvertedPendulum-v4", 1),
    ("InvertedDoublePendulumJax-v4", "InvertedDoublePendulum-v4", 1),
    ("SwimmerJax-v4", "Swimmer-v4", 2),
  ],
)
@isolated
def test_env_obs_and_reward_align_with_gymnasium(task, gym_id, adim) -> None:
  """Force gymnasium into OUR reset state; step both 20x with the same
  actions; obs and rewards agree to f32-rollout tolerance."""
  import envpool_tpu
  from envpool_tpu.envs.mujoco import device_tasks as dt

  env_cls = {
    "ReacherJax-v4": dt.ReacherJaxEnv,
    "InvertedPendulumJax-v4": dt.InvertedPendulumJaxEnv,
    "InvertedDoublePendulumJax-v4": dt.InvertedDoublePendulumJaxEnv,
    "SwimmerJax-v4": dt.SwimmerJaxEnv,
  }[task]
  spec = envpool_tpu.make_spec(task, num_envs=1, seed=0)
  cfg = spec.config
  key = jax.random.PRNGKey(3)
  state, obs0, _ = env_cls.reset(cfg, None, key)

  genv = gymnasium.make(gym_id, disable_env_checker=True)
  genv.reset(seed=0)
  _force_gym_state(genv, state["q"], state["v"])

  rng = np.random.default_rng(5)
  step = jax.jit(
    lambda s, a: env_cls.step(cfg, s, a, jax.random.PRNGKey(0))
  )
  max_obs_err = 0.0
  for t in range(20):
    a = rng.uniform(-0.2, 0.2, adim).astype(np.float32)
    gobs, gr, gterm, _, _ = genv.step(np.asarray(a, np.float64))
    state, obs, r, term, info = step(state, jnp.asarray(a))
    err = np.abs(np.asarray(obs, np.float64) - gobs).max()
    max_obs_err = max(max_obs_err, err)
    assert abs(float(r) - float(gr)) < 2e-2 + 1e-2 * abs(float(gr))
    if gterm:
      break
  assert max_obs_err < 5e-2, max_obs_err


@isolated
def test_device_mujoco_through_pool_deterministic() -> None:
  """Same seed => identical trajectories through the full pool API."""
  import envpool_tpu

  def run():
    env = envpool_tpu.make_gymnasium(
      "InvertedPendulumJax-v4", num_envs=8, seed=11
    )
    env.reset()
    out = []
    for t in range(10):
      obs, r, term, trunc, _ = env.step(
        np.full((8, 1), 0.1 * ((-1) ** t), np.float32)
      )
      out.append(obs)
    return np.stack(out)

  a, b = run(), run()
  assert np.array_equal(a, b)


@isolated
def test_unsupported_models_raise(tmp_path) -> None:
  """Genuinely out-of-scope geoms (ellipsoid, box-box pairs) are
  rejected with a clear error; box-plane now extracts (plane-box
  corner narrow phase), as do pusher/ant/humanoid."""
  xml = tmp_path / "box.xml"
  xml.write_text(
    "<mujoco><worldbody>"
    '<geom name="floor" type="plane" size="1 1 .1"/>'
    '<body name="b" pos="0 0 1"><freejoint/>'
    '<geom name="g" type="box" size=".1 .1 .1"/></body>'
    "</worldbody></mujoco>"
  )
  assert de.extract_model(str(xml)).contacts is not None
  bad = tmp_path / "ellipsoid.xml"
  bad.write_text(
    "<mujoco><worldbody>"
    '<geom name="floor" type="plane" size="1 1 .1"/>'
    '<body name="b" pos="0 0 1"><freejoint/>'
    '<geom name="g" type="ellipsoid" size=".1 .1 .2"/></body>'
    "</worldbody></mujoco>"
  )
  with pytest.raises(NotImplementedError):
    de.extract_model(str(bad))
  boxbox = tmp_path / "boxbox.xml"
  boxbox.write_text(
    "<mujoco><worldbody>"
    '<body name="a" pos="0 0 1"><freejoint/>'
    '<geom name="g1" type="box" size=".1 .1 .1"/></body>'
    '<body name="b" pos="0 0 2"><freejoint/>'
    '<geom name="g2" type="box" size=".1 .1 .1"/></body>'
    "</worldbody></mujoco>"
  )
  with pytest.raises(NotImplementedError):
    de.extract_model(str(boxbox))
  assert de.extract_model(_asset("pusher.xml")).contacts is not None
  assert de.extract_model(_asset("ant.xml")).contacts is not None
  assert de.extract_model(_asset("humanoid.xml")).contacts is not None


@isolated
def test_fluid_force_matches_qfrc_passive() -> None:
  """Inertia-box fluid model (swimmer: density=4000, viscosity=0.1)
  matches MuJoCo's qfrc_passive minus the damping part exactly."""
  with _x64():
    xml = "swimmer.xml"
    mdl = de.extract_model(_asset(xml))
    m = mujoco.MjModel.from_xml_path(_asset(xml))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(7)
    for _ in range(3):
      q = m.qpos0 + rng.uniform(-0.4, 0.4, m.nq)
      v = rng.uniform(-1.0, 1.0, m.nv)
      d.qpos[:] = q
      d.qvel[:] = v
      mujoco.mj_forward(m, d)
      fluid_ref = d.qfrc_passive + m.dof_damping * v  # no springs here
      ours = np.asarray(de.fluid_force(mdl, jnp.asarray(q), jnp.asarray(v)))
      scale = max(1.0, np.abs(fluid_ref).max())
      assert np.abs(ours - fluid_ref).max() < 1e-12 * scale


@isolated
def test_100_step_rollout_parity_swimmer() -> None:
  """100 RK4 steps through the fluid model: machine-precision parity.

  Exercises the 3-joint torso (the within-body Coriolis chain) and the
  density/viscosity medium forces under sustained actuation."""
  with _x64():
    xml = "swimmer.xml"
    mdl = de.extract_model(_asset(xml))
    m = mujoco.MjModel.from_xml_path(_asset(xml))
    d = mujoco.MjData(m)
    rng = np.random.default_rng(3)
    q = m.qpos0 + rng.uniform(-0.1, 0.1, m.nq)
    v = rng.uniform(-0.1, 0.1, m.nv)
    ctrl = rng.uniform(-0.5, 0.5, m.nu)
    d.qpos[:] = q
    d.qvel[:] = v
    d.ctrl[:] = ctrl
    q1, v1 = jnp.asarray(q), jnp.asarray(v)
    cj = jnp.asarray(ctrl)
    step = jax.jit(lambda a, b: de.step_smooth(mdl, a, b, cj))
    for _ in range(100):
      mujoco.mj_step(m, d)
      q1, v1 = step(q1, v1)
    assert d.ncon == 0
    assert np.abs(np.asarray(q1) - d.qpos).max() < 1e-9
    assert np.abs(np.asarray(v1) - d.qvel).max() < 1e-8
