"""On-device dm_control tier: task-layer parity vs the host tier.

The engine's physics parity vs raw ``mj_step`` is covered by
``test_device_mujoco.py`` / ``test_device_contacts.py``; these tests pin
the TASK layer — observation layout, tolerance rewards, episode-init
statistics — of ``device_domains.py`` against the host ``domains.py``
classes (which are themselves the reference's ``envpool/mujoco/dmc/*.h``
logic over real mujoco). Methodology mirrors the reference's alignment
strategy: force both tiers into the same physics state and step
side-by-side (``mujoco_gym_align_test.py:42-60``).
"""

import math
import types

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from envpool_tpu.envs.mujoco.dmc import device_domains as dd  # noqa: E402
from _isolation import isolated  # noqa: E402
from envpool_tpu.envs.mujoco.dmc import domains as hd  # noqa: E402


def _cfg(task, frame_skip=1):
  return types.SimpleNamespace(
    task_name=task, frame_skip=frame_skip, seed=0
  )


def _host(cls, task):
  return cls(_cfg(task), env_id=0)


def _force_host(env, q, v, ctrl=None):
  env.data.qpos[:] = np.asarray(q)
  env.data.qvel[:] = np.asarray(v)
  if ctrl is not None:
    env.data.ctrl[:] = np.asarray(ctrl)
  mujoco.mj_forward(env.model, env.data)


def _flat(obs_dict):
  return np.concatenate(
    [np.atleast_1d(np.asarray(x, np.float64)).ravel()
     for x in obs_dict.values()]
  )


# (device cls, host cls, task, action dim, extra-state builder)
CONTACT_FREE = [
  (dd.DmcPendulumJaxEnv, hd.DmcPendulumEnv, "swingup", 1),
  (dd.DmcCartpoleJaxEnv, hd.DmcCartpoleEnv, "balance", 1),
  (dd.DmcCartpoleJaxEnv, hd.DmcCartpoleEnv, "swingup_sparse", 1),
  (dd.DmcCartpoleJaxEnv, hd.DmcCartpoleEnv, "three_poles", 1),
  (dd.DmcAcrobotJaxEnv, hd.DmcAcrobotEnv, "swingup", 1),
  (dd.DmcAcrobotJaxEnv, hd.DmcAcrobotEnv, "swingup_sparse", 1),
]


@pytest.mark.parametrize("dcls,hcls,task,adim", CONTACT_FREE)
def test_obs_reward_trajectory_parity(dcls, hcls, task, adim) -> None:
  """50-step trajectory: obs and reward match the host tier to <1e-8."""
  with jax.enable_x64(True):
    cfg = _cfg(task)
    mdl = dcls.mdl(cfg)
    host = _host(hcls, task)
    rng = np.random.default_rng(3)
    q = np.asarray(mdl.init_qpos) + rng.uniform(-0.05, 0.05, mdl.nq)
    v = rng.uniform(-0.05, 0.05, mdl.nv)
    state = {"q": jnp.asarray(q), "v": jnp.asarray(v)}
    _force_host(host, q, v)
    key = jax.random.PRNGKey(0)
    for t in range(50):
      act = 0.8 * np.sin(
        0.11 * t + np.arange(adim, dtype=np.float64)
      ).astype(np.float64)
      r_host, _ = host.control_step(act)
      state, obs_d, r_dev, term, info = dcls.step(
        cfg, state, jnp.asarray(act), key
      )
      obs_h = host.task_observation()
      np.testing.assert_allclose(
        _flat(obs_d), _flat(obs_h), atol=1e-6,
        err_msg=f"{task} obs diverged at step {t}",
      )
      assert abs(float(r_dev) - r_host) < 1e-6, f"{task} reward step {t}"
      assert not bool(term)
      assert float(info["discount"]) == 1.0


def test_reacher_parity_both_tasks() -> None:
  """Reacher: target in env state reproduces the host's geom mutation."""
  with jax.enable_x64(True):
    for task in ("easy", "hard"):
      cfg = _cfg(task)
      mdl = dd.DmcReacherJaxEnv.mdl(cfg)
      host = _host(hd.DmcReacherEnv, task)
      host.model.geom_size[host.id_target, 0] = host.target_size
      rng = np.random.default_rng(5)
      target = rng.uniform(-0.15, 0.15, 2)
      host.model.geom_pos[host.id_target, :2] = target
      q = np.asarray(mdl.init_qpos) + rng.uniform(-1.0, 1.0, mdl.nq)
      v = rng.uniform(-0.5, 0.5, mdl.nv)
      state = {
        "q": jnp.asarray(q), "v": jnp.asarray(v),
        "target": jnp.asarray(target),
      }
      _force_host(host, q, v)
      key = jax.random.PRNGKey(0)
      for t in range(30):
        act = 0.5 * np.cos(0.2 * t + np.arange(2, dtype=np.float64))
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcReacherJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=1e-6,
          err_msg=f"reacher {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-6


def test_point_mass_parity_tendon_mixing() -> None:
  """point_mass: the state-borne W matrix == mjModel wrap_prm gains."""
  with jax.enable_x64(True):
    for task, wrap in (
      ("easy", np.eye(2)),
      ("hard", np.array([[0.6, 0.8], [-0.8, 0.6]])),
    ):
      cfg = _cfg(task)
      mdl = dd.DmcPointMassJaxEnv.mdl(cfg)
      host = _host(hd.DmcPointMassEnv, task)
      host.model.wrap_prm[0:2] = wrap[0]
      host.model.wrap_prm[2:4] = wrap[1]
      rng = np.random.default_rng(7)
      q = rng.uniform(-0.2, 0.2, mdl.nq)
      v = rng.uniform(-0.2, 0.2, mdl.nv)
      state = {
        "q": jnp.asarray(q), "v": jnp.asarray(v),
        "wrap": jnp.asarray(wrap),
      }
      _force_host(host, q, v)
      key = jax.random.PRNGKey(0)
      for t in range(30):
        act = 0.7 * np.sin(0.3 * t + np.arange(2, dtype=np.float64))
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcPointMassJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=1e-6,
          err_msg=f"point_mass {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-6


@isolated
def test_cheetah_parity_through_contacts() -> None:
  """cheetah run: obs/reward parity through plane contacts (30 steps)."""
  with jax.enable_x64(True):
    cfg = _cfg("run")
    mdl = dd.DmcCheetahJaxEnv.mdl(cfg)
    host = _host(hd.DmcCheetahEnv, "run")
    rng = np.random.default_rng(11)
    # settled-ish start: feet near the plane
    q = np.array(mdl.init_qpos, np.float64)
    q[1] = -0.05
    q[3:] += rng.uniform(-0.1, 0.1, mdl.nq - 3)
    v = rng.uniform(-0.1, 0.1, mdl.nv)
    state = {"q": jnp.asarray(q), "v": jnp.asarray(v)}
    _force_host(host, q, v)
    key = jax.random.PRNGKey(0)
    for t in range(30):
      act = 0.6 * np.sin(0.17 * t + np.arange(6, dtype=np.float64))
      r_host, _ = host.control_step(act)
      state, obs_d, r_dev, _, _ = dd.DmcCheetahJaxEnv.step(
        cfg, state, jnp.asarray(act), key
      )
      obs_h = host.task_observation()
      np.testing.assert_allclose(
        _flat(obs_d), _flat(obs_h), atol=1e-6,
        err_msg=f"cheetah obs step {t}",
      )
      assert abs(float(r_dev) - r_host) < 1e-6, f"cheetah reward step {t}"


@isolated
def test_walker_parity_through_contacts() -> None:
  """walker stand/walk: obs/reward parity with feet on the plane."""
  with jax.enable_x64(True):
    for task in ("stand", "walk"):
      cfg = _cfg(task, frame_skip=5)
      mdl = dd.DmcWalkerJaxEnv.mdl(cfg)
      host = _host(hd.DmcWalkerEnv, task)
      rng = np.random.default_rng(13)
      q = np.array(mdl.init_qpos, np.float64)
      q[1] = -0.1  # feet into the plane
      q[3:] += rng.uniform(-0.1, 0.1, mdl.nq - 3)
      v = rng.uniform(-0.1, 0.1, mdl.nv)
      state = {"q": jnp.asarray(q), "v": jnp.asarray(v)}
      _force_host(host, q, v)
      host.n_sub_steps = 5
      key = jax.random.PRNGKey(0)
      for t in range(12):
        act = 0.5 * np.sin(0.23 * t + np.arange(6, dtype=np.float64))
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcWalkerJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=1e-6,
          err_msg=f"walker {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-6


@isolated
def test_hopper_parity_and_touch() -> None:
  """hopper stand/hop: obs (incl. log1p touch) and reward parity."""
  with jax.enable_x64(True):
    for task in ("stand", "hop"):
      cfg = _cfg(task, frame_skip=4)
      mdl = dd.DmcHopperJaxEnv.mdl(cfg)
      host = _host(hd.DmcHopperEnv, task)
      rng = np.random.default_rng(17)
      q = np.array(mdl.init_qpos, np.float64)
      q[1] = -0.035  # slight foot penetration; gravity keeps contact
      q[3:] += rng.uniform(-0.05, 0.05, mdl.nq - 3)
      v = 0.02 * rng.uniform(-1.0, 1.0, mdl.nv)
      state = {
        "q": jnp.asarray(q), "v": jnp.asarray(v),
        "touch": jnp.zeros(2, np.float64),
      }
      _force_host(host, q, v)
      host.n_sub_steps = 4
      key = jax.random.PRNGKey(0)
      touched = 0.0
      for t in range(25):
        act = 0.4 * np.sin(0.31 * t + np.arange(4, dtype=np.float64))
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcHopperJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=1e-5,
          err_msg=f"hopper {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-6
        touched += float(np.asarray(obs_d["touch"]).sum())
      assert touched > 0.0, "touch sensors never activated"


@isolated
def test_swimmer_parity_both_sizes() -> None:
  """swimmer6/swimmer15: velocimeter+gyro obs and LONG_TAIL reward parity
  (free planar root in the viscous medium)."""
  with jax.enable_x64(True):
    for task, nlinks in (("swimmer6", 6), ("swimmer15", 15)):
      cfg = _cfg(task, frame_skip=5)
      mdl = dd.DmcSwimmerJaxEnv.mdl(cfg)
      host = _host(hd.DmcSwimmerEnv, task)
      host.n_sub_steps = 5
      rng = np.random.default_rng(19)
      target = rng.uniform(-1.0, 1.0, 2)
      host.model.geom_pos[host.id_target, :2] = target
      q = np.array(mdl.init_qpos, np.float64)
      q[:2] += rng.uniform(-0.2, 0.2, 2)
      q[2] = rng.uniform(-math.pi, math.pi)
      q[3:] += rng.uniform(-0.5, 0.5, mdl.nq - 3)
      v = 0.1 * rng.uniform(-1.0, 1.0, mdl.nv)
      state = {
        "q": jnp.asarray(q), "v": jnp.asarray(v),
        "target": jnp.asarray(target),
      }
      _force_host(host, q, v)
      key = jax.random.PRNGKey(0)
      adim = nlinks - 1
      for t in range(15):
        act = 0.6 * np.sin(0.19 * t + np.arange(adim, dtype=np.float64))
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcSwimmerJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=1e-6,
          err_msg=f"swimmer {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-6, f"{task} reward step {t}"


@isolated
def test_fish_parity_both_tasks() -> None:
  """fish upright/swim: quaternion free root in the zero-gravity viscous
  medium — joint_angles/upright/velocity/target obs + reward parity."""
  with jax.enable_x64(True):
    for task in ("upright", "swim"):
      cfg = _cfg(task, frame_skip=5)
      mdl = dd.DmcFishJaxEnv.mdl(cfg)
      host = _host(hd.DmcFishEnv, task)
      host.n_sub_steps = 5
      rng = np.random.default_rng(23)
      target = np.array([0.2, -0.15, 0.18])
      host.model.geom_pos[host.id_target] = target
      q = np.array(mdl.init_qpos, np.float64)
      quat = rng.normal(0, 1, 4)
      q[3:7] = quat / np.linalg.norm(quat)
      q[7:] += rng.uniform(-0.2, 0.2, mdl.nq - 7)
      v = 0.05 * rng.uniform(-1.0, 1.0, mdl.nv)
      state = {
        "q": jnp.asarray(q), "v": jnp.asarray(v),
        "target": jnp.asarray(target),
      }
      _force_host(host, q, v)
      key = jax.random.PRNGKey(0)
      for t in range(15):
        act = 0.5 * np.sin(0.29 * t + np.arange(5, dtype=np.float64))
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcFishJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=1e-6,
          err_msg=f"fish {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-6, f"fish {task} step {t}"


@isolated
def test_finger_parity_all_tasks() -> None:
  """finger spin/turn: obs (incl. log1p touch), capsule-capsule contact
  response and threshold rewards match the host tier. The start state
  puts the fingertip against the spinner so contacts actually fire."""
  with jax.enable_x64(True):
    for task in ("spin", "turn_easy", "turn_hard"):
      cfg = _cfg(task, frame_skip=2)
      mdl = dd.DmcFingerJaxEnv.mdl(cfg)
      host = _host(hd.DmcFingerEnv, task)
      host.n_sub_steps = 2
      if task == "spin":
        # device bakes the spin damping mutation into the model; apply
        # the same mutation to the host (its task_initialize_episode
        # would do this on reset). The target site stays at its default
        # pos/size for spin in both tiers.
        host.model.dof_damping[host.id_hinge_dof] = 0.03
        target = np.array(host.model.site_pos[host.id_site_target])[[0, 2]]
      else:
        target = np.array(
          [0.2 + 0.15 * math.sin(1.0), 0.4 + 0.15 * math.cos(1.0)]
        )
        host.model.site_pos[host.id_site_target, 0] = target[0]
        host.model.site_pos[host.id_site_target, 2] = target[1]
        host.model.site_size[host.id_site_target, 0] = (
          dd.DmcFingerJaxEnv._target_size(cfg)
        )
      # fingertip pressed on the spinner inside the touchbottom site
      # zone (single shallow contact — the degenerate axes-crossing
      # depth makes mj's contact normal arbitrary, so tests stay in the
      # physical regime)
      q = np.array([-0.875, 0.197, 1.6])
      v = np.array([0.0, 0.0, 0.0])
      state = {
        "q": jnp.asarray(q), "v": jnp.asarray(v),
        "touch": jnp.zeros(2, np.float64),
        "target": jnp.asarray(target),
      }
      _force_host(host, q, v)
      key = jax.random.PRNGKey(0)
      touched = 0.0
      spun = 0.0
      for t in range(30):
        act = np.array([0.9 * math.sin(0.25 * t), -0.8])
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcFingerJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=2e-5,
          err_msg=f"finger {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-6, f"finger {task} step {t}"
        touched += float(np.asarray(obs_d["touch"]).sum())
        spun += abs(float(np.asarray(state["v"])[2]))
      assert touched > 0.0, f"finger {task}: touch sensors never fired"
      assert spun > 1e-3, f"finger {task}: spinner never moved"


@isolated
def test_cheetah_reset_limited_joints_only() -> None:
  """cheetah episode init randomizes only LIMITED joints
  (cheetah.h:83-98): the unlimited rootx/rootz/rooty stay 0 before the
  settle, and post-settle torso pitch matches the host tier's regime."""
  with jax.enable_x64(True):
    cfg = _cfg("run")
    mdl = dd.DmcCheetahJaxEnv.mdl(cfg)
    q0 = jnp.asarray(mdl.init_qpos, jnp.float64)
    # pre-settle draw: unlimited root dofs untouched, limited in range
    for seed in range(8):
      q = dd.randomize_limited_and_rotational_joints(
        mdl, q0, jax.random.PRNGKey(seed), limited_only=True
      )
      qn = np.asarray(q)
      assert qn[0] == 0.0 and qn[1] == 0.0 and qn[2] == 0.0
      for j, jt in enumerate(mdl.jnt_type):
        if mdl.jnt_limited[j]:
          lo, hi = mdl.jnt_range[j]
          qa = mdl.jnt_qadr[j]
          assert lo - 1e-9 <= qn[qa] <= hi + 1e-9
    # post-settle: torso must not start inverted (the pre-fix uniform
    # rooty in (-pi, pi) leaves ~half the episodes upside down)
    keys = jax.random.split(jax.random.PRNGKey(42), 16)
    reset1 = jax.jit(
      lambda k: dd.DmcCheetahJaxEnv.reset(cfg, None, k)[0]["q"]
    )
    qs = np.stack([np.asarray(reset1(k)) for k in keys])
    host = _host(hd.DmcCheetahEnv, "run")
    host_pitch = []
    for _ in range(16):
      host.reset()
      host_pitch.append(float(host.data.qpos[2]))
    bound = max(np.abs(host_pitch).max() * 2.0, 1.2)
    assert np.abs(qs[:, 2]).max() < bound, (
      f"device cheetah settles to |rooty| {np.abs(qs[:, 2]).max():.2f}, "
      f"host regime {np.abs(host_pitch).max():.2f}"
    )


def test_device_reset_statistics() -> None:
  """Episode init draws land where the suite's randomizer puts them."""
  with jax.enable_x64(True):
    # reacher hard: wrist within its limit range, shoulder in (-pi, pi),
    # target radius in [0.05, 0.2]
    cfg = _cfg("hard")
    keys = jax.random.split(jax.random.PRNGKey(1), 256)
    mdl = dd.DmcReacherJaxEnv.mdl(cfg)
    states = [dd.DmcReacherJaxEnv.reset(cfg, None, k)[0] for k in keys[:64]]
    qs = np.stack([np.asarray(s["q"]) for s in states])
    tgts = np.stack([np.asarray(s["target"]) for s in states])
    lo, hi = mdl.jnt_range[1]
    assert (qs[:, 1] >= lo).all() and (qs[:, 1] <= hi).all()
    assert (np.abs(qs[:, 0]) <= math.pi).all()
    radii = np.linalg.norm(tgts, axis=1)
    assert (radii >= 0.05 - 1e-6).all() and (radii <= 0.2 + 1e-6).all()
    assert radii.std() > 0.01

    # point_mass hard: |dir1 . dir2| <= 0.9, both unit
    cfg = _cfg("hard")
    states = [
      dd.DmcPointMassJaxEnv.reset(cfg, None, k)[0] for k in keys[64:128]
    ]
    for s in states:
      w = np.asarray(s["wrap"], np.float64)
      np.testing.assert_allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-5)
      assert abs(float(w[0] @ w[1])) <= 0.9 + 1e-5

    # cartpole swingup: hinge_1 near pi, cart near 0
    cfg = _cfg("swingup")
    states = [
      dd.DmcCartpoleJaxEnv.reset(cfg, None, k)[0] for k in keys[128:160]
    ]
    qs = np.stack([np.asarray(s["q"]) for s in states])
    assert np.abs(qs[:, 0]).max() < 0.05
    assert np.abs(qs[:, 1] - math.pi).max() < 0.05


def test_device_dmc_through_pool_deterministic() -> None:
  """Same seed => identical trajectories through the full TpuEnvPool."""
  import envpool_tpu

  def run():
    env = envpool_tpu.make(
      "PendulumJaxSwingup-v1", env_type="dm", num_envs=3, seed=7
    )
    env.reset()
    outs = []
    for t in range(5):
      ts = env.step({"action": np.full((3, 1), 0.5, np.float32)})
      outs.append(np.asarray(ts.observation.orientation))
    return np.stack(outs)

  a, b = run(), run()
  np.testing.assert_array_equal(a, b)


@isolated
def test_ball_in_cup_parity() -> None:
  """ball_in_cup: obs/reward/contact + TAUT-STRING (tendon-limit row)
  trajectories match the host tier; the string is the device engine's
  first tendon constraint."""
  with jax.enable_x64(True):
    cfg = _cfg("catch", frame_skip=10)
    mdl = dd.DmcBallInCupJaxEnv.mdl(cfg)
    host = _host(hd.DmcBallInCupEnv, "catch")
    host.n_sub_steps = 10
    rng = np.random.default_rng(11)
    # start taut-ish: ball hanging low
    q = np.array([0.05, -0.05, 0.1, -0.27])
    v = np.array([0.3, -0.2, 0.5, 0.0])
    state = {"q": jnp.asarray(q), "v": jnp.asarray(v)}
    _force_host(host, q, v)
    key = jax.random.PRNGKey(0)
    hit = 0.0
    for t in range(40):
      act = np.clip(rng.normal(0.0, 0.6, 2), -1, 1)
      r_host, _ = host.control_step(act)
      state, obs_d, r_dev, _, _ = dd.DmcBallInCupJaxEnv.step(
        cfg, state, jnp.asarray(act), key
      )
      obs_h = host.task_observation()
      np.testing.assert_allclose(
        _flat(obs_d), _flat(obs_h), atol=1e-6,
        err_msg=f"ball_in_cup obs step {t}",
      )
      assert abs(float(r_dev) - r_host) < 1e-6, f"ball_in_cup step {t}"
      hit += r_host
    # string must have gone taut at least once during the swing
    assert float(np.abs(np.asarray(state["v"])).max()) < 50.0


@pytest.mark.parametrize(
  "task", ("stand", "walk", "run", "run_pure_state")
)
@isolated
def test_humanoid_parity(task) -> None:
  """humanoid: obs (com-velocity, extremities, head height) and reward
  match the host tier from a near-keyframe state with the feet in floor
  contact (plane-box corner narrow phase). Per-task subprocesses: one
  big eager-scan compile per process (jaxlib CPU crash workaround,
  tests/_isolation.py)."""
  with jax.enable_x64(True):
    for task in (task,):
      cfg = _cfg(task, frame_skip=5)
      mdl = dd.DmcHumanoidJaxEnv.mdl(cfg)
      host = _host(hd.DmcHumanoidEnv, task)
      host.n_sub_steps = 5
      rng = np.random.default_rng(7)
      q = np.asarray(mdl.init_qpos).copy()
      q[2] = 1.25  # feet just touching
      q[7:] += rng.uniform(-0.08, 0.08, mdl.nq - 7)
      v = rng.uniform(-0.3, 0.3, mdl.nv)
      state = {"q": jnp.asarray(q), "v": jnp.asarray(v)}
      _force_host(host, q, v)
      key = jax.random.PRNGKey(0)
      for t in range(8):
        act = np.clip(
          0.4 * np.sin(0.3 * t + np.arange(21)), -1, 1
        )
        r_host, _ = host.control_step(act)
        state, obs_d, r_dev, _, _ = dd.DmcHumanoidJaxEnv.step(
          cfg, state, jnp.asarray(act), key
        )
        obs_h = host.task_observation()
        np.testing.assert_allclose(
          _flat(obs_d), _flat(obs_h), atol=5e-5,
          err_msg=f"humanoid {task} obs step {t}",
        )
        assert abs(float(r_dev) - r_host) < 1e-5, (
          f"humanoid {task} reward step {t}"
        )


@pytest.mark.parametrize(
  "task", ("bring_ball", "bring_peg", "insert_ball", "insert_peg")
)
@isolated
def test_manipulator_parity(task) -> None:
  """manipulator: obs (incl. xquat pairs and log1p touch), gripper
  tendon actuation and the is_close reward match the host tier with
  the receptacle/target pose forced identically in both (the device
  carries it in state via the fk body-pose override)."""
  with jax.enable_x64(True):
    cfg = _cfg(task, frame_skip=10)
    mdl = dd.DmcManipulatorJaxEnv.mdl(cfg)
    host = _host(hd.DmcManipulatorEnv, task)
    host.n_sub_steps = 10
    target = np.array([0.25, 0.2, 0.5])
    # force host model pose like task_initialize_episode
    host.model.body_pos[host.id_body_target, 0] = target[0]
    host.model.body_pos[host.id_body_target, 2] = target[1]
    host.model.body_quat[host.id_body_target, 0] = math.cos(target[2] / 2)
    host.model.body_quat[host.id_body_target, 2] = math.sin(target[2] / 2)
    if host.insert:
      host.model.body_pos[host.id_receptacle, 0] = target[0]
      host.model.body_pos[host.id_receptacle, 2] = target[1]
      host.model.body_quat[host.id_receptacle, 0] = math.cos(target[2] / 2)
      host.model.body_quat[host.id_receptacle, 2] = math.sin(target[2] / 2)
    rng = np.random.default_rng(3)
    q = np.zeros(11)
    q[:8] = [0.5, 0.4, -0.6, 0.3, -0.3, 0.1, -0.3, 0.1]
    q[8:] = [0.25, 0.4, 0.3]  # prop above the target / receptacle
    v = np.zeros(11)
    state = {
      "q": jnp.asarray(q), "v": jnp.asarray(v),
      "touch": jnp.zeros(5, np.float64),
      "target": jnp.asarray(target),
    }
    _force_host(host, q, v)
    key = jax.random.PRNGKey(0)
    for t in range(10):
      act = np.clip(0.5 * np.sin(0.4 * t + np.arange(5)), -1, 1)
      r_host, _ = host.control_step(act)
      state, obs_d, r_dev, _, _ = dd.DmcManipulatorJaxEnv.step(
        cfg, state, jnp.asarray(act), key
      )
      obs_h = host.task_observation()
      if task == "insert_peg" and t >= 4:
        # once the peg rests on the slot boxes, mj's native-CCD
        # capsule-box manifolds diverge from the masked-candidate set
        # (same deviation contract as the cylinder pairs,
        # test_device_pusher.py): chained trajectories separate, so
        # assert bounded PER-STEP error and resync to the host state
        assert (
          np.abs(_flat(obs_d) - _flat(obs_h)).max() < 0.1
        ), f"manipulator {task} per-step drift step {t}"
        assert abs(float(r_dev) - r_host) < 0.05
        state = {
          **state,
          "q": jnp.asarray(np.array(host.data.qpos)),
          "v": jnp.asarray(np.array(host.data.qvel)),
        }
        continue
      np.testing.assert_allclose(
        _flat(obs_d), _flat(obs_h), atol=2e-5,
        err_msg=f"manipulator {task} obs step {t}",
      )
      assert abs(float(r_dev) - r_host) < 1e-5, (
        f"manipulator {task} reward step {t}"
      )


@pytest.mark.parametrize("task", ("stand", "run"))
@isolated
def test_humanoid_cmu_parity(task) -> None:
  """humanoid_CMU (nv=62, the widest device model): obs and reward
  match the host tier from a near-upright state."""
  with jax.enable_x64(True):
    cfg = _cfg(task, frame_skip=10)
    mdl = dd.DmcHumanoidCMUJaxEnv.mdl(cfg)
    host = _host(hd.DmcHumanoidCMUEnv, task)
    host.n_sub_steps = 10
    rng = np.random.default_rng(5)
    q = np.asarray(mdl.init_qpos).copy()
    q[2] = 1.05
    q[7:] += rng.uniform(-0.04, 0.04, mdl.nq - 7)
    v = rng.uniform(-0.2, 0.2, mdl.nv)
    state = {"q": jnp.asarray(q), "v": jnp.asarray(v)}
    _force_host(host, q, v)
    key = jax.random.PRNGKey(0)
    for t in range(4):
      act = np.clip(0.3 * np.sin(0.2 * t + np.arange(56)), -1, 1)
      r_host, _ = host.control_step(act)
      state, obs_d, r_dev, _, _ = dd.DmcHumanoidCMUJaxEnv.step(
        cfg, state, jnp.asarray(act), key
      )
      obs_h = host.task_observation()
      np.testing.assert_allclose(
        _flat(obs_d), _flat(obs_h), atol=5e-5,
        err_msg=f"humanoid_CMU {task} obs step {t}",
      )
      assert abs(float(r_dev) - r_host) < 1e-5, (
        f"humanoid_CMU {task} reward step {t}"
      )
