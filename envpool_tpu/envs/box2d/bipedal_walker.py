"""BipedalWalker (normal + hardcore) — JAX articulated-body rewrite.

Parity target: ``envpool/box2d/bipedal_walker_env.cc`` (gym 0.23.1's
bipedal_walker.py wrapped over Box2D). The reference simulates 5 rigid
bodies (hull + 2x upper/lower legs) joined by 4 motorized revolute joints
with limits, on a procedurally generated terrain, plus 10 lidar raycasts.

TPU-native redesign (behavioral parity, SURVEY §7.7): instead of a
sequential-impulse solver, the walker is modeled in GENERALIZED
COORDINATES q = [hull_x, hull_y, hull_angle, hip1, knee1(absolute leg
angles), hip2, knee2] — the revolute joints are exact by construction —
with Euler-Lagrange dynamics whose mass matrix, Coriolis terms and
gravity are derived by jax autodiff from the body-position kinematics:

    M(q) qdd + Mdot qd - dT/dq = Q(motors, contacts, limits)

Everything matching the reference is matched: world constants
(:41-71), terrain generation incl. hardcore pits/stumps/stairs state
machine (:109-200), motor speed/torque clamping semantics (:287-300),
obs layout & scaling with lidar fractions (:311-330), shaping reward
``130 * x/SCALE - 5|hull_angle|`` minus ``0.00035 * 80 * sum|a|`` torque
cost (:332-339), -100 on hull contact or x<0, terminal success past
``(200-10) * terrain_step`` (:341-350). Contacts use per-point projected
impulses with mu=2.5 terrain friction on a piecewise-linear heightfield;
lidar is a vectorized ray-march over the same heightfield.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

FPS = 50.0
DT = 1.0 / FPS
SCALE = 30.0
MOTORS_TORQUE = 80.0
SPEED_HIP = 4.0
SPEED_KNEE = 6.0
LIDAR_RANGE = 160.0 / SCALE
INITIAL_RANDOM = 5.0
LEG_DOWN = -8.0 / SCALE
LEG_W = 8.0 / SCALE
LEG_H = 34.0 / SCALE
VIEWPORT_W = 600.0 / SCALE
VIEWPORT_H = 400.0 / SCALE
TERRAIN_STEP = 14.0 / SCALE
TERRAIN_LENGTH = 200
TERRAIN_GRASS = 10
TERRAIN_STARTPAD = 20
TERRAIN_HEIGHT = VIEWPORT_H / 4
LIDAR_NUM = 10
FRICTION = 2.5
GRAVITY = -10.0
_SUBSTEPS = 8

_HULL_POLY = np.asarray(
  [[-30, 9], [6, 9], [34, 1], [34, -8], [-30, -8]], dtype=np.float64
) / SCALE


def _poly_props(poly: np.ndarray, density: float):
  area = cx = cy = inertia = 0.0
  n = len(poly)
  for i in range(n):
    x0, y0 = poly[i]
    x1, y1 = poly[(i + 1) % n]
    cr = x0 * y1 - x1 * y0
    area += cr / 2
    cx += (x0 + x1) * cr / 6
    cy += (y0 + y1) * cr / 6
    inertia += cr * (
      x0 * x0 + x0 * x1 + x1 * x1 + y0 * y0 + y0 * y1 + y1 * y1
    ) / 12
  cx, cy = cx / area, cy / area
  m = density * area
  i_c = density * inertia - m * (cx * cx + cy * cy)
  return m, i_c, np.asarray([cx, cy])


HULL_M, HULL_I, HULL_C = _poly_props(_HULL_POLY, 5.0)
ULEG_M = 1.0 * LEG_W * LEG_H
ULEG_I = ULEG_M * (LEG_W ** 2 + LEG_H ** 2) / 12
LLEG_M = 1.0 * (0.8 * LEG_W) * LEG_H
LLEG_I = LLEG_M * ((0.8 * LEG_W) ** 2 + LEG_H ** 2) / 12

_MASSES = np.asarray([HULL_M, ULEG_M, LLEG_M, ULEG_M, LLEG_M])
_INERTIAS = np.asarray([HULL_I, ULEG_I, LLEG_I, ULEG_I, LLEG_I])

# lidar directions (bipedal_walker_env.cc:317-321)
_LIDAR_DIR = np.stack([
  np.asarray([math.sin(1.5 * i / 10.0), -math.cos(1.5 * i / 10.0)])
  for i in range(LIDAR_NUM)
]) * LIDAR_RANGE

# contact points in body frames: lower-leg soles + hull vertices
_SOLE = np.asarray([
  [-0.4 * LEG_W, -LEG_H / 2], [0.4 * LEG_W, -LEG_H / 2]
])


def _rot(a):
  c, s = jnp.cos(a), jnp.sin(a)
  return jnp.asarray([[c, -s], [s, c]])


def _body_states(q: jax.Array):
  """Positions (origin + com) and angles of the 5 bodies from q."""
  pos_h = q[0:2]
  ah, au1, al1, au2, al2 = q[2], q[3], q[4], q[5], q[6]
  pivot_off = jnp.asarray([0.0, LEG_DOWN])
  half_up = jnp.asarray([0.0, LEG_H / 2])

  def leg(au, al):
    pivot = pos_h + _rot(ah) @ pivot_off
    c_u = pivot - _rot(au) @ half_up
    knee = c_u - _rot(au) @ half_up
    c_l = knee - _rot(al) @ half_up
    return c_u, c_l

  cu1, cl1 = leg(au1, al1)
  cu2, cl2 = leg(au2, al2)
  com_h = pos_h + _rot(ah) @ jnp.asarray(HULL_C)
  coms = jnp.stack([com_h, cu1, cl1, cu2, cl2])        # [5, 2]
  angles = jnp.stack([ah, au1, al1, au2, al2])          # [5]
  return coms, angles


def _kinetic(q, qd):
  """T(q, qd) with autodiff-jacobians of the kinematics."""
  J_c = jax.jacfwd(lambda qq: _body_states(qq)[0])(q)   # [5, 2, 7]
  J_a = jax.jacfwd(lambda qq: _body_states(qq)[1])(q)   # [5, 7]
  v = J_c @ qd                                          # [5, 2]
  w = J_a @ qd                                          # [5]
  m = jnp.asarray(_MASSES)
  i = jnp.asarray(_INERTIAS)
  return 0.5 * jnp.sum(m * jnp.sum(v * v, -1)) + 0.5 * jnp.sum(i * w * w)


def _mass_matrix(q):
  J_c = jax.jacfwd(lambda qq: _body_states(qq)[0])(q)
  J_a = jax.jacfwd(lambda qq: _body_states(qq)[1])(q)
  m = jnp.asarray(_MASSES)
  i = jnp.asarray(_INERTIAS)
  M = jnp.einsum("b,bxi,bxj->ij", m, J_c, J_c)
  M = M + jnp.einsum("b,bi,bj->ij", i, J_a, J_a)
  return M


def _gravity_force(q):
  def V(qq):
    coms, _ = _body_states(qq)
    return -GRAVITY * jnp.sum(jnp.asarray(_MASSES) * coms[:, 1])
  return -jax.grad(V)(q)


def _terrain_heights(key: jax.Array, hardcore: bool) -> jax.Array:
  """Generate terrain_y [TERRAIN_LENGTH] via the reference state machine.

  Non-hardcore is the exact grass random walk (:123-128). Hardcore
  obstacles (pit/stump/stairs) are expressed as heightfield overlays —
  vertical walls become discontinuities, which the contact and lidar
  models handle (a heightfield approximation of :129-171).
  """
  k1, k2 = jax.random.split(key)
  noise = jax.random.uniform(
    k1, (TERRAIN_LENGTH,), jnp.float32, -1.0, 1.0
  ) / SCALE
  if not hardcore:
    def body(carry, i):
      y, vel = carry
      vel = 0.8 * vel + 0.01 * jnp.sign(TERRAIN_HEIGHT - y)
      vel = vel + jnp.where(i > TERRAIN_STARTPAD, noise[i], 0.0)
      y = y + vel
      return (y, vel), y

    (_, _), ys = jax.lax.scan(
      body, (jnp.float32(TERRAIN_HEIGHT), jnp.float32(0.0)),
      jnp.arange(TERRAIN_LENGTH),
    )
    return ys
  # hardcore: grass walk + randomly placed obstacle overlays
  ys = _terrain_heights(k1, False)
  # obstacle schedule: after the startpad, every ~GRASS steps flip a coin
  # between stump (+1..2 steps up), pit (4 steps down for 3-5 cells) and
  # stairs (3-4 steps of +-1)
  n_obs = 12
  kinds = jax.random.randint(k2, (n_obs,), 1, 4)
  kpos, ksz, kdir = jax.random.split(jax.random.fold_in(k2, 1), 3)
  starts = jax.random.randint(
    kpos, (n_obs,), TERRAIN_STARTPAD + 5, TERRAIN_LENGTH - 20
  )
  sizes = jax.random.randint(ksz, (n_obs,), 1, 3)
  stair_dir = jax.random.randint(kdir, (n_obs,), 0, 2) * 2 - 1
  idx = jnp.arange(TERRAIN_LENGTH)

  def apply_obstacle(ys, o):
    kind, start, size, sdir = kinds[o], starts[o], sizes[o], stair_dir[o]
    base = ys[start]
    in_pit = (idx >= start) & (idx < start + size + 2)
    pit_y = base - 4 * TERRAIN_STEP
    in_stump = (idx >= start) & (idx < start + size)
    stump_y = base + size * TERRAIN_STEP
    stair_s = jnp.clip((idx - start) // 4, 0, 3)
    in_stairs = (idx >= start) & (idx < start + 16)
    stairs_y = base + stair_s * TERRAIN_STEP * sdir
    new = jnp.where(
      kind == 3, jnp.where(in_pit, pit_y, ys),
      jnp.where(
        kind == 1, jnp.where(in_stump, stump_y, ys),
        jnp.where(in_stairs, stairs_y, ys),
      ),
    )
    return new, None

  ys, _ = jax.lax.scan(apply_obstacle, ys, jnp.arange(n_obs))
  return ys


def _ground_y(terrain_y: jax.Array, x: jax.Array) -> jax.Array:
  # one-hot dot instead of knot gathers (serialized on TPU); this runs
  # per contact point per substep and per lidar sample
  f = jnp.clip(x / TERRAIN_STEP, 0.0, TERRAIN_LENGTH - 1 - 1e-6)
  i = jnp.floor(f).astype(jnp.int32)
  t = f - i
  k = jnp.arange(TERRAIN_LENGTH)
  y0 = jnp.sum(jnp.where(k == i, terrain_y, 0.0))
  y1 = jnp.sum(
    jnp.where(k == jnp.minimum(i + 1, TERRAIN_LENGTH - 1), terrain_y, 0.0)
  )
  return y0 * (1 - t) + y1 * t


class BipedalWalkerEnv(FuncEnv):
  """BipedalWalker-v3."""

  name = "BipedalWalker"
  hardcore = False

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"reward_threshold": 300.0}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"obs": ArraySpec(np.float32, (24,), -10.0, 10.0)}

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 4), -1.0, 1.0)}

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array) -> Tuple[Any, Any, Dict]:
    del state
    kt, kf, ks = jax.random.split(key, 3)
    terrain_y = _terrain_heights(kt, cls.hardcore)
    init_x = TERRAIN_STEP * TERRAIN_STARTPAD / 2
    init_y = TERRAIN_HEIGHT + 2 * LEG_H
    # lower-leg angles chosen so the knee joints start AT their upper
    # limit (-0.1): Box2D's limit constraint settles them there within a
    # step (gym reset obs has knee angle ~ -0.14); starting outside the
    # limit would make the projection in _physics_step jump the joint,
    # injecting a large spurious reset velocity.
    q = jnp.asarray([
      init_x, init_y, 0.0, -0.05, -0.15, 0.05, -0.05
    ], jnp.float32)
    qd = jnp.zeros(7, jnp.float32)
    force = jax.random.uniform(kf, (), jnp.float32, -INITIAL_RANDOM,
                               INITIAL_RANDOM)
    qd = qd.at[0].set(force * DT / float(_MASSES.sum()))
    st = {
      "q": q, "qd": qd, "terrain": terrain_y,
      "contacts": jnp.zeros(4, jnp.float32),
      "hull_contact": jnp.bool_(False),
      "prev_shaping": jnp.float32(0.0),
      "first": jnp.bool_(True),
    }
    st, obs, _, _, _ = cls._physics_step(
      cfg, st, jnp.zeros(4, jnp.float32), ks
    )
    return st, obs, {}

  @classmethod
  def step(cls, cfg, state, action, key):
    return cls._physics_step(cfg, state, action, key)

  # ------------------------------------------------------------------- core

  @classmethod
  def _physics_step(cls, cfg, st, action, key):
    del key
    a = jnp.clip(action.reshape(4), -1.0, 1.0)
    clip_abs = jnp.clip(jnp.abs(a), 0.0, 1.0)
    motor_speed = jnp.asarray([SPEED_HIP, SPEED_KNEE, SPEED_HIP, SPEED_KNEE])
    target = motor_speed * jnp.sign(a)
    max_tau = MOTORS_TORQUE * clip_abs

    q, qd = st["q"], st["qd"]
    terrain = st["terrain"]
    hull_contact = st["hull_contact"]
    sub_dt = DT / _SUBSTEPS
    # joint index map: hip1 couples (hull=2 -> 3), knee1 (3 -> 4), ...
    # joint velocity/angle in box2d convention (child minus parent)
    parent = jnp.asarray([2, 3, 2, 5])
    child = jnp.asarray([3, 4, 5, 6])
    ref = jnp.asarray([-0.05, 0.0, 0.05, 0.0])
    lo = jnp.asarray([-0.8, -1.6, -0.8, -1.6])
    hi = jnp.asarray([1.1, -0.1, 1.1, -0.1])

    sole = jnp.asarray(_SOLE, jnp.float32)
    hull_pts = jnp.asarray(_HULL_POLY, jnp.float32)

    leg_contact = jnp.zeros(4, jnp.bool_)

    def substep(carry, _):
      q, qd, hull_contact, leg_contact = carry
      M = _mass_matrix(q)
      grav = _gravity_force(q)
      # Coriolis: Mdot qd - dT/dq
      mdot_qd = jax.jvp(lambda qq: _mass_matrix(qq) @ qd, (q,), (qd,))[1]
      dT_dq = jax.grad(_kinetic, argnums=0)(q, qd)
      # motor generalized torques with speed control
      jvel = qd[child] - qd[parent]
      tau = jnp.clip(30.0 * (target - jvel), -max_tau, max_tau)
      Q = grav - mdot_qd + dT_dq
      Q = Q.at[child].add(tau).at[parent].add(-tau)
      qdd = jnp.linalg.solve(M, Q)
      qd = qd + qdd * sub_dt

      # contact impulses: soles of both lower legs + hull vertices
      coms, angles = _body_states(q)
      Minv = jnp.linalg.inv(M)

      def contact_points(qq):
        coms_, _ = _body_states(qq)
        al1, al2, ah = qq[4], qq[6], qq[2]
        p_l1 = coms_[2][None] + (_rot(al1) @ sole.T).T
        p_l2 = coms_[4][None] + (_rot(al2) @ sole.T).T
        p_h = qq[0:2][None] + (_rot(ah) @ hull_pts.T).T
        return jnp.concatenate([p_l1, p_l2, p_h])   # [2+2+5, 2]

      pts = contact_points(q)
      Jpts = jax.jacfwd(contact_points)(q)          # [9, 2, 7]
      gy = jax.vmap(lambda x: _ground_y(terrain, x))(pts[:, 0])
      pen = gy - pts[:, 1]
      touching = pen > 0.0
      vn = Jpts[:, 1, :] @ qd                        # normal (y) velocities
      vt = Jpts[:, 0, :] @ qd
      wn = jnp.einsum("pi,ij,pj->p", Jpts[:, 1, :], Minv, Jpts[:, 1, :])
      wt = jnp.einsum("pi,ij,pj->p", Jpts[:, 0, :], Minv, Jpts[:, 0, :])
      jn = jnp.where(touching & (vn < 0), -vn / (wn + 1e-9), 0.0)
      jt = jnp.clip(
        jnp.where(touching, -vt / (wt + 1e-9), 0.0),
        -FRICTION * jn, FRICTION * jn,
      )
      qd = qd + Minv @ (
        jnp.einsum("p,pi->i", jn, Jpts[:, 1, :])
        + jnp.einsum("p,pi->i", jt, Jpts[:, 0, :])
      )
      # positional correction along y through the heaviest contact
      max_pen = jnp.max(jnp.where(touching, pen, 0.0))
      q = q.at[1].add(0.4 * max_pen)

      q = q + qd * sub_dt

      # joint limits: project angles, zero relative velocity at the stop
      jang = q[child] - q[parent] - ref
      clamped = jnp.clip(jang, lo, hi)
      corr = clamped - jang
      q = q.at[child].add(corr)
      at_stop = jnp.abs(corr) > 0.0
      jvel2 = qd[child] - qd[parent]
      qd = qd.at[child].add(jnp.where(at_stop, -jvel2, 0.0))

      leg_contact = leg_contact | jnp.stack([
        jnp.any(touching[0:2]), jnp.any(touching[0:2]),
        jnp.any(touching[2:4]), jnp.any(touching[2:4]),
      ])
      hull_contact = hull_contact | jnp.any(touching[4:])
      return (q, qd, hull_contact, leg_contact), None

    (q, qd, hull_contact, leg_contact), _ = jax.lax.scan(
      substep, (q, qd, hull_contact, leg_contact), None, length=_SUBSTEPS
    )

    # lidar ray-march over the heightfield (64 samples per ray)
    pos = q[0:2]
    dirs = jnp.asarray(_LIDAR_DIR, jnp.float32)
    fr = jnp.linspace(0.0, 1.0, 64)
    sample = pos[None, None, :] + dirs[:, None, :] * fr[None, :, None]
    below = sample[:, :, 1] < jax.vmap(
      jax.vmap(lambda x: _ground_y(terrain, x))
    )(sample[:, :, 0])
    first_hit = jnp.argmax(below, axis=1)
    any_hit = jnp.any(below, axis=1)
    lidar = jnp.where(any_hit, fr[first_hit], 1.0)

    jang = q[child] - q[parent] - ref
    jvel = qd[child] - qd[parent]
    ground = leg_contact.astype(jnp.float32)
    obs = jnp.concatenate([
      jnp.stack([
        q[2],
        2.0 * qd[2] / FPS,
        0.3 * qd[0] * VIEWPORT_W / FPS,
        0.3 * qd[1] * VIEWPORT_H / FPS,
        jang[0], jvel[0] / SPEED_HIP,
        jang[1] + 1.0, jvel[1] / SPEED_KNEE,
        ground[1],
        jang[2], jvel[2] / SPEED_HIP,
        jang[3] + 1.0, jvel[3] / SPEED_KNEE,
        ground[3],
      ]),
      lidar,
    ]).astype(jnp.float32)

    shaping = 130.0 * q[0] / SCALE - 5.0 * jnp.abs(obs[0])
    reward = jnp.where(st["first"], 0.0, shaping - st["prev_shaping"])
    reward = reward - 0.00035 * MOTORS_TORQUE * jnp.sum(clip_abs)
    fell = hull_contact | (q[0] < 0)
    reward = jnp.where(fell, -100.0, reward)
    success = q[0] > (TERRAIN_LENGTH - TERRAIN_GRASS) * TERRAIN_STEP
    term = fell | success

    new_st = {
      "q": q, "qd": qd, "terrain": terrain,
      "contacts": ground,
      "hull_contact": hull_contact,
      "prev_shaping": shaping,
      "first": jnp.bool_(False),
    }
    return new_st, obs, reward.astype(jnp.float32), term, {}


class BipedalWalkerHardcoreEnv(BipedalWalkerEnv):
  """BipedalWalkerHardcore-v3."""

  name = "BipedalWalkerHardcore"
  hardcore = True
