"""On-device MuJoCo: a compact smooth-dynamics engine in JAX.

The reference runs MuJoCo on worker threads over ``mj_step``
(``envpool/mujoco/gym/mujoco_env.h:44-94``) — a host-bound design. The
TPU-first counterpart steps the physics *on the device*: this module
re-implements MuJoCo's smooth (constraint-free) forward dynamics as pure
JAX functions over constants extracted from a host-side ``mjModel``, so a
``vmap``-batched env steps thousands of MuJoCo models per chip inside one
fused XLA program with zero per-step host traffic.

Scope: kinematic trees of 1-DOF joints (hinge/slide), motor actuators,
joint damping/armature/springs, gravity, the inertia-box fluid model,
joint-limit constraints, and — via ``device_collision.py`` — MuJoCo's
full contact pipeline (plane/sphere/capsule narrow phase, pyramidal
friction cones, soft-constraint rows, primal Newton solve), plus free
(quaternion-root) joints with mj_integratePos semantics. This covers the
complete physics of the gym tasks Reacher, InvertedPendulum,
InvertedDoublePendulum, Swimmer, HalfCheetah, Hopper, Walker2d, Ant,
Humanoid and HumanoidStandup (whose inert tendons are validated and
skipped). With cylinder contacts (device_collision.py) every gym
MuJoCo task runs on-device, Pusher included.

Pipeline per step, mirroring ``mj_step`` with the Euler integrator:

1. forward kinematics (``mj_kinematics`` semantics: per-joint anchor/axis
   resolved in the partially-accumulated body frame);
2. composite-rigid-body mass matrix in world-frame Plucker coordinates
   (``mj_crb``), plus armature on the diagonal;
3. bias forces c(q,v) including gravity via a recursive Newton-Euler pass
   with the base accelerating at -g (``mj_rne``);
4. passive forces: joint springs and (implicitly integrated) damping;
5. actuation: gear-scaled clamped motor controls;
6. MuJoCo's Euler rule: qacc solved against (M + h*diag(damping)) — the
   implicit-damping modification ``mj_Euler`` applies — then semi-implicit
   position update.

All loops over bodies/dofs are static Python loops (nbody <= 8 here), so
XLA sees a fully unrolled closed-form program: batched 3x3/nv x nv algebra
that fuses into a few dozen elementwise/matmul ops per step.

Numerical contract: with x64 enabled this engine matches ``mj_step`` to
~1e-10 per step on the in-scope models (asserted by
``tests/test_device_mujoco.py``); in f32 (TPU native) trajectories align
behaviorally over full episodes.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import numpy as np

# mjtJoint enum values (mujoco/mjmodel.h)
_JNT_FREE, _JNT_BALL, _JNT_SLIDE, _JNT_HINGE = 0, 1, 2, 3


def precise_matmul(fn):
  """Matmul-precision control scope for the engine's entry points.

  TPU's DEFAULT dot precision routes f32 matmuls through bf16 MXU
  passes (~8 mantissa bits). In round 4 that truncation made
  light-link mass-matrix diagonals come out NEGATIVE (walker's foot
  dof at reset), NaN-ing 1/sqrt(diag) in the Cholesky — VERDICT r3's
  f32 instability — and the whole engine ran under HIGHEST (6-pass
  f32 MXU emulation), costing ~1.7x throughput. Per-function
  precision bisection on the chip then showed the ONLY
  stability-critical dots are the spatial-inertia 3x3 products, now
  computed as elementwise VPU ops at true f32 (see ``_mm3``); every
  other dot tolerates bf16, so the default here is back to DEFAULT
  (measured: HalfCheetah 401k steps/s stable vs 217k under global
  HIGHEST, all 28 families finite over 2k-step random-action soaks).
  ``ENVPOOL_TPU_MM_PRECISION`` (global) and
  ``ENVPOOL_TPU_MM_PREC_<FNNAME>`` (per entry point) remain as
  experiment/escape hatches.
  """

  @functools.wraps(fn)
  def wrapped(*args, **kwargs):
    import os

    import jax
    prec = os.environ.get(
      "ENVPOOL_TPU_MM_PREC_" + fn.__name__.strip("_").upper(),
      os.environ.get("ENVPOOL_TPU_MM_PRECISION", "default"),
    )
    if prec == "default":  # escape hatch for perf experiments
      prec = "bfloat16"  # enter explicitly so inner scopes can relax outer
    with jax.default_matmul_precision(prec):
      return fn(*args, **kwargs)

  return wrapped


class DeviceModel(NamedTuple):
  """Static extraction of an mjModel: python structure + numpy constants."""

  nq: int
  nv: int
  nbody: int
  parent: Tuple[int, ...]              # body -> parent body id
  body_pos: np.ndarray                 # [nbody, 3]
  body_rotm: np.ndarray                # [nbody, 3, 3]
  body_mass: np.ndarray                # [nbody]
  body_ipos: np.ndarray                # [nbody, 3] com offset, body frame
  body_inertia_w: np.ndarray           # [nbody, 3, 3] I_c in body frame
  body_joints: Tuple[Tuple[int, ...], ...]   # per body: joint ids, in order
  body_dofs: Tuple[Tuple[int, ...], ...]     # per body: dof ids, in order
  jnt_type: Tuple[int, ...]
  jnt_axis: np.ndarray                 # [njnt, 3] (body frame)
  jnt_pos: np.ndarray                  # [njnt, 3] (body frame)
  jnt_dof: Tuple[int, ...]             # joint -> first dof index
  jnt_qadr: Tuple[int, ...]            # joint -> first qpos index
  jnt_limited: Tuple[bool, ...]
  jnt_range: np.ndarray                # [njnt, 2]
  jnt_margin: np.ndarray               # [njnt]
  jnt_solref: np.ndarray               # [njnt, 2] (timeconst, dampratio)
  jnt_solimp: np.ndarray               # [njnt, 5] (d0, dmax, width, mid, pow)
  jnt_stiffness: np.ndarray            # [njnt]
  qpos_spring: np.ndarray              # [nq]
  dof_body: Tuple[int, ...]            # dof -> body id
  dof_damping: np.ndarray              # [nv]
  dof_armature: np.ndarray             # [nv]
  ancestor: Tuple[Tuple[bool, ...], ...]  # [nbody][nbody] a is ancestor-or-self
  # actuators (motor/general with fixed gain, joint transmission)
  act_dof: Tuple[int, ...]             # joint-transmission dof (-1: tendon)
  act_trn: np.ndarray                  # [nu, nv] constant actuator moment
  act_gear: np.ndarray                 # [nu]
  ctrl_range: np.ndarray               # [nu, 2]
  force_range: np.ndarray              # [nu, 2] (+-inf when unlimited)
  timestep: float
  integrator: int                      # 0=Euler (implicit damping), 1=RK4
  gravity: np.ndarray                  # [3]
  # fluid model (mj_passive inertia-box model): per-body equivalent
  # inertia box dims, inertia-frame rotation, and the medium constants
  density: float
  viscosity: float
  wind: np.ndarray                     # [3]
  body_ibox: np.ndarray                # [nbody, 3]
  body_irotm: np.ndarray               # [nbody, 3, 3] body->inertia frame
  init_qpos: np.ndarray                # [nq] (qpos0)
  body_name2id: Dict[str, int]
  site_body: Tuple[int, ...]
  site_pos: np.ndarray                 # [nsite, 3] (body frame)
  site_name2id: Dict[str, int]
  site_size: np.ndarray                # [nsite, 3]
  site_type: Tuple[int, ...]           # mjtGeom (touch-sensor zones)
  geom_body: Tuple[int, ...]
  geom_pos: np.ndarray                 # [ngeom, 3] (body frame)
  geom_rotm: np.ndarray                # [ngeom, 3, 3] (body frame)
  geom_size: np.ndarray                # [ngeom, 3]
  geom_name2id: Dict[str, int]
  dof_invweight0: np.ndarray           # [nv] (diag-approx for limit rows)
  # contact tables (device_collision.ContactData) or None when the model
  # has no admissible geom pairs
  contacts: Any


def _quat2rotm(q: np.ndarray) -> np.ndarray:
  w, x, y, z = q
  return np.array([
    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
  ])


def _inertia_boxes(m) -> np.ndarray:
  """Equivalent inertia-box dims per body (mj_inertiaBoxFluidModel):
  box_i = sqrt(6 (I_j + I_k - I_i) / (2 m)) i.e. inverting the solid-box
  inertia I_i = m/12 (d_j^2 + d_k^2)."""
  out = np.zeros((m.nbody, 3))
  for b in range(m.nbody):
    mass = float(m.body_mass[b])
    if mass <= 0:
      continue
    ii = np.asarray(m.body_inertia[b], dtype=np.float64)
    for i in range(3):
      j, k = (i + 1) % 3, (i + 2) % 3
      out[b, i] = np.sqrt(max(1e-15, ii[j] + ii[k] - ii[i]) / mass * 6.0)
  return out


@functools.lru_cache(maxsize=32)
def extract_model(xml_path: str) -> DeviceModel:
  """Pull the constants this engine needs out of a host-side mjModel."""
  import mujoco
  return _extract_model(mujoco.MjModel.from_xml_path(xml_path))


def extract_model_string(xml: str) -> DeviceModel:
  """Like :func:`extract_model` but from an MJCF string (dmc replicas)."""
  import mujoco
  return _extract_model(mujoco.MjModel.from_xml_string(xml))


def _extract_model(m) -> DeviceModel:
  import mujoco

  for j in range(m.njnt):
    if m.jnt_type[j] not in (_JNT_SLIDE, _JNT_HINGE, _JNT_FREE):
      raise NotImplementedError(
        "device engine supports free/hinge/slide joints only"
      )
    if m.jnt_type[j] == _JNT_FREE:
      b = int(m.jnt_bodyid[j])
      if int(m.body_jntnum[b]) != 1:
        raise NotImplementedError("free joint must be its body's only joint")
      if float(m.jnt_stiffness[j]) != 0.0:
        raise NotImplementedError("springs on free joints not supported")
  for t in range(m.ntendon):
    # supported tendon effects: LIMITS on 2-site spatial tendons (a
    # constraint row, extract_contacts) and fixed-tendon actuator
    # transmission (folded into act_trn below). Tendon
    # stiffness/damping/friction forces are not modeled.
    if (
      float(m.tendon_stiffness[t]) != 0.0
      or float(m.tendon_damping[t]) != 0.0
      or float(m.tendon_frictionloss[t]) != 0.0
    ):
      raise NotImplementedError("tendon stiffness/damping not supported")
  if m.neq:
    raise NotImplementedError("equality constraints not supported")
  if np.any(np.asarray(m.dof_frictionloss) != 0.0):
    raise NotImplementedError("dof frictionloss not supported")

  body_joints: List[Tuple[int, ...]] = []
  body_dofs: List[Tuple[int, ...]] = []
  for b in range(m.nbody):
    adr, num = int(m.body_jntadr[b]), int(m.body_jntnum[b])
    body_joints.append(tuple(range(adr, adr + num)) if num else ())
    dofs: List[int] = []
    for j in body_joints[-1]:
      nd = 6 if m.jnt_type[j] == _JNT_FREE else 1
      dofs.extend(range(int(m.jnt_dofadr[j]), int(m.jnt_dofadr[j]) + nd))
    body_dofs.append(tuple(dofs))

  # I_c rotated into the body frame: R_i diag(inertia) R_i^T
  inertia_w = np.zeros((m.nbody, 3, 3))
  for b in range(m.nbody):
    ri = _quat2rotm(np.asarray(m.body_iquat[b], dtype=np.float64))
    inertia_w[b] = ri @ np.diag(m.body_inertia[b]) @ ri.T

  ancestor = np.zeros((m.nbody, m.nbody), dtype=bool)
  for b in range(m.nbody):
    a = b
    while True:
      ancestor[a][b] = True
      if a == 0:
        break
      a = int(m.body_parentid[a])

  act_dof: List[int] = []
  act_trn = np.zeros((m.nu, m.nv))
  _TRN_JOINT, _TRN_TENDON = 0, 3  # mjtTrn
  _WRAP_JOINT = 1                 # mjtWrap
  for u in range(m.nu):
    # joint transmission with a fixed (possibly zero-bias) affine gain
    # (the gym models' plain <motor>), or FIXED-tendon transmission
    # (manipulator's grasp tendon): the actuator moment is a constant
    # row over dofs, so tau = act_trn.T @ clamped_force
    trn = int(m.actuator_trntype[u])
    if trn == _TRN_JOINT:
      jid = int(m.actuator_trnid[u, 0])
      d = int(m.jnt_dofadr[jid])
      act_dof.append(d)
      act_trn[u, d] = 1.0
    elif trn == _TRN_TENDON:
      t = int(m.actuator_trnid[u, 0])
      adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
      if any(int(m.wrap_type[adr + i]) != _WRAP_JOINT for i in range(num)):
        raise NotImplementedError(
          "tendon actuators supported on FIXED tendons only"
        )
      for i in range(num):
        jid = int(m.wrap_objid[adr + i])
        act_trn[u, int(m.jnt_dofadr[jid])] = float(m.wrap_prm[adr + i])
      act_dof.append(-1)  # no single dof; consumers use act_trn
    else:
      raise NotImplementedError("only joint/fixed-tendon actuators")

  fr = np.asarray(m.actuator_forcerange, dtype=np.float64).reshape(m.nu, 2)
  flim = np.asarray(m.actuator_forcelimited, dtype=bool).reshape(m.nu)
  fr = np.where(
    flim[:, None], fr,
    np.array([-np.inf, np.inf])[None, :].repeat(m.nu, 0),
  )
  cr = np.asarray(m.actuator_ctrlrange, dtype=np.float64).reshape(m.nu, 2)
  clim = np.asarray(m.actuator_ctrllimited, dtype=bool).reshape(m.nu)
  cr = np.where(
    clim[:, None], cr,
    np.array([-np.inf, np.inf])[None, :].repeat(m.nu, 0),
  )

  body_names = {
    mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b): b
    for b in range(m.nbody)
  }
  site_names = {
    mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_SITE, s): s
    for s in range(m.nsite)
  }

  from .device_collision import extract_contacts
  contacts = extract_contacts(m)
  if contacts.point_b1.shape[0] == 0 and contacts.ten_site_body.shape[0] == 0:
    contacts = None  # limit-only models use the closed-form solve path

  return DeviceModel(
    nq=int(m.nq), nv=int(m.nv), nbody=int(m.nbody),
    parent=tuple(int(p) for p in m.body_parentid),
    body_pos=np.asarray(m.body_pos, dtype=np.float64),
    body_rotm=np.stack([
      _quat2rotm(np.asarray(m.body_quat[b], dtype=np.float64))
      for b in range(m.nbody)
    ]),
    body_mass=np.asarray(m.body_mass, dtype=np.float64),
    body_ipos=np.asarray(m.body_ipos, dtype=np.float64),
    body_inertia_w=inertia_w,
    body_joints=tuple(body_joints),
    body_dofs=tuple(body_dofs),
    jnt_type=tuple(int(t) for t in m.jnt_type),
    jnt_axis=np.asarray(m.jnt_axis, dtype=np.float64),
    jnt_pos=np.asarray(m.jnt_pos, dtype=np.float64),
    jnt_dof=tuple(int(d) for d in m.jnt_dofadr),
    jnt_qadr=tuple(int(a) for a in m.jnt_qposadr),
    jnt_limited=tuple(bool(x) for x in m.jnt_limited),
    jnt_range=np.asarray(m.jnt_range, dtype=np.float64).reshape(m.njnt, 2),
    jnt_margin=np.asarray(m.jnt_margin, dtype=np.float64),
    jnt_solref=np.asarray(m.jnt_solref, dtype=np.float64).reshape(m.njnt, 2),
    jnt_solimp=np.asarray(m.jnt_solimp, dtype=np.float64).reshape(m.njnt, 5),
    jnt_stiffness=np.asarray(m.jnt_stiffness, dtype=np.float64),
    qpos_spring=np.asarray(m.qpos_spring, dtype=np.float64),
    dof_body=tuple(int(b) for b in m.dof_bodyid),
    dof_damping=np.asarray(m.dof_damping, dtype=np.float64),
    dof_armature=np.asarray(m.dof_armature, dtype=np.float64),
    ancestor=tuple(tuple(row) for row in ancestor),
    act_dof=tuple(act_dof),
    act_trn=act_trn,
    act_gear=np.asarray(m.actuator_gear[:, 0], dtype=np.float64),
    ctrl_range=cr,
    force_range=fr,
    timestep=float(m.opt.timestep),
    integrator=int(m.opt.integrator),
    gravity=np.asarray(m.opt.gravity, dtype=np.float64),
    density=float(m.opt.density),
    viscosity=float(m.opt.viscosity),
    wind=np.asarray(m.opt.wind, dtype=np.float64),
    body_ibox=_inertia_boxes(m),
    body_irotm=np.stack([
      _quat2rotm(np.asarray(m.body_iquat[b], dtype=np.float64))
      for b in range(m.nbody)
    ]),
    # copy: fk() measures joint coordinates relative to qpos0 (line ~390),
    # so an external in-place mutation through a view would corrupt every
    # kinematic quantity of the cached model
    init_qpos=np.array(m.qpos0, dtype=np.float64, copy=True),
    body_name2id=body_names,
    site_body=tuple(int(b) for b in m.site_bodyid),
    site_pos=np.asarray(m.site_pos, dtype=np.float64),
    site_name2id=site_names,
    site_size=np.asarray(m.site_size, dtype=np.float64),
    site_type=tuple(int(t) for t in m.site_type),
    geom_body=tuple(int(b) for b in m.geom_bodyid),
    geom_pos=np.asarray(m.geom_pos, dtype=np.float64),
    geom_rotm=np.stack([
      _quat2rotm(np.asarray(m.geom_quat[g], dtype=np.float64))
      for g in range(m.ngeom)
    ]) if m.ngeom else np.zeros((0, 3, 3)),
    geom_size=np.asarray(m.geom_size, dtype=np.float64),
    geom_name2id={
      mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g): g
      for g in range(m.ngeom)
    },
    dof_invweight0=np.asarray(m.dof_invweight0, dtype=np.float64),
    contacts=contacts,
  )


# --------------------------------------------------------------- dynamics
# All functions below operate on a SINGLE env's (q, v) in jnp arrays; the
# env batches them with vmap. Loops are static (tiny nbody/nv).


def _rotm_axis_angle(axis, angle):
  """Rotation matrix about a (world) unit axis — Rodrigues, traceable.

  The versine is computed as 1 - cos(a) = 2 sin^2(a/2): XLA's cos is
  only ~f32-accurate near zero (measured 2.3e-8 absolute error at
  a=0.001 in f64 on CPU), and the cancellation in 1-cos amplifies that
  into ~5% relative error on the term; sin is correctly rounded, so the
  half-angle identity restores full precision in both f64 (parity
  tests) and f32 (the TPU path).
  """
  import jax.numpy as jnp
  s = jnp.sin(angle)
  sh = jnp.sin(0.5 * angle)
  vers = 2.0 * sh * sh                 # 1 - cos(angle), accurately
  x, y, z = axis[0], axis[1], axis[2]
  k = jnp.stack([
    jnp.stack([0.0 * x, -z, y]),
    jnp.stack([z, 0.0 * x, -x]),
    jnp.stack([-y, x, 0.0 * x]),
  ])
  return jnp.eye(3, dtype=axis.dtype) + s * k + vers * _mm3(k, k)


def _quat2rotm_j(qt):
  """Traceable quaternion -> rotation matrix (normalizes first,
  matching mj_kinematics' mju_normalize4)."""
  import jax.numpy as jnp
  qt = qt / jnp.sqrt(qt @ qt)
  w, x, y, z = qt[0], qt[1], qt[2], qt[3]
  return jnp.stack([
    jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
               2 * (x * z + w * y)]),
    jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
               2 * (y * z - w * x)]),
    jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
               1 - 2 * (x * x + y * y)]),
  ])


@precise_matmul
def fk(mdl: DeviceModel, q, mut=None):
  """mj_kinematics: world pose per body + world anchor/axis per DOF.

  Returns (xpos[nbody,3], xmat[nbody,3,3], anchors{dof: [3]}, axes{dof}).
  A free joint contributes 6 dof entries: 3 world-axis slides (anchor
  unused) and 3 rotations about the body-frame axes through the body
  origin — matching MuJoCo's cdof convention (angular velocity in the
  child body's local frame).

  ``mut`` (optional): {body_id: (pos3, rotm33)} overriding a body's
  LOCAL frame (body_pos/body_quat) with traced per-env values — the
  device counterpart of tasks that mutate mjModel body poses per
  episode (manipulator's receptacle/target, ``manipulator.h:186-210``).
  """
  import jax.numpy as jnp
  dt = q.dtype
  xpos = [jnp.zeros(3, dt)] * mdl.nbody
  xmat = [jnp.eye(3, dtype=dt)] * mdl.nbody
  anchors: Dict[int, Any] = {}
  axes: Dict[int, Any] = {}
  eye3 = np.eye(3)
  for b in range(1, mdl.nbody):
    p = mdl.parent[b]
    if mut is not None and b in mut:
      lpos, lrot = mut[b]
      pos = xpos[p] + _mv(xmat[p], jnp.asarray(lpos, dt))
      rot = _mm3(xmat[p], jnp.asarray(lrot, dt))
    else:
      pos = xpos[p] + _mv(xmat[p], jnp.asarray(mdl.body_pos[b], dt))
      rot = _mm3(xmat[p], jnp.asarray(mdl.body_rotm[b], dt))
    for j in mdl.body_joints[b]:
      d = mdl.jnt_dof[j]
      qa = mdl.jnt_qadr[j]
      if mdl.jnt_type[j] == _JNT_FREE:
        # pose comes straight from qpos (body_pos folded into qpos0)
        pos = q[qa:qa + 3]
        rot = _quat2rotm_j(q[qa + 3:qa + 7])
        for i in range(3):
          axes[d + i] = jnp.asarray(eye3[i], dt)      # world slides
          axes[d + 3 + i] = rot[:, i]                 # body-axis hinges
          anchors[d + 3 + i] = pos
        continue
      jpos = jnp.asarray(mdl.jnt_pos[j], dt)
      jax_ = jnp.asarray(mdl.jnt_axis[j], dt)
      anchor = pos + _mv(rot, jpos)
      axis_w = _mv(rot, jax_)
      # joint displacement is measured from the reference pose: the XML
      # ``ref`` attribute lands in m.qpos0 (mj_kinematics subtracts it)
      qj = q[qa] - jnp.asarray(mdl.init_qpos[qa], dt)
      if mdl.jnt_type[j] == _JNT_HINGE:
        r = _rotm_axis_angle(axis_w, qj)
        rot = _mm3(r, rot)
        pos = anchor - _mv(rot, jpos)
        anchors[d] = anchor  # rotational dofs only (see _motion_subspaces)
      else:  # slide
        pos = pos + axis_w * qj
      axes[d] = axis_w
    xpos[b] = pos
    xmat[b] = rot
  return xpos, xmat, anchors, axes


def _motion_subspaces(mdl: DeviceModel, anchors, axes):
  """World-origin Plucker motion subspace [omega; v_origin] per dof.

  Rotational dofs (hinges, free-joint rotations) have an anchor entry;
  translational ones (slides, free-joint translations) do not.
  """
  import jax.numpy as jnp
  S = [None] * mdl.nv
  for d in range(mdl.nv):
    a = axes[d]
    if d in anchors:  # rotational
      S[d] = jnp.concatenate([a, jnp.cross(anchors[d], a)])
    else:  # translational
      S[d] = jnp.concatenate([jnp.zeros(3, a.dtype), a])
  return S


def _mm3(A, B):
  """Small matmul as broadcast-multiply + sum (VPU, true f32).

  The engine's matrices are tiny (3x3 rotations, nv<=62 mass
  matrices, <=few-hundred-row Jacobians): a TPU ``dot`` pads them to
  128x128 MXU tiles at ~1% utilization AND truncates f32 inputs to
  bf16 (~8 mantissa bits), which de-PSDs inertia products (VERDICT
  r3's NaN source). The broadcast-multiply+reduce form lowers to
  fused VPU elementwise kernels across the env batch — true f32 and
  measured FASTER than both the bf16 MXU dot and its multi-pass
  HIGHEST emulation (HalfCheetah 401k vs 362k/217k steps/s).
  """
  return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)


def _mv(A, x):
  """[..., n, k] @ [..., k] as VPU multiply+reduce (see ``_mm3``)."""
  return (A * x[..., None, :]).sum(-1)


def _vm(x, A):
  """[..., k] @ [..., k, m] as VPU multiply+reduce (see ``_mm3``)."""
  return (x[..., :, None] * A).sum(-2)


def _spatial_inertias(mdl: DeviceModel, xpos, xmat):
  """6x6 spatial inertia of each body about the world origin."""
  import jax.numpy as jnp
  Is = [None] * mdl.nbody
  for b in range(mdl.nbody):
    dt = xmat[b].dtype
    mass = float(mdl.body_mass[b])
    com = xpos[b] + (xmat[b] * jnp.asarray(mdl.body_ipos[b], dt)).sum(-1)
    ic = _mm3(_mm3(xmat[b], jnp.asarray(mdl.body_inertia_w[b], dt)),
              xmat[b].swapaxes(-1, -2))
    cx = jnp.stack([
      jnp.stack([com[0] * 0, -com[2], com[1]]),
      jnp.stack([com[2], com[0] * 0, -com[0]]),
      jnp.stack([-com[1], com[0], com[0] * 0]),
    ])
    top = jnp.concatenate(
      [ic + mass * _mm3(cx, cx.swapaxes(-1, -2)), mass * cx], axis=1
    )
    bot = jnp.concatenate([mass * cx.T, mass * jnp.eye(3, dtype=dt)], axis=1)
    Is[b] = jnp.concatenate([top, bot], axis=0)
  return Is


def _kin_ctx(mdl: DeviceModel, q, mut=None):
  """One forward-kinematics pass shared by all dynamics terms.

  Returns (xpos, xmat, S, Is). Sharing this cuts both trace time and
  graph size ~3x (mass matrix, bias, and fluid each needed it).
  """
  xpos, xmat, anchors, axes = fk(mdl, q, mut)
  S = _motion_subspaces(mdl, anchors, axes)
  Is = _spatial_inertias(mdl, xpos, xmat)
  return xpos, xmat, S, Is


@precise_matmul
def mass_matrix(mdl: DeviceModel, q, ctx=None):
  """CRB in world Plucker coordinates + armature (mj_crb semantics).

  Assembled as one batched matmul over stacked subspaces: with
  IcS[j] = Ic[body(j)] @ S[j], the valid entries are
  M[i,j] = S_i . IcS_j when body(i) is on the path above body(j)
  (and the transpose for the mirrored case) — selected by STATIC
  ancestor masks, so nv^2 scalar stacking never appears in the trace.
  """
  import jax.numpy as jnp
  _, _, S, Is = ctx if ctx is not None else _kin_ctx(mdl, q)
  # composite: subtree inertia per body
  Ic = list(Is)
  for b in range(mdl.nbody - 1, 0, -1):
    p = mdl.parent[b]
    Ic[p] = Ic[p] + Ic[b]
  Sm = jnp.stack(S)                                        # [nv, 6]
  IcS = jnp.stack([
    _mv(Ic[mdl.dof_body[j]], S[j]) for j in range(mdl.nv)
  ])                                                       # [nv, 6]
  m_raw = _mm3(Sm, IcS.swapaxes(-1, -2))                   # [nv, nv]
  anc = np.zeros((mdl.nv, mdl.nv))
  for i in range(mdl.nv):
    for j in range(mdl.nv):
      anc[i, j] = float(mdl.ancestor[mdl.dof_body[i]][mdl.dof_body[j]])
  mask_a = jnp.asarray(anc, q.dtype)
  mask_b = jnp.asarray(anc.T * (1.0 - anc), q.dtype)
  M = m_raw * mask_a + m_raw.T * mask_b
  return M + jnp.diag(jnp.asarray(mdl.dof_armature, q.dtype))


def _cross_m(a, b):
  """Plucker motion cross product a x_m b."""
  import jax.numpy as jnp
  w, v = a[:3], a[3:]
  w2, v2 = b[:3], b[3:]
  return jnp.concatenate([
    jnp.cross(w, w2), jnp.cross(w, v2) + jnp.cross(v, w2)
  ])


def _cross_f(a, b):
  """Plucker force cross product a x_f b (dual of x_m)."""
  import jax.numpy as jnp
  w, v = a[:3], a[3:]
  n, f = b[:3], b[3:]
  return jnp.concatenate([
    jnp.cross(w, n) + jnp.cross(v, f), jnp.cross(w, f)
  ])


def body_velocities(mdl: DeviceModel, v, S):
  """World-origin Plucker velocity per body from joint rates."""
  import jax.numpy as jnp
  zero6 = jnp.zeros(6, v.dtype)
  vel = [zero6] * mdl.nbody
  for b in range(1, mdl.nbody):
    p = mdl.parent[b]
    vj = zero6
    for d in mdl.body_dofs[b]:
      vj = vj + S[d] * v[d]
    vel[b] = vel[p] + vj
  return vel


@precise_matmul
def bias_forces(mdl: DeviceModel, q, v, ctx=None):
  """c(q, v) including gravity — mj_rne(flg_acc=0) semantics."""
  import jax.numpy as jnp
  dt = q.dtype
  _, _, S, Is = ctx if ctx is not None else _kin_ctx(mdl, q)
  zero6 = jnp.zeros(6, dt)
  vel = [zero6] * mdl.nbody
  acc = [zero6] * mdl.nbody
  # gravity via base acceleration -g (standard RNEA trick)
  acc[0] = jnp.concatenate(
    [jnp.zeros(3, dt), -jnp.asarray(mdl.gravity, dt)]
  )
  f = [zero6] * mdl.nbody
  for b in range(1, mdl.nbody):
    p = mdl.parent[b]
    # 1-dof joints within a body form a serial chain of massless
    # virtual bodies: each dof's velocity-product term uses the
    # velocity accumulated UP TO that dof (they differ whenever a body
    # has >1 joint, e.g. swimmer's 3-joint torso). A free joint is ONE
    # joint: its translations contribute no velocity-product term
    # (world-fixed axes) and its 3 rotational dofs act as a single
    # block whose term uses the pre-rotation velocity — mj_comVel's
    # ball/free case, verified at 1e-15 vs qfrc_bias.
    vel_b = vel[p]
    acc_b = acc[p]
    for j in mdl.body_joints[b]:
      d = mdl.jnt_dof[j]
      if mdl.jnt_type[j] == _JNT_FREE:
        vel_b = vel_b + sum(S[d + i] * v[d + i] for i in range(3))
        vrot = sum(S[d + 3 + i] * v[d + 3 + i] for i in range(3))
        acc_b = acc_b + _cross_m(vel_b, vrot)
        vel_b = vel_b + vrot
      else:
        vj = S[d] * v[d]
        vel_b = vel_b + vj
        acc_b = acc_b + _cross_m(vel_b, vj)
    vel[b] = vel_b
    acc[b] = acc_b
    f[b] = _mv(Is[b], acc[b]) + _cross_f(vel[b], _mv(Is[b], vel[b]))
  for b in range(mdl.nbody - 1, 0, -1):
    p = mdl.parent[b]
    if p != 0:
      f[p] = f[p] + f[b]
  # project the (bottom-up accumulated) subtree wrench of each dof's body
  Sm = jnp.stack(S)                                        # [nv, 6]
  F = jnp.stack([f[mdl.dof_body[d]] for d in range(mdl.nv)])
  return jnp.sum(Sm * F, axis=1)


def actuator_force(mdl: DeviceModel, ctrl):
  """Clamped motor controls -> qfrc_actuator (mj_fwdActuation).

  The actuator moment is a constant [nu, nv] row per actuator (1 at the
  joint dof for joint transmission, the wrap coefs for fixed-tendon
  transmission), so projection is one static matmul."""
  import jax.numpy as jnp
  dt = ctrl.dtype
  lo = jnp.asarray(mdl.ctrl_range[:, 0], dt)
  hi = jnp.asarray(mdl.ctrl_range[:, 1], dt)
  c = jnp.clip(ctrl, lo, hi)
  force = c * jnp.asarray(mdl.act_gear, dt)
  force = jnp.clip(
    force,
    jnp.asarray(mdl.force_range[:, 0], dt),
    jnp.asarray(mdl.force_range[:, 1], dt),
  )
  return _vm(force, jnp.asarray(mdl.act_trn, dt))


def passive_spring_force(mdl: DeviceModel, q):
  """Joint springs: -stiffness * (q - qpos_spring) (mj_passive)."""
  import jax.numpy as jnp
  dt = q.dtype
  qfrc = jnp.zeros(mdl.nv, dt)
  for j in range(len(mdl.jnt_type)):
    if mdl.jnt_type[j] == _JNT_FREE:
      continue  # extract_model asserts zero stiffness on free joints
    d, qa = mdl.jnt_dof[j], mdl.jnt_qadr[j]
    stiff = float(mdl.jnt_stiffness[j])
    if stiff:
      qfrc = qfrc.at[d].set(
        -stiff * (q[qa] - float(mdl.qpos_spring[qa]))
      )
  return qfrc


def _solve_psd(A, b, floor=None):
  """Solve with a tiny SPD system: column-vectorized scaled Cholesky.

  jnp.linalg.solve lowers to LU, which TPU only implements for f32/c64
  (and the batched LAPACK-style custom calls are ~100x slower than this
  at nv<=23 anyway); an explicit factorization is both portable (works
  in f64-on-CPU tests) and fast.

  The factorization/substitutions advance one COLUMN per step, so under
  ``vmap`` each step is a handful of [batch, <=nv] vector ops. The
  fully scalar-unrolled form this replaces traced to ~nv^3/6 individual
  [batch] ops, and XLA's per-op overhead made the Hessian solve ~95% of
  the contact Newton iteration's runtime on TPU (measured: 1.33 ms ->
  0.30 ms per iteration for Ant's nv=14 at 2048 envs).

  f32 robustness (the TPU-native consumption path): each pivot is
  floored at a dtype epsilon times a STATIC per-dof scale
  (``floor``, a numpy constant — for the engine's dof-space systems,
  1/dof_invweight0, the mass-matrix diagonal's magnitude). The floor
  must be a trace-time literal: both an explicit Jacobi rescale AND a
  floor that reads A[j, j] as a traced value measured 2.4-5x on the
  whole HalfCheetah step (reading the diagonal inside the
  factorization chain breaks XLA's fusion of the unrolled solve; a
  literal-floored max is free — measured 216k vs 91k env-steps/s).
  Without the floor, the contact Hessian M + J'WJ of stiff contact
  rows (D ~ 1e6) on ill-conditioned mass matrices (cheetah's light
  feet vs heavy torso) loses its last pivots to f32 rounding, sqrt
  goes NaN, and the NaN saturates the whole env lane — measured 28/32
  cheetah envs NaN at reset before this guard (with the bf16-matmul
  root cause fixed by ``precise_matmul``, the floor is the backstop).
  The floor only engages when f32 rounding has already destroyed the
  pivot; x64 parity tests are bit-unaffected.

  NOT differentiable-safe: masked lanes above the diagonal still
  compute s/piv inside jnp.where, so reverse-mode AD through the
  discarded branch would propagate NaNs. The engine is a forward
  simulator; nothing differentiates through it.
  """
  import jax.numpy as jnp
  n = A.shape[0]
  tiny = 1e-7 if A.dtype == jnp.float32 else 1e-14
  if floor is None:
    flo = np.ones(n)
  else:
    flo = np.asarray(floor, np.float64)
  if n == 1:
    # same pivot floor as the n==2 / Cholesky branches: a 1x1 system
    # whose diagonal f32-rounds to <=0 must not produce inf/NaN
    return b / jnp.maximum(A[0, 0], tiny * float(flo[0]))
  if n == 2:
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    det = jnp.maximum(det, tiny * float(flo[0] * flo[1]))
    x0 = (A[1, 1] * b[0] - A[0, 1] * b[1]) / det
    x1 = (A[0, 0] * b[1] - A[1, 0] * b[0]) / det
    return jnp.stack([x0, x1])
  # full-f32 dots: TPU's default dot precision runs f32 through bf16
  # MXU passes, which loses enough mantissa to make the factorization of
  # ill-conditioned mass matrices (tiny fin/finger links) take sqrt of a
  # negative. Broadcast-multiply+reduce keeps the exact f32
  # multiply-adds on the VPU — same accuracy as a HIGHEST-precision
  # dot without the multi-pass MXU emulation (see ``_mm3``). Handles
  # both the [n,j]@[j] column updates and the 1-D substitution dots.
  def dot(a, b):
    return (a * b).sum(-1)
  idx = np.arange(n)
  zero = jnp.zeros((), A.dtype)
  L = jnp.zeros_like(A)
  for j in range(n):
    s = A[:, j] - dot(L[:, :j], L[j, :j]) if j else A[:, j]
    piv = jnp.sqrt(jnp.maximum(s[j], tiny * float(flo[j])))
    L = L.at[:, j].set(jnp.where(idx >= j, s / piv, zero))
  y = jnp.zeros_like(b)
  for i in range(n):
    y = y.at[i].set(
      ((b[i] - dot(L[i, :i], y[:i])) if i else b[0]) / L[i, i]
    )
  x = jnp.zeros_like(b)
  for i in range(n - 1, -1, -1):
    r = y[i] - dot(L[i + 1:, i], x[i + 1:]) if i < n - 1 else y[i]
    x = x.at[i].set(r / L[i, i])
  return x


def _dof_floor(mdl: DeviceModel) -> np.ndarray:
  """Static per-dof pivot-floor scale: the mass-matrix diagonal's
  magnitude, approximated by 1/dof_invweight0 (trace-time constant)."""
  return 1.0 / np.maximum(np.asarray(mdl.dof_invweight0, np.float64), 1e-9)


def _impedance(solimp, x):
  """MuJoCo constraint impedance d(x), x = |pos - margin| / width.

  The endpoints are clamped to [mjMINIMP, mjMAXIMP] = [1e-4, 0.9999]
  before interpolation (mj_assignImpedance) — pinned empirically: for
  d0=0 solimps (dm humanoid's solimplimit) mj's impedance exceeds the
  raw spline by exactly (1-y)*1e-4."""
  import jax.numpy as jnp
  d0, dmax, _, mid, power = (
    float(solimp[0]), float(solimp[1]), float(solimp[2]),
    float(solimp[3]), float(solimp[4]),
  )
  d0 = min(max(d0, 1e-4), 0.9999)
  dmax = min(max(dmax, 1e-4), 0.9999)
  x = jnp.clip(x, 0.0, 1.0)
  a = 1.0 / mid ** (power - 1)
  b = 1.0 / (1.0 - mid) ** (power - 1)
  y = jnp.where(
    x <= mid, a * x ** power, 1.0 - b * (1.0 - x) ** power
  )
  return d0 + y * (dmax - d0)


def limit_constraint_force(mdl: DeviceModel, q, v, Minv, qacc_smooth):
  """Joint-limit constraint forces per MuJoCo's soft-constraint model.

  For each limited joint, the nearer limit defines a row J = +-e_dof.
  Constants fit MuJoCo's own efc_* arrays exactly (verified in
  tests/test_device_mujoco.py / test_device_contacts.py), with
  tc_eff = max(solref[0], 2*timestep) — MuJoCo clamps the constraint
  time constant from below at two timesteps:
    aref = -2 vel/(dmax*tc_eff) - imp * pos / (dmax^2 tc_eff^2 dr^2)
    R    = (1-imp)/imp * dof_invweight0[dof]
  and the force solves the dual QP  min 1/2 f'(A+R)f - f'(aref-a0),
  f >= 0  (a0 = J qacc_smooth), via projected Gauss-Seidel — exact for a
  single active constraint, and models here never have coupled pairs
  active for long. Returns qfrc_constraint [nv].
  """
  import jax.numpy as jnp
  dtype = q.dtype
  lim = [j for j in range(len(mdl.jnt_type)) if mdl.jnt_limited[j]]
  if not lim:
    return jnp.zeros(mdl.nv, dtype)
  if isinstance(Minv, dict):  # {dof: Minv column} — only limited cols
    def mv(i, j):
      return Minv[j][i]
  else:
    def mv(i, j):
      return Minv[i, j]
  sgn, dofs, aref, a0, rreg, active = [], [], [], [], [], []
  for j in lim:
    d, qa = mdl.jnt_dof[j], mdl.jnt_qadr[j]
    lo, hi = float(mdl.jnt_range[j, 0]), float(mdl.jnt_range[j, 1])
    margin = float(mdl.jnt_margin[j])
    tc, dr = float(mdl.jnt_solref[j, 0]), float(mdl.jnt_solref[j, 1])
    tc = max(tc, 2.0 * mdl.timestep)  # MuJoCo clamps tc at 2*timestep
    dmax = float(mdl.jnt_solimp[j, 1])
    width = float(mdl.jnt_solimp[j, 2])
    dist_lo = q[qa] - lo
    dist_hi = hi - q[qa]
    use_lo = dist_lo < dist_hi
    dist = jnp.where(use_lo, dist_lo, dist_hi)
    s = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
    act = dist < margin
    imp = _impedance(mdl.jnt_solimp[j], jnp.abs(dist - margin) / width)
    k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
    b = 2.0 / (dmax * tc)
    vel = s * v[d]
    aref.append(-b * vel - k * imp * (dist - margin))
    a0.append(s * qacc_smooth[d])
    rreg.append((1.0 - imp) / imp * float(mdl.dof_invweight0[d]))
    sgn.append(s)
    dofs.append(d)
    active.append(act)
  n = len(lim)
  s_v = jnp.stack(sgn)
  act_v = jnp.stack(active)
  b_v = (jnp.stack(aref) - jnp.stack(a0)) * act_v
  # A = J Minv J^T over the limited dofs, with signs
  A = jnp.stack([
    jnp.stack([
      s_v[i] * s_v[jx] * mv(dofs[i], dofs[jx]) for jx in range(n)
    ]) for i in range(n)
  ]) + jnp.diag(jnp.stack(rreg))
  if n == 1:
    f = jnp.maximum(0.0, b_v[0] / A[0, 0])[None] * act_v
  elif n == 2:
    # closed-form 2x2 NNLS (KKT cases) — replaces the PGS sweep, which
    # traced to a much larger graph
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    fu0 = (A[1, 1] * b_v[0] - A[0, 1] * b_v[1]) / det
    fu1 = (A[0, 0] * b_v[1] - A[1, 0] * b_v[0]) / det
    c10 = jnp.maximum(0.0, b_v[0] / A[0, 0])
    c21 = jnp.maximum(0.0, b_v[1] / A[1, 1])
    ok1 = b_v[1] - A[1, 0] * c10 <= 0
    interior = (fu0 >= 0) & (fu1 >= 0)
    k0 = jnp.where(interior, fu0, jnp.where(ok1, c10, 0.0))
    k1 = jnp.where(interior, fu1, jnp.where(ok1, 0.0, c21))
    # an inactive constraint's force is PINNED to zero — reduce to the
    # 1x1 problem for the other one (masking after the coupled solve
    # would let the dead row perturb the live one through A[0,1])
    both = act_v[0] & act_v[1]
    f0 = jnp.where(both, k0, jnp.where(act_v[0], c10, 0.0))
    f1 = jnp.where(both, k1, jnp.where(act_v[1], c21, 0.0))
    f = jnp.stack([f0, f1])
  else:
    f = jnp.zeros(n, dtype)
    for _ in range(10):  # projected Gauss-Seidel
      for i in range(n):
        resid = b_v[i] - A[i] @ f
        fi = jnp.maximum(0.0, f[i] + resid / A[i, i]) * act_v[i]
        f = f.at[i].set(fi)
  qfrc = jnp.zeros(mdl.nv, dtype)
  for i in range(n):
    qfrc = qfrc.at[dofs[i]].add(s_v[i] * f[i])
  return qfrc


@precise_matmul
def fluid_force(mdl: DeviceModel, q, v, ctx=None):
  """Medium viscosity/density forces — MuJoCo's inertia-box fluid model
  (``mj_inertiaBoxFluidModel`` in engine_passive.c; the default when no
  geom has an ellipsoid fluid spec). Per body, in the inertia frame:

    viscous:  torque -pi d^3 mu w,  force -3 pi d mu v   (d = mean box)
    density:  force_i  -1/2 rho box_j box_k |v_i| v_i
              torque_i -rho box_i (box_j^4 + box_k^4) |w_i| w_i / 64

  applied at the body CoM, mapped to qfrc through the joint subspaces.
  Verified against ``d.qfrc_passive`` in tests/test_device_mujoco.py.
  """
  import jax.numpy as jnp
  dt = q.dtype
  xpos, xmat, S, _ = ctx if ctx is not None else _kin_ctx(mdl, q)
  vel = body_velocities(mdl, v, S)
  qfrc = jnp.zeros(mdl.nv, dt)
  rho, mu = mdl.density, mdl.viscosity
  wind = jnp.asarray(mdl.wind, dt)
  for b in range(1, mdl.nbody):
    if float(mdl.body_mass[b]) <= 0:
      continue
    box = mdl.body_ibox[b]
    com = xpos[b] + _mv(xmat[b], jnp.asarray(mdl.body_ipos[b], dt))
    ximat = _mm3(xmat[b], jnp.asarray(mdl.body_irotm[b], dt))
    w_w = vel[b][:3]
    v_w = vel[b][3:] + jnp.cross(w_w, com)  # linear velocity at CoM
    lw = _vm(w_w, ximat)
    lv = _vm(v_w - wind, ximat)
    ltrq = jnp.zeros(3, dt)
    lfrc = jnp.zeros(3, dt)
    if mu > 0:
      diam = float(np.mean(box))
      ltrq = ltrq - float(np.pi * diam ** 3 * mu) * lw
      lfrc = lfrc - float(3.0 * np.pi * diam * mu) * lv
    if rho > 0:
      bj = np.array([box[1] * box[2], box[0] * box[2], box[0] * box[1]])
      lfrc = lfrc - 0.5 * rho * jnp.asarray(bj, dt) * jnp.abs(lv) * lv
      bt = np.array([
        box[0] * (box[1] ** 4 + box[2] ** 4),
        box[1] * (box[0] ** 4 + box[2] ** 4),
        box[2] * (box[0] ** 4 + box[1] ** 4),
      ]) / 64.0
      ltrq = ltrq - rho * jnp.asarray(bt, dt) * jnp.abs(lw) * lw
    f_w = _mv(ximat, lfrc)
    t_w = _mv(ximat, ltrq)
    # Plucker force about the world origin: [torque + com x f; f]
    F = jnp.concatenate([t_w + jnp.cross(com, f_w), f_w])
    msk = jnp.asarray(np.array([
      float(mdl.ancestor[mdl.dof_body[d]][b]) for d in range(mdl.nv)
    ]), dt)
    qfrc = qfrc + _mv(jnp.stack(S), F) * msk
  return qfrc


@precise_matmul
def _qacc_smooth_parts(mdl: DeviceModel, q, v, tau, mut=None):
  import jax.numpy as jnp
  dt = q.dtype
  damping = jnp.asarray(mdl.dof_damping, dt)
  ctx = _kin_ctx(mdl, q, mut)  # ONE fk pass for all three terms
  M = mass_matrix(mdl, q, ctx)
  c = bias_forces(mdl, q, v, ctx)
  spring = passive_spring_force(mdl, q)
  qfrc_smooth = tau + spring - damping * v - c
  if mdl.density > 0 or mdl.viscosity > 0:
    qfrc_smooth = qfrc_smooth + fluid_force(mdl, q, v, ctx)
  return M, qfrc_smooth, ctx


def _has_contact_points(mdl: DeviceModel) -> bool:
  """True when the Newton row solve is needed (contact candidates or
  tendon-limit rows); limit-only models take the closed-form path."""
  return mdl.contacts is not None and (
    mdl.contacts.point_b1.shape[0] > 0
    or mdl.contacts.ten_site_body.shape[0] > 0
  )


def _contact_solve(mdl: DeviceModel, q, v, M, qfrc_smooth, ctx,
                   warm=None, first=None):
  """Unified limit+contact solve -> (qacc, qfrc_constraint, efc_force).

  ``warm`` (a previous solve's qacc) mirrors MuJoCo's qacc_warmstart —
  mjData carries qacc_warmstart between every forward call, so each RK4
  stage / frame-skip substep warm-starts from the last. ``first`` (a
  traced bool) selects the cold start (qacc_smooth) on the first
  substep of a scanned frame-skip chain, so ONE traced body serves the
  whole chain. Depth is always the model's full Newton budget.
  """
  import jax.numpy as jnp
  from . import device_collision as dc
  solve = functools.partial(_solve_psd, floor=_dof_floor(mdl))
  qacc_sm = solve(M, qfrc_smooth)
  cd = mdl.contacts
  J, aref, D, mask = dc.assemble_rows(mdl, cd, q, v, ctx)
  if warm is None:
    start = qacc_sm
  elif first is None:
    start = warm
  else:
    start = jnp.where(first, qacc_sm, warm)
  qacc, f = dc.newton_qacc(
    solve, M, qacc_sm, J, aref, D, mask,
    iters=cd.newton_iters, ls_iters=cd.newton_ls, start=start,
  )
  return qacc, _vm(f, J), f


@precise_matmul
def _qacc_smooth(mdl: DeviceModel, q, v, tau):
  """Plain forward dynamics: qacc = M^-1 (tau + passive - bias)."""
  M, qfrc_smooth, _ = _qacc_smooth_parts(mdl, q, v, tau)
  return _solve_psd(M, qfrc_smooth, floor=_dof_floor(mdl))


def _minv(mdl: DeviceModel, M):
  """Explicit inverse of the tiny mass matrix via column solves."""
  import jax.numpy as jnp
  n = M.shape[0]
  eye = jnp.eye(n, dtype=M.dtype)
  return jnp.stack([_solve_psd(M, eye[i]) for i in range(n)], axis=1)


def _limit_minv_cols(mdl: DeviceModel, M):
  """Minv columns for the limited dofs only (all the constraint solve
  needs) — len(limited) solves instead of a full nv-column inverse."""
  import jax.numpy as jnp
  eye = jnp.eye(M.shape[0], dtype=M.dtype)
  dofs = sorted({
    mdl.jnt_dof[j] for j in range(len(mdl.jnt_type)) if mdl.jnt_limited[j]
  })
  return {d: _solve_psd(M, eye[d]) for d in dofs}


@precise_matmul
def _qacc_full(mdl: DeviceModel, q, v, tau, warm=None, first=None,
               want_fext=False, mut=None):
  """Forward dynamics incl. limit+contact constraints (mj_forward).

  ``want_fext`` additionally returns the per-body external contact
  wrench about the world origin (cfrc_ext precursor) and the efc row
  forces -> (qacc, fext, f).
  """
  M, qfrc_smooth, ctx = _qacc_smooth_parts(mdl, q, v, tau, mut)
  if _has_contact_points(mdl):
    qacc, _, f = _contact_solve(mdl, q, v, M, qfrc_smooth, ctx, warm, first)
    if want_fext:
      from . import device_collision as dc
      fext = dc.contact_wrenches(
        mdl.contacts, mdl, q, v, ctx, f, mdl.nbody
      )
      return qacc, fext, f
    return qacc
  flo = _dof_floor(mdl)
  qacc_sm = _solve_psd(M, qfrc_smooth, floor=flo)
  if not any(mdl.jnt_limited):
    return qacc_sm
  cols = _limit_minv_cols(mdl, M)
  qfrc_con = limit_constraint_force(mdl, q, v, cols, qacc_sm)
  return qacc_sm + _solve_psd(M, qfrc_con, floor=flo)


def _has_free(mdl: DeviceModel) -> bool:
  return any(t == _JNT_FREE for t in mdl.jnt_type)


def _quat_mul(a, b):
  import jax.numpy as jnp
  aw, av = a[0], a[1:]
  bw, bv = b[0], b[1:]
  return jnp.concatenate([
    (aw * bw - av @ bv)[None], aw * bv + bw * av + jnp.cross(av, bv)
  ])


def integrate_pos(mdl: DeviceModel, q, v, h):
  """mj_integratePos: qpos += h*qvel, quaternions via the exponential
  map of the LOCAL angular velocity (mju_quatIntegrate) + normalize."""
  import jax.numpy as jnp
  if not _has_free(mdl):
    return q + h * v
  dt = q.dtype
  out = q
  for j in range(len(mdl.jnt_type)):
    d, qa = mdl.jnt_dof[j], mdl.jnt_qadr[j]
    if mdl.jnt_type[j] == _JNT_FREE:
      out = out.at[qa:qa + 3].set(q[qa:qa + 3] + h * v[d:d + 3])
      w = v[d + 3:d + 6]
      ang = jnp.sqrt(w @ w + 1e-30) * h
      # sin(ang/2)/|w| with the |w| -> 0 limit h/2
      s = jnp.where(ang > 1e-12, jnp.sin(ang / 2) / (ang / h), h / 2)
      # cos(ang/2) via 1 - 2 sin^2(ang/4): XLA's cos is f32-accurate
      # near zero (see _rotm_axis_angle) and small rotations are the
      # common case here
      sq = jnp.sin(ang / 4)
      cw = 1.0 - 2.0 * sq * sq
      rot = jnp.concatenate([cw[None], s * w])
      quat = _quat_mul(q[qa + 3:qa + 7], rot)
      quat = quat / jnp.sqrt(quat @ quat)
      out = out.at[qa + 3:qa + 7].set(quat.astype(dt))
    else:
      out = out.at[qa].set(q[qa] + h * v[d])
  return out


@precise_matmul
def step_smooth(mdl: DeviceModel, q, v, ctrl, nstep: int = 1,
                want_aux: bool = False, tau=None, mut=None):
  """mj_step x nstep, smooth dynamics only, per the model's integrator.

  - Euler (``mj_Euler``): qacc solves (M + h*diag(damping)) qacc =
    tau + spring(q) - damping*v - c(q,v) — the implicit-damping system —
    then qvel += h qacc; qpos += h qvel (semi-implicit).
  - RK4 (``mj_RungeKutta``): classic 4-stage tableau on (qpos, qvel)
    with plain forward dynamics per stage, damping explicit.

  ``want_aux`` (contact models only) additionally returns
  ``(q_fwd, v_fwd, fext, f)``: the state of the LAST forward evaluation
  in the chain (RK4: stage 4 of the final substep; Euler: the final
  substep's pre-integration state) plus the per-body contact wrench
  about the world origin and the efc row forces at that evaluation
  (``f`` feeds dmc touch sensors). This is exactly what
  mjData's derived fields (xipos/cinert/cvel/contacts) hold after
  ``mj_step`` — gymnasium reads those STALE values for Humanoid's
  observation and mass-center reward, and this reproduces that quirk.
  """
  import jax
  import jax.numpy as jnp
  from jax import lax
  dt = q.dtype
  h = jnp.asarray(mdl.timestep, dt)
  damping = jnp.asarray(mdl.dof_damping, dt)
  if tau is None:
    # joint-transmission motors; callers with other transmission types
    # (e.g. dmc point_mass's fixed tendons) pass qfrc directly via tau
    tau = actuator_force(mdl, ctrl)
  else:
    tau = jnp.asarray(tau, dt)
  contacts = _has_contact_points(mdl)
  if want_aux and not contacts:
    raise ValueError("want_aux requires a contact model")

  def one_step(q, v, warm=None, first=None):
    """One mj_step. ``warm``: previous solve's qacc (contact models) —
    the qacc_warmstart chain mjData threads through every forward call;
    ``first`` (traced bool) selects the cold qacc_smooth start instead.
    Returns (q, v, last qacc, aux)."""
    aux = None
    if mdl.integrator == 1:  # RK4 (full dynamics per stage)
      a1 = _qacc_full(mdl, q, v, tau, warm, first, mut=mut)
      q2, v2 = integrate_pos(mdl, q, v, 0.5 * h), v + 0.5 * h * a1
      a2 = _qacc_full(mdl, q2, v2, tau, a1, mut=mut)
      q3, v3 = integrate_pos(mdl, q, v2, 0.5 * h), v + 0.5 * h * a2
      a3 = _qacc_full(mdl, q3, v3, tau, a2, mut=mut)
      q4, v4 = integrate_pos(mdl, q, v3, h), v + h * a3
      if want_aux:
        a4, fext, f4 = _qacc_full(mdl, q4, v4, tau, a3, want_fext=True, mut=mut)
        aux = (q4, v4, fext, f4)
      else:
        a4 = _qacc_full(mdl, q4, v4, tau, a3, mut=mut)
      q = integrate_pos(mdl, q, (v + 2 * v2 + 2 * v3 + v4) / 6.0, h)
      v = v + (h / 6.0) * (a1 + 2 * a2 + 2 * a3 + a4)
      last = a4
    else:  # Euler with implicit damping
      M, qfrc_smooth, ctx = _qacc_smooth_parts(mdl, q, v, tau, mut)
      qfrc = qfrc_smooth
      last = None
      if contacts:
        last, qfrc_con, _f = _contact_solve(
          mdl, q, v, M, qfrc_smooth, ctx, warm, first
        )
        if want_aux:
          from . import device_collision as dc
          aux = (q, v, dc.contact_wrenches(
            mdl.contacts, mdl, q, v, ctx, _f, mdl.nbody
          ), _f)
        qfrc = qfrc + qfrc_con
      elif any(mdl.jnt_limited):
        qacc_sm = _solve_psd(M, qfrc_smooth, floor=_dof_floor(mdl))
        qfrc = qfrc + limit_constraint_force(
          mdl, q, v, _limit_minv_cols(mdl, M), qacc_sm
        )
      A = M + h * jnp.diag(damping)
      qacc = _solve_psd(A, qfrc, floor=_dof_floor(mdl))
      v = v + h * qacc
      q = integrate_pos(mdl, q, v, h)
    # mj_step's divergence guard (mj_checkPos/mj_checkVel/mj_checkAcc,
    # mjMAXVAL = 1e10): a non-finite or huge state resets that lane to
    # (qpos0, 0) — mj_resetData semantics. MuJoCo itself diverges for
    # perfectly replicated dynamics (verified bit-identical on the dmc
    # reacher wrist-limit blowup: a 510 rad/s limit overshoot explodes
    # in BOTH engines; mj then recovers via exactly this warning+reset
    # path, which is why "mj_step never NaNs"). The reference's mujoco
    # tier inherits that behavior (mujoco_env.h:68-94); without it one
    # diverged lane NaN-saturates and stays dead until episode end.
    bad = jnp.zeros((), bool)
    for arr in (q, v):
      bad = bad | ~jnp.isfinite(arr).all() | (jnp.abs(arr) > 1e10).any()
    q = jnp.where(bad, jnp.asarray(mdl.init_qpos, dt), q)
    v = jnp.where(bad, jnp.zeros(mdl.nv, dt), v)
    if last is not None:
      last = jnp.where(bad, jnp.zeros(mdl.nv, dt), last)
    if aux is not None:
      # derived fields of a diverged lane (stale-state obs inputs):
      # post-reset mjData holds reset-state values — zero the forces
      # and pin the stale (q, v) to the reset state
      aq, av, fext, f_rows = aux
      aux = (
        jnp.where(bad, jnp.asarray(mdl.init_qpos, dt), aq),
        jnp.where(bad, jnp.zeros(mdl.nv, dt), av),
        jnp.where(bad, jnp.zeros_like(fext), fext),
        jnp.where(bad, jnp.zeros_like(f_rows), f_rows),
      )
    return q, v, last, aux

  if nstep > 1 and contacts:
    # contact models scan ONE traced substep body for the whole chain:
    # the first iteration cold-starts from qacc_smooth (selected by the
    # carried ``first`` flag), later iterations warm-start from the
    # previous solve — mjData.qacc_warmstart semantics with a single
    # copy of the physics+solver subgraph in the program
    def scan_body(c, _):
      q, v, warm, first = c
      q, v, warm, aux = one_step(q, v, warm, first)
      return (q, v, warm, jnp.zeros_like(first)), aux
    init = (q, v, jnp.zeros(mdl.nv, dt), jnp.ones((), bool))
    (q, v, _, _), auxs = lax.scan(scan_body, init, None, length=nstep)
    if want_aux:
      aux = jax.tree_util.tree_map(lambda x: x[-1], auxs)
      return q, v, aux
  elif nstep > 1:
    # contact-free chains scan too: unrolling frame_skip copies of the
    # full smooth dynamics (fish 10, swimmer 15) made the traced program
    # ~nstep x larger for zero runtime benefit — compile time only
    def scan_body(c, _):
      q, v = c
      q, v, _, _ = one_step(q, v)
      return (q, v), None
    (q, v), _ = lax.scan(scan_body, (q, v), None, length=nstep)
  else:
    for _ in range(nstep):
      q, v, _, aux = one_step(q, v)
    if want_aux:
      return q, v, aux
  return q, v


def body_xpos(mdl: DeviceModel, q, name: str):
  """World position of a named body's frame origin (get_body_com)."""
  xpos, _, _, _ = fk(mdl, q)
  return xpos[mdl.body_name2id[name]]


def body_xmat(mdl: DeviceModel, q, name: str):
  """World rotation matrix of a named body (data.xmat)."""
  _, xmat, _, _ = fk(mdl, q)
  return xmat[mdl.body_name2id[name]]


def body_xipos(mdl: DeviceModel, q, name: str):
  """World position of a named body's center of mass (data.xipos)."""
  import jax.numpy as jnp
  xpos, xmat, _, _ = fk(mdl, q)
  b = mdl.body_name2id[name]
  return xpos[b] + _mv(xmat[b], jnp.asarray(mdl.body_ipos[b], q.dtype))


def geom_xpos(mdl: DeviceModel, q, name: str, offset=None):
  """World position of a named geom (data.geom_xpos); ``offset`` (a
  traced [3] or [2]-padded array) overrides the model's body-frame geom
  position — dmc tasks move target geoms per episode."""
  import jax.numpy as jnp
  xpos, xmat, _, _ = fk(mdl, q)
  g = mdl.geom_name2id[name]
  b = mdl.geom_body[g]
  local = (
    jnp.asarray(mdl.geom_pos[g], q.dtype) if offset is None else offset
  )
  return xpos[b] + _mv(xmat[b], local)


@precise_matmul
def subtree_linvel(mdl: DeviceModel, q, v, name: str):
  """mj_subtreeVel's subtree COM linear velocity for a named body:
  mass-weighted mean of per-body COM velocities over the subtree (the
  ``subtreelinvel`` sensor dmc locomotion rewards read)."""
  import jax.numpy as jnp
  dt = q.dtype
  xpos, xmat, anchors, axes = fk(mdl, q)
  S = _motion_subspaces(mdl, anchors, axes)
  vel = body_velocities(mdl, v, S)
  root = mdl.body_name2id[name]
  num = jnp.zeros(3, dt)
  msum = 0.0
  for b in range(mdl.nbody):
    if not mdl.ancestor[root][b]:
      continue
    mb = float(mdl.body_mass[b])
    if mb == 0.0:
      continue
    com = xpos[b] + _mv(xmat[b], jnp.asarray(mdl.body_ipos[b], dt))
    w, v0 = vel[b][:3], vel[b][3:]
    num = num + mb * (v0 + jnp.cross(w, com))
    msum += mb
  return num / msum


def site_xpos(mdl: DeviceModel, q, name: str):
  """World position of a named site."""
  import jax.numpy as jnp
  xpos, xmat, _, _ = fk(mdl, q)
  s = mdl.site_name2id[name]
  b = mdl.site_body[s]
  return xpos[b] + _mv(xmat[b], jnp.asarray(mdl.site_pos[s], q.dtype))


def com_quantities(mdl: DeviceModel, q, v, ctx=None):
  """mjData's com-based quantities at (q, v): (com0, xipos, cinert, cvel).

  Conventions decoded from mjData (verified element-exact in
  tests/test_device_humanoid.py):
  - ``com0`` = subtree_com[0]: mass-weighted mean of body CoMs;
  - ``cinert[b]`` [10] = upper-tri inertia about com0 in world axes via
    the parallel-axis theorem (Ixx,Iyy,Izz,Ixy,Ixz,Iyz), then
    m*(xipos-com0), then m;
  - ``cvel[b]`` [6] = [omega; v_origin + omega x com0] — the world-origin
    Plucker velocity translated to com0.
  """
  import jax.numpy as jnp
  dt = q.dtype
  if ctx is None:
    ctx = _kin_ctx(mdl, q)
  xpos, xmat, S, _ = ctx
  xipos = jnp.stack([
    xpos[b] + _mv(xmat[b], jnp.asarray(mdl.body_ipos[b], dt))
    for b in range(mdl.nbody)
  ])
  mass = jnp.asarray(mdl.body_mass, dt)
  com0 = (mass[:, None] * xipos).sum(0) / mass.sum()
  vel = body_velocities(mdl, v, S)
  cin, cv = [], []
  for b in range(mdl.nbody):
    mb = float(mdl.body_mass[b])
    ic = _mm3(_mm3(xmat[b], jnp.asarray(mdl.body_inertia_w[b], dt)),
              xmat[b].swapaxes(-1, -2))
    d = xipos[b] - com0
    ioff = ic + mb * ((d @ d) * jnp.eye(3, dtype=dt) - jnp.outer(d, d))
    cin.append(jnp.concatenate([
      jnp.stack([ioff[0, 0], ioff[1, 1], ioff[2, 2],
                 ioff[0, 1], ioff[0, 2], ioff[1, 2]]),
      mb * d, jnp.asarray(mb, dt)[None],
    ]))
    w, v0 = vel[b][:3], vel[b][3:]
    cv.append(jnp.concatenate([w, v0 + jnp.cross(w, com0)]))
  return com0, xipos, jnp.stack(cin), jnp.stack(cv)
