"""Contacts for the on-device MuJoCo engine: collision + constraint solver.

The reference steps contact-rich MuJoCo tasks on host worker threads over
``mj_step`` (``envpool/mujoco/gym/mujoco_env.h:44-94``). This module brings
those tasks on-device: it reproduces MuJoCo's contact pipeline — static
candidate enumeration, analytic narrow phase, soft-constraint row assembly,
and the primal Newton solve — as pure JAX over constants extracted from the
host ``mjModel``, so ``vmap`` runs thousands of contact-rich envs per chip.

Design notes (TPU-first):
- Candidate contacts are enumerated at model-extraction time (geom pairs
  passing MuJoCo's contype/conaffinity + body filters); the narrow phase
  always evaluates every candidate and *masks* inactive ones, so shapes are
  static and the whole step stays inside one XLA program.
- Constraint rows are assembled as stacked arrays (J [m, nv], aref, D,
  mask) and solved with the same primal Newton iteration MuJoCo's default
  solver uses: minimize 0.5 (a-a0)' M (a-a0) + 0.5 sum_i D_i [J_i a -
  aref_i]_-^2 with an exact piecewise-quadratic line search.

Constants were fit against MuJoCo 3.x's own ``mjData.efc_*`` arrays and are
asserted row-for-row in ``tests/test_device_contacts.py``:
- ``tc_eff = max(solref[0], 2*timestep)`` (MuJoCo clamps the constraint
  time constant from below at two timesteps),
  ``K = 1/(dmax^2 tc_eff^2 dampratio^2)``, ``B = 2/(dmax tc_eff)``,
  ``aref = -B*vel - K*imp(pos)*(pos - margin)``;
- row regularizer ``R = (1-imp)/imp * diagApprox`` with the
  position-independent ``diagApprox``: ``dof_invweight0[dof]`` for joint
  limits, ``2 mu^2 (1+mu^2) * (body_invweight0[b1,0] + body_invweight0
  [b2,0])`` for pyramidal condim-3 contacts (plain invweight sum for
  frictionless condim-1 rows);
- pyramidal facet rows ``J_n ± mu1 J_t1, J_n ± mu2 J_t2`` (unnormalized),
  one shared penetration ``pos`` per contact.

Scope: plane/sphere/capsule/cylinder geoms, pyramidal friction cones,
condim 1/3 — the full contact model of the gym tasks incl. Pusher's
cylinder object. Elliptic cones, condim 4/6 and mesh geoms are rejected
at extraction.

Cylinder narrow phase (the geom the reference's Pusher task needs,
``envpool/mujoco/gym/pusher.h``):
- plane-cylinder reproduces MuJoCo's analytic ``mjc_PlaneCylinder``
  regimes, reverse-engineered against mj 3.10 and verified by bisection
  over tilt/penetration: always the deepest rim point; two extra rim
  points at +-120 deg when tilt < 45 deg AND their own depth is within
  margin (face resting); the far line endpoint when ITS depth is within
  margin (side resting). Exactly-flat fallback direction = the
  cylinder's local x axis (matches mj).
- capsule/sphere-cylinder is a single analytic closest-point contact
  (golden-section over the capsule segment vs the solid cylinder, exact
  to ~1e-10 at realistic penetrations). MuJoCo >= 3 runs these pairs
  through its iterative native-CCD (GJK/EPA) which can emit multi-point
  manifolds; MuJoCo 2.x (the generation the reference envpool and gym's
  Pusher-v4 pin — gym refuses Pusher-v4 on mujoco>=3) used libccd MPR:
  one contact per pair, which is the behavior reproduced here. Parity
  vs mj 3.10's single-contact cases is ~1e-8; the deviation contract is
  documented in ``tests/test_device_pusher.py``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from .device_engine import _mm3, _mv, _vm, precise_matmul

# mjtGeom enum values (mujoco/mjmodel.h)
_GEOM_PLANE, _GEOM_SPHERE, _GEOM_CAPSULE, _GEOM_CYLINDER = 0, 2, 3, 5
_GEOM_BOX = 6


class ContactData(NamedTuple):
  """Static (numpy) candidate-contact tables for one model."""

  # geom tables
  geom_body: np.ndarray        # [ngeom] int
  geom_size: np.ndarray        # [ngeom, 3]
  geom_pos: np.ndarray         # [ngeom, 3] (body frame)
  geom_rotm: np.ndarray        # [ngeom, 3, 3] (body frame)
  # plane-capsule pairs (plane first); spheres are capsules with hl=0,
  # contributing ONE candidate point instead of two
  pc_plane: Tuple[int, ...]    # [n_pc] plane geom id
  pc_cap: Tuple[int, ...]      # [n_pc] capsule/sphere geom id
  pc_two: Tuple[bool, ...]     # [n_pc] True -> 2 endpoint candidates
  # capsule-capsule (incl. sphere) pairs: one candidate point each
  cc_g1: Tuple[int, ...]       # [n_cc]
  cc_g2: Tuple[int, ...]       # [n_cc]
  # plane-cylinder pairs: FOUR candidate points each (deepest rim,
  # +-120deg face rims gated on tilt<45deg, far side-line endpoint)
  pcy_plane: Tuple[int, ...]   # [n_pcy]
  pcy_cyl: Tuple[int, ...]     # [n_pcy]
  # capsule/sphere-cylinder pairs (capsule first, mj type order): one
  # analytic closest-point candidate each
  cyc_cap: Tuple[int, ...]     # [n_cyc]
  cyc_cyl: Tuple[int, ...]     # [n_cyc]
  # plane-box pairs: EIGHT corner candidates each (mjc_PlaneBox emits
  # the below-margin corners in the same enumeration order)
  pb_plane: Tuple[int, ...]    # [n_pb]
  pb_box: Tuple[int, ...]      # [n_pb]
  # sphere/capsule-box pairs (sphere/capsule first, mj type order):
  # spheres contribute ONE closest-point candidate; capsules THREE
  # (one per endpoint sphere + one golden-section mid-segment point)
  sb_cap: Tuple[int, ...]      # [n_sb]
  sb_box: Tuple[int, ...]      # [n_sb]
  sb_three: Tuple[bool, ...]   # [n_sb] True -> capsule (3 candidates)
  # per candidate-point constants, aligned with the concatenation
  # [pc endpoints (1 or 2 per pair), cc points, pcy (4 per pair), cyc]
  point_b1: np.ndarray         # [P] int body of geom1
  point_b2: np.ndarray         # [P] int body of geom2
  point_g1: np.ndarray         # [P] int geom1 id
  point_g2: np.ndarray         # [P] int geom2 id
  point_sgn: np.ndarray        # [P, nv] +-1/0: dof influence on b2 - b1
  point_K: np.ndarray          # [P]
  point_B: np.ndarray          # [P]
  point_solimp: np.ndarray     # [P, 5]
  point_incmargin: np.ndarray  # [P] includemargin = margin - gap
  point_diagA: np.ndarray      # [P] position-independent diag approx
  point_mu: np.ndarray         # [P, 2] tangential friction
  point_condim: np.ndarray     # [P] 1 or 3
  # joint-limit rows
  lim_dof: Tuple[int, ...]     # [L] dof index (velocity/M space)
  lim_qadr: Tuple[int, ...]    # [L] qpos index
  lim_lo: np.ndarray           # [L]
  lim_hi: np.ndarray           # [L]
  lim_margin: np.ndarray       # [L]
  lim_K: np.ndarray            # [L]
  lim_B: np.ndarray            # [L]
  lim_solimp: np.ndarray       # [L, 5]
  lim_diagA: np.ndarray        # [L] dof_invweight0
  # limited spatial tendon rows (2-site tendons, e.g. ball_in_cup's
  # string): one row per tendon, nearer-limit side selected at runtime
  # like joint limits. efc order: after joint limits, before contacts.
  ten_site_body: np.ndarray    # [T, 2] body id per endpoint site
  ten_site_pos: np.ndarray     # [T, 2, 3] site offset in body frame
  ten_lo: np.ndarray           # [T]
  ten_hi: np.ndarray           # [T]
  ten_margin: np.ndarray       # [T]
  ten_K: np.ndarray            # [T]
  ten_B: np.ndarray            # [T]
  ten_solimp: np.ndarray       # [T, 5]
  ten_diagA: np.ndarray        # [T] tendon_invweight0
  ten_anc: np.ndarray          # [T, 2, nv] dof influences each endpoint
  nrows: int                   # total constraint rows
  # Newton solve depth: fitted per problem size — 6/6 converges the
  # planar models (nv<=9) to mj's optimum; wide free-root problems
  # (ant: nv=14, ~100 rows) need 8/8 (verified to 1e-15 over random
  # deep-penetration states in tests)
  newton_iters: int
  newton_ls: int


def _mix(a1, a2, w1, w2):
  """solmix-weighted combination of solref/solimp (equal priority)."""
  s = w1 + w2
  if s < 1e-12:
    w1 = w2 = 0.5
  else:
    w1, w2 = w1 / s, w2 / s
  return w1 * np.asarray(a1, np.float64) + w2 * np.asarray(a2, np.float64)


def extract_contacts(m) -> ContactData:
  """Candidate-pair tables from an mjModel (MuJoCo's collision filters).

  Pair admission mirrors ``mj_collision``: contype/conaffinity bitmasks,
  same-body exclusion, and the parent-child filter (skipped when the
  parent is the world body). Geom pairs are enumerated exhaustively at
  build time — there is no runtime broadphase; inactive candidates cost
  one masked row block each.
  """
  if int(m.opt.cone) != 0:
    raise NotImplementedError("device engine supports pyramidal cones only")
  if m.npair:
    raise NotImplementedError("explicit <pair> contacts unsupported")
  # <exclude> body pairs (mj_collision's signature filter): packed as
  # (body1 << 16) + body2 in exclude_signature
  excluded = set()
  for e in range(m.nexclude):
    sig = int(m.exclude_signature[e])
    ba, bb = sig >> 16, sig & 0xFFFF
    excluded.add((min(ba, bb), max(ba, bb)))

  nv = int(m.nv)
  timestep = float(m.opt.timestep)
  gb = np.asarray(m.geom_bodyid, dtype=np.int64)

  # dof -> body, ancestor table (dof's body is ancestor-or-self of b)
  dof_body = np.asarray(m.dof_bodyid, dtype=np.int64)
  anc = np.zeros((m.nbody, m.nbody), dtype=bool)
  for b in range(m.nbody):
    a = b
    while True:
      anc[a][b] = True
      if a == 0:
        break
      a = int(m.body_parentid[a])

  pairs = []
  for g1 in range(m.ngeom):
    for g2 in range(g1 + 1, m.ngeom):
      b1, b2 = int(gb[g1]), int(gb[g2])
      if b1 == b2:
        continue
      if (min(b1, b2), max(b1, b2)) in excluded:
        continue
      # parent-child filter (mj default filterparent; world parent exempt)
      if (int(m.body_parentid[b2]) == b1 and b1 != 0) or (
        int(m.body_parentid[b1]) == b2 and b2 != 0
      ):
        continue
      t1, t2 = int(m.geom_contype[g1]), int(m.geom_contype[g2])
      a1, a2 = int(m.geom_conaffinity[g1]), int(m.geom_conaffinity[g2])
      if not ((t1 & a2) or (t2 & a1)):
        continue
      k1, k2 = int(m.geom_type[g1]), int(m.geom_type[g2])
      for k in (k1, k2):
        if k not in (
          _GEOM_PLANE, _GEOM_SPHERE, _GEOM_CAPSULE, _GEOM_CYLINDER,
          _GEOM_BOX,
        ):
          raise NotImplementedError(
            f"geom type {k} unsupported by the device contact engine"
          )
      if k1 == _GEOM_PLANE and k2 == _GEOM_PLANE:
        continue
      if k1 == _GEOM_CYLINDER and k2 == _GEOM_CYLINDER:
        raise NotImplementedError("cylinder-cylinder contacts unsupported")
      if _GEOM_BOX in (k1, k2) and (
        min(k1, k2) == _GEOM_CYLINDER or k1 == k2
      ):
        raise NotImplementedError("cylinder-box/box-box unsupported")
      # order by geom type (mj_collideGeoms' type-sorted collision
      # table: plane first, sphere/capsule before cylinder; contact
      # normal then points geom1 -> geom2). Fresh names: rebinding the
      # loop variables here would corrupt later iterations.
      if k1 > k2:
        pairs.append((g2, g1, k2, k1))
      else:
        pairs.append((g1, g2, k1, k2))

  def _combine(g1, g2):
    """MuJoCo contact-parameter mixing for equal geom priority."""
    if int(m.geom_priority[g1]) != int(m.geom_priority[g2]):
      hi = g1 if m.geom_priority[g1] > m.geom_priority[g2] else g2
      fric = np.asarray(m.geom_friction[hi], np.float64)
      solref = np.asarray(m.geom_solref[hi], np.float64)
      solimp = np.asarray(m.geom_solimp[hi], np.float64)
      condim = int(m.geom_condim[hi])
    else:
      fric = np.maximum(m.geom_friction[g1], m.geom_friction[g2])
      w1 = float(m.geom_solmix[g1])
      w2 = float(m.geom_solmix[g2])
      solref = _mix(m.geom_solref[g1], m.geom_solref[g2], w1, w2)
      # negative (direct) solref entries use min, but gym models are std
      if m.geom_solref[g1][0] <= 0 or m.geom_solref[g2][0] <= 0:
        solref = np.minimum(m.geom_solref[g1], m.geom_solref[g2])
      solimp = _mix(m.geom_solimp[g1], m.geom_solimp[g2], w1, w2)
      condim = max(int(m.geom_condim[g1]), int(m.geom_condim[g2]))
    # margins/gaps ADD (each geom's margin expands its own surface):
    # mj_collideGeoms uses margin = margin1 + margin2, gap likewise
    incmargin = (
      float(m.geom_margin[g1]) + float(m.geom_margin[g2])
    ) - (float(m.geom_gap[g1]) + float(m.geom_gap[g2]))
    if condim not in (1, 3):
      raise NotImplementedError("device contacts support condim 1/3 only")
    return fric, solref, solimp, condim, incmargin

  def _kb(solref, solimp):
    tc, dr = float(solref[0]), float(solref[1])
    tc = max(tc, 2.0 * timestep)  # MuJoCo clamps timeconst at 2*timestep
    dmax = float(solimp[1])
    return (
      1.0 / max(1e-15, dmax * dmax * tc * tc * dr * dr),
      2.0 / max(1e-15, dmax * tc),
    )

  pc_plane, pc_cap, pc_two = [], [], []
  cc_g1, cc_g2 = [], []
  pcy_plane, pcy_cyl = [], []
  cyc_cap, cyc_cyl = [], []
  pb_plane, pb_box = [], []
  sb_cap, sb_box, sb_three = [], [], []
  pt = {k: [] for k in (
    "b1", "b2", "g1", "g2", "K", "B", "solimp", "inc", "diagA", "mu",
    "condim",
  )}
  iw = np.asarray(m.body_invweight0, np.float64)

  def _add_points(g1, g2, n_pts):
    fric, solref, solimp, condim, inc = _combine(g1, g2)
    K, B = _kb(solref, solimp)
    b1, b2 = int(gb[g1]), int(gb[g2])
    base = float(iw[b1, 0] + iw[b2, 0])
    mu = float(fric[0])
    if condim == 3:
      diag_a = 2.0 * mu * mu * (1.0 + mu * mu) * base
    else:
      diag_a = base
    for _ in range(n_pts):
      pt["b1"].append(b1)
      pt["b2"].append(b2)
      pt["g1"].append(g1)
      pt["g2"].append(g2)
      pt["K"].append(K)
      pt["B"].append(B)
      pt["solimp"].append(np.asarray(solimp, np.float64))
      pt["inc"].append(inc)
      pt["diagA"].append(diag_a)
      # condim-3 tangents BOTH use the sliding friction fric[0]
      # (fric[1] is torsional, condim>=4 only): mjContact.friction[:2]
      pt["mu"].append([float(fric[0]), float(fric[0])])
      pt["condim"].append(condim)

  for g1, g2, k1, k2 in pairs:
    if k2 == _GEOM_BOX and k1 == _GEOM_PLANE:
      pb_plane.append(g1)
      pb_box.append(g2)
    elif k2 == _GEOM_BOX:  # sphere/capsule (type-sorted first) vs box
      sb_cap.append(g1)
      sb_box.append(g2)
      sb_three.append(k1 == _GEOM_CAPSULE)
    elif k1 == _GEOM_PLANE and k2 == _GEOM_CYLINDER:
      pcy_plane.append(g1)
      pcy_cyl.append(g2)
    elif k1 == _GEOM_PLANE:
      pc_plane.append(g1)
      pc_cap.append(g2)
      pc_two.append(k2 == _GEOM_CAPSULE)
    elif k2 == _GEOM_CYLINDER:  # sphere/capsule (type-sorted first) vs cyl
      cyc_cap.append(g1)
      cyc_cyl.append(g2)
    else:  # sphere/capsule vs sphere/capsule: one candidate point
      cc_g1.append(g1)
      cc_g2.append(g2)

  # the per-point constant table MUST follow contact_points' family
  # segment order [pc, cc, pcy, cyc, pb, sb], not pair-enumeration
  # order — models mixing families interleave them in `pairs`
  for i, (gp, gc) in enumerate(zip(pc_plane, pc_cap)):
    _add_points(gp, gc, 2 if pc_two[i] else 1)
  for g1, g2 in zip(cc_g1, cc_g2):
    _add_points(g1, g2, 1)
  for gp, gc in zip(pcy_plane, pcy_cyl):
    _add_points(gp, gc, 4)
  for g1, g2 in zip(cyc_cap, cyc_cyl):
    _add_points(g1, g2, 1)
  for gp, gx in zip(pb_plane, pb_box):
    _add_points(gp, gx, 8)
  for i, (g1, g2) in enumerate(zip(sb_cap, sb_box)):
    _add_points(g1, g2, 3 if sb_three[i] else 1)

  n_pts = len(pt["b1"])
  sgn = np.zeros((n_pts, nv))
  for p in range(n_pts):
    for d in range(nv):
      db = dof_body[d]
      sgn[p, d] = float(anc[db][pt["b2"][p]]) - float(anc[db][pt["b1"][p]])

  # joint limits (1-dof hinge/slide; free joints are never limited)
  lim_dof, lim_qadr, lim_lo, lim_hi, lim_margin = [], [], [], [], []
  lim_K, lim_B, lim_solimp, lim_diag = [], [], [], []
  dof_iw = np.asarray(m.dof_invweight0, np.float64)
  for j in range(m.njnt):
    if not m.jnt_limited[j]:
      continue
    d = int(m.jnt_dofadr[j])
    K, B = _kb(m.jnt_solref[j], m.jnt_solimp[j])
    lim_dof.append(d)
    lim_qadr.append(int(m.jnt_qposadr[j]))
    lim_lo.append(float(m.jnt_range[j, 0]))
    lim_hi.append(float(m.jnt_range[j, 1]))
    lim_margin.append(float(m.jnt_margin[j]))
    lim_K.append(K)
    lim_B.append(B)
    lim_solimp.append(np.asarray(m.jnt_solimp[j], np.float64))
    lim_diag.append(float(dof_iw[d]))

  # limited 2-site spatial tendons (e.g. ball_in_cup's string): one
  # nearest-side limit row each, efc-ordered after joint limits
  _WRAP_SITE = 3  # mjtWrap
  ten_body, ten_spos, ten_lo, ten_hi, ten_mar = [], [], [], [], []
  ten_K, ten_B, ten_imp, ten_diag, ten_anc = [], [], [], [], []
  for t in range(m.ntendon):
    if not bool(m.tendon_limited[t]):
      continue
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    wtypes = [int(m.wrap_type[adr + i]) for i in range(num)]
    if num != 2 or any(w != _WRAP_SITE for w in wtypes):
      raise NotImplementedError(
        "only 2-site spatial tendon limits supported"
      )
    sites = [int(m.wrap_objid[adr + i]) for i in range(num)]
    bodies = [int(m.site_bodyid[s]) for s in sites]
    K, B = _kb(m.tendon_solref_lim[t], m.tendon_solimp_lim[t])
    ten_body.append(bodies)
    ten_spos.append([np.asarray(m.site_pos[s], np.float64) for s in sites])
    ten_lo.append(float(m.tendon_range[t, 0]))
    ten_hi.append(float(m.tendon_range[t, 1]))
    ten_mar.append(float(m.tendon_margin[t]))
    ten_K.append(K)
    ten_B.append(B)
    ten_imp.append(np.asarray(m.tendon_solimp_lim[t], np.float64))
    ten_diag.append(float(m.tendon_invweight0[t]))
    ten_anc.append([
      [float(anc[dof_body[d]][b]) for d in range(nv)] for b in bodies
    ])
  n_ten = len(ten_body)

  rows = len(lim_dof) + n_ten
  for c in pt["condim"]:
    rows += 2 * (c - 1) if c > 1 else 1
  deep = nv > 9 or rows > 70
  # humanoid-scale problems (nv ~27, ~350 rows) leave 8-iteration
  # solves ~0.3 in qvel from mj's optimum at contact-transition
  # substeps (warm start far from the new active set); 16/12 restores
  # ~1e-12 per-substep parity (measured, dm humanoid substep 2)
  wide = nv > 20 or rows > 200

  return ContactData(
    geom_body=gb,
    geom_size=np.asarray(m.geom_size, np.float64),
    geom_pos=np.asarray(m.geom_pos, np.float64),
    geom_rotm=np.stack([
      _quat2rotm(np.asarray(m.geom_quat[g], np.float64))
      for g in range(m.ngeom)
    ]) if m.ngeom else np.zeros((0, 3, 3)),
    pc_plane=tuple(pc_plane),
    pc_cap=tuple(pc_cap),
    pc_two=tuple(pc_two),
    cc_g1=tuple(cc_g1),
    cc_g2=tuple(cc_g2),
    pcy_plane=tuple(pcy_plane),
    pcy_cyl=tuple(pcy_cyl),
    cyc_cap=tuple(cyc_cap),
    cyc_cyl=tuple(cyc_cyl),
    pb_plane=tuple(pb_plane),
    pb_box=tuple(pb_box),
    sb_cap=tuple(sb_cap),
    sb_box=tuple(sb_box),
    sb_three=tuple(sb_three),
    point_b1=np.asarray(pt["b1"], np.int64),
    point_b2=np.asarray(pt["b2"], np.int64),
    point_g1=np.asarray(pt["g1"], np.int64),
    point_g2=np.asarray(pt["g2"], np.int64),
    point_sgn=sgn,
    point_K=np.asarray(pt["K"], np.float64),
    point_B=np.asarray(pt["B"], np.float64),
    point_solimp=(
      np.stack(pt["solimp"]) if n_pts else np.zeros((0, 5))
    ),
    point_incmargin=np.asarray(pt["inc"], np.float64),
    point_diagA=np.asarray(pt["diagA"], np.float64),
    point_mu=np.asarray(pt["mu"], np.float64).reshape(n_pts, 2),
    point_condim=np.asarray(pt["condim"], np.int64),
    lim_dof=tuple(lim_dof),
    lim_qadr=tuple(lim_qadr),
    lim_lo=np.asarray(lim_lo, np.float64),
    lim_hi=np.asarray(lim_hi, np.float64),
    lim_margin=np.asarray(lim_margin, np.float64),
    lim_K=np.asarray(lim_K, np.float64),
    lim_B=np.asarray(lim_B, np.float64),
    lim_solimp=(
      np.stack(lim_solimp) if lim_dof else np.zeros((0, 5))
    ),
    lim_diagA=np.asarray(lim_diag, np.float64),
    ten_site_body=(
      np.asarray(ten_body, np.int64) if n_ten else np.zeros((0, 2), np.int64)
    ),
    ten_site_pos=(
      np.asarray(ten_spos, np.float64) if n_ten else np.zeros((0, 2, 3))
    ),
    ten_lo=np.asarray(ten_lo, np.float64),
    ten_hi=np.asarray(ten_hi, np.float64),
    ten_margin=np.asarray(ten_mar, np.float64),
    ten_K=np.asarray(ten_K, np.float64),
    ten_B=np.asarray(ten_B, np.float64),
    ten_solimp=(
      np.stack(ten_imp) if n_ten else np.zeros((0, 5))
    ),
    ten_diagA=np.asarray(ten_diag, np.float64),
    ten_anc=(
      np.asarray(ten_anc, np.float64) if n_ten
      else np.zeros((0, 2, nv))
    ),
    nrows=rows,
    newton_iters=16 if wide else (8 if deep else 6),
    newton_ls=12 if wide else (8 if deep else 6),
  )


def _quat2rotm(q: np.ndarray) -> np.ndarray:
  w, x, y, z = q
  return np.array([
    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
  ])


# ------------------------------------------------------------ narrow phase


def _geom_pose(cd: ContactData, xpos, xmat, g: int, dtype):
  """World pose of geom g from its body's pose."""
  import jax.numpy as jnp
  b = int(cd.geom_body[g])
  gpos = xpos[b] + _mv(xmat[b], jnp.asarray(cd.geom_pos[g], dtype))
  grot = _mm3(xmat[b], jnp.asarray(cd.geom_rotm[g], dtype))
  return gpos, grot


def _point_box(c, size):
  """Point vs solid box in the BOX frame.

  Returns (surface point [3], signed distance, outward unit normal):
  outside, the closest surface point (clamp) and the separation along
  it; inside, the nearest face with negative distance — the exit
  direction MPR-style depth reporting uses for a swept sphere.
  """
  import jax.numpy as jnp
  q = jnp.abs(c) - size
  out = jnp.maximum(q, 0.0)
  od = jnp.sqrt(out @ out + 1e-30)
  outside = jnp.max(q) > 0
  cl = jnp.clip(c, -size, size)
  n_out = (c - cl) / od
  # inside: one-hot of the nearest face
  qi = size - jnp.abs(c)
  oh = (qi == jnp.min(qi)).astype(c.dtype)
  oh = oh / jnp.sum(oh)  # ties split; realistic states have none
  sgn = jnp.where(c >= 0, 1.0, -1.0).astype(c.dtype)
  n_in = oh * sgn
  face = c * (1.0 - oh) + oh * sgn * size
  sdist = jnp.where(outside, od, -jnp.min(qi))
  nrm = jnp.where(outside, n_out, n_in)
  surf = jnp.where(outside, cl, face)
  return surf, sdist, nrm


def _point_box_v(c, size):
  """Vectorized ``_point_box`` over [P, 3] points / [P, 3] box sizes."""
  import jax.numpy as jnp
  q = jnp.abs(c) - size
  out = jnp.maximum(q, 0.0)
  od = jnp.sqrt(jnp.sum(out * out, axis=1) + 1e-30)
  outside = (jnp.max(q, axis=1) > 0)[:, None]
  cl = jnp.clip(c, -size, size)
  n_out = (c - cl) / od[:, None]
  qi = size - jnp.abs(c)
  oh = (qi == jnp.min(qi, axis=1, keepdims=True)).astype(c.dtype)
  oh = oh / jnp.sum(oh, axis=1, keepdims=True)
  sgn = jnp.where(c >= 0, 1.0, -1.0).astype(c.dtype)
  n_in = oh * sgn
  face = c * (1.0 - oh) + oh * sgn * size
  sdist = jnp.where(outside[:, 0], od, -jnp.min(qi, axis=1))
  nrm = jnp.where(outside, n_out, n_in)
  surf = jnp.where(outside, cl, face)
  return surf, sdist, nrm


def _make_frame_tangents(n):
  """mju_makeFrame: t1 = normalize(cross(n, tmp)), t2 = cross(n, t1),
  tmp = +z when the normal is far from z else +y. Single normal [3]."""
  import jax.numpy as jnp
  ey = jnp.zeros_like(n).at[1].set(1.0)
  ez = jnp.zeros_like(n).at[2].set(1.0)
  tmp = jnp.where(jnp.abs(n[2]) < 0.5, ez, ey)
  t1 = jnp.cross(n, tmp)
  t1 = t1 / jnp.sqrt(t1 @ t1 + 1e-30)
  return t1, jnp.cross(n, t1)


def _make_frames_v(n):
  """Vectorized mju_makeFrame over [P, 3] normals."""
  import jax.numpy as jnp
  ey = jnp.zeros_like(n).at[:, 1].set(1.0)
  ez = jnp.zeros_like(n).at[:, 2].set(1.0)
  tmp = jnp.where((jnp.abs(n[:, 2]) < 0.5)[:, None], ez, ey)
  t1 = jnp.cross(n, tmp)
  t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, axis=1) + 1e-30)[:, None]
  return t1, jnp.cross(n, t1)


def _geom_poses(cd: ContactData, xpos, xmat, geoms, dtype):
  """Vectorized world poses for a static tuple of geom ids -> ([n,3],
  [n,3,3]). The body gathers are static python indices (free at trace
  time); the pose math is two batched einsums instead of per-geom ops —
  the humanoid/CMU models have hundreds of candidate pairs and the
  unrolled per-pair form dominated trace/compile time."""
  import jax.numpy as jnp
  bl = [int(cd.geom_body[g]) for g in geoms]
  X = jnp.stack([xpos[b] for b in bl])
  R = jnp.stack([xmat[b] for b in bl])
  gs = np.asarray(geoms, np.int64)
  gp = jnp.asarray(cd.geom_pos[gs], dtype)
  gr = jnp.asarray(cd.geom_rotm[gs], dtype)
  pos = X + jnp.einsum("nij,nj->ni", R, gp)
  rot = jnp.einsum("nij,njk->nik", R, gr)
  return pos, rot


@precise_matmul
def contact_points(cd: ContactData, xpos, xmat, dtype):
  """Narrow phase over all candidates.

  Returns (pos [P,3], dist [P], n [P,3], t1 [P,3], t2 [P,3], gate [P]);
  ``gate`` is an extra activation condition beyond the margin test
  (True everywhere except the plane-cylinder face-rim candidates, which
  MuJoCo only emits below 45 deg tilt).

  Plane-capsule: one candidate per endpoint sphere (MuJoCo's
  ``mjc_PlaneCapsule``): dist = n.(e - p0) - r, pos = e - n (r + dist/2);
  the first tangent is the capsule axis projected onto the plane
  (mju_makeFrame fallback when near-vertical) — the frame convention the
  pyramid facets inherit from the collider. Plane-sphere uses the
  mju_makeFrame tangents. Capsule-capsule: closest points between the
  axis segments (clamped parametric solve), one candidate. Spheres are
  capsules with zero half-length. Normals point geom1 -> geom2 like
  mjContact.frame.
  """
  import jax.numpy as jnp
  # per-family BLOCK arrays (pos [k,3], dist [k], n, t1, t2, gate),
  # concatenated at the end; the loop families below still build
  # per-row lists (few candidates each) folded into one block
  blocks = []
  pos_l, dist_l, n_l, t1_l, t2_l, gate_l = [], [], [], [], [], []
  _true = jnp.asarray(True)

  def _flush_rows():
    if pos_l:
      blocks.append((
        jnp.stack(pos_l), jnp.stack(dist_l), jnp.stack(n_l),
        jnp.stack(t1_l), jnp.stack(t2_l), jnp.stack(gate_l),
      ))
      for lst in (pos_l, dist_l, n_l, t1_l, t2_l, gate_l):
        lst.clear()

  # ---- plane-capsule/sphere: vectorized over pairs, then candidate
  # rows gathered by ONE static index (pair 0 endpoints, pair 1 ...)
  if cd.pc_plane:
    ppos, prot = _geom_poses(cd, xpos, xmat, cd.pc_plane, dtype)
    n = prot[:, :, 2]                     # [np, 3] plane normal
    cpos, crot = _geom_poses(cd, xpos, xmat, cd.pc_cap, dtype)
    caps = np.asarray(cd.pc_cap, np.int64)
    r = jnp.asarray(cd.geom_size[caps, 0], dtype)
    two = np.asarray(cd.pc_two, bool)
    hl = jnp.asarray(np.where(two, cd.geom_size[caps, 1], 0.0), dtype)
    axis = crot[:, :, 2]
    # tangent along the in-plane axis projection (mjc_PlaneCapsule);
    # sphere pairs and near-vertical capsules use mju_makeFrame
    proj = axis - jnp.sum(axis * n, axis=1)[:, None] * n
    pn = jnp.sqrt(jnp.sum(proj * proj, axis=1))
    mf1, _ = _make_frames_v(n)
    use_proj = (pn > 1e-10)[:, None] & jnp.asarray(two)[:, None]
    t1 = jnp.where(use_proj, proj / jnp.maximum(pn, 1e-30)[:, None], mf1)
    t2 = jnp.cross(n, t1)
    ends = jnp.stack([cpos - hl[:, None] * axis,
                      cpos + hl[:, None] * axis], axis=1)  # [np, 2, 3]
    dist2 = jnp.einsum("pi,pei->pe", n, ends - ppos[:, None, :]) - r[:, None]
    pos2 = ends - n[:, None, :] * (r[:, None] + 0.5 * dist2)[:, :, None]
    rows = np.asarray([
      i * 2 + e
      for i in range(len(cd.pc_plane))
      for e in range(2 if two[i] else 1)
    ])
    pairs_of = rows // 2
    npairs = len(cd.pc_plane)
    if len(rows) == npairs * 2:
      # all-capsule models (every pair emits both endpoints): identity
      # selection — skip the gather, which TPU lowers poorly on tiny
      # tensors inside this hot kernel
      blocks.append((
        pos2.reshape(npairs * 2, 3),
        dist2.reshape(npairs * 2),
        jnp.repeat(n, 2, axis=0), jnp.repeat(t1, 2, axis=0),
        jnp.repeat(t2, 2, axis=0),
        jnp.ones((npairs * 2,), bool),
      ))
    else:
      blocks.append((
        pos2.reshape(npairs * 2, 3)[rows],
        dist2.reshape(npairs * 2)[rows],
        n[pairs_of], t1[pairs_of], t2[pairs_of],
        jnp.ones((len(rows),), bool),
      ))

  # ---- capsule-capsule (incl. spheres): fully vectorized over pairs
  if cd.cc_g1:
    p1, r1m = _geom_poses(cd, xpos, xmat, cd.cc_g1, dtype)
    p2, r2m = _geom_poses(cd, xpos, xmat, cd.cc_g2, dtype)
    gs1 = np.asarray(cd.cc_g1, np.int64)
    gs2 = np.asarray(cd.cc_g2, np.int64)
    r1 = jnp.asarray(cd.geom_size[gs1, 0], dtype)
    r2 = jnp.asarray(cd.geom_size[gs2, 0], dtype)
    hl1 = jnp.asarray(cd.geom_size[gs1, 1], dtype)
    hl2 = jnp.asarray(cd.geom_size[gs2, 1], dtype)
    a1 = r1m[:, :, 2]
    a2 = r2m[:, :, 2]
    d12 = p2 - p1
    A = jnp.sum(a1 * a1, axis=1)
    Bq = jnp.sum(a1 * a2, axis=1)
    C = jnp.sum(a2 * a2, axis=1)
    D_ = jnp.sum(a1 * d12, axis=1)
    E = jnp.sum(a2 * d12, axis=1)
    den = A * C - Bq * Bq
    s = jnp.where(jnp.abs(den) > 1e-12, (C * D_ - Bq * E) / den, 0.0)
    s = jnp.clip(s, -hl1, hl1)
    t = jnp.clip((Bq * s - E) / jnp.maximum(C, 1e-12), -hl2, hl2)
    s = jnp.clip((Bq * t + D_) / jnp.maximum(A, 1e-12), -hl1, hl1)
    q1 = p1 + s[:, None] * a1
    q2 = p2 + t[:, None] * a2
    diff = q2 - q1
    sep = jnp.sqrt(jnp.sum(diff * diff, axis=1) + 1e-30)
    n = diff / sep[:, None]
    dist = sep - r1 - r2
    pos = q1 + n * (r1 + 0.5 * dist)[:, None]
    t1, t2 = _make_frames_v(n)
    blocks.append((pos, dist, n, t1, t2, jnp.ones((len(cd.cc_g1),), bool)))

  # ---- plane-cylinder: 4 candidates per pair (mjc_PlaneCylinder regimes)
  c120, s120 = -0.5, float(np.sqrt(3.0) / 2.0)
  for gp, gc in zip(cd.pcy_plane, cd.pcy_cyl):
    ppos, prot = _geom_pose(cd, xpos, xmat, gp, dtype)
    n = prot[:, 2]
    cpos, crot = _geom_pose(cd, xpos, xmat, gc, dtype)
    r = float(cd.geom_size[gc, 0])
    h = float(cd.geom_size[gc, 1])
    ax = crot[:, 2]
    prj = ax @ n
    flip = jnp.where(prj > 0, -1.0, 1.0).astype(dtype)
    axf = flip * ax            # axis pointing toward the plane
    prjf = flip * prj          # <= 0
    raw = prjf * axf - n       # unnormalized max-descent radial dir
    slen = jnp.sqrt(jnp.maximum(1.0 - prjf * prjf, 0.0))
    # exactly-flat fallback: cylinder local x projected onto the plane
    cx = crot[:, 0]
    fb = cx - (cx @ n) * n
    fb = fb / jnp.sqrt(fb @ fb + 1e-30)
    d_r = jnp.where(slen > 1e-10, raw / jnp.maximum(slen, 1e-30), fb)
    t_perp = jnp.cross(axf, d_r)
    e_lo = cpos + h * axf
    face_gate = slen < -prjf   # tilt below 45 deg
    cands = (
      (e_lo + r * d_r, _true),
      (e_lo + r * (c120 * d_r + s120 * t_perp), face_gate),
      (e_lo + r * (c120 * d_r - s120 * t_perp), face_gate),
      (cpos - h * axf + r * d_r, _true),
    )
    t1, t2 = _make_frame_tangents(n)
    for e, gate in cands:
      dist = n @ (e - ppos)
      pos_l.append(e - n * (0.5 * dist))
      dist_l.append(dist)
      n_l.append(n)
      t1_l.append(t1)
      t2_l.append(t2)
      gate_l.append(gate)

  # ---- capsule/sphere-cylinder: one analytic closest-point candidate
  if cd.cyc_cap:
    cy = _capsule_cylinder_points(cd, xpos, xmat, dtype)
    for i in range(len(cd.cyc_cap)):
      pos_l.append(cy[0][i])
      dist_l.append(cy[1][i])
      n_l.append(cy[2][i])
      t1, t2 = _make_frame_tangents(cy[2][i])
      t1_l.append(t1)
      t2_l.append(t2)
      gate_l.append(_true)

  _flush_rows()

  # ---- plane-box: 8 corner candidates per pair, vectorized
  # (mjc_PlaneBox corner order: i&1 -> +x, i&2 -> +y, i&4 -> +z)
  if cd.pb_plane:
    ppos, prot = _geom_poses(cd, xpos, xmat, cd.pb_plane, dtype)
    n = prot[:, :, 2]                                   # [npb, 3]
    bpos, brot = _geom_poses(cd, xpos, xmat, cd.pb_box, dtype)
    sz = cd.geom_size[np.asarray(cd.pb_box, np.int64)]  # [npb, 3]
    corners_l = np.stack([
      [(sz[p, 0] if i & 1 else -sz[p, 0]),
       (sz[p, 1] if i & 2 else -sz[p, 1]),
       (sz[p, 2] if i & 4 else -sz[p, 2])]
      for p in range(len(cd.pb_box)) for i in range(8)
    ]).reshape(len(cd.pb_box), 8, 3)
    offs = jnp.einsum(
      "pij,pcj->pci", brot, jnp.asarray(corners_l, dtype)
    )                                                   # [npb, 8, 3]
    corners = bpos[:, None, :] + offs
    dist8 = jnp.einsum("pi,pci->pc", n, corners - ppos[:, None, :])
    pos8 = corners - n[:, None, :] * (0.5 * dist8)[:, :, None]
    # mjc_PlaneBox emits only the LOWER-half corners (corner offset
    # projected on the plane normal <= 0) — at most 4 per box; upper
    # corners within margin (tilted box) are skipped regardless of
    # depth (pinned empirically: mj 3.10 drops the two shallow
    # top-edge corners of a tilted resting foot)
    lower = jnp.einsum("pci,pi->pc", offs, n) <= 0
    t1, t2 = _make_frames_v(n)
    npb = len(cd.pb_box)
    rep = np.repeat(np.arange(npb), 8)
    blocks.append((
      pos8.reshape(npb * 8, 3), dist8.reshape(npb * 8),
      n[rep], t1[rep], t2[rep], lower.reshape(npb * 8),
    ))

  # ---- sphere/capsule-box: closest-point candidates, vectorized over
  # pairs (sphere: 1; capsule: endpoint spheres + ONE golden-section
  # mid-segment point, shared batched fori_loop). mj >= 3 runs these
  # pairs through native CCD which can emit multi-point manifolds; the
  # masked-candidate set reproduces the single/dual-contact regimes,
  # same deviation contract as the cylinder pairs above.
  if cd.sb_cap:
    from jax import lax
    cpos, crot = _geom_poses(cd, xpos, xmat, cd.sb_cap, dtype)
    bpos, brot = _geom_poses(cd, xpos, xmat, cd.sb_box, dtype)
    caps = np.asarray(cd.sb_cap, np.int64)
    boxes = np.asarray(cd.sb_box, np.int64)
    three = np.asarray(cd.sb_three, bool)
    r = jnp.asarray(cd.geom_size[caps, 0], dtype)
    hl = jnp.asarray(np.where(three, cd.geom_size[caps, 1], 0.0), dtype)
    sz = jnp.asarray(cd.geom_size[boxes], dtype)        # [ns, 3]
    axis = crot[:, :, 2]

    def sdist_s(s):
      """Batched box SDF of capsule-axis points C(s) (box frames)."""
      cw = cpos + s[:, None] * axis
      c = jnp.einsum("pji,pj->pi", brot, cw - bpos)
      qv = jnp.abs(c) - sz
      out = jnp.maximum(qv, 0.0)
      od = jnp.sqrt(jnp.sum(out * out, axis=1) + 1e-30)
      inner = jnp.max(qv, axis=1)
      return jnp.where(inner > 0, od, inner)

    gr = (np.sqrt(5.0) - 1.0) / 2.0

    def gs_body(_, band):
      lo, hi = band
      x1 = hi - gr * (hi - lo)
      x2 = lo + gr * (hi - lo)
      take_lo = sdist_s(x1) < sdist_s(x2)
      return jnp.where(take_lo, lo, x1), jnp.where(take_lo, x2, hi)

    lo, hi = lax.fori_loop(0, 48, gs_body, (-hl, hl))
    s_mid = 0.5 * (lo + hi)
    cands = jnp.stack([
      cpos - hl[:, None] * axis,
      cpos + hl[:, None] * axis,
      cpos + s_mid[:, None] * axis,
    ], axis=1)                                          # [ns, 3cand, 3]
    cb = jnp.einsum(
      "pji,pcj->pci", brot, cands - bpos[:, None, :]
    )                                                   # box frame
    surf, sdist, outward = _point_box_v(
      cb.reshape(-1, 3), jnp.repeat(sz, 3, axis=0)
    )
    ns = len(cd.sb_cap)
    surf = surf.reshape(ns, 3, 3)
    sdist = sdist.reshape(ns, 3)
    outward = outward.reshape(ns, 3, 3)
    dist3 = sdist - r[:, None]
    nrm3 = -jnp.einsum("pij,pcj->pci", brot, outward)   # g1 -> g2
    ps = cands + nrm3 * r[:, None, None]
    surf_w = bpos[:, None, :] + jnp.einsum("pij,pcj->pci", brot, surf)
    pos3 = 0.5 * (ps + surf_w)
    rows = np.asarray([
      p * 3 + e
      for p in range(ns)
      for e in range(3 if three[p] else 1)
    ])
    nrm_f = nrm3.reshape(ns * 3, 3)[rows]
    t1, t2 = _make_frames_v(nrm_f)
    blocks.append((
      pos3.reshape(ns * 3, 3)[rows], dist3.reshape(ns * 3)[rows],
      nrm_f, t1, t2, jnp.ones((len(rows),), bool),
    ))

  _flush_rows()
  if not blocks:
    z = jnp.zeros((0,), dtype)
    z3 = jnp.zeros((0, 3), dtype)
    return z3, z, z3, z3, z3, jnp.zeros((0,), bool)
  if len(blocks) == 1:
    return blocks[0]
  return tuple(
    jnp.concatenate([b[k] for b in blocks], axis=0) for k in range(6)
  )


def _capsule_cylinder_points(cd: ContactData, xpos, xmat, dtype):
  """Closest-point contact for every capsule/sphere-cylinder pair.

  Signed distance from a point to the solid cylinder is exact; the
  minimizing capsule-axis parameter is found by golden-section (the
  signed distance of a convex set along an affine path is convex), 48
  ``fori_loop`` iterations -> interval ~1e-10 of the segment length.
  Returns (pos [n,3], dist [n], n_cap2cyl [n,3]) with MuJoCo's
  conventions: normal geom1(capsule) -> geom2(cylinder), contact point
  midway between the two surfaces.
  """
  import jax.numpy as jnp
  from jax import lax

  p1s, a1s, p2s, a2s = [], [], [], []
  for gcap, gcyl in zip(cd.cyc_cap, cd.cyc_cyl):
    pp, rr = _geom_pose(cd, xpos, xmat, gcap, dtype)
    p1s.append(pp)
    a1s.append(rr[:, 2])
    pp2, rr2 = _geom_pose(cd, xpos, xmat, gcyl, dtype)
    p2s.append(pp2)
    a2s.append(rr2[:, 2])
  p1 = jnp.stack(p1s)
  a1 = jnp.stack(a1s)
  p2 = jnp.stack(p2s)
  a2 = jnp.stack(a2s)
  caps = np.asarray(cd.cyc_cap)
  cyls = np.asarray(cd.cyc_cyl)
  rcap = jnp.asarray(cd.geom_size[caps, 0], dtype)
  hl = jnp.asarray(cd.geom_size[caps, 1], dtype)   # 0 for spheres
  R = jnp.asarray(cd.geom_size[cyls, 0], dtype)
  H = jnp.asarray(cd.geom_size[cyls, 1], dtype)

  def sdist(s):
    """Signed distance of capsule-axis point C(s) to the solid cylinder."""
    c = p1 + s[:, None] * a1
    w = c - p2
    z = jnp.sum(w * a2, axis=1)
    rv = w - z[:, None] * a2
    rho = jnp.sqrt(jnp.sum(rv * rv, axis=1) + 1e-30)
    dz = jnp.maximum(jnp.abs(z) - H, 0.0)
    dr = jnp.maximum(rho - R, 0.0)
    out = jnp.sqrt(dz * dz + dr * dr)
    return jnp.where(out > 0, out, jnp.maximum(rho - R, jnp.abs(z) - H))

  gr = (np.sqrt(5.0) - 1.0) / 2.0

  def body(_, c):
    lo, hi = c
    x1 = hi - gr * (hi - lo)
    x2 = lo + gr * (hi - lo)
    take_lo = sdist(x1) < sdist(x2)
    return jnp.where(take_lo, lo, x1), jnp.where(take_lo, x2, hi)

  lo, hi = lax.fori_loop(0, 48, body, (-hl, hl))
  s = 0.5 * (lo + hi)

  c = p1 + s[:, None] * a1
  w = c - p2
  z = jnp.sum(w * a2, axis=1)
  rv = w - z[:, None] * a2
  rho = jnp.sqrt(jnp.sum(rv * rv, axis=1) + 1e-30)
  rhat = rv / rho[:, None]
  inside = (rho <= R) & (jnp.abs(z) <= H)
  sgnz = jnp.where(z >= 0, 1.0, -1.0).astype(dtype)

  # outside: closest surface point (covers side, rim and face cases)
  zc = jnp.clip(z, -H, H)
  surf_out = p2 + zc[:, None] * a2 + jnp.minimum(rho, R)[:, None] * rhat
  diff = c - surf_out
  dd = jnp.sqrt(jnp.sum(diff * diff, axis=1) + 1e-30)
  n_out = -diff / dd[:, None]
  dist_out = dd - rcap

  # inside: nearest-exit direction (side vs face), mirroring the
  # penetration depth MPR reports for a swept sphere
  side = (rho - R) >= (jnp.abs(z) - H)
  surf_in = jnp.where(
    side[:, None],
    p2 + z[:, None] * a2 + R[:, None] * rhat,
    p2 + (sgnz * H)[:, None] * a2 + rv,
  )
  n_in = jnp.where(side[:, None], -rhat, -(sgnz[:, None] * a2))
  dist_in = jnp.maximum(rho - R, jnp.abs(z) - H) - rcap

  nrm = jnp.where(inside[:, None], n_in, n_out)
  dist = jnp.where(inside, dist_in, dist_out)
  surf = jnp.where(inside[:, None], surf_in, surf_out)
  pos = 0.5 * ((c + rcap[:, None] * nrm) + surf)
  return pos, dist, nrm


def _impedance_v(solimp, x):
  """Vectorized MuJoCo impedance d(x) over [P] with per-row solimp [P,5].

  Endpoints clamped to [mjMINIMP, mjMAXIMP] = [1e-4, 0.9999] like
  mj_assignImpedance (see device_engine._impedance)."""
  import jax.numpy as jnp
  d0, dmax, mid, power = solimp[:, 0], solimp[:, 1], solimp[:, 3], solimp[:, 4]
  d0 = jnp.clip(d0, 1e-4, 0.9999)
  dmax = jnp.clip(dmax, 1e-4, 0.9999)
  x = jnp.clip(x, 0.0, 1.0)
  a = 1.0 / mid ** (power - 1)
  b = 1.0 / (1.0 - mid) ** (power - 1)
  y = jnp.where(x <= mid, a * x ** power, 1.0 - b * (1.0 - x) ** power)
  return d0 + y * (dmax - d0)


# ------------------------------------------------------- row assembly


@precise_matmul
def assemble_rows(mdl, cd: ContactData, q, v, ctx):
  """All constraint rows for one state -> (J [m,nv], aref, D, mask).

  Row order: joint limits first, then per contact point its pyramid
  facets (n+mu t1, n-mu t1, n+mu t2, n-mu t2) or the single normal row
  for condim-1 — mirroring mjData.efc_* layout (limits before contacts).
  """
  import jax.numpy as jnp
  dtype = q.dtype
  xpos, xmat, S, _ = ctx
  nv = mdl.nv

  J_l, aref_l, D_l, mask_l = [], [], [], []

  # ---- joint limits
  L = len(cd.lim_dof)
  if L:
    dofs = np.asarray(cd.lim_dof)
    qd = q[np.asarray(cd.lim_qadr)]
    vd = v[dofs]
    lo = jnp.asarray(cd.lim_lo, dtype)
    hi = jnp.asarray(cd.lim_hi, dtype)
    margin = jnp.asarray(cd.lim_margin, dtype)
    dist_lo = qd - lo
    dist_hi = hi - qd
    use_lo = dist_lo < dist_hi
    dist = jnp.where(use_lo, dist_lo, dist_hi)
    s = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
    active = dist < margin
    imp = _impedance_v(
      jnp.asarray(cd.lim_solimp, dtype),
      jnp.abs(dist - margin) / jnp.asarray(cd.lim_solimp[:, 2], dtype),
    )
    K = jnp.asarray(cd.lim_K, dtype)
    Bc = jnp.asarray(cd.lim_B, dtype)
    vel = s * vd
    aref = -Bc * vel - K * imp * (dist - margin)
    R = (1.0 - imp) / imp * jnp.asarray(cd.lim_diagA, dtype)
    Jlim = jnp.zeros((L, nv), dtype)
    Jlim = Jlim.at[jnp.arange(L), dofs].set(s)
    J_l.append(Jlim)
    aref_l.append(aref)
    D_l.append(1.0 / R)
    mask_l.append(active)

  # ---- tendon limits (2-site spatial tendons; efc order: after joint
  # limits, before contacts). Row jacobian: dL/dq = u . (V(p2) a2 -
  # V(p1) a1), nearer limit side picks the sign like joint limits.
  T = cd.ten_site_body.shape[0]
  if T:
    Sm_t = jnp.stack(S)                      # [nv, 6]
    for t in range(T):
      ps = []
      Jp = []
      for e in range(2):
        b = int(cd.ten_site_body[t, e])
        p = xpos[b] + _mv(xmat[b], jnp.asarray(cd.ten_site_pos[t, e], dtype))
        Vd = Sm_t[:, 3:] + jnp.cross(Sm_t[:, :3], p[None, :])  # [nv, 3]
        anc_e = jnp.asarray(cd.ten_anc[t, e], dtype)            # [nv]
        ps.append(p)
        Jp.append(Vd * anc_e[:, None])
      diff = ps[1] - ps[0]
      length = jnp.sqrt(diff @ diff + 1e-30)
      u = diff / length
      dLdq = _mv(Jp[1] - Jp[0], u)                              # [nv]
      lo = jnp.asarray(cd.ten_lo[t], dtype)
      hi = jnp.asarray(cd.ten_hi[t], dtype)
      margin = jnp.asarray(cd.ten_margin[t], dtype)
      dist_lo = length - lo
      dist_hi = hi - length
      use_lo = dist_lo < dist_hi
      dist = jnp.where(use_lo, dist_lo, dist_hi)
      sgn = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
      active = dist < margin
      imp = _impedance_v(
        jnp.asarray(cd.ten_solimp[t:t + 1], dtype),
        jnp.abs(dist - margin)[None] / jnp.asarray(
          cd.ten_solimp[t, 2], dtype
        ),
      )[0]
      K = jnp.asarray(cd.ten_K[t], dtype)
      Bc = jnp.asarray(cd.ten_B[t], dtype)
      row = sgn * dLdq
      vel = row @ v
      aref_t = -Bc * vel - K * imp * (dist - margin)
      R = (1.0 - imp) / imp * jnp.asarray(cd.ten_diagA[t], dtype)
      J_l.append(row[None, :])
      aref_l.append(aref_t[None])
      D_l.append((1.0 / R)[None])
      mask_l.append(active[None])

  # ---- contacts
  P = cd.point_b1.shape[0]
  if P:
    pos, dist, n, t1, t2, gate = contact_points(cd, xpos, xmat, dtype)
    inc = jnp.asarray(cd.point_incmargin, dtype)
    active = (dist < inc) & gate
    imp = _impedance_v(
      jnp.asarray(cd.point_solimp, dtype),
      jnp.abs(dist - inc) / jnp.asarray(cd.point_solimp[:, 2], dtype),
    )
    K = jnp.asarray(cd.point_K, dtype)
    Bc = jnp.asarray(cd.point_B, dtype)
    R = (1.0 - imp) / imp * jnp.asarray(cd.point_diagA, dtype)
    Dp = 1.0 / R
    kpos = K * imp * (dist - inc)

    # point-velocity jacobians: V[p, d] = S_lin[d] + S_ang[d] x pos[p]
    Sm = jnp.stack(S)                        # [nv, 6]
    Vd = Sm[None, :, 3:] + jnp.cross(
      Sm[None, :, :3], pos[:, None, :]
    )                                        # [P, nv, 3]
    sgn = jnp.asarray(cd.point_sgn, dtype)   # [P, nv]
    Jn = jnp.einsum("pi,pdi->pd", n, Vd) * sgn
    Jt1 = jnp.einsum("pi,pdi->pd", t1, Vd) * sgn
    Jt2 = jnp.einsum("pi,pdi->pd", t2, Vd) * sgn

    # vectorized facet rows, grouped by condim
    one = np.where(cd.point_condim == 1)[0]
    pyr = np.where(cd.point_condim == 3)[0]
    if len(one):
      rows = Jn[one]
      J_l.append(rows)
      aref_l.append(-Bc[one] * _mv(rows, v) - kpos[one])
      D_l.append(Dp[one])
      mask_l.append(active[one])
    if len(pyr):
      m1 = jnp.asarray(cd.point_mu[pyr, 0], dtype)[:, None]
      m2 = jnp.asarray(cd.point_mu[pyr, 1], dtype)[:, None]
      rows = jnp.stack([
        Jn[pyr] + m1 * Jt1[pyr],
        Jn[pyr] - m1 * Jt1[pyr],
        Jn[pyr] + m2 * Jt2[pyr],
        Jn[pyr] - m2 * Jt2[pyr],
      ], axis=1).reshape(4 * len(pyr), nv)     # [4Pp, nv]
      rep = lambda x: jnp.repeat(x[pyr], 4)    # noqa: E731
      J_l.append(rows)
      aref_l.append(-rep(Bc) * _mv(rows, v) - rep(kpos))
      D_l.append(rep(Dp))
      mask_l.append(jnp.repeat(active[pyr], 4))

  J = jnp.concatenate(J_l, axis=0)
  aref = jnp.concatenate([jnp.atleast_1d(x) for x in aref_l])
  D = jnp.concatenate([jnp.atleast_1d(x) for x in D_l])
  mask = jnp.concatenate([jnp.atleast_1d(x) for x in mask_l])
  return J, aref, D, mask


# ---------------------------------------------------------------- solver


# Hessian-assembly strategy cutover (FMA count R*nv^2); tuned on-chip —
# see newton_qacc. Env var for experiments.
_HESS_EW_LIMIT = int(
  __import__("os").environ.get("ENVPOOL_TPU_HESS_EW_LIMIT", "20000")
)


@precise_matmul
def newton_qacc(solve_psd, M, a0, J, aref, D, mask,
                iters: int = 6, ls_iters: int = 6, start=None):
  """MuJoCo's primal Newton solve over qacc (solver=Newton, pyramidal).

  Minimizes  0.5 (a-a0)' M (a-a0) + 0.5 sum_i w_i(a) D_i (J_i a - aref_i)^2
  with w_i(a) = mask_i AND (J_i a - aref_i < 0), by damped Newton with an
  (approximately exact) piecewise-quadratic line search: the 1-D Newton
  iteration on phi'(alpha) lands on the breakpoint structure the same way
  MuJoCo's iterative line search does. Returns (qacc, efc_force).

  Both loops are ``lax.fori_loop``s, keeping the traced graph small —
  the solver appears 16x per env step under RK4 frame-skipping. The
  Hessian solve uses the engine's unrolled elementwise Cholesky
  (``solve_psd``): on TPU a batched 6-9 dim ``cho_factor`` lowers to a
  serialized blocked While loop, while the unrolled form fuses into a
  handful of elementwise kernels across the env batch.
  """
  import jax.numpy as jnp
  from jax import lax

  Dm = D * mask

  def ls_body(_, carry):
    alpha, r, p, q1, q2 = carry
    ra = r + alpha * p
    wa = Dm * (ra < 0)
    g = q2 * alpha + q1 + jnp.sum(wa * ra * p)
    h = q2 + jnp.sum(wa * p * p)
    alpha = jnp.clip(alpha - g / jnp.maximum(h, 1e-30), 0.0, 2.0)
    return alpha, r, p, q1, q2

  def body(_, a):
    r = _mv(J, a) - aref
    w = Dm * (r < 0)
    da = a - a0
    Mda = _mv(M, da)
    grad = Mda + _vm(w * r, J)
    # Hessian: H[n,m] = M[n,m] + sum_r w_r J[r,n] J[r,m]. On TPU the
    # [R,nv]x[nv,R] dot pads to 128x128 MXU tiles at <1% utilization
    # AND the bf16 truncation de-PSDs H (the dmc-cheetah NaN source) —
    # the VPU elementwise form is both true-f32 and ~1.6x faster
    # end-to-end (measured 2.23M vs 1.40M steps/s on CheetahJaxRun-v1).
    # Above ~1e5 FMAs (humanoid: nv=27, R~350) the VPU form's work
    # grows cubically while MXU padding waste amortizes, so wide
    # problems switch to a HIGHEST-precision (f32-true) dot.
    if J.shape[-1] ** 2 * J.shape[-2] > _HESS_EW_LIMIT:
      import jax
      Jw = J * w[..., :, None]
      H = M + jnp.matmul(
        J.swapaxes(-1, -2), Jw, precision=jax.lax.Precision.HIGHEST
      )
    else:
      H = M + (
        J[..., :, :, None] * J[..., :, None, :] * w[..., :, None, None]
      ).sum(-3)
    delta = -solve_psd(H, grad)
    p = _mv(J, delta)
    q2 = delta @ _mv(M, delta)
    q1 = delta @ Mda
    alpha = jnp.asarray(1.0, a.dtype)
    alpha, *_ = lax.fori_loop(
      0, ls_iters, ls_body, (alpha, r, p, q1, q2)
    )
    return a + alpha * delta

  a = lax.fori_loop(0, iters, body, a0 if start is None else start)
  r = _mv(J, a) - aref
  f = jnp.maximum(0.0, -(Dm * r))
  return a, f


def geom_normal_forces(cd: ContactData, f_rows, geoms):
  """Sum of contact NORMAL forces per requested geom id (mj touch
  sensor semantics: mj_contactForce's contact-frame normal component,
  which for pyramidal facets is the sum of the facet lambdas). Row
  layout mirrors assemble_rows; rows whose candidate involves the geom
  contribute. Returns a [len(geoms)] array."""
  import jax.numpy as jnp
  L = len(cd.lim_dof) + cd.ten_site_body.shape[0]  # rows before contacts
  one = np.where(cd.point_condim == 1)[0]
  pyr = np.where(cd.point_condim == 3)[0]
  P = cd.point_b1.shape[0]
  normal = jnp.zeros((P,), f_rows.dtype)
  if len(one):
    normal = normal.at[one].set(f_rows[L:L + len(one)])
  if len(pyr):
    lam = f_rows[L + len(one):].reshape(len(pyr), 4)
    normal = normal.at[pyr].set(jnp.sum(lam, axis=1))
  out = []
  for g in geoms:
    sel = np.where((cd.point_g1 == g) | (cd.point_g2 == g))[0]
    out.append(normal[sel].sum() if len(sel) else jnp.zeros((), f_rows.dtype))
  return jnp.stack(out)


@precise_matmul
def contact_wrenches(cd: ContactData, mdl, q, v, ctx, f_rows, nbody: int):
  """Per-body external contact wrench about the WORLD ORIGIN [nbody, 6].

  Rebuilds each candidate point's world force from the solved row forces
  (pyramid facets: F = n*sum(lam) + mu1*t1*(lam1-lam2) + mu2*t2*
  (lam3-lam4); condim-1: F = n*lam) and accumulates +wrench on body2 /
  -wrench on body1 — mj_rnePostConstraint's cfrc_ext contribution, which
  skips the world body. Row layout mirrors assemble_rows: limits first,
  then condim-1 points, then 4 facets per condim-3 point. The narrow
  phase is re-evaluated here; XLA CSE merges it with assemble_rows' call.
  """
  import jax.numpy as jnp
  xpos, xmat = ctx[0], ctx[1]
  dtype = q.dtype
  P = cd.point_b1.shape[0]
  out = jnp.zeros((nbody, 6), dtype)
  if not P:
    return out
  pos, dist, n, t1, t2, _ = contact_points(cd, xpos, xmat, dtype)
  L = len(cd.lim_dof) + cd.ten_site_body.shape[0]  # rows before contacts
  one = np.where(cd.point_condim == 1)[0]
  pyr = np.where(cd.point_condim == 3)[0]
  F = jnp.zeros((P, 3), dtype)
  if len(one):
    lam = f_rows[L:L + len(one)]
    F = F.at[one].set(n[one] * lam[:, None])
  if len(pyr):
    lam = f_rows[L + len(one):].reshape(len(pyr), 4)
    m1 = jnp.asarray(cd.point_mu[pyr, 0], dtype)[:, None]
    m2 = jnp.asarray(cd.point_mu[pyr, 1], dtype)[:, None]
    Fp = (
      n[pyr] * jnp.sum(lam, axis=1)[:, None]
      + m1 * t1[pyr] * (lam[:, 0] - lam[:, 1])[:, None]
      + m2 * t2[pyr] * (lam[:, 2] - lam[:, 3])[:, None]
    )
    F = F.at[pyr].set(Fp)
  trq = jnp.cross(pos, F)
  wrench = jnp.concatenate([trq, F], axis=1)          # [P, 6]
  # static +-1 body-assignment matrix, world row excluded
  assign = np.zeros((P, nbody))
  for p in range(P):
    if int(cd.point_b2[p]) != 0:
      assign[p, int(cd.point_b2[p])] += 1.0
    if int(cd.point_b1[p]) != 0:
      assign[p, int(cd.point_b1[p])] -= 1.0
  return jnp.einsum("pb,pk->bk", jnp.asarray(assign, dtype), wrench)
