"""CarRacing-v2 — JAX rewrite of the Box2D top-down racer.

Parity targets: ``envpool/box2d/car_racing_env.cc`` + ``car_dynamics.cc``
(gym's car_racing.py over Box2D + OpenCV). What is reproduced exactly:

- car dynamics per wheel: steering joint chase at min(50|d|, 3) rad/s with
  +-0.4 limits, engine power / wheel moment of inertia / brake semantics,
  the 205000*SIZE^2 slip force with the friction-circle clamp, grass
  friction 0.6 vs road 1.0 (``car_dynamics.cc:127-215``);
- gas smoothing (+0.1 max per step, rear wheels), brake, steer sign
  (``car_dynamics.cc:108-125``, ``car_racing_env.cc:372-376``);
- reward: -0.1 per frame, +1000/N per newly visited tile, -100 on leaving
  the +-playfield, episode end on full visitation or new lap past
  lap_complete_percent (``car_racing_env.cc:60-80, 385-410``);
- obs: 96x96x3 uint8 with the same world-to-screen transform (zoom
  animation over the first second, car-centered, rotation by -hull angle,
  window 1000x800 squashed to 96x96), road/border/grass-checker colors,
  hull/wheel sprites, and the bottom indicator bar (speed, 4x wheel
  omega, steer, angular velocity) (``car_racing_env.cc:440-592``).

TPU design: tracks are a host-generated bank (``car_track.py``) resident
in HBM; per-step rendering is one affine gather from the track's baked
bitmap plus analytic car/indicator overlays; wheel-tile containment (for
friction + visitation) is a vectorized point-in-quad over the padded tile
array. Omitted vs the reference render: skid-mark particles and the
printed score digits (cv::putText) — documented deviations that don't
affect the physics or reward.

PERF: physics runs at ~700k env-steps/s/chip; the obs render is bounded
by TPU's serialized element gather (~8.5 ns/element, ~9.2k pixels/env) at
~12k env-steps/s total. The gather-free path — 3-shear rotation as
per-row shifts against a dynamic_slice'd window — is the known next
optimization; the render cost only matters when pixels are consumed
every step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

from . import car_track
from .car_track import BITMAP_RES, PALETTE, PLAYFIELD, SCALE

FPS = 50.0
DT = 1.0 / FPS
SIZE = 0.02
ENGINE_POWER = 1e8 * SIZE * SIZE
WHEEL_MOI = 4000 * SIZE * SIZE
FRICTION_LIMIT = 1e6 * SIZE * SIZE
WHEEL_R = 27.0
WHEEL_W = 14.0
BRAKE_FORCE = 15.0
ZOOM = 2.7
WINDOW_W, WINDOW_H = 1000.0, 800.0
STATE_W = STATE_H = 96

_WHEEL_POS = np.asarray(
  [[-55, 80], [55, 80], [-55, -82], [55, -82]], np.float64
) * SIZE
_HULL_POLYS = [
  np.asarray([[-60, 130], [60, 130], [60, 110], [-60, 110]], np.float64)
  * SIZE,
  np.asarray([[-15, 120], [15, 120], [20, 20], [-20, 20]], np.float64)
  * SIZE,
  np.asarray(
    [[25, 20], [50, -10], [50, -40], [20, -90], [-20, -90], [-50, -40],
     [-50, -10], [-25, 20]], np.float64
  ) * SIZE,
  np.asarray([[-50, -120], [50, -120], [50, -90], [-50, -90]], np.float64)
  * SIZE,
]


def _poly_mass(poly, density):
  area = cx = cy = inertia = 0.0
  n = len(poly)
  for i in range(n):
    x0, y0 = poly[i]
    x1, y1 = poly[(i + 1) % n]
    cr = x0 * y1 - x1 * y0
    area += cr / 2
    cx += (x0 + x1) * cr / 6
    cy += (y0 + y1) * cr / 6
    inertia += cr * (x0 * x0 + x0 * x1 + x1 * x1
                     + y0 * y0 + y0 * y1 + y1 * y1) / 12
  if area < 0:
    area, cx, cy, inertia = -area, -cx, -cy, -inertia
  return (density * area, density * inertia,
          np.asarray([cx, cy]) / max(area, 1e-12))


_HM = sum(_poly_mass(p, 1.0)[0] for p in _HULL_POLYS)
_WHEEL_M = 0.1 * (2 * WHEEL_W * SIZE) * (2 * WHEEL_R * SIZE)
CAR_MASS = _HM + 4 * _WHEEL_M
CAR_I = sum(_poly_mass(p, 1.0)[1] for p in _HULL_POLYS) + sum(
  _WHEEL_M * float(np.sum(w * w)) for w in _WHEEL_POS
)

_TMAX = 460


@functools.lru_cache(maxsize=8)
def _bank(seed: int, n_tracks: int):
  return car_track.generate_bank(seed, n_tracks, _TMAX)


def _rot(a):
  c, s = jnp.cos(a), jnp.sin(a)
  return jnp.asarray([[c, -s], [s, c]])


def _point_in_quads(p: jax.Array, quads: jax.Array) -> jax.Array:
  """p [2] against quads [T, 4, 2] (CCW or CW) -> [T] bool."""
  a = quads
  b = jnp.roll(quads, -1, axis=1)
  cross = (
    (b[..., 0] - a[..., 0]) * (p[1] - a[..., 1])
    - (b[..., 1] - a[..., 1]) * (p[0] - a[..., 0])
  )
  return jnp.all(cross <= 0, axis=1) | jnp.all(cross >= 0, axis=1)


class CarRacingEnv(FuncEnv):
  """CarRacing-v2."""

  name = "CarRacing"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {
      "reward_threshold": 900.0,
      "lap_complete_percent": 0.95,
      "n_tracks": 8,   # track-bank size (TPU extension)
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.uint8, (96, 96, 3), 0, 255),
      "info:tile_visited_count": ArraySpec(np.int32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "action": ArraySpec(
        np.float32, (-1, 3), [-1.0, 0.0, 0.0], [1.0, 1.0, 1.0]
      )
    }

  # ------------------------------------------------------------------ hooks

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array) -> Tuple[Any, Any, Dict]:
    tiles, centers, n_tiles, bitmaps, coarse, init = _bank(
      int(cfg.seed), int(cfg.n_tracks)
    )
    track_id = jax.random.randint(key, (), 0, int(cfg.n_tracks))
    init_j = jnp.asarray(init)[track_id]
    st = {
      "track_id": track_id,
      "pos": init_j[1:3],
      "vel": jnp.zeros(2, jnp.float32),
      "angle": init_j[0],
      "omega": jnp.float32(0.0),
      "wheel_omega": jnp.zeros(4, jnp.float32),
      "joint_angle": jnp.zeros(2, jnp.float32),   # front steering joints
      "gas": jnp.float32(0.0),
      "brake": jnp.float32(0.0),
      "steer": jnp.float32(0.0),
      "phase": jnp.zeros(4, jnp.float32),
      "visited": jnp.zeros(_TMAX, jnp.bool_),
      "visited_count": jnp.int32(0),
      "reward_acc": jnp.float32(0.0),
      "prev_reward": jnp.float32(0.0),
      "new_lap": jnp.bool_(False),
      "t": jnp.float32(0.0),
    }
    st, obs, _, _, info = cls._step_impl(cfg, st, None)
    return st, obs, info

  @classmethod
  def step(
    cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array
  ) -> Tuple[Any, Any, jax.Array, jax.Array, Dict]:
    del key
    st, obs, reward, term, info = cls._step_impl(
      cfg, state, action.reshape(3)
    )
    return st, obs, reward, term, info

  # ------------------------------------------------------------------- core

  @classmethod
  def _step_impl(cls, cfg: Any, st: Any, action):
    tiles_b, centers_b, n_tiles_b, bitmaps_b, coarse_b, _ = _bank(
      int(cfg.seed), int(cfg.n_tracks)
    )
    tiles = jnp.asarray(tiles_b)[st["track_id"]]
    n_tiles = jnp.asarray(n_tiles_b)[st["track_id"]]

    is_action = action is not None
    gas, brake, steer = st["gas"], st["brake"], st["steer"]
    if is_action:
      steer = -jnp.clip(action[0], -1.0, 1.0)
      # gas smoothing: += min(g - gas, 0.1) (car_dynamics.cc:108-114)
      g = jnp.clip(action[1], 0.0, 1.0)
      gas = gas + jnp.minimum(g - gas, 0.1)
      brake = jnp.clip(action[2], 0.0, 1.0)

    pos, vel = st["pos"], st["vel"]
    angle, omega = st["angle"], st["omega"]
    wheel_omega = st["wheel_omega"]
    joint_angle = st["joint_angle"]
    phase = st["phase"]

    # steering joints chase the target (car_dynamics.cc:128-131)
    diff = steer - joint_angle
    jspeed = jnp.sign(diff) * jnp.minimum(50.0 * jnp.abs(diff), 3.0)
    joint_angle = jnp.clip(joint_angle + jspeed * DT, -0.4, 0.4)

    rot_h = _rot(angle)
    wheel_pos_local = jnp.asarray(_WHEEL_POS, jnp.float32)
    wheel_world = pos[None, :] + wheel_pos_local @ rot_h.T      # [4, 2]
    wheel_angle = angle + jnp.concatenate(
      [joint_angle, jnp.zeros(2, jnp.float32)]
    )

    # which tile is each wheel on? (friction + visitation)
    on_tile = jax.vmap(
      lambda p: _point_in_quads(p, tiles)
    )(wheel_world)                                              # [4, T]
    valid = jnp.arange(_TMAX) < n_tiles
    on_tile = on_tile & valid[None, :]
    on_road = jnp.any(on_tile, axis=1)                          # [4]
    friction_limit = jnp.where(
      on_road, FRICTION_LIMIT, FRICTION_LIMIT * 0.6
    )

    # visitation reward (FrictionDetector, car_racing_env.cc:64-79)
    touched = jnp.any(on_tile, axis=0)                          # [T]
    newly = touched & ~st["visited"]
    visited = st["visited"] | touched
    n_new = jnp.sum(newly).astype(jnp.int32)
    visited_count = st["visited_count"] + n_new
    reward_acc = st["reward_acc"] + 1000.0 * n_new.astype(jnp.float32) / (
      n_tiles.astype(jnp.float32)
    )
    new_lap = st["new_lap"] | (
      newly[0]
      & (visited_count.astype(jnp.float32)
         > n_tiles.astype(jnp.float32) * float(cfg.lap_complete_percent))
    )

    # per-wheel forces (car_dynamics.cc:133-215)
    forw = jnp.stack(
      [-jnp.sin(wheel_angle), jnp.cos(wheel_angle)], axis=-1
    )
    side = jnp.stack(
      [jnp.cos(wheel_angle), jnp.sin(wheel_angle)], axis=-1
    )
    r = wheel_world - pos[None, :]
    v_wheel = vel[None, :] + omega * jnp.stack(
      [-r[:, 1], r[:, 0]], axis=-1
    )
    vf = jnp.sum(forw * v_wheel, axis=-1)
    vs = jnp.sum(side * v_wheel, axis=-1)

    gas_w = jnp.asarray([0.0, 0.0, 1.0, 1.0]) * gas
    wheel_omega = wheel_omega + (
      DT * ENGINE_POWER * gas_w / WHEEL_MOI / (jnp.abs(wheel_omega) + 5.0)
    )
    # brake (car_dynamics.cc:155-165)
    bval = jnp.minimum(BRAKE_FORCE * brake, jnp.abs(wheel_omega))
    wheel_omega = jnp.where(
      brake >= 0.9, 0.0, wheel_omega - jnp.sign(wheel_omega) * bval
    )
    phase = phase + wheel_omega * DT

    vr = wheel_omega * (WHEEL_R * SIZE)
    f_force = (-vf + vr) * (205000 * SIZE * SIZE)
    p_force = -vs * (205000 * SIZE * SIZE)
    force = jnp.sqrt(f_force**2 + p_force**2)
    scale_down = jnp.where(
      force > friction_limit, friction_limit / (force + 1e-9), 1.0
    )
    f_force = f_force * scale_down
    p_force = p_force * scale_down
    wheel_omega = wheel_omega - (
      DT * f_force * (WHEEL_R * SIZE) / WHEEL_MOI
    )

    f_vec = p_force[:, None] * side + f_force[:, None] * forw   # [4, 2]
    total_f = jnp.sum(f_vec, axis=0)
    total_tau = jnp.sum(r[:, 0] * f_vec[:, 1] - r[:, 1] * f_vec[:, 0])

    vel = vel + total_f / CAR_MASS * DT
    omega = omega + total_tau / CAR_I * DT
    pos = pos + vel * DT
    angle = angle + omega * DT
    t = st["t"] + DT

    # reward / termination (car_racing_env.cc:385-410)
    if is_action:
      reward_acc = reward_acc - 0.1
      step_reward = reward_acc - st["prev_reward"]
      prev_reward = reward_acc
      finished = (visited_count >= n_tiles) | new_lap
      out = (jnp.abs(pos[0]) > PLAYFIELD) | (jnp.abs(pos[1]) > PLAYFIELD)
      step_reward = jnp.where(out, -100.0, step_reward)
      term = finished | out
    else:
      step_reward = jnp.float32(0.0)
      prev_reward = st["prev_reward"]
      term = jnp.bool_(False)

    new_st = {
      "track_id": st["track_id"], "pos": pos, "vel": vel, "angle": angle,
      "omega": omega, "wheel_omega": wheel_omega,
      "joint_angle": joint_angle, "gas": gas, "brake": brake,
      "steer": steer, "phase": phase, "visited": visited,
      "visited_count": visited_count, "reward_acc": reward_acc,
      "prev_reward": prev_reward, "new_lap": new_lap, "t": t,
    }
    obs = cls._render_v2(
      jnp.asarray(bitmaps_b), jnp.asarray(coarse_b), st["track_id"], pos,
      vel, angle, omega, wheel_pos_local, joint_angle, wheel_omega, t,
    )
    info = {"tile_visited_count": visited_count}
    return new_st, obs, step_reward.astype(jnp.float32), term, info

  # ------------------------------------------------------------------ render

  @staticmethod
  def _render(
    bitmaps_all, track_id, pos, vel, angle, omega, wheel_pos_local,
    joint_angle, wheel_omega, t,
  ) -> jax.Array:
    """96x96x3 uint8 state-pixels view (car_racing_env.cc:561-592).

    TPU note: ``bitmaps_all`` is the SHARED [n_tracks, R, R] bank;
    ``track_id`` is folded into a flat gather index. A vmapped gather
    from a per-env-selected bitmap is ~75x slower on TPU than a batched
    gather from one shared table.
    """
    view_angle = -angle
    zoom = (
      0.1 * SCALE * jnp.maximum(1.0 - t, 0.0)
      + ZOOM * SCALE * jnp.minimum(t, 1.0)
    )
    scroll = -pos * zoom
    rot_v = _rot(view_angle)
    trans = rot_v @ scroll + jnp.asarray([WINDOW_W / 2.0, WINDOW_H / 4.0])

    # pixel grid -> pre-flip window coords -> world coords
    jj, ii = jnp.meshgrid(jnp.arange(STATE_W), jnp.arange(STATE_H))
    x_s = (jj + 0.5) * (WINDOW_W / STATE_W)
    y_s = WINDOW_H - (ii + 0.5) * (WINDOW_H / STATE_H)  # undo cv::flip
    sxy = jnp.stack([x_s - trans[0], y_s - trans[1]], axis=-1) / zoom
    world = sxy @ rot_v  # R(view_angle)^T applied row-wise

    # background: sample the baked track bitmap
    scale = 2 * PLAYFIELD / BITMAP_RES
    bx = jnp.clip(
      ((world[..., 0] + PLAYFIELD) / scale).astype(jnp.int32), 0,
      BITMAP_RES - 1,
    )
    by = jnp.clip(
      ((world[..., 1] + PLAYFIELD) / scale).astype(jnp.int32), 0,
      BITMAP_RES - 1,
    )
    flat_idx = (
      track_id * (BITMAP_RES * BITMAP_RES) + by * BITMAP_RES + bx
    )
    color_idx = jnp.take(bitmaps_all.reshape(-1), flat_idx)
    # palette lookup as mask arithmetic (tiny-table gathers serialize)
    img = jnp.zeros((*color_idx.shape, 3), jnp.uint8)
    for k in range(len(PALETTE)):
      img = jnp.where(
        (color_idx == k)[..., None],
        jnp.asarray(PALETTE[k], jnp.uint8), img,
      )

    return CarRacingEnv._overlays(
      img, world, ii, jj, pos, vel, angle, omega, wheel_pos_local,
      joint_angle, wheel_omega,
    )

  @staticmethod
  def _overlays(
    img, world, ii, jj, pos, vel, angle, omega, wheel_pos_local,
    joint_angle, wheel_omega,
  ) -> jax.Array:
    """Car sprite + indicator bar (shared by both background renderers)."""
    # car overlay: world -> car frame
    rel = world - pos[None, None, :]
    rot_h = _rot(angle)
    car_xy = rel @ rot_h  # R(angle)^T rows

    def in_poly(points, poly):
      a = jnp.asarray(poly, jnp.float32)
      b = jnp.roll(a, -1, axis=0)
      cross = (
        (b[:, 0] - a[:, 0])[None, None, :]
        * (points[..., 1:2] - a[:, 1][None, None, :])
        - (b[:, 1] - a[:, 1])[None, None, :]
        * (points[..., 0:1] - a[:, 0][None, None, :])
      )
      return jnp.all(cross <= 0, axis=-1) | jnp.all(cross >= 0, axis=-1)

    in_hull = jnp.zeros(car_xy.shape[:2], jnp.bool_)
    for poly in _HULL_POLYS:
      in_hull = in_hull | in_poly(car_xy, poly)

    wheel_angles = jnp.concatenate(
      [joint_angle, jnp.zeros(2, jnp.float32)]
    )
    in_wheel = jnp.zeros(car_xy.shape[:2], jnp.bool_)
    for w in range(4):
      wc = jnp.asarray(wheel_pos_local[w], jnp.float32)
      rel_w = car_xy - wc[None, None, :]
      rw = _rot(wheel_angles[w])
      wxy = rel_w @ rw
      inside = (
        (jnp.abs(wxy[..., 0]) <= WHEEL_W * SIZE)
        & (jnp.abs(wxy[..., 1]) <= WHEEL_R * SIZE)
      )
      in_wheel = in_wheel | inside

    img = jnp.where(
      in_wheel[..., None], jnp.asarray([0, 0, 0], jnp.uint8),
      jnp.where(
        in_hull[..., None], jnp.asarray([204, 0, 0], jnp.uint8), img
      ),
    )

    # indicator bar (car_racing_env.cc:491-560): bottom 5h rows black,
    # then value bars. h = H/40, s = W/40 in window units.
    h = WINDOW_H / 40.0
    s = WINDOW_W / 40.0
    y_png = (ii + 0.5) * (WINDOW_H / STATE_H)   # post-flip window row
    x_png = (jj + 0.5) * (WINDOW_W / STATE_W)
    img = jnp.where(
      (y_png > WINDOW_H - 5 * h)[..., None],
      jnp.asarray([0, 0, 0], jnp.uint8), img,
    )

    true_speed = jnp.sqrt(jnp.sum(vel * vel))

    def vert_bar(img, place, val, color):
      y_top = WINDOW_H - (h + h * val)
      inside = (
        (x_png >= place * s) & (x_png < (place + 1) * s)
        & (y_png >= jnp.minimum(y_top, WINDOW_H - h))
        & (y_png < jnp.maximum(y_top, WINDOW_H - h))
      ) & (jnp.abs(val) > 1e-4)
      return jnp.where(
        inside[..., None], jnp.asarray(color, jnp.uint8), img
      )

    def horiz_bar(img, place, val, color):
      x_from = place * s
      x_to = (place + val) * s
      inside = (
        (y_png >= WINDOW_H - 4 * h) & (y_png < WINDOW_H - 2 * h)
        & (x_png >= jnp.minimum(x_from, x_to))
        & (x_png < jnp.maximum(x_from, x_to))
      ) & (jnp.abs(val) > 1e-4)
      return jnp.where(
        inside[..., None], jnp.asarray(color, jnp.uint8), img
      )

    img = vert_bar(img, 5, 0.02 * true_speed, [255, 255, 255])
    img = vert_bar(img, 7, 0.01 * wheel_omega[0], [0, 0, 255])
    img = vert_bar(img, 8, 0.01 * wheel_omega[1], [0, 0, 255])
    img = vert_bar(img, 9, 0.01 * wheel_omega[2], [51, 0, 255])
    img = vert_bar(img, 10, 0.01 * wheel_omega[3], [51, 0, 255])
    img = horiz_bar(img, 20, -10.0 * joint_angle[0], [0, 255, 0])
    img = horiz_bar(img, 30, -0.8 * omega, [255, 0, 0])
    return img.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# gather-free renderer: per-row integer shifts via static-roll decomposition
# (TPU serializes per-element gathers at ~8.5 ns; rolls + masked selects fuse
# into VMEM-resident elementwise work, and the final scale/translate is a
# pair of small one-hot matmuls)

def _row_shift_rolls(w: jax.Array, shifts: jax.Array) -> jax.Array:
  """w [R, C] -> out[r, c] = w[r, c - shifts[r]] (circular)."""
  r_, c_ = w.shape
  s = jnp.mod(shifts, c_)
  lo = jnp.mod(s, 16)
  hi = s // 16
  acc = jnp.zeros_like(w)
  for l in range(16):
    acc = jnp.where((lo == l)[:, None], jnp.roll(w, l, axis=1), acc)
  out = jnp.zeros_like(w)
  for h in range(c_ // 16):
    out = jnp.where((hi == h)[:, None], jnp.roll(acc, 16 * h, axis=1), out)
  return out


def _col_shift_rolls(w: jax.Array, shifts: jax.Array) -> jax.Array:
  return _row_shift_rolls(w.T, shifts).T


def _rot_shear(w: jax.Array, theta: jax.Array) -> jax.Array:
  """Integer 3-shear rotation: out[d] = w[S(theta) (d - c) + c] with
  S(theta) = [[cos, sin], [-sin, cos]] in (row, col) coords; exact to
  ~1 px vs nearest-neighbor rotation for |theta| <= pi/4."""
  r_, c_ = w.shape
  cy, cx = (r_ - 1) / 2, (c_ - 1) / 2
  a = jnp.tan(theta / 2)
  b = -jnp.sin(theta)
  rr = jnp.arange(r_) - cy
  cc = jnp.arange(c_) - cx
  w = _row_shift_rolls(w, jnp.round(a * rr).astype(jnp.int32))
  w = _col_shift_rolls(w, jnp.round(b * cc).astype(jnp.int32))
  w = _row_shift_rolls(w, jnp.round(a * rr).astype(jnp.int32))
  return w


def _fused_render_kernel(
  scal_ref, bank_ref, s1_ref, s2_ref, s3_ref, s4_ref, rows_ref, cols_ref,
  out_ref, win_ref, sem,
):
  """Fully fused per-env background sampler.

  Grid is (num_envs,). Per grid step: DMA the env's [S, S] window out of
  the HBM-resident bitmap bank at a scalar-prefetched dynamic offset
  (a batched ``dynamic_slice``/one-hot-matmul fetch costs ~140us/env or
  ~1.6 GFLOP/env respectively; the DMA moves exactly 2*S*S bytes), then
  run the whole sampling chain in VMEM: quadrant rot90 fold, the
  3-shear rotation + residual shear as barrel-shifted rolls, and the
  final one-hot scale/translate matmuls on the MXU."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  e = pl.program_id(0)
  # scal carries offsets in tile units (rows/8, cols/128): multiplying
  # back in-kernel lets Mosaic PROVE the DMA offsets are tile-aligned
  # (a plain runtime value fails its divisibility check). The quadrant
  # rotation is already baked into the bank (4 pre-rotated copies), so
  # the kernel is pure DMA -> shears -> sampling matmuls.
  r0 = scal_ref[e, 0] * 8
  c0 = scal_ref[e, 1] * 128
  s_dim = win_ref.shape[0]
  copy = pltpu.make_async_copy(
    bank_ref.at[pl.ds(r0, s_dim), pl.ds(c0, s_dim)], win_ref, sem
  )
  copy.start()
  copy.wait()
  w = win_ref[...]
  n_bits = max(1, (s_dim - 1).bit_length())

  # per-row/col circular shift as a binary barrel shifter: 8 conditional
  # power-of-two rolls instead of a 16+12 two-level merge — ~3.5x less
  # generated vector code (the two-level variant took Mosaic ~8 min to
  # compile at this window size; execution cost is the same)
  def row_pass(w, shifts_2d):           # shift along axis 1, per row
    sh = jnp.mod(shifts_2d, s_dim).reshape(s_dim, 1)
    acc = w
    for b in range(n_bits):
      bit = (sh >> b) & 1
      acc = jnp.where(bit == 1, jnp.roll(acc, 1 << b, axis=1), acc)
    return acc

  def col_pass(w, shifts_2d):           # shift along axis 0, per column
    sh = jnp.mod(shifts_2d, s_dim).reshape(1, s_dim)
    acc = w
    for b in range(n_bits):
      bit = (sh >> b) & 1
      acc = jnp.where(bit == 1, jnp.roll(acc, 1 << b, axis=0), acc)
    return acc

  w = row_pass(w, s1_ref[...])
  w = col_pass(w, s2_ref[...])
  w = row_pass(w, s3_ref[...])
  w = col_pass(w, s4_ref[...])

  rows = rows_ref[...].reshape(STATE_H, 1)     # [96, 1]
  cols = cols_ref[...].reshape(1, STATE_W)     # [1, 96]
  iota_s_row = jax.lax.broadcasted_iota(jnp.int32, (STATE_H, s_dim), 1)
  iota_s_col = jax.lax.broadcasted_iota(jnp.int32, (s_dim, STATE_W), 0)
  row_oh = (rows == iota_s_row).astype(jnp.bfloat16)
  col_oh = (iota_s_col == cols).astype(jnp.bfloat16)
  out_ref[0] = jnp.dot(
    jnp.dot(row_oh, w, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16),
    col_oh, preferred_element_type=jnp.float32,
  )


def _fused_sample_batched(bank_flat, scal, s1, s2, s3, s4, rows, cols):
  """[N]-env batched sampler: one pallas call, grid over envs."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n = scal.shape[0]
  s_dim = s1.shape[-1]
  # unit middle dim so each block's trailing dims equal the array's
  # (Mosaic requires trailing block dims divisible by (8, 128) or full)
  env_block = lambda w: pl.BlockSpec((1, 1, w), lambda i, s: (i, 0, 0))
  grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1,
    grid=(n,),
    in_specs=[
      pl.BlockSpec(memory_space=pl.ANY),        # bitmap bank stays in HBM
      env_block(s_dim), env_block(s_dim), env_block(s_dim),
      env_block(s_dim), env_block(STATE_H), env_block(STATE_W),
    ],
    out_specs=pl.BlockSpec(
      (1, STATE_H, STATE_W), lambda i, s: (i, 0, 0)
    ),
    scratch_shapes=[
      pltpu.VMEM((s_dim, s_dim), jnp.bfloat16),
      pltpu.SemaphoreType.DMA(()),
    ],
  )
  return pl.pallas_call(
    _fused_render_kernel,
    grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((n, STATE_H, STATE_W), jnp.float32),
    interpret=jax.default_backend() not in ("tpu",),
  )(scal, bank_flat, s1[:, None], s2[:, None], s3[:, None], s4[:, None],
    rows[:, None], cols[:, None])


@jax.custom_batching.custom_vmap
def _fused_sample(bank_flat, scal, s1, s2, s3, s4, rows, cols):
  """Single-env view of the sampler; under the engine's env vmap the
  batch rule below lands every env in ONE pallas grid (a plain vmap of
  the pallas call would broadcast the multi-MB bank per env)."""
  return _fused_sample_batched(
    bank_flat, scal[None], s1[None], s2[None], s3[None], s4[None],
    rows[None], cols[None],
  )[0]


@_fused_sample.def_vmap
def _fused_sample_vmap_rule(
  axis_size, in_batched, bank_flat, scal, s1, s2, s3, s4, rows, cols
):
  del axis_size
  assert not in_batched[0], "bitmap bank must be shared across envs"
  out = _fused_sample_batched(bank_flat, scal, s1, s2, s3, s4, rows, cols)
  return out, True


# window-coordinate maps of rot90^k about the ARRAY center:
# (r, c) in the original window lands at A_k (r, c) + b_k(S) in the
# rotated array (the kernel realizes the same rot90 with exchange-matrix
# matmuls, so the affine must be conjugated through it)
_QUAD_A = np.asarray([
  [[1, 0], [0, 1]],
  [[0, -1], [1, 0]],
  [[-1, 0], [0, -1]],
  [[0, 1], [-1, 0]],
], np.float32)


def _quad_b(s_dim: int) -> np.ndarray:
  m = float(s_dim - 1)
  return np.asarray([[0, 0], [m, 0], [m, m], [0, m]], np.float32)


def _sample_rotated(
  bank_rot_flat: jax.Array,  # [4*T*S, S] bf16 palette+1 bank: the four
                             # rot90^k copies of every track (0 = black)
  track_id: jax.Array,       # scalar
  s_full: int,               # static per-track bitmap size S
  s_win: int,                # static DMA window size (== s_full to skip
                             # windowing, e.g. the coarse mipmap)
  m_col_i: jax.Array,        # d(by,bx)/di  [2], full-bitmap coords
  m_col_j: jax.Array,        # d(by,bx)/dj  [2]
  q0: jax.Array,             # (by, bx) of out pixel (0,0), full coords
  pivot: jax.Array,          # rotation pivot in full coords (the car;
                             # small shear shifts need it near the view)
) -> jax.Array:
  """96x96 nearest sampling along the affine p -> M p + q0 without any
  gather: pick the pre-rotated quadrant bank (conjugating the affine
  exactly through the rot90), window around the mapped pivot at
  tile-aligned offsets, then QR-factor the residual M1 = Rot(phi) @
  [[u00, u01], [0, u11]] (|phi| <= 45deg) and realize it as integer
  3-shear + residual shear about the pivot + one-hot scale matmuls —
  all inside ``_fused_render_kernel`` against the DMA'd window."""
  n_tracks = bank_rot_flat.shape[0] // (4 * s_full)
  theta = -jnp.arctan2(m_col_i[1], m_col_i[0])
  k = jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32)
  km = jnp.mod(k, 4)
  onehot_k = (jnp.arange(4) == km).astype(jnp.float32)
  a_k = jnp.einsum("k,kij->ij", onehot_k, jnp.asarray(_QUAD_A))
  b_k = onehot_k @ jnp.asarray(_quad_b(s_full))
  m1_i = a_k @ m_col_i
  m1_j = a_k @ m_col_j
  q1 = a_k @ q0 + b_k
  c1 = a_k @ pivot + b_k
  # window in the rotated bank, offsets quantized so the Mosaic DMA can
  # prove tile alignment (rows to 8, cols to 128); the pivot then sits
  # >= 128 px from the window's column edges
  ci = jnp.round(c1).astype(jnp.int32)
  ws = jnp.stack([
    jnp.clip(((ci[0] - s_win // 2) // 8) * 8, 0, s_full - s_win),
    jnp.clip((ci[1] // 128 - 1) * 128, 0, s_full - s_win),
  ])
  q1 = q1 - ws
  c1 = c1 - ws
  # residual rotation of the conjugated affine
  phi = jnp.arctan2(m1_i[1], m1_i[0])
  theta_res = -phi
  a = jnp.tan(theta_res / 2)
  b = -jnp.sin(theta_res)
  s1 = jnp.round(a * (jnp.arange(s_win) - c1[0])).astype(jnp.int32)
  s2 = jnp.round(b * (jnp.arange(s_win) - c1[1])).astype(jnp.int32)
  s3 = s1
  # upper-triangular factor U = Rot(-phi) @ M1
  rot = jnp.asarray(
    [[jnp.cos(phi), jnp.sin(phi)], [-jnp.sin(phi), jnp.cos(phi)]]
  )  # Rot(-phi)
  r0 = rot @ (q1 - c1) + c1
  u_i = rot @ m1_i         # (u00, ~0)
  u_j = rot @ m1_j         # (u01, u11)
  u00, u01, u11 = u_i[0], u_j[0], u_j[1]
  # residual shear: sampled row = r0y + u00 i + u01 j with col
  # cc(j) = r0x + u11 j; shift columns vertically so rows decouple from j
  cc = jnp.arange(s_win).astype(jnp.float32)
  s4 = -jnp.round(u01 / u11 * (cc - r0[1])).astype(jnp.int32)
  rows = jnp.round(
    r0[0] + u00 * jnp.arange(STATE_H)
  ).astype(jnp.int32)                                   # [96]
  cols = jnp.round(
    r0[1] + u11 * jnp.arange(STATE_W)
  ).astype(jnp.int32)                                   # [96]
  flat_row = (km * n_tracks + track_id) * s_full + ws[0]
  scal = jnp.stack([flat_row // 8, ws[1] // 128])
  out = _fused_sample(bank_rot_flat, scal, s1, s2, s3, s4, rows, cols)
  return jnp.round(out).astype(jnp.int32)


def _render_v2_impl(
  cls,
  bitmaps_all, coarse_all, track_id, pos, vel, angle, omega,
  wheel_pos_local, joint_angle, wheel_omega, t,
) -> jax.Array:
  """Gather-free 96x96x3 render. Same view transform as ``_render``; the
  background sample runs through ``_sample_rotated`` against either the
  fine bitmap (steady zoom) or the coarse full-playfield mipmap (the
  first-second zoom animation), selected per env."""
  from .car_track import COARSE_RES

  view_angle = -angle
  zoom = (
    0.1 * SCALE * jnp.maximum(1.0 - t, 0.0)
    + ZOOM * SCALE * jnp.minimum(t, 1.0)
  )
  scroll = -pos * zoom
  rot_v = _rot(view_angle)
  trans = rot_v @ scroll + jnp.asarray([WINDOW_W / 2.0, WINDOW_H / 4.0])

  def world_of(i, j):
    x_s = (j + 0.5) * (WINDOW_W / STATE_W)
    y_s = WINDOW_H - (i + 0.5) * (WINDOW_H / STATE_H)
    sxy = jnp.stack([x_s - trans[0], y_s - trans[1]]) / zoom
    return sxy @ rot_v

  # affine out-pixel -> bitmap (by, bx), derived numerically (no sign
  # algebra): columns from finite differences of the exact transform
  res_f = 2 * PLAYFIELD / BITMAP_RES
  res_c = 2 * PLAYFIELD / COARSE_RES

  def bm_coords(i, j, res):
    w = world_of(i, j)
    return jnp.stack([(w[1] + PLAYFIELD) / res, (w[0] + PLAYFIELD) / res])

  # ---- fine path: DMA'd 384^2 window around the car out of the
  # 4-quadrant pre-rotated bank (the rot90 is baked into the bank, the
  # residual |<=45deg| rotation runs as shears in the kernel). 384 gives
  # both tile-quantized offsets (rows to 8, cols to 128) >=128 px of
  # margin around the car; the view spans <=+-88 px and the shear rolls
  # (pivoted ON the car) shift <=~40 px, so wrap contamination stays
  # outside the view.
  q00 = bm_coords(0.0, 0.0, res_f)
  m_i = bm_coords(1.0, 0.0, res_f) - q00
  m_j = bm_coords(0.0, 1.0, res_f) - q00
  center = jnp.stack([
    (pos[1] + PLAYFIELD) / res_f, (pos[0] + PLAYFIELD) / res_f
  ])
  n_tracks_i = bitmaps_all.shape[0]
  bmp1 = bitmaps_all.astype(jnp.bfloat16) + 1   # palette+1; 0 = black
  bank_fine = jnp.concatenate([
    jnp.rot90(bmp1, k=k, axes=(1, 2)) for k in range(4)
  ]).reshape(4 * n_tracks_i * BITMAP_RES, BITMAP_RES)
  idx_fine = _sample_rotated(
    bank_fine, track_id, BITMAP_RES, 384, m_i, m_j, q00, center
  )

  # ---- coarse path: whole playfield mipmap, zero-padded to 256 so the
  # barrel-shift wrap zone lands on black; pivot at the map center
  q00c = bm_coords(0.0, 0.0, res_c)
  m_ic = bm_coords(1.0, 0.0, res_c) - q00c
  m_jc = bm_coords(0.0, 1.0, res_c) - q00c
  pad_c = (256 - COARSE_RES) // 2
  coarse1 = jnp.pad(
    coarse_all.astype(jnp.bfloat16) + 1,
    ((0, 0), (pad_c, pad_c), (pad_c, pad_c)),
  )
  bank_coarse = jnp.concatenate([
    jnp.rot90(coarse1, k=k, axes=(1, 2)) for k in range(4)
  ]).reshape(4 * n_tracks_i * 256, 256)
  idx_coarse = _sample_rotated(
    bank_coarse, track_id, 256, 256, m_ic, m_jc, q00c + pad_c,
    jnp.full(2, (256 - 1) / 2.0, jnp.float32),
  )

  # steady zoom covers <= 192 * res_f meters per axis; else coarse
  view_w = STATE_W * (WINDOW_W / STATE_W) / zoom          # world meters
  use_fine = view_w * 1.5 < 192 * res_f
  color_idx1 = jnp.where(use_fine, idx_fine, idx_coarse)  # palette+1; 0=black

  # palette with the +1 shift; 0 stays black
  img = jnp.zeros((*color_idx1.shape, 3), jnp.uint8)
  for k in range(len(PALETTE)):
    img = jnp.where(
      (color_idx1 == k + 1)[..., None],
      jnp.asarray(PALETTE[k], jnp.uint8), img,
    )

  # car + indicator overlays: identical to the gather renderer
  jj, ii = jnp.meshgrid(jnp.arange(STATE_W), jnp.arange(STATE_H))
  x_s = (jj + 0.5) * (WINDOW_W / STATE_W)
  y_s = WINDOW_H - (ii + 0.5) * (WINDOW_H / STATE_H)
  sxy = jnp.stack([x_s - trans[0], y_s - trans[1]], axis=-1) / zoom
  world = sxy @ rot_v
  img = cls._overlays(
    img, world, ii, jj, pos, vel, angle, omega, wheel_pos_local,
    joint_angle, wheel_omega,
  )
  return img


CarRacingEnv._render_v2 = classmethod(_render_v2_impl)
