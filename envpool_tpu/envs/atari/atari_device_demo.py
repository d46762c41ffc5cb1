"""On-device Atari parity-demo track (SURVEY §7.8(b)).

ALE itself is a 6502 emulator and cannot run in XLA, so the real Atari
family is the host-callback tier (``atari_env.py``).  This module is the
promised *on-device* track: a pure-JAX Pong-style game that renders real
210x160 RGB frames on device and consumes them through the SAME wrapper
stack the reference implements in C++ (``envpool/atari/atari_env.h``):

- frame_skip with elementwise max over the LAST TWO skipped frames
  (``atari_env.h:269-276``) — like the reference, only those two frames
  are "grabbed" (rendered) per env-step;
- BT.601 grayscale + INTER_AREA resize to 84x84 as MXU matmuls
  (``envpool_tpu.ops.image`` — the device counterparts of
  ``envpool/utils/image_process.h:27-45``);
- stack_num frame stacking with push-all-on-reset (``atari_env.h:281-287``);
- reward_clip to sign (``atari_env.h:217-223``).

Everything — game dynamics, rendering, and the wrapper pipeline — runs in
one fused XLA program per step; no host traffic. The game is NOT the ALE
Pong ROM (no emulator on device, by construction); its point is parity of
the *frame pipeline*: ``tests/test_atari_device_demo.py`` pins the device
wrapper stack bit-exactly against the host tier's numpy implementation
(``atari_env._resize_area_np`` + maxpool + stack) on identical frames.

Game rules (Pong-flavored, deterministic given the seed):
- 160x210 court, play area rows [34, 194); right paddle is the agent,
  left paddle a tracking opponent; ball bounces off walls and paddles
  (paddle hits re-angle the ball by hit offset);
- minimal-action-set-sized action space (6: NOOP/FIRE/UP/DOWN/UPFIRE/
  DOWNFIRE — ALE pong's minimal set size), paddles move 4 px per frame;
- a point when the ball exits either side (+1 agent / -1 agent), serve
  from center toward the scored-on side; episode ends at 21 points
  either side (the ALE pong game-over rule).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec
from envpool_tpu.ops import image as img_ops

RAW_H, RAW_W = 210, 160
TOP, BOT = 34, 194          # play-area rows [TOP, BOT)
PAD_H, PAD_W = 16, 4        # paddle size
BALL_H, BALL_W = 4, 2       # ball size (rows x cols)
AGENT_X, ENEMY_X = 140, 16  # paddle column anchors
PADDLE_SPEED = 4
ENEMY_SPEED = 2
WIN_SCORE = 21

# ALE pong palette flavors (uint8 RGB)
_BG = np.asarray([144, 72, 17], np.uint8)
_AGENT = np.asarray([92, 186, 92], np.uint8)
_ENEMY = np.asarray([213, 130, 74], np.uint8)
_BALL = np.asarray([236, 236, 236], np.uint8)


def render_frame(ay, ey, bx, by, gray: bool) -> jax.Array:
  """Render one 210x160 frame from scalar game state.

  RGB [210, 160, 3] uint8, or grayscale [210, 160, 1] rendered in RGB
  then BT.601-converted (the ALE grabs grayscale from its palette; the
  demo converts — same pipeline shape).
  """
  rows = jnp.arange(RAW_H, dtype=jnp.int32)[:, None]
  cols = jnp.arange(RAW_W, dtype=jnp.int32)[None, :]
  in_play = (rows >= TOP) & (rows < BOT)
  m_agent = (
    in_play & (cols >= AGENT_X) & (cols < AGENT_X + PAD_W)
    & (rows >= ay) & (rows < ay + PAD_H)
  )
  m_enemy = (
    in_play & (cols >= ENEMY_X) & (cols < ENEMY_X + PAD_W)
    & (rows >= ey) & (rows < ey + PAD_H)
  )
  bxi = jnp.round(bx).astype(jnp.int32)
  byi = jnp.round(by).astype(jnp.int32)
  m_ball = (
    in_play & (cols >= bxi) & (cols < bxi + BALL_W)
    & (rows >= byi) & (rows < byi + BALL_H)
  )
  frame = jnp.asarray(_BG)[None, None, :] * jnp.ones(
    (RAW_H, RAW_W, 1), jnp.uint8
  )
  frame = jnp.where(m_agent[..., None], jnp.asarray(_AGENT), frame)
  frame = jnp.where(m_enemy[..., None], jnp.asarray(_ENEMY), frame)
  frame = jnp.where(m_ball[..., None], jnp.asarray(_BALL), frame)
  if gray:
    return img_ops.grayscale(frame)[..., None]
  return frame


class PongDemoEnv(FuncEnv):
  """On-device Pong-style demo with the full Atari wrapper stack."""

  name = "PongDemo"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    # the wrapper-stack slice of the Atari config (atari_env.h:50-59);
    # emulator-only knobs (noop_max, sticky actions, episodic_life) have
    # no on-device counterpart and are omitted
    return {
      "stack_num": 4, "frame_skip": 4, "img_height": 84, "img_width": 84,
      "gray_scale": True, "reward_clip": False,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    c = 1 if cfg.gray_scale else 3
    return {
      "obs": ArraySpec(
        np.uint8,
        (int(cfg.stack_num) * c, int(cfg.img_height), int(cfg.img_width)),
        0, 255,
      ),
      "info:score": ArraySpec(np.int32, (2,)),
      "info:reward": ArraySpec(np.float32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 5)}

  # ---------------------------------------------------------------- helpers

  @staticmethod
  def _serve(key: jax.Array, toward_agent) -> Tuple[jax.Array, ...]:
    """Center serve; vx sign per ``toward_agent``, vy uniform in ±[1, 3]."""
    kvy, ksg = jax.random.split(key)
    bx = jnp.float32(RAW_W // 2)
    by = jnp.float32((TOP + BOT) // 2)
    vx = jnp.where(toward_agent, 2.0, -2.0).astype(jnp.float32)
    vy = jax.random.uniform(kvy, (), jnp.float32, 1.0, 3.0)
    vy = vy * jnp.where(
      jax.random.bernoulli(ksg), jnp.float32(1.0), jnp.float32(-1.0)
    )
    return bx, by, vx, vy

  @classmethod
  def _frame(cls, cfg: Any, st: Dict[str, jax.Array]) -> jax.Array:
    return render_frame(
      st["ay"], st["ey"], st["bx"], st["by"], bool(cfg.gray_scale)
    )

  @classmethod
  def _process(cls, cfg: Any, f0: jax.Array, f1: jax.Array) -> jax.Array:
    """maxpool(last two frames) -> resize -> CHW (one stack slot)."""
    frame = img_ops.max_last_two(f0, f1)  # [210, 160, C] uint8
    small = img_ops.resize_area(
      jnp.moveaxis(frame, -1, 0), (int(cfg.img_height), int(cfg.img_width))
    )  # [C, h, w]
    return small

  @classmethod
  def _advance(cls, st: Dict[str, jax.Array], action: jax.Array, key):
    """One 60 Hz game frame. Returns (state', point_reward)."""
    ay, ey = st["ay"], st["ey"]
    bx, by, vx, vy = st["bx"], st["by"], st["vx"], st["vy"]
    up = (action == 2) | (action == 4)
    down = (action == 3) | (action == 5)
    ay = ay + jnp.where(
      up, -PADDLE_SPEED, jnp.where(down, PADDLE_SPEED, 0)
    ).astype(jnp.int32)
    ay = jnp.clip(ay, TOP, BOT - PAD_H)
    # opponent tracks the ball center
    bc = by + BALL_H / 2.0
    ec = (ey + PAD_H / 2.0).astype(jnp.float32)
    ey = ey + jnp.where(
      bc > ec + 1, ENEMY_SPEED, jnp.where(bc < ec - 1, -ENEMY_SPEED, 0)
    ).astype(jnp.int32)
    ey = jnp.clip(ey, TOP, BOT - PAD_H)

    bx = bx + vx
    by = by + vy
    # wall bounce (reflect inside [TOP, BOT - BALL_H])
    over_top = by < TOP
    over_bot = by > BOT - BALL_H
    by = jnp.where(over_top, 2 * TOP - by, by)
    by = jnp.where(over_bot, 2 * (BOT - BALL_H) - by, by)
    vy = jnp.where(over_top | over_bot, -vy, vy)
    # paddle bounce: ball crossing the paddle column while overlapping
    hit_agent = (
      (vx > 0) & (bx + BALL_W >= AGENT_X) & (bx + BALL_W < AGENT_X + PAD_W)
      & (by + BALL_H >= ay) & (by <= ay + PAD_H)
    )
    hit_enemy = (
      (vx < 0) & (bx <= ENEMY_X + PAD_W) & (bx > ENEMY_X)
      & (by + BALL_H >= ey) & (by <= ey + PAD_H)
    )
    vx = jnp.where(hit_agent | hit_enemy, -vx, vx)
    bx = jnp.where(hit_agent, jnp.float32(AGENT_X - BALL_W), bx)
    bx = jnp.where(hit_enemy, jnp.float32(ENEMY_X + PAD_W), bx)
    # re-angle by hit offset (clamped), pong's control mechanic
    off_a = (by + BALL_H / 2.0 - (ay + PAD_H / 2.0)) / (PAD_H / 2.0)
    off_e = (by + BALL_H / 2.0 - (ey + PAD_H / 2.0)) / (PAD_H / 2.0)
    vy = jnp.where(hit_agent, jnp.clip(3.0 * off_a, -3.0, 3.0), vy)
    vy = jnp.where(hit_enemy, jnp.clip(3.0 * off_e, -3.0, 3.0), vy)

    # scoring: ball fully out either side
    agent_scores = bx < 0.0
    enemy_scores = bx > RAW_W - BALL_W
    scored = agent_scores | enemy_scores
    sbx, sby, svx, svy = cls._serve(key, toward_agent=enemy_scores)
    bx = jnp.where(scored, sbx, bx)
    by = jnp.where(scored, sby, by)
    vx = jnp.where(scored, svx, vx)
    vy = jnp.where(scored, svy, vy)
    reward = (
      agent_scores.astype(jnp.float32) - enemy_scores.astype(jnp.float32)
    )
    score = st["score"] + jnp.stack(
      [agent_scores.astype(jnp.int32), enemy_scores.astype(jnp.int32)]
    )
    out = dict(st, ay=ay, ey=ey, bx=bx, by=by, vx=vx, vy=vy, score=score)
    return out, reward

  # ---------------------------------------------------------------- env API

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    del state
    kserve, kside = jax.random.split(key)
    bx, by, vx, vy = cls._serve(kserve, jax.random.bernoulli(kside))
    mid = jnp.int32((TOP + BOT - PAD_H) // 2)
    st = {
      "ay": mid, "ey": mid, "bx": bx, "by": by, "vx": vx, "vy": vy,
      "score": jnp.zeros(2, jnp.int32),
    }
    frame = cls._frame(cfg, st)
    slot = cls._process(cfg, frame, frame)  # push-all on reset
    stack = jnp.tile(slot, (int(cfg.stack_num), 1, 1))
    st["stack"] = stack
    return st, stack, cls._info(st, 0.0)

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    action = action.reshape(())
    skip = int(cfg.frame_skip)
    keys = jax.random.split(key, skip)
    st = {k: v for k, v in state.items() if k != "stack"}
    reward = jnp.float32(0.0)
    frames = []
    # like the reference: act frame_skip times, grab only the last two
    # frames for the maxpool (atari_env.h:186-205)
    for i in range(skip):
      st, r = cls._advance(st, action, keys[i])
      reward = reward + r
      if i >= skip - 2:
        frames.append(cls._frame(cfg, st))
    if len(frames) == 1:  # frame_skip == 1
      frames = [frames[0], frames[0]]
    slot = cls._process(cfg, frames[0], frames[1])
    stack = img_ops.stack_push(
      state["stack"].reshape(
        int(cfg.stack_num), -1, int(cfg.img_height), int(cfg.img_width)
      ),
      slot,
    )
    st["stack"] = stack.reshape(
      int(cfg.stack_num) * slot.shape[0],
      int(cfg.img_height), int(cfg.img_width),
    )
    done = jnp.any(st["score"] >= WIN_SCORE)
    info_reward = reward
    if bool(cfg.reward_clip):
      reward = jnp.sign(reward)
    return (
      st, st["stack"], reward.astype(jnp.float32), done,
      cls._info(st, info_reward),
    )

  @classmethod
  def _info(cls, st: Dict[str, jax.Array], reward) -> Dict[str, Any]:
    return {
      "score": st["score"],
      "reward": jnp.float32(reward),
    }
