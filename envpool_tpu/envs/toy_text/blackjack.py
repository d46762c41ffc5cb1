"""Blackjack — pure-functional JAX dynamics.

Parity target: ``envpool/toy_text/blackjack.h:30-150`` (sutton-and-barto /
natural variants). Hands are dynamic lists in the reference; here they are
summarized by (raw sum, has-ace, natural) — sufficient statistics for every
observable and rule — so the state is fixed-shape. The dealer's stick-time
draw-out loop becomes a ``lax.while_loop``.

Cards are drawn uniform{1..13} capped at 10, matching ``DrawCard``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec


def _draw(key: jax.Array) -> jax.Array:
  return jnp.minimum(10, jax.random.randint(key, (), 1, 14, jnp.int32))


def _sum_hand(raw: jax.Array, has_ace: jax.Array) -> jax.Array:
  """Usable-ace total: +10 when an ace fits under 21."""
  return jnp.where(has_ace & (raw + 10 <= 21), raw + 10, raw)


def _usable_ace(raw: jax.Array, has_ace: jax.Array) -> jax.Array:
  return (has_ace & (raw + 10 <= 21)).astype(jnp.int32)


def _score(raw: jax.Array, has_ace: jax.Array) -> jax.Array:
  s = _sum_hand(raw, has_ace)
  return jnp.where(s > 21, 0, s)


class BlackjackEnv(FuncEnv):
  """Blackjack-v1."""

  name = "Blackjack"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"natural": False, "sab": True}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"obs": ArraySpec(np.int32, (3,), 0, 31)}

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 1)}

  @staticmethod
  def _obs(state: Dict[str, jax.Array]) -> jax.Array:
    return jnp.stack(
      [
        _sum_hand(state["p_raw"], state["p_ace"]),
        state["d_first"],
        _usable_ace(state["p_raw"], state["p_ace"]),
      ]
    ).astype(jnp.int32)

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    del state
    k = jax.random.split(key, 4)
    p1, p2 = _draw(k[0]), _draw(k[1])
    d1, d2 = _draw(k[2]), _draw(k[3])
    new = {
      "p_raw": p1 + p2,
      "p_ace": (p1 == 1) | (p2 == 1),
      "p_nat": ((p1 == 1) & (p2 == 10)) | ((p1 == 10) & (p2 == 1)),
      "d_raw": d1 + d2,
      "d_ace": (d1 == 1) | (d2 == 1),
      "d_nat": ((d1 == 1) & (d2 == 10)) | ((d1 == 10) & (d2 == 1)),
      "d_first": d1,
    }
    return new, cls._obs(new), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    hit = action.astype(jnp.int32) != 0
    k_hit, k_dealer = jax.random.split(key)

    # --- hit branch: one card to the player
    card = _draw(k_hit)
    p_raw_h = state["p_raw"] + card
    p_ace_h = state["p_ace"] | (card == 1)
    bust = _sum_hand(p_raw_h, p_ace_h) > 21

    # --- stick branch: dealer draws to 17+ (bounded while loop)
    def cond(c):
      raw, ace, _ = c
      return _sum_hand(raw, ace) < 17

    def body(c):
      raw, ace, kk = c
      kk, kd = jax.random.split(kk)
      cd = _draw(kd)
      return raw + cd, ace | (cd == 1), kk

    d_raw, d_ace, _ = jax.lax.while_loop(
      cond, body, (state["d_raw"], state["d_ace"], k_dealer)
    )
    p_score = _score(state["p_raw"], state["p_ace"])
    d_score = _score(d_raw, d_ace)
    stick_rew = (
      jnp.where(p_score > d_score, 1.0, 0.0) -
      jnp.where(p_score < d_score, 1.0, 0.0)
    )
    if cfg.sab:
      stick_rew = jnp.where(
        state["p_nat"] & ~state["d_nat"], 1.0, stick_rew
      )
    elif cfg.natural:
      stick_rew = jnp.where(
        state["p_nat"] & (stick_rew == 1.0), 1.5, stick_rew
      )

    new = {
      "p_raw": jnp.where(hit, p_raw_h, state["p_raw"]),
      "p_ace": jnp.where(hit, p_ace_h, state["p_ace"]),
      "p_nat": jnp.where(hit, False, state["p_nat"]),
      "d_raw": jnp.where(hit, state["d_raw"], d_raw),
      "d_ace": jnp.where(hit, state["d_ace"], d_ace),
      "d_nat": state["d_nat"],
      "d_first": state["d_first"],
    }
    term = jnp.where(hit, bust, True)
    reward = jnp.where(
      hit, jnp.where(bust, -1.0, 0.0), stick_rew
    ).astype(jnp.float32)
    return new, cls._obs(new), reward, term, {}
