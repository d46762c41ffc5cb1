"""ViZDoom combined-action discretization (wheel-free unit tests).

Parity checks against ``envpool/vizdoom/utils.h`` BuildActionSet semantics
and the invariants asserted by the reference's own test
(``vizdoom_test.py:101-124``): force_speed halves the set, each delta
button with num=11 multiplies it by 11.
"""

import numpy as np

from envpool_tpu.envs.vizdoom.action_set import BUTTONS, build_action_set


def test_exact_enumeration_single_plus_pair() -> None:
  # ATTACK is a free bit; MOVE_RIGHT/MOVE_LEFT are antagonists (<=1 on).
  rows = build_action_set(["ATTACK", "MOVE_RIGHT", "MOVE_LEFT"])
  expected = np.asarray([
    [0, 0, 0],
    [0, 1, 0],
    [0, 0, 1],
    [1, 0, 0],
    [1, 1, 0],
    [1, 0, 1],
  ], np.float64)
  np.testing.assert_array_equal(rows, expected)


def test_lone_pair_member_is_a_plain_button() -> None:
  # MOVE_RIGHT without MOVE_LEFT: plain on/off (factor 2, not 3)
  rows = build_action_set(["ATTACK", "MOVE_RIGHT"])
  assert len(rows) == 4


def test_force_speed_halves() -> None:
  buttons = ["ATTACK", "SPEED", "MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"]
  free = build_action_set(buttons, force_speed=False)
  forced = build_action_set(buttons, force_speed=True)
  assert len(free) == 2 * len(forced)
  assert (forced[:, 1] == 1.0).all()          # SPEED pinned on
  # forced set == the speed-on half of the free set, same order
  speed_on = free[free[:, 1] == 1.0]
  np.testing.assert_array_equal(forced, speed_on)


def test_weapon_select_group() -> None:
  # k weapon-select buttons contribute a factor k+1 (none or exactly one)
  rows = build_action_set(
    ["ATTACK", "SELECT_WEAPON1", "SELECT_WEAPON3", "SELECT_WEAPON5"]
  )
  assert len(rows) == 2 * (3 + 1)
  weap = rows[:, 1:]
  assert (weap.sum(axis=1) <= 1).all()
  # enumeration order: none first, then ascending weapon id (utils.h:63-73)
  np.testing.assert_array_equal(
    weap[:4], [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
  )


def test_delta_button_multiplies() -> None:
  buttons = ["ATTACK", "MOVE_FORWARD", "LOOK_UP_DOWN_DELTA"]
  base = build_action_set(buttons)
  d1 = build_action_set(
    buttons, delta_button_config={"LOOK_UP_DOWN_DELTA": [11, -10, 10]}
  )
  assert len(d1) == 11 * len(base)
  vals = np.unique(d1[:, 2])
  np.testing.assert_allclose(vals, np.arange(-10.0, 10.1, 2.0), atol=1e-5)

  buttons2 = buttons + ["MOVE_LEFT_RIGHT_DELTA"]
  d2 = build_action_set(
    buttons2,
    delta_button_config={
      "MOVE_LEFT_RIGHT_DELTA": [11, -10, 10],
      "LOOK_UP_DOWN_DELTA": [11, -10, 10],
    },
  )
  assert len(d2) == 121 * len(base)


def test_unconfigured_delta_is_inert() -> None:
  rows = build_action_set(["ATTACK", "TURN_LEFT_RIGHT_DELTA"])
  assert len(rows) == 2
  assert (rows[:, 1] == 0.0).all()


def test_antagonist_pairs_all() -> None:
  # every (id, id+1) pair in the reference's list caps at 3 options
  for first in ("MOVE_RIGHT", "MOVE_BACKWARD", "TURN_RIGHT", "LOOK_UP",
                "MOVE_UP", "SELECT_NEXT_WEAPON", "SELECT_NEXT_ITEM"):
    second = BUTTONS[BUTTONS.index(first) + 1]
    rows = build_action_set([first, second])
    assert len(rows) == 3, first
    assert (rows.sum(axis=1) <= 1).all()


def test_realistic_battle_set() -> None:
  # D3Battle-like: 2 pairs + 3 singles -> 3*3*2^3 = 72
  rows = build_action_set([
    "ATTACK", "USE", "SPEED",
    "MOVE_FORWARD", "MOVE_BACKWARD", "TURN_LEFT", "TURN_RIGHT",
  ])
  assert len(rows) == 2 ** 3 * 3 * 3
  assert rows.shape[1] == 7
  assert len(np.unique(rows, axis=0)) == len(rows)
