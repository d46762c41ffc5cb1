"""Toy-text alignment vs gymnasium's reference envs.

Counterpart of the reference's align-test tier (SURVEY §4.6) for the
deterministic tabular envs: identical action sequences must produce
identical observation/reward/termination streams.
"""

import gymnasium
import numpy as np

import envpool_tpu


def test_cliffwalking_alignment() -> None:
  ref = gymnasium.make("CliffWalking-v1").unwrapped
  ours = envpool_tpu.make_gymnasium("CliffWalking-v0", num_envs=1, seed=0)
  robs, _ = ref.reset(seed=0)
  oobs, _ = ours.reset()
  assert int(oobs[0]) == int(robs)
  rng = np.random.default_rng(3)
  for t in range(120):
    a = int(rng.integers(0, 4))
    robs, rrew, rterm, rtrunc, _ = ref.step(a)
    oobs, orew, oterm, otrunc, _ = ours.step(np.asarray([a], np.int32))
    assert int(oobs[0]) == int(robs), f"step {t}"
    assert float(orew[0]) == float(rrew), f"step {t}"
    assert bool(oterm[0]) == bool(rterm), f"step {t}"
    if rterm:
      robs, _ = ref.reset()
      # our pool auto-resets; next iteration continues both


def test_taxi_transition_alignment() -> None:
  """Taxi dynamics are deterministic given the decoded state; compare
  transitions from our env's decoded state against gymnasium's table."""
  ref = gymnasium.make("Taxi-v3").unwrapped
  ours = envpool_tpu.make_gymnasium("Taxi-v3", num_envs=8, seed=1)
  obs, _ = ours.reset()
  rng = np.random.default_rng(0)
  prev_done = np.zeros(8, bool)
  for t in range(60):
    acts = rng.integers(0, 6, 8)
    prev = obs.copy()
    obs, rew, term, trunc, info = ours.step(acts.astype(np.int32))
    for i in range(8):
      if prev_done[i]:
        continue  # this step was the pool auto-reset (action ignored)
      s = int(prev[i])
      transitions = ref.P[s][int(acts[i])]
      # deterministic env: single transition entry
      _, s2, r, done = transitions[0]
      assert int(obs[i]) == s2, (t, i)
      assert float(rew[i]) == float(r), (t, i)
      assert bool(term[i]) == bool(done), (t, i)
    prev_done = np.asarray(term | trunc)


def test_frozen_lake_map_holes() -> None:
  """FrozenLake hole/goal layout matches gymnasium's 4x4 map: stepping
  into a hole ends the episode with reward 0, goal gives 1."""
  ref = gymnasium.make("FrozenLake-v1", is_slippery=False).unwrapped
  desc = np.asarray([[c for c in row] for row in ref.desc.astype(str)])
  ours = envpool_tpu.make_gymnasium("FrozenLake-v1", num_envs=64, seed=0)
  obs, _ = ours.reset()
  rng = np.random.default_rng(1)
  for t in range(200):
    acts = rng.integers(0, 4, 64).astype(np.int32)
    obs, rew, term, trunc, _ = ours.step(acts)
    for i in np.nonzero(term & ~trunc)[0]:
      r, c = divmod(int(obs[i]), 4)
      cell = desc[r, c]
      assert cell in ("H", "G"), (t, i, cell)
      assert (rew[i] == 1.0) == (cell == "G")
