"""Alignment tests: step our JAX dynamics and a float64 numpy re-derivation
of the gym/reference formulas side-by-side from identical forced states.

Mirrors the reference alignment strategy
(``envpool/mujoco/gym/mujoco_gym_align_test.py:42-60``): force both
implementations into the same physics state and compare one-step outputs.
Tolerances account for float32 (TPU-native) vs float64 integration.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envpool_tpu.envs.classic_control.acrobot import AcrobotEnv
from envpool_tpu.envs.classic_control.cartpole import CartPoleEnv
from envpool_tpu.envs.classic_control.mountain_car import (
  MountainCarContinuousEnv,
  MountainCarEnv,
)
from envpool_tpu.envs.classic_control.pendulum import PendulumEnv

KEY = jax.random.PRNGKey(0)


def _cartpole_ref(s, act):
  """float64 re-derivation of ``envpool/classic_control/cartpole.h:88-111``."""
  g, mc, mp, total, length = 9.8, 1.0, 0.1, 1.1, 0.5
  mpl, fmag, tau = mp * length, 10.0, 0.02
  x, x_dot, theta, theta_dot = [float(v) for v in s]
  force = fmag if act == 1 else -fmag
  costheta, sintheta = math.cos(theta), math.sin(theta)
  temp = (force + mpl * theta_dot**2 * sintheta) / total
  theta_acc = (g * sintheta - costheta * temp) / (
    length * (4.0 / 3.0 - mp * costheta**2 / total)
  )
  x_acc = temp - mpl * theta_acc * costheta / total
  x += tau * x_dot
  x_dot += tau * x_acc
  theta += tau * theta_dot
  theta_dot += tau * theta_acc
  term = (
    x < -2.4 or x > 2.4 or theta < -12 * 2 * math.pi / 360 or
    theta > 12 * 2 * math.pi / 360
  )
  return np.array([x, x_dot, theta, theta_dot]), term


@pytest.mark.parametrize("act", [0, 1])
def test_cartpole_align(act: int) -> None:
  cfg = None  # cartpole step ignores config
  rng = np.random.RandomState(42)
  for _ in range(50):
    s = rng.uniform(-0.2, 0.2, 4).astype(np.float32)
    state = {"s": jnp.asarray(s)}
    _, obs, rew, term, _ = CartPoleEnv.step(
      cfg, state, jnp.int32(act), KEY
    )
    ref, ref_term = _cartpole_ref(s, act)
    np.testing.assert_allclose(np.asarray(obs), ref, rtol=2e-5, atol=1e-6)
    assert bool(term) == ref_term


def test_pendulum_align() -> None:
  from collections import namedtuple
  cfg = namedtuple("C", ["version"])(0)
  rng = np.random.RandomState(0)
  for _ in range(50):
    theta = rng.uniform(-math.pi, math.pi)
    theta_dot = rng.uniform(-1, 1)
    u = rng.uniform(-2, 2)
    state = {
      "theta": jnp.float32(theta), "theta_dot": jnp.float32(theta_dot)
    }
    _, obs, rew, _, _ = PendulumEnv.step(
      cfg, state, jnp.array([u], jnp.float32), KEY
    )
    # float64 reference (``envpool/classic_control/pendulum.h:84-103``)
    cost = theta**2 + 0.1 * theta_dot**2 + 0.001 * u**2
    new_td = theta_dot + 3 * (10.0 / 2 * math.sin(theta) + u) * 0.05
    theta2 = theta + new_td * 0.05  # version 0
    td2 = np.clip(new_td, -8, 8)
    theta2 = (theta2 + math.pi) % (2 * math.pi) - math.pi
    ref = np.array([math.cos(theta2), math.sin(theta2), td2])
    np.testing.assert_allclose(np.asarray(obs), ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(rew), -cost, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", [0, 1, 2])
def test_mountain_car_align(act: int) -> None:
  rng = np.random.RandomState(1)
  for _ in range(50):
    pos = rng.uniform(-1.2, 0.6)
    vel = rng.uniform(-0.07, 0.07)
    state = {"pos": jnp.float32(pos), "vel": jnp.float32(vel)}
    _, obs, rew, term, _ = MountainCarEnv.step(
      None, state, jnp.int32(act), KEY
    )
    v = vel + (act - 1) * 0.001 - math.cos(3 * pos) * 0.0025
    v = np.clip(v, -0.07, 0.07)
    p = np.clip(pos + v, -1.2, 0.6)
    if p == -1.2 and v < 0:
      v = 0.0
    ref_term = p >= 0.5 and v >= 0
    np.testing.assert_allclose(
      np.asarray(obs), [p, v], rtol=1e-4, atol=1e-6
    )
    assert float(rew) == -1.0
    assert bool(term) == ref_term


def test_mountain_car_continuous_reward() -> None:
  state = {"pos": jnp.float32(0.44), "vel": jnp.float32(0.05)}
  _, obs, rew, term, _ = MountainCarContinuousEnv.step(
    None, state, jnp.array([0.5], jnp.float32), KEY
  )
  assert bool(term)  # crosses 0.45 easily with +vel
  np.testing.assert_allclose(float(rew), 100 - 0.1 * 0.25, rtol=1e-5)


def test_acrobot_rk4_sanity() -> None:
  """Energy-consistent small-step behavior + terminal condition."""
  s = jnp.array([0.05, -0.02, 0.01, 0.03, 0.0], jnp.float32)
  state = {"s": s}
  _, obs, rew, term, info = AcrobotEnv.step(None, state, jnp.int32(1), KEY)
  assert not bool(term)
  assert float(rew) == -1.0
  # hanging nearly straight down stays near down
  assert abs(float(info["state"][0])) < 0.5
  # terminal: both links up -> -cos(0)-cos(0) = -2 is NOT terminal;
  # links down from the pivot (theta1=pi) gives -cos(pi)-cos(pi)=2 > 1
  s_up = jnp.array([math.pi, 0.0, 0.0, 0.0, 0.0], jnp.float32)
  _, _, rew_up, term_up, _ = AcrobotEnv.step(
    None, {"s": s_up}, jnp.int32(1), KEY
  )
  assert bool(term_up)
  assert float(rew_up) == 0.0
