"""f32 soak tier: native-precision stability of the device physics.

The on-device MuJoCo/dmc families run their contact pipeline in f32 on
TPU — the precision every benchmark and training run actually uses —
while the parity tests force x64 states.  This tier closes that gap
(VERDICT r3 weak #1): every device MuJoCo/dmc model family rolls out
from a COLD reset under uniform random actions in default f32, and every
lane of state and observation must stay finite the whole way.  Reference
bar: ``mj_step`` never NaNs on these models from reset
(``/root/reference/envpool/mujoco/gym/mujoco_env.h:68-94``).

Scale: the full tier (>=1024 envs x >=2000 steps per family) is the
contract and runs in one process per family via the pool's compiled
``xla()`` rollout.  On the CI CPU mesh that is minutes per contact
family, so CI runs a reduced-scale pass by default and the full-scale
pass is enabled with ``ENVPOOL_TPU_SOAK=full`` (run on the real chip;
results recorded in STATUS.md).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _isolation import isolated

FULL = os.environ.get("ENVPOOL_TPU_SOAK", "") == "full"
NUM_ENVS = 1024 if FULL else 128
NUM_STEPS = 2000 if FULL else 300

# one representative per device model family (every distinct physics
# model in the tier; task layers on the same model share the pipeline)
GYM_TASKS = [
  "ReacherJax-v4",
  "InvertedPendulumJax-v4",
  "InvertedDoublePendulumJax-v4",
  "SwimmerJax-v4",
  "HalfCheetahJax-v4",
  "HopperJax-v4",
  "Walker2dJax-v4",
  "AntJax-v4",
  "HumanoidJax-v4",
  "HumanoidStandupJax-v4",
  "PusherJax-v4",
]
DMC_TASKS = [
  "PendulumJaxSwingup-v1",
  "CartpoleJaxBalance-v1",
  "CartpoleJaxThreePoles-v1",
  "AcrobotJaxSwingup-v1",
  "ReacherJaxEasy-v1",
  "PointMassJaxEasy-v1",
  "CheetahJaxRun-v1",
  "HopperJaxHop-v1",
  "WalkerJaxRun-v1",
  "SwimmerJaxSwimmer6-v1",
  "FishJaxSwim-v1",
  "FingerJaxSpin-v1",
  "BallInCupJaxCatch-v1",
  "HumanoidJaxRun-v1",
  "HumanoidCMUJaxRun-v1",
  "ManipulatorJaxBringBall-v1",
  "ManipulatorJaxInsertPeg-v1",
]


def _registered(task: str) -> bool:
  import envpool_tpu

  return task in envpool_tpu.list_all_envs()


def _soak(task: str, num_envs: int, steps: int) -> None:
  """Compiled rollout from cold reset; asserts all lanes finite."""
  import envpool_tpu

  env = envpool_tpu.make(
    task, env_type="gymnasium", num_envs=num_envs, seed=7
  )
  env.reset()
  handle0, recv, send, _ = env.xla()
  spec = env.spec.action_array_spec["action"]
  lo = np.broadcast_to(np.maximum(spec.minimum, -1.0), spec.static_shape)
  hi = np.broadcast_to(np.minimum(spec.maximum, 1.0), spec.static_shape)

  def rollout(handle, key):
    def body(carry, _):
      handle, key = carry
      key, sub = jax.random.split(key)
      action = jax.random.uniform(
        sub, (num_envs, *spec.static_shape), jnp.float32,
        jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
      )
      handle = send(handle, action)
      _, states = recv(handle)
      fin = jnp.ones((num_envs,), bool)
      for s in states:
        if jnp.issubdtype(s.dtype, jnp.floating):
          fin = fin & jnp.isfinite(s.reshape(s.shape[0], -1)).all(axis=1)
      return (handle, key), fin

    (handle, key), fins = jax.lax.scan(
      body, (handle, key), None, length=min(steps, 100)
    )
    return handle, key, fins

  # chunked rollout: one long device call can exceed the tunneled-TPU
  # per-RPC execution deadline (~100 s kills the worker — observed on
  # hopper at 1024x2000-in-one-call and humanoid_CMU at 250-step
  # chunks); 100-step chunks thread the handle through with identical
  # total coverage
  run = jax.jit(rollout, donate_argnums=0)
  handle, key = handle0, jax.random.PRNGKey(0)
  done_steps = 0
  while done_steps < steps:
    handle, key, fins = run(handle, key)
    fins = np.asarray(fins)  # [chunk, num_envs]
    bad_steps = np.where(~fins.all(axis=1))[0]
    assert fins.all(), (
      f"{task}: non-finite state/obs in "
      f"{int((~fins[bad_steps[0]]).sum())}/{num_envs} lanes "
      f"first at step {done_steps + int(bad_steps[0])} of {steps} "
      "(f32, cold reset, uniform random actions)"
    )
    done_steps += fins.shape[0]


@pytest.mark.parametrize("task", GYM_TASKS)
@isolated
def test_f32_soak_gym(task: str) -> None:
  if not _registered(task):
    pytest.skip(f"{task} not registered")
  _soak(task, NUM_ENVS, NUM_STEPS)


# programs this jaxlib's CPU compiler takes many minutes on (TPU: ~20 s)
_HEAVY = (
  "HumanoidJaxRun-v1", "HumanoidCMUJaxRun-v1",
  "ManipulatorJaxBringBall-v1", "ManipulatorJaxInsertPeg-v1",
)


@pytest.mark.parametrize("task", DMC_TASKS)
@isolated
def test_f32_soak_dmc(task: str) -> None:
  if not _registered(task):
    pytest.skip(f"{task} not registered")
  if task in _HEAVY and not FULL:
    pytest.skip(
      "CPU-compile-pathological model; soaked at full scale on the "
      "real chip (ENVPOOL_TPU_SOAK=full, results in STATUS.md)"
    )
  _soak(task, NUM_ENVS, NUM_STEPS)


@isolated
def test_cheetah_settle_reset_finite_f32() -> None:
  """CheetahJaxRun's 200-step settle reset must be finite in f32 at
  step 0 (r3: 28/32 envs NaNed out of the settle itself)."""
  import envpool_tpu

  env = envpool_tpu.make(
    "CheetahJaxRun-v1", env_type="gymnasium", num_envs=64, seed=0
  )
  obs, _ = env.reset()
  leaves = obs.values() if isinstance(obs, dict) else [obs]
  for leaf in leaves:
    assert np.isfinite(np.asarray(leaf, np.float64)).all(), (
      "non-finite observation straight out of reset"
    )
