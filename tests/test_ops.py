"""Image op tests: INTER_AREA resize & grayscale vs numpy references.

Counterpart of the reference's resize-equivalence test against cv2
(``envpool/atari/atari_envpool_test.py:221-240``) — cv2 is not a dependency
here, so the oracle is a direct numpy implementation of the same math.
"""

import numpy as np
import jax.numpy as jnp

from envpool_tpu.ops import grayscale, max_last_two, resize_area, stack_push


def _area_resize_np(img: np.ndarray, out_hw) -> np.ndarray:
  """Naive pixel-area-average reference (exact for integer scale factors)."""
  h, w = img.shape[-2:]
  oh, ow = out_hw
  fh, fw = h // oh, w // ow
  x = img.astype(np.float64).reshape(*img.shape[:-2], oh, fh, ow, fw)
  x = x.mean(axis=(-3, -1))
  return np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)


def test_resize_integer_factor() -> None:
  rng = np.random.default_rng(0)
  img = rng.integers(0, 256, size=(3, 84 * 2, 84 * 2), dtype=np.uint8)
  out = np.asarray(resize_area(jnp.asarray(img), (84, 84)))
  ref = _area_resize_np(img, (84, 84))
  # float rounding at .5 boundaries may differ by 1 count in rare cases
  assert np.mean(np.abs(out.astype(int) - ref.astype(int)) <= 1) == 1.0
  assert np.mean(out == ref) > 0.99


def test_resize_non_integer_factor_rows_sum() -> None:
  img = np.full((210, 160), 37, np.uint8)
  out = np.asarray(resize_area(jnp.asarray(img), (84, 84)))
  # area weights partition unity: constant image stays constant
  assert np.all(out == 37)


def test_grayscale() -> None:
  rng = np.random.default_rng(1)
  img = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
  out = np.asarray(grayscale(jnp.asarray(img)))
  ref = np.clip(
    np.floor(img.astype(np.float64) @ [0.299, 0.587, 0.114] + 0.5), 0, 255
  ).astype(np.uint8)
  assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1


def test_maxpool_and_stack() -> None:
  a = jnp.asarray([[1, 5]], jnp.uint8)
  b = jnp.asarray([[3, 2]], jnp.uint8)
  np.testing.assert_array_equal(np.asarray(max_last_two(a, b)), [[3, 5]])
  stack = jnp.zeros((4, 2, 2), jnp.uint8)
  frame = jnp.ones((2, 2), jnp.uint8)
  out = stack_push(stack, frame)
  assert np.all(np.asarray(out[-1]) == 1)
  assert np.all(np.asarray(out[:-1]) == 0)
