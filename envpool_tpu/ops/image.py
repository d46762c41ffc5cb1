"""Image ops for obs pipelines — TPU-native replacements for OpenCV calls.

The reference processes frames per-env on CPU threads with OpenCV
(``envpool/utils/image_process.h:27-45``: ``cv::resize`` INTER_AREA and
``cv::cvtColor`` RGB2GRAY); here the same transforms are batched XLA ops on
the full ``[num_envs, ...]`` frame batch, so they fuse into the surrounding
env step and never touch the host.

INTER_AREA resize is implemented as a sparse matrix contraction: for a
fixed (in_h, in_w) -> (out_h, out_w) the pixel-area-overlap weights are a
constant, so the resize is two small matmuls ``W_h @ img @ W_w^T`` — which
XLA maps straight onto the MXU (the batched [B, H, W] case becomes two
batched GEMMs). This reproduces cv2.INTER_AREA exactly in float, then
rounds to uint8 the way OpenCV does.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights used by cv::COLOR_RGB2GRAY
_GRAY_W = np.asarray([0.299, 0.587, 0.114], dtype=np.float32)


@functools.lru_cache(maxsize=64)
def _area_weights(n_in: int, n_out: int) -> np.ndarray:
  """[n_out, n_in] pixel-area overlap weight matrix (rows sum to 1)."""
  scale = n_in / n_out
  w = np.zeros((n_out, n_in), dtype=np.float32)
  for o in range(n_out):
    lo = o * scale
    hi = (o + 1) * scale
    i0 = int(np.floor(lo))
    i1 = int(np.ceil(hi))
    for i in range(i0, min(i1, n_in)):
      overlap = min(hi, i + 1) - max(lo, i)
      if overlap > 0:
        w[o, i] = overlap / scale
  return w


def resize_area(
  img: jax.Array, out_hw: Tuple[int, int]
) -> jax.Array:
  """INTER_AREA resize of [..., H, W] (uint8 or float) to [..., h, w].

  Matches ``cv::resize(..., INTER_AREA)`` for downscaling (the Atari
  210x160 -> 84x84 path, ``envpool/atari/atari_env.h:117-121``).
  """
  h_out, w_out = out_hw
  h_in, w_in = img.shape[-2], img.shape[-1]
  wh = jnp.asarray(_area_weights(h_in, h_out))
  ww = jnp.asarray(_area_weights(w_in, w_out))
  x = img.astype(jnp.float32)
  # contract H then W: [..., h_out, W] then [..., h_out, w_out].
  # HIGHEST precision: the default TPU bf16 matmul truncation would shift
  # pixel sums across the .5 rounding boundary; these GEMMs are tiny.
  x = jnp.einsum(
    "oh,...hw->...ow", wh, x, precision=jax.lax.Precision.HIGHEST
  )
  x = jnp.einsum(
    "pw,...ow->...op", ww, x, precision=jax.lax.Precision.HIGHEST
  )
  if img.dtype == jnp.uint8:
    # OpenCV rounds half away from zero for uint8 saturation_cast
    x = jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(jnp.uint8)
  return x


def grayscale(img: jax.Array) -> jax.Array:
  """RGB [..., H, W, 3] -> gray [..., H, W] with BT.601 weights.

  Matches ``cv::cvtColor(COLOR_RGB2GRAY)``
  (``envpool/utils/image_process.h:41-45``).
  """
  x = jnp.einsum(
    "...c,c->...", img.astype(jnp.float32), jnp.asarray(_GRAY_W),
    precision=jax.lax.Precision.HIGHEST,
  )
  if img.dtype == jnp.uint8:
    x = jnp.clip(jnp.floor(x + 0.5), 0, 255).astype(jnp.uint8)
  return x


def max_last_two(a: jax.Array, b: jax.Array) -> jax.Array:
  """Elementwise max of the last two skipped frames
  (``envpool/atari/atari_env.h:269-276``)."""
  return jnp.maximum(a, b)


def stack_push(stack: jax.Array, frame: jax.Array) -> jax.Array:
  """Shift a [stack_num, ...] frame stack left and append ``frame``.

  Counterpart of the reference's stack_buf_ deque push
  (``envpool/atari/atari_env.h:281-287``).
  """
  return jnp.concatenate([stack[1:], frame[None]], axis=0)
