"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip shardings are validated on virtual CPU devices
(xla_force_host_platform_device_count), the JAX-recommended way to test
mesh code without hardware; real-chip perf is measured by bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
  ).strip()
# the ambient environment may pre-set JAX_PLATFORMS (e.g. to the tunneled
# TPU); tests MUST run on the virtual CPU mesh, so force-override.
os.environ["JAX_PLATFORMS"] = "cpu"

# persistent compilation cache: repeated suite runs skip recompiling the
# heavy physics programs (box2d walker etc.)
import jax

# jax may already be imported (e.g. by a pytest plugin), in which case it
# latched JAX_PLATFORMS at import; update the config directly too (works
# as long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/envpool_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
