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
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# persistent compilation cache: repeated suite runs skip recompiling the
# heavy physics programs (box2d walker etc.)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/envpool_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
