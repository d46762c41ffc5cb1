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
# ENVPOOL_TPU_TEST_PLATFORM escapes the override for tiers that are only
# meaningful on real hardware (the full f32 soak: CPU f32 dots are always
# true-f32, so only the chip exercises the MXU's bf16 truncation).
os.environ["JAX_PLATFORMS"] = os.environ.get(
  "ENVPOOL_TPU_TEST_PLATFORM", "cpu"
)

import jax

# jax may already be imported (e.g. by a pytest plugin), in which case it
# latched JAX_PLATFORMS at import; update the config directly too (works
# as long as no backend has been initialized yet).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: enabled only inside @isolated subprocess
# children (tests/_isolation.py) or when explicitly requested. This
# jaxlib's CPU backend corrupts its process after one very large compile
# — a second large compile OR a cache read in the same process then
# SIGSEGV/SIGABRTs inside XLA — so the big device-physics programs are
# compiled one-per-process and only those clean processes touch the
# cache. bench.py keeps its own cache: the TPU executable path does not
# exhibit the bug.
if (
  os.environ.get("ENVPOOL_TPU_ISOLATED_CHILD")
  or os.environ.get("ENVPOOL_TPU_TEST_CACHE")
):
  jax.config.update(
    "jax_compilation_cache_dir", "/tmp/envpool_tpu_jax_cache"
  )
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
