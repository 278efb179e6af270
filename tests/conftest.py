"""Test configuration: run everything on a faked 8-device CPU mesh.

The reference has no test suite at all (SURVEY.md §4); we test on CPU with
XLA device faking so multi-chip sharding logic is exercised without TPUs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin prepends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is set; force the faked CPU mesh explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: repeat test runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_flowmol")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
