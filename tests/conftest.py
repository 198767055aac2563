"""Test configuration: force CPU with 8 virtual devices.

This environment's sitecustomize registers the axon TPU backend in every
python process and presets JAX_PLATFORMS=axon, so plain env setdefault does
not work: we override the env var AND the jax config before any backend is
initialized.  Tests must not touch the single tunneled TPU chip — two
processes contending for it deadlock, and CPU keeps tests deterministic and
parallel-safe.  The 8 virtual devices exercise the sharded code paths
(SURVEY.md section 4: same code runs unchanged on a real pod slice).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Strip the axon TPU pool claim entirely (verified-safe way to run a python
# process concurrently with the single TPU-holding process on this image).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # match TPU f32 semantics in tests
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", "tests must run on CPU"
