import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (multi-chip validated separately by dryrun_multichip).
#
# NOTE: the env presets a remote-TPU (axon) backend whose sitecustomize
# overrides JAX_PLATFORMS, so the env var alone is NOT enough — the config
# must be forced after importing jax, before any computation.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is COMPILE-bound (tiny models,
# but hundreds of distinct jits incl. 8-device shard_map programs — ~35 min
# cold on one core). Cached executables cut re-runs to minutes; the dir is
# machine-local (gitignored).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
