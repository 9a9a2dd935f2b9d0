import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (multi-chip validated separately by dryrun_multichip).
os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU tunnel); force CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
