"""Test configuration: force a virtual 8-device CPU mesh before JAX loads, so
sharding tests run without a TPU pod (SURVEY.md section 4 test plan).

The suite is hermetic-CPU by default: an ambient JAX_PLATFORMS=axon (the
tunnel-attached TPU) is overridden, and the axon plugin's site dir is
stripped from PYTHONPATH/sys.path — the plugin registers itself even under
JAX_PLATFORMS=cpu and stalls JAX init for minutes when the tunnel is down.
Set CAVIF_TPU_TEST_DEVICE=1 to run against the real accelerator instead
(the device-scoped tests skip on the CPU backend).
"""

import os
import sys

if not os.environ.get("CAVIF_TPU_TEST_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    if os.environ.get("PYTHONPATH"):
        # keep test subprocesses from re-registering the plugin
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in os.environ["PYTHONPATH"].split(os.pathsep)
            if "axon" not in p
        )
    sys.path[:] = [p for p in sys.path if "axon" not in p]
    if "jax" in sys.modules:
        # the plugin's sitecustomize imports jax at interpreter startup,
        # so the env var above is already cached — override the config
        import jax

        jax.config.update("jax_platforms", "cpu")
else:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compilation cache: tunnel-attached TPU compiles are slow
# (tens of seconds); cache them across test processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
