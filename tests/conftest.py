"""Test config: run everything on a virtual 8-device CPU mesh so sharding tests work
without TPU hardware (SURVEY.md §4 test strategy)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from resuneta_tpu.utils.cpucache import cpu_cache_dir  # noqa: E402 (stdlib-only)

os.environ["JAX_PLATFORMS"] = "cpu"
# host-fingerprinted dir: /tmp/jax_cache entries from a previous host gen hang
# multi-device CPU collectives (see resuneta_tpu/utils/cpucache.py)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cpu_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout" not in flags:
    # Serialize the thunk scheduler (the concurrent one reorders independent
    # collectives differently per device thread -> in-process rendezvous
    # deadlock) and raise the 40 s rendezvous abort (few physical cores skew
    # virtual-device progress). See __graft_entry__.dryrun_multichip.
    flags += (" --xla_cpu_collective_timeout_seconds=3600"
              " --xla_cpu_enable_concurrency_optimized_scheduler=false")
os.environ["XLA_FLAGS"] = flags

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
