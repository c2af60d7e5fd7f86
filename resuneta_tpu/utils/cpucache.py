"""Host-fingerprinted JAX compilation-cache directory for CPU runs.

STDLIB-ONLY on purpose: callers (tests/conftest.py, __graft_entry__.py) must
set JAX_COMPILATION_CACHE_DIR before initializing jax, so this module cannot
pull jax in transitively.

Why: the driver re-provisions this container across sessions on different host
generations, and XLA:CPU's AOT cache entries record the compile machine's
feature set (including tuning prefs like prefer-no-gather). Loading an entry
compiled on a previous host gen doesn't just warn ("could lead to SIGILL") —
on multi-device CPU programs it produced per-device programs with mismatched
collective schedules that hang the in-process rendezvous (collective-permute /
all-to-all "only k of n arrived", exit 134; see CLAUDE.md). Keying the CPU
cache path by a hash of /proc/cpuinfo's feature flags makes cross-host-gen
reuse structurally impossible while keeping same-host caching fast.
"""

import hashlib


def cpu_cache_dir(base="/tmp/jax_cache_cpu"):
    """Cache dir namespaced by this host's CPU model + feature flags."""
    model = flags = b""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if not model and line.startswith(b"model name"):
                    model = line.strip()
                elif not flags and line.startswith(b"flags"):
                    flags = line.strip()
                if model and flags:
                    break
    except OSError:
        import platform

        model = (platform.machine() + platform.processor()).encode()
    return f"{base}_{hashlib.sha1(model + flags).hexdigest()[:12]}"
