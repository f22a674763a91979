"""Test configuration: force CPU backend with 8 virtual devices.

Per SURVEY.md §5 the sharded paths (shard_map block tables, halo exchange,
Schur psum) are exercised in CI on a virtual 8-device CPU mesh —
``shard_map`` is backend-agnostic so this is the same code path as real
ICI/DCN.

Note: this environment boots an `axon` TPU PJRT plugin in every process via
sitecustomize and sets JAX_PLATFORMS=axon, which overrides the usual env-var
route; `jax.config.update("jax_platforms", "cpu")` after import is the
reliable way to pin tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the shard_map raycast programs take minutes to
# partition on the virtual mesh; cache them across test runs/processes.
#
# The cache dir is keyed by a HOST FINGERPRINT (jax version + CPU flags):
# /tmp survives across sessions that may land on machines with different
# CPU tuning features, and XLA:CPU AOT executables loaded under
# mismatched features SEGFAULT the whole pytest process (observed
# 2026-08-21: `cpu_aot_loader` feature-mismatch warnings escalating to a
# hard SIGSEGV in compilation_cache.get_executable_and_time).
import hashlib


def _host_fingerprint() -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    h.update(line.encode())
                    break
    except OSError:
        pass
    return h.hexdigest()[:12]


jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_cache_ifusion_{_host_fingerprint()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
