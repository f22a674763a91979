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

# NO persistent compile cache for tests.  This jaxlib's XLA:CPU AOT
# executable serialization is unstable on this box: loading entries
# written under different CPU tuning features segfaults
# (compilation_cache.get_executable_and_time), and after purging the
# cache a fresh WRITE segfaulted too (put_executable_and_time) —
# observed 2026-08-21 killing the whole pytest process mid-suite.  The
# r3 cache bought little anyway (shard_map partitioning time, not XLA
# compile, dominates the slow tests); correctness beats warm-ups.
# In-memory (per-process) jit caching is unaffected.
