"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (per the build-plan contract)."""

import os

# Force override: the shell env may pin JAX_PLATFORMS to the TPU tunnel
# (axon); tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU PJRT plugin at interpreter
# startup, so the env var alone is not enough — force the platform via the
# config API too (backend is not initialized until first use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: compiles are expensive on the 1-core host.
# The dir is keyed by the host's cpuinfo IDENTITY (model, not just flags):
# XLA:CPU caches AOT machine code, /tmp survives container migration
# across hosts, and XLA derives model-dependent pseudo-features
# (+prefer-no-gather/scatter) — loading an entry compiled for another
# host SIGILLs/segfaults (observed as mid-suite cpu_aot_loader crashes;
# a flags-only key collided across hosts in round 5).  Shared with the
# product entry points: como_tpu._machine_tag.
from como_tpu import _machine_tag  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_cpu_v2_{_machine_tag()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
