"""como_tpu — a TPU-native dense monocular SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of COMO
("Compact Mapping and Odometry", ECCV 2024, reference: edexheim/como):
real-time monocular visual odometry with a compact GP-regressed dense
geometry backend, built TPU-first:

  * functional core: all SLAM state lives in pytrees with *static* shapes;
    tracking and mapping steps are pure jitted functions,
  * hand-derived Jacobians on the hot path (verified against autodiff in
    tests), assembled with deterministic XLA scatter-adds,
  * Pallas kernels for the GP cross-covariance hot op,
  * host orchestration kept thin: frame decisions on host, all linear
    algebra on device,
  * a sequential engine (benchmark path) and a pipelined runtime
    (tracking/mapping decoupled, bounded drop-stale queues).

Package layout:
  geometry/  SE(3), camera, rigid transforms, log-depth, affine brightness
  ops/       image pyramids/gradients, bilinear sampling, masked linalg
  gp/        probability-product Matern kernel, greedy entropy sampler,
             GP depth predictor + distillation
  net/       DepthCov UNet (flax) + analytic structure-tensor prior
  odom/      frontend (IC tracking, two-frame SfM, correspondence) and
             backend (photometric BA, prior factors, linear system)
  runtime/   sequential + pipelined engines, queues
  data/      dataset loaders (TUM/Replica/ScanNet/synthetic)
  parallel/  device mesh / sharded BA linearization
"""

__version__ = "0.1.0"

import jax as _jax

# GN solvers and hand-derived Jacobian chains are f32 algorithms: on TPU the
# default matmul precision is bf16, which silently destroys them (observed:
# 3e-3 error on a 3x3 rotation product).  The framework therefore pins the
# default to full f32; hot MXU paths (the DepthCov UNet) opt in to bf16
# explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache for EVERY entry point (CLI included): the
# frame/insertion programs cost minutes to compile cold on the 1-core
# host, and a process without the cache recompiles all of them (measured:
# the CLI ran at 0.4 FPS — ~240 s of in-loop compiles — while scripts
# that set the cache ran the same engine at ~19-28 FPS).  Respect an
# existing setting (tests point this at a CPU-specific dir).
#
# The dir is keyed by a host fingerprint: XLA:CPU entries carry AOT
# machine code, and /tmp survives container migration across hosts —
# deserializing an entry compiled for another host is flagged by XLA as
# a SIGILL risk (observed in BENCH_r04's tail as the "machine features
# mismatch" warning; CPU programs ride this cache too because input
# acquisition is pinned to the host cpu backend).
#
# The fingerprint hashes the cpuinfo IDENTITY lines (vendor/family/
# model/stepping/model name), not just the feature flags: XLA derives
# pseudo-features like +prefer-no-gather/+prefer-no-scatter from LLVM's
# detected CPU *model* (gather/scatter are microcoded on some models),
# so two hosts with bitwise-identical `flags` lines can still produce
# incompatible AOT entries — observed round 5 as a flags-keyed cache
# replaying another host's +prefer-no-gather entries.


def _machine_tag() -> str:
    import hashlib

    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # first processor block has everything we need
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model", "model name",
                           "stepping", "flags"):
                    ident.append(line.strip())
    except OSError:
        pass
    if not ident:
        return "generic"
    return hashlib.sha1("\n".join(ident).encode()).hexdigest()[:12]


def cache_dir() -> str:
    """The host-keyed persistent compile-cache dir used by all entry points
    (v2: model-identity-keyed, see _machine_tag)."""
    return f"/tmp/jax_cache_v2_{_machine_tag()}"


if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir", cache_dir())
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Bound the cache, which as a side effect turns on jax.lru_cache's file
# locking: with the default unbounded cache, get()/put() take NO lock and
# put() is a non-atomic write_bytes — two processes sharing the dir can
# race a reader into a partially-written entry (the round-4 crash class:
# every observed suite segfault/abort happened with a second JAX process
# alive, never solo).  64 GiB >> the observed steady-state (~1 GiB), so
# eviction itself never triggers; we only want the lock.
_jax.config.update("jax_compilation_cache_max_size", 64 * 1024**3)

# Keep the host CPU backend available alongside the TPU plugin: input
# acquisition (synthetic ray-casts, image decode) must run on host, not
# ride the device tunnel (data/synthetic.py pins renders to it).  The
# environment pins JAX_PLATFORMS=<tpu-plugin> which HIDES the cpu
# backend; append it (first entry stays the default platform).
_plat = _jax.config.jax_platforms
if _plat and "cpu" not in _plat.split(","):
    try:
        _jax.config.update("jax_platforms", _plat + ",cpu")
    except RuntimeError:  # backends already initialized: leave as-is
        pass

# When CPU is only the auxiliary input-acquisition backend (default
# platform is a real accelerator), cap its codegen at AVX2.  XLA:CPU's
# default AVX-512 target adds the LLVM tuning flags prefer-no-scatter/
# prefer-no-gather to the AOT feature string, and the cache loader
# validates that string against host *cpuid* features — where tuning
# flags never appear — so EVERY persistent-cache reload of a CPU
# executable logs the scary "machine features mismatch / SIGILL"
# warning even minutes after being written on the same machine
# (root-caused round 5; reproduced with a 2-process write/reload).
# AVX2 entries carry no such flags and reload silently.  CPU-only
# processes (the test suite) keep full ISA: measured ~40% faster on
# the suite's compute mix, and cosmetic warnings don't matter there.
if _plat and not _plat.startswith("cpu"):
    import os as _os

    _xf = _os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in _xf:
        _os.environ["XLA_FLAGS"] = (_xf + " --xla_cpu_max_isa=AVX2").strip()
