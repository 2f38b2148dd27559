"""lcpcga_tpu — TPU-native learned compression of point cloud geometry
and attributes in a single model.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
mic-rud/Learned-Compression-of-Point-Cloud-Geometry-and-Attributes
(arXiv:2408.00599), re-architected TPU-first: fixed-capacity sorted
sparse tensors, gather-GEMM sparse convolutions, jit-able entropy
models, a C++ rANS coder, and shard_map data parallelism.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: full-scale codec programs take ~10
# minutes to compile on the tunneled TPU backend; the cache makes every
# process after the first start warm (verified effective on axon).
# Opt out / redirect with $JAX_COMPILATION_CACHE_DIR or
# $LCPCGA_NO_COMPILE_CACHE.
import os as _os


def _cache_platform_ok() -> bool:
    """Only persist compiled executables for TPU backends.

    XLA:CPU AOT entries bake in the compile machine's CPU features;
    loading them on a different host fails the feature check (or risks
    SIGILL) and re-compiles every program — which is what timed out the
    round-2 multichip dryrun. The CPU paths (tests, virtual-device
    dryruns) compile fast anyway, so the cache only helps on TPU.
    """
    plats = _os.environ.get("JAX_PLATFORMS", "")
    if plats and all(p.strip() in ("cpu",) for p in plats.split(",") if p.strip()):
        return False
    if "host_platform_device_count" in _os.environ.get("XLA_FLAGS", ""):
        return False
    return True


if not _os.environ.get("LCPCGA_NO_COMPILE_CACHE") and _cache_platform_ok():
    try:
        import jax as _jax

        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/lcpcga_jax"),
        )
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
