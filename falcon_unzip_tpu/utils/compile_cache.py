"""Persistent XLA/Mosaic compilation cache.

Every distinct device-program shape pays a compile — and on the tunneled
TPU the Pallas kernels pay a *serialized, server-side Mosaic* compile
that has dominated cold-start wall-clock (see models.aligner bucket
notes).  JAX's persistent compilation cache serializes the compiled
executable (including Mosaic custom calls) to disk, so every process
after the first skips straight to execution: measured on the axon
backend, a Pallas kernel's first call drops from ~0.4 s (trivial kernel;
tens of seconds for the big DP shapes) to ~0.03 s.

The reference has no analogue (its native binaries are AOT-compiled);
for a JIT-compiled framework the cache IS the AOT story, so the package
enables it at import (falcon_unzip_tpu.__init__) and the drivers/benches
re-assert it defensively.

NOTE: jax initializes its cache object lazily on FIRST use and ignores
later jax_compilation_cache_dir updates, so the import-time enable is
the one that sticks; everything must agree on default_dir().

Measured on the axon backend (cache at default_dir(), fresh process):
the placement-shape Pallas DP ("edit", W=512, 4096x4608, P=64) costs
~145 s cold (serialized server-side Mosaic compile) and ~10 s from the
cache — the persistent cache DOES cover Mosaic custom calls, because
the serialized executable embeds the compiled kernel binary.

Env overrides:
  FALCON_UNZIP_TPU_CACHE_DIR  — cache directory (default
                                ~/.cache/falcon_unzip_tpu/jax)
  FALCON_UNZIP_TPU_NO_CACHE   — set to disable entirely
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_enabled = False


def _host_tag() -> str:
    """8-hex fingerprint of the host CPU's feature flags.

    XLA:CPU entries are AOT-compiled FOR THE COMPILING MACHINE; loading
    an entry produced on a host with different vector extensions makes
    XLA warn about possible SIGILL and — measured in round 5 — changes
    float contraction enough to flip low-margin consensus columns.
    Salting the cache path with the feature set makes a foreign host's
    entries invisible instead of subtly wrong.  (TPU entries embed
    device binaries keyed by the accelerator, but they live alongside
    the CPU entries, so the whole directory is salted.)"""
    import hashlib
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha256(
        (platform.machine() + platform.processor()).encode()
    ).hexdigest()[:8]


def default_dir() -> str:
    return os.environ.get(
        "FALCON_UNZIP_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "falcon_unzip_tpu", f"xla-{_host_tag()}"))


def enable(cache_dir: str | None = None) -> bool:
    """Point jax at the persistent compilation cache (idempotent).

    Safe to call before or after backend initialization; concurrent
    processes share the directory (jax writes entries atomically).
    Returns True when the cache is active."""
    global _enabled
    if os.environ.get("FALCON_UNZIP_TPU_NO_CACHE"):
        return False
    if _enabled:
        return True
    cache_dir = cache_dir or default_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every entry: the tunneled Mosaic compiles we care about
        # are seconds-long, but small XLA helpers around them also add
        # dispatch latency on re-runs
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        _enabled = True
        logger.info("persistent compile cache at %s", cache_dir)
    except Exception as exc:  # never let caching break the pipeline
        logger.warning("compile cache unavailable: %s", exc)
        return False
    return True
