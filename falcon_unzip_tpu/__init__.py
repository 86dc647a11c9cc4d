"""falcon-unzip-tpu: TPU-native diploid unzip + polish framework.

Importing the package enables JAX's persistent compilation cache (keyed
by HLO hash, safe across processes) so the many fixed-shape bucket
programs of the aligner/overlapper/polisher compile once per machine,
not once per run.  The reference's analogue is pypeFLOW's "outputs
already exist → skip task" resume semantics applied to compiled code.

Opt out with FALCON_UNZIP_TPU_NO_CACHE=1; override the location with
FALCON_UNZIP_TPU_CACHE_DIR.
"""
import os as _os

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    if _os.environ.get("FALCON_UNZIP_TPU_NO_CACHE"):
        return
    cache = _os.environ.get(
        "FALCON_UNZIP_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache",
                      "falcon_unzip_tpu", "xla"))
    try:
        import jax
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()
