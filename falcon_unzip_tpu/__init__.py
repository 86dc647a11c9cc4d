"""falcon-unzip-tpu: TPU-native diploid unzip + polish framework.

Importing the package enables JAX's persistent compilation cache (keyed
by HLO hash, safe across processes) so the many fixed-shape bucket
programs of the aligner/overlapper/polisher compile once per machine,
not once per run.  The reference's analogue is pypeFLOW's "outputs
already exist → skip task" resume semantics applied to compiled code.

Opt out with FALCON_UNZIP_TPU_NO_CACHE=1; override the location with
FALCON_UNZIP_TPU_CACHE_DIR.
"""
__version__ = "0.1.0"

from .utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()
