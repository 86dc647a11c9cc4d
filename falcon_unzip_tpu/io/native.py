"""ctypes bindings for the native IO library (libfalcon_io.so).

Loads the C++ FASTX parser when built (``make -C falcon_unzip_tpu/native``)
and transparently builds it on first use if a compiler is available.
``read_fasta_native`` mirrors io.fasta.read_fasta (same SeqBatch output,
conformance-tested); callers fall back to the pure-Python path when the
library is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..seq import SeqBatch

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfalcon_io.so")

_lib = None


class _FastxResult(ctypes.Structure):
    _fields_ = [
        ("seq", ctypes.POINTER(ctypes.c_int8)),
        ("offsets", ctypes.POINTER(ctypes.c_int64)),
        ("names", ctypes.POINTER(ctypes.c_char)),
        ("names_len", ctypes.c_int64),
        ("n", ctypes.c_int64),
        ("total", ctypes.c_int64),
        ("quals", ctypes.POINTER(ctypes.c_char)),
    ]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fastx_parse.argtypes = [ctypes.c_char_p]
    lib.fastx_parse.restype = ctypes.POINTER(_FastxResult)
    lib.fastx_free.argtypes = [ctypes.POINTER(_FastxResult)]
    lib.fastx_free.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def read_fasta_native(path: str, align: int = 128) -> SeqBatch:
    """Parse FASTA/FASTQ via the C++ library -> SeqBatch."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    rp = lib.fastx_parse(path.encode())
    if not rp:
        raise IOError(f"fastx_parse failed for {path}")
    try:
        r = rp.contents
        n = int(r.n)
        total = int(r.total)
        offsets = np.ctypeslib.as_array(r.offsets, shape=(n + 1,)).copy()
        flat = np.ctypeslib.as_array(r.seq, shape=(max(total, 1),)).copy()
        names_blob = ctypes.string_at(r.names, r.names_len)
        names = names_blob.decode("ascii").split("\x00")[:n] if n else []
        seqs = [flat[offsets[i]:offsets[i + 1]] for i in range(n)]
        return SeqBatch.from_strs(seqs, names=names, align=align)
    finally:
        lib.fastx_free(rp)
