"""ctypes binding to the native batch JPEG decoder (native/decode.cpp).

The native path does libjpeg decode + antialiased triangle-filter resize
across a thread pool — the cache-build fast path.  Falls back to the
PIL decoder (irp_tpu.data.pipeline.decode_to_rgb256) when the shared
library isn't built; build with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Installed package: setup.py compiles into irp_tpu/_native/.
    installed = os.path.join(pkg, "_native", "libirpdecode.so")
    if os.path.exists(installed):
        return installed
    # Dev checkout: built by `make -C native` at the repo root.
    return os.path.join(os.path.dirname(pkg), "native", "libirpdecode.so")


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.environ.get("IRP_DECODER_LIB", _lib_path())
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.irp_decode_resize_batch.restype = ctypes.c_int
        lib.irp_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_decoder_available() -> bool:
    return _load() is not None


def decode_batch_native(jpegs: Sequence[bytes], out_size: int = 256,
                        n_threads: int = 0, out=None):
    """Decode+resize a batch of JPEG byte strings.

    Returns (images (N,out,out,3) uint8, ok (N,) bool).  Raises if the
    native library is unavailable.  ``out`` (C-contiguous
    (N,out,out,3) uint8) decodes in place — rows whose ``ok`` is False
    are left untouched for the caller's fallback decoder.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder not built (make -C native)")
    n = len(jpegs)
    if out is None:
        out = np.zeros((n, out_size, out_size, 3), np.uint8)
    elif (out.shape != (n, out_size, out_size, 3) or out.dtype != np.uint8
          or not out.flags.c_contiguous):
        raise ValueError("out must be C-contiguous (N,out,out,3) uint8")
    ok = np.zeros(n, np.int32)
    buf_ptrs = (ctypes.c_char_p * n)(*jpegs)
    sizes = (ctypes.c_long * n)(*[len(b) for b in jpegs])
    lib.irp_decode_resize_batch(
        ctypes.cast(buf_ptrs, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(sizes, ctypes.POINTER(ctypes.c_long)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_size,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return out, ok.astype(bool)


def make_native_decoder(out_size: int = 256):
    """Per-sample decoder callable matching build_cache's ``decoder`` arg."""
    def decode_one(jpg: bytes, size: int = out_size):
        imgs, ok = decode_batch_native([jpg], size)
        if not ok[0]:
            raise ValueError("native JPEG decode failed")
        return imgs[0]
    return decode_one
