"""ctypes bridge to the native window-gather library (native/window_gather.c).

Builds the shared library on demand with the system compiler (cached under
``~/.cache/ae_wavenet_tpu``); every entry point has a numpy fallback so the
package works without a toolchain.  ctypes releases the GIL during the C
call, so the loader's producer thread overlaps device compute.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "window_gather.c")


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _source_path()
    cc = os.environ.get("CC") or shutil.which("cc") or shutil.which("gcc")
    if not os.path.exists(src) or cc is None:
        return None
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "ae_wavenet_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libwindow_gather.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", so, src, "-lm"],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.gather_windows_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.mu_encode_i16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def gather_windows(data: np.ndarray, offsets: np.ndarray, w: int) -> np.ndarray:
    """data: packed int16 (memmap ok); offsets: [n] int64 -> [n, w] int16."""
    n = len(offsets)
    if n and (offsets.min() < 0 or offsets.max() + w > data.size):
        raise IndexError("window offsets out of bounds for packed data")
    out = np.empty((n, w), np.int16)
    lib = _build_and_load()
    if lib is None:
        for i, o in enumerate(offsets):
            out[i] = data[o : o + w]
        return out
    offs = np.ascontiguousarray(offsets, np.int64)
    lib.gather_windows_i16(
        data.ctypes.data if isinstance(data, np.ndarray) else data,
        offs.ctypes.data, n, w, out.ctypes.data,
    )
    return out


def mu_encode_host(x: np.ndarray) -> np.ndarray:
    """int16 [-32768, 32767] -> uint8 mu-law ids (numpy fallback inside)."""
    lib = _build_and_load()
    x = np.ascontiguousarray(x, np.int16)
    if lib is None:
        from ae_wavenet_tpu.audio.mulaw import mu_encode_np

        return mu_encode_np(x.astype(np.float32) / 32768.0).astype(np.uint8)
    out = np.empty(x.shape, np.uint8)
    lib.mu_encode_i16(x.ctypes.data, x.size, out.ctypes.data)
    return out
