"""ctypes bindings for the native runtime library (``native/``).

Provides the fast async multi-field snapshot writer (the AMReX
VisMF-parallel-I/O analog) and the droplet-profile quadratures (the
``externlib.H`` series-integral analog).  Falls back to numpy-only
behavior when the shared library is absent; :func:`ensure_built` invokes
make on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbflbm_native.so"))

_lib = None


def ensure_built(force: bool = False):
    """Build (if needed) and load the native library; returns it or None."""
    global _lib
    if _lib is not None and not force:
        return _lib
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "bflbm_native.cc"))
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if not os.path.exists(_LIB_PATH) or stale or force:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bflbm_writer_create.restype = ctypes.c_void_p
    lib.bflbm_writer_create.argtypes = [ctypes.c_int]
    lib.bflbm_writer_submit.restype = ctypes.c_int
    lib.bflbm_writer_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint32, ctypes.c_uint32]
    lib.bflbm_writer_flush.argtypes = [ctypes.c_void_p]
    lib.bflbm_writer_errors.restype = ctypes.c_int
    lib.bflbm_writer_errors.argtypes = [ctypes.c_void_p]
    lib.bflbm_writer_destroy.argtypes = [ctypes.c_void_p]
    lib.bflbm_write.restype = ctypes.c_int
    lib.bflbm_write.argtypes = lib.bflbm_writer_submit.argtypes[1:]
    lib.bflbm_read_header.restype = ctypes.c_int
    lib.bflbm_read_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64)]
    lib.bflbm_read_field.restype = ctypes.c_int
    lib.bflbm_read_field.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_char_p, ctypes.c_uint32]
    lib.bflbm_sech_moment.restype = ctypes.c_double
    lib.bflbm_sech_moment.argtypes = [ctypes.c_int, ctypes.c_int,
                                      ctypes.c_double, ctypes.c_double,
                                      ctypes.c_double]
    _lib = lib
    return _lib


def available() -> bool:
    return ensure_built() is not None


def _prep(names: Sequence[str], arrays: Sequence[np.ndarray]):
    arrs = [np.ascontiguousarray(a) for a in arrays]
    itemsize = arrs[0].dtype.itemsize
    assert all(a.dtype.itemsize == itemsize for a in arrs)
    assert all(a.shape == arrs[0].shape for a in arrs)
    shape = np.asarray(arrs[0].shape, dtype=np.uint64)
    ptrs = (ctypes.c_void_p * len(arrs))(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs])
    names_b = "\n".join(names).encode()
    return arrs, ptrs, names_b, shape, itemsize


class AsyncFieldWriter:
    """Background-thread snapshot writer; submit() returns immediately."""

    def __init__(self, nthreads: int = 2):
        lib = ensure_built()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.bflbm_writer_create(nthreads)

    def submit(self, path: str, names: Sequence[str],
               arrays: Sequence[np.ndarray]) -> None:
        arrs, ptrs, names_b, shape, itemsize = _prep(names, arrays)
        rc = self._lib.bflbm_writer_submit(
            self._h, path.encode(), names_b, ptrs, len(arrs),
            shape.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(shape), itemsize)
        if rc != 0:
            raise IOError(f"submit failed rc={rc}")

    def flush(self) -> None:
        self._lib.bflbm_writer_flush(self._h)
        errs = self._lib.bflbm_writer_errors(self._h)
        if errs:
            raise IOError(f"{errs} async writes failed")

    def close(self) -> None:
        if self._h:
            self.flush()
            self._lib.bflbm_writer_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_fields(path: str, fields: Dict[str, np.ndarray]) -> None:
    lib = ensure_built()
    if lib is None:
        raise RuntimeError("native library unavailable")
    names = list(fields)
    arrs, ptrs, names_b, shape, itemsize = _prep(names,
                                                 [fields[n] for n in names])
    rc = lib.bflbm_write(
        path.encode(), names_b, ptrs, len(arrs),
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(shape), itemsize)
    if rc != 0:
        raise IOError(f"write failed rc={rc}")


def read_fields(path: str) -> Dict[str, np.ndarray]:
    lib = ensure_built()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nf = ctypes.c_uint32()
    ndim = ctypes.c_uint32()
    shape = (ctypes.c_uint64 * 8)()
    rc = lib.bflbm_read_header(path.encode(), ctypes.byref(nf),
                               ctypes.byref(ndim), shape)
    if rc != 0:
        raise IOError(f"bad header rc={rc}")
    dims = tuple(shape[i] for i in range(ndim.value))
    cells = int(np.prod(dims))
    out: Dict[str, np.ndarray] = {}
    for i in range(nf.value):
        buf = np.empty(cells, dtype=np.float64)  # max itemsize
        name = ctypes.create_string_buffer(256)
        dt = lib.bflbm_read_field(path.encode(), i,
                                  buf.ctypes.data_as(ctypes.c_void_p),
                                  buf.nbytes, name, 256)
        if dt < 0:
            raise IOError(f"read field {i} failed rc={dt}")
        dtype = np.float32 if dt == 4 else np.float64
        arr = buf.view(np.uint8)[: cells * dt].view(dtype).reshape(dims)
        out[name.value.decode()] = arr.copy()
    return out


def sech_moment(n: int, p: int, radius: float, width: float,
                rmax: float) -> float:
    """Int_0^rmax x^n sech^p((x - R)/s) dx via native adaptive quadrature
    (the droplet-fit moments that externlib.H evaluates by series)."""
    lib = ensure_built()
    if lib is None:
        # numpy fallback
        x = np.linspace(0, rmax, 200001)
        se = 1.0 / np.cosh((x - radius) / width) ** p
        return float(np.trapezoid(x ** n * se, x))
    return float(lib.bflbm_sech_moment(n, p, radius, width, rmax))
