"""ctypes bindings for the native data-path library (tsv_reader.cpp).

Compiled lazily with g++ on first use and cached next to the source; falls
back cleanly (``AVAILABLE = False``) when no toolchain exists so the pure-
Python reader keeps working.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "tsv_reader.cpp")
_LIB = os.path.join(_DIR, "libtsv.so")
_lock = threading.Lock()
_lib = None
AVAILABLE = False


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        lib.tsv_open.restype = ctypes.c_void_p
        lib.tsv_open.argtypes = [ctypes.c_char_p]
        lib.tsv_num_rows.restype = ctypes.c_int64
        lib.tsv_num_rows.argtypes = [ctypes.c_void_p]
        lib.tsv_row_len.restype = ctypes.c_int64
        lib.tsv_row_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tsv_read_row.restype = ctypes.c_int64
        lib.tsv_read_row.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.tsv_close.argtypes = [ctypes.c_void_p]
        lib.tsv_rows_total_len.restype = ctypes.c_int64
        lib.tsv_rows_total_len.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.tsv_read_rows.restype = ctypes.c_int64
        lib.tsv_read_rows.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tsv_copy_offsets.restype = ctypes.c_int64
        lib.tsv_copy_offsets.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.b64_decode.restype = ctypes.c_int64
        lib.b64_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        AVAILABLE = True
        return lib


class NativeTsv:
    """mmap-indexed TSV file via the C++ library."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tsv library unavailable")
        self._lib = lib
        self._h = lib.tsv_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")
        self.n_rows = lib.tsv_num_rows(self._h)
        self._buf = ctypes.create_string_buffer(1 << 20)

    def row(self, i: int) -> str:
        n = self._lib.tsv_row_len(self._h, i)
        if n < 0:
            raise IndexError(i)
        if n > len(self._buf):
            self._buf = ctypes.create_string_buffer(n + 1024)
        got = self._lib.tsv_read_row(self._h, i, self._buf, len(self._buf))
        return self._buf.raw[:got].decode("utf-8")

    def rows(self, indices) -> list:
        """Batched row read: one C call for the whole batch.

        ~an order of magnitude fewer ctypes crossings than per-row ``row()``
        when assembling a training batch (ref hot loop:
        data/file_dataset.py:75-77 does a Python readline per example).
        """
        idx = np.ascontiguousarray(indices, np.int64)
        n = len(idx)
        if n == 0:
            return []
        idx_p = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        total = self._lib.tsv_rows_total_len(self._h, idx_p, n)
        if total < 0:
            raise IndexError(f"bad row in batch: {idx}")
        buf = ctypes.create_string_buffer(max(int(total), 1))
        lens = np.empty(n, np.int64)
        got = self._lib.tsv_read_rows(
            self._h, idx_p, n, buf, total,
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if got < 0:
            raise IndexError(f"bad row in batch: {idx}")
        raw = buf.raw
        out = []
        o = 0
        for ln in lens:
            out.append(raw[o : o + ln].decode("utf-8"))
            o += int(ln)
        return out

    def offsets(self) -> np.ndarray:
        out = np.empty(self.n_rows, np.int64)
        self._lib.tsv_copy_offsets(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), self.n_rows
        )
        return out

    def close(self):
        if self._h:
            self._lib.tsv_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def b64_decode(data: str) -> bytes:
    """urlsafe base64 → bytes via the native decoder."""
    lib = _load()
    raw = data.encode()
    out = (ctypes.c_uint8 * (len(raw) * 3 // 4 + 4))()
    n = lib.b64_decode(raw, len(raw), out)
    if n < 0:
        raise ValueError("invalid base64")
    return bytes(out[:n])


def available() -> bool:
    return _load() is not None
