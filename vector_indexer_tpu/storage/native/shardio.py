"""ctypes bindings for the native shard I/O library (libvixshardio.so).

Auto-builds via the adjacent Makefile on first import when a toolchain is
present; `available()` gates every use so the pure-numpy fallback in
shard_format.py always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvixshardio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.vix_write_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint64,
        ]
        lib.vix_write_file.restype = ctypes.c_int
        lib.vix_file_size.argtypes = [ctypes.c_char_p]
        lib.vix_file_size.restype = ctypes.c_int64
        lib.vix_read_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        lib.vix_read_file.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def write_file(path: str, data: bytes) -> None:
    lib = _load()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    rc = lib.vix_write_file(path.encode(), buf, len(data))
    if rc != 0:
        raise OSError(-rc, os.strerror(-rc), path)


def read_file(path: str) -> bytes:
    lib = _load()
    size = lib.vix_file_size(path.encode())
    if size < 0:
        raise OSError(-size, os.strerror(-size), path)
    buf = (ctypes.c_uint8 * size)()
    got = lib.vix_read_file(path.encode(), buf, 0, size)
    if got < 0:
        raise OSError(-got, os.strerror(-got), path)
    return bytes(bytearray(buf)[: int(got)])
