"""ctypes bindings for the native shard I/O library (libvixshardio.so).

Auto-builds via the adjacent Makefile on first import when a toolchain is
present; `available()` gates every use so the pure-numpy fallback in
shard_format.py always works.
"""

from __future__ import annotations

import contextlib
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
        lib.vix_mmap_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.vix_mmap_open.restype = ctypes.c_void_p
        lib.vix_mmap_close.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.vix_mmap_close.restype = ctypes.c_int
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


def read_file(path: str, offset: int = 0, size: int | None = None) -> bytes:
    lib = _load()
    if size is None:
        total = lib.vix_file_size(path.encode())
        if total < 0:
            raise OSError(-total, os.strerror(-total), path)
        size = max(int(total) - offset, 0)
    buf = (ctypes.c_uint8 * size)()
    got = lib.vix_read_file(path.encode(), buf, offset, size)
    if got < 0:
        raise OSError(-got, os.strerror(-got), path)
    return bytes(bytearray(buf)[: int(got)])


@contextlib.contextmanager
def mmap_view(path: str):
    """Zero-copy read-only view of a file (MADV_SEQUENTIAL|WILLNEED).

    Yields a read-only memoryview over the mapping; the mapping is released
    on exit, so callers must copy anything they keep (the shard parsers
    already .copy() every array they return)."""
    lib = _load()
    size = ctypes.c_uint64(0)
    addr = lib.vix_mmap_open(path.encode(), ctypes.byref(size))
    if not addr:
        raise OSError(f"mmap failed: {path}")
    try:
        arr = (ctypes.c_uint8 * size.value).from_address(addr)
        yield memoryview(arr).toreadonly()
    finally:
        lib.vix_mmap_close(addr, size)
