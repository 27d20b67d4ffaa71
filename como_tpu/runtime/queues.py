"""Bounded drop-stale queues for the pipelined runtime.

Backed by the native C++ ring (native/como_runtime.cpp, via ctypes): the
native side moves 64-bit tokens without the GIL; Python keeps a
token -> object registry.  Falls back to a pure-Python implementation if
the shared library cannot be built (same semantics, used on constrained
hosts).  Semantics mirror the reference TupleTensorQueue
(como/utils/multiprocessing.py): blocking push with backpressure, pop
with timeout, pop_until_latest that drains and keeps only the newest.
"""

from __future__ import annotations

import ctypes
import itertools
import os
import subprocess
import threading
from collections import deque
from typing import Any, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libcomo_runtime.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.crq_create.restype = ctypes.c_void_p
    lib.crq_create.argtypes = [ctypes.c_int]
    lib.crq_push.restype = ctypes.c_int64
    lib.crq_push.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int,
                             ctypes.c_long]
    lib.crq_pop.restype = ctypes.c_int64
    lib.crq_pop.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.crq_pop_latest.restype = ctypes.c_int64
    lib.crq_pop_latest.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.POINTER(ctypes.c_uint64),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.crq_size.restype = ctypes.c_int
    lib.crq_size.argtypes = [ctypes.c_void_p]
    lib.crq_close.argtypes = [ctypes.c_void_p]
    lib.crq_destroy.argtypes = [ctypes.c_void_p]
    lib.crt_now.restype = ctypes.c_double
    lib.crt_sleep_until.argtypes = [ctypes.c_double]
    _LIB = lib
    return lib


class NativeQueue:
    """Bounded queue of Python objects over the native token ring."""

    def __init__(self, maxsize: int = 8):
        self._lib = _load_native()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable")
        self._h = self._lib.crq_create(maxsize)
        self._maxsize = maxsize
        self._objs: dict[int, Any] = {}
        self._next = itertools.count(1)
        self._reg_lock = threading.Lock()
        self._stale_buf = (ctypes.c_uint64 * maxsize)()

    def _register(self, obj) -> int:
        tok = next(self._next)
        with self._reg_lock:
            self._objs[tok] = obj
        return tok

    def _resolve(self, tok: int):
        with self._reg_lock:
            return self._objs.pop(tok, None)

    def push(self, obj, block: bool = True, timeout: Optional[float] = None):
        tok = self._register(obj)
        ms = int(timeout * 1000) if timeout else 0
        r = self._lib.crq_push(self._h, tok, 1 if block else 0, ms)
        if r == -2:  # closed / timed out while full
            self._resolve(tok)
            return False
        if r >= 0:   # drop-stale: release the displaced object
            self._resolve(int(r))
        return True

    def pop(self, timeout: Optional[float] = None):
        ms = -1 if timeout is None else int(timeout * 1000)
        tok = self._lib.crq_pop(self._h, ms)
        return None if tok < 0 else self._resolve(int(tok))

    def pop_until_latest(self, timeout: Optional[float] = None):
        ms = 0 if timeout is None else int(timeout * 1000)
        n = ctypes.c_int(0)
        tok = self._lib.crq_pop_latest(self._h, ms, self._stale_buf,
                                       ctypes.byref(n))
        for i in range(n.value):
            self._resolve(int(self._stale_buf[i]))
        return None if tok < 0 else self._resolve(int(tok))

    def qsize(self):
        return self._lib.crq_size(self._h)

    def close(self):
        self._lib.crq_close(self._h)


class PyQueue:
    """Pure-Python fallback with identical semantics."""

    def __init__(self, maxsize: int = 8):
        self._dq: deque = deque()
        self._maxsize = maxsize
        self._cv = threading.Condition()
        self._closed = False

    def push(self, obj, block: bool = True, timeout: Optional[float] = None):
        with self._cv:
            if block:
                ok = self._cv.wait_for(
                    lambda: len(self._dq) < self._maxsize or self._closed,
                    timeout)
                if self._closed or not ok:
                    return False
            elif len(self._dq) >= self._maxsize:
                self._dq.popleft()  # drop stale
            self._dq.append(obj)
            self._cv.notify_all()
            return True

    def pop(self, timeout: Optional[float] = None):
        with self._cv:
            self._cv.wait_for(lambda: self._dq or self._closed, timeout)
            if not self._dq:
                return None
            out = self._dq.popleft()
            self._cv.notify_all()
            return out

    def pop_until_latest(self, timeout: Optional[float] = None):
        with self._cv:
            if not self._dq and timeout:
                self._cv.wait_for(lambda: self._dq or self._closed, timeout)
            out = None
            while self._dq:
                out = self._dq.popleft()
            if out is not None:
                self._cv.notify_all()
            return out

    def qsize(self):
        with self._cv:
            return len(self._dq)

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()


def make_queue(maxsize: int = 8):
    try:
        return NativeQueue(maxsize)
    except Exception:
        return PyQueue(maxsize)


def monotonic_now() -> float:
    lib = _load_native()
    if lib is not None:
        return lib.crt_now()
    import time
    return time.monotonic()


def sleep_until(t_mono: float) -> None:
    lib = _load_native()
    if lib is not None:
        lib.crt_sleep_until(t_mono)
        return
    import time
    dt = t_mono - time.monotonic()
    if dt > 0:
        time.sleep(dt)
