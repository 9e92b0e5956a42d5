"""ctypes bindings for the native runtime library (native/aefs_native.cpp).

Builds the .so on first use with g++ if it is missing; every consumer has a
pure-Python/NumPy fallback so the framework works without a compiler.

    from aefs_tpu import native
    native.available() -> bool
    native.json_f32_array(np_float32_1d) -> str   ('[v0,v1,...]')
    native.f32_to_i16 / i16_to_f32 / interleave
    native.b64encode / b64decode
    native.SpscRing(block_floats, capacity)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "aefs_native.cpp")
_SO = os.path.join(_HERE, "native", "libaefs_native.so")

_lib = None
_lock = threading.Lock()


def _build():
    # Portable flags by default: the .so is a first-use local build, but a
    # shared cache/NFS checkout can be loaded from a different CPU than the
    # one that built it, so ISA-specific codegen is opt-in
    # (AEFS_NATIVE_MARCH=native — or any -march= value — for hot local use).
    # Build to a per-pid temp name and os.replace into place: an
    # interrupted or concurrent build must never leave a truncated .so at
    # the final path — its mtime would be newer than the source, so the
    # rebuild check would trust it forever and every consumer would fall
    # back to Python silently.
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC]
    march = os.environ.get("AEFS_NATIVE_MARCH", "")
    if march:
        cmd.insert(2, f"-march={march}")
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        i64, f32p, i16p, u8p, charp = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_char_p,
        )
        lib.json_f32_array.restype = i64
        lib.json_f32_array.argtypes = [f32p, i64, ctypes.c_char_p]
        lib.f32_to_i16.argtypes = [f32p, i16p, i64]
        lib.i16_to_f32.argtypes = [i16p, f32p, i64]
        lib.interleave_f32.argtypes = [f32p, f32p, i64, i64]
        lib.b64_encode.restype = i64
        lib.b64_encode.argtypes = [u8p, i64, ctypes.c_char_p]
        lib.b64_decode.restype = i64
        lib.b64_decode.argtypes = [charp, i64, u8p]
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [i64, i64]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int32
        lib.ring_push.argtypes = [ctypes.c_void_p, f32p]
        lib.ring_pop.restype = i64
        lib.ring_pop.argtypes = [ctypes.c_void_p, f32p, i64]
        lib.ring_size.restype = i64
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_dropped.restype = i64
        lib.ring_dropped.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    try:
        return _load() is not None
    except Exception:
        return False


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def json_f32_array(arr) -> str:
    """float32 1-D array -> JSON list text (the plot-pump hot path)."""
    arr = np.ascontiguousarray(arr, np.float32)
    try:
        lib = _load()
    except Exception:
        vals = np.where(np.isfinite(arr), arr, 0.0)  # match the C path
        return "[" + ",".join(f"{float(v):.5g}" for v in vals) + "]"
    # +3, not +2: n=0 still writes '[', ']' and the terminating NUL
    buf = ctypes.create_string_buffer(arr.size * 16 + 3)
    n = lib.json_f32_array(_f32p(arr), arr.size, buf)
    return buf.raw[:n].decode("ascii")


def f32_to_i16(arr):
    arr = np.ascontiguousarray(arr, np.float32)
    try:
        lib = _load()
    except Exception:
        return (np.clip(arr, -1, 1) * 32767.0).astype(np.int16)
    out = np.empty(arr.shape, np.int16)
    lib.f32_to_i16(_f32p(arr), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), arr.size)
    return out


def i16_to_f32(arr):
    arr = np.ascontiguousarray(arr, np.int16)
    try:
        lib = _load()
    except Exception:
        return arr.astype(np.float32) / 32768.0
    out = np.empty(arr.shape, np.float32)
    lib.i16_to_f32(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), _f32p(out), arr.size)
    return out


def interleave(planes):
    """(C, N) channel-major float32 planes -> (N, C) interleaved frames."""
    planes = np.ascontiguousarray(planes, np.float32)
    if planes.ndim != 2:
        raise ValueError(f"interleave expects (C, N), got {planes.shape}")
    c, n = planes.shape
    try:
        lib = _load()
    except Exception:
        return np.ascontiguousarray(planes.T)
    out = np.empty((n, c), np.float32)
    lib.interleave_f32(_f32p(planes), _f32p(out), c, n)
    return out


def b64encode(data: bytes) -> bytes:
    try:
        lib = _load()
    except Exception:
        import base64

        return base64.b64encode(data)
    src = np.frombuffer(data, np.uint8)
    buf = ctypes.create_string_buffer((len(data) + 2) // 3 * 4 + 1)
    n = lib.b64_encode(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data), buf)
    return buf.raw[:n]


def b64decode(text) -> bytes:
    if isinstance(text, str):
        text = text.encode("ascii")
    try:
        lib = _load()
    except Exception:
        import base64

        return base64.b64decode(text)
    out = np.empty(len(text) * 3 // 4 + 3, np.uint8)
    n = lib.b64_decode(text, len(text), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[:n].tobytes()


class SpscRing:
    """Lock-free single-producer/single-consumer float32-block queue with
    drop-on-full semantics (native replacement for the plot-tap
    queue.Queue, core.py:99-106 / backend.py:80-83)."""

    def __init__(self, block_floats: int, capacity: int):
        self._h = None  # __del__ must be safe if init raises below
        self._lib = _load()
        self.block_floats = int(block_floats)
        self.capacity = int(capacity)
        if self.block_floats <= 0 or self.capacity <= 0:
            raise ValueError(
                f"SpscRing needs positive sizes, got block_floats="
                f"{self.block_floats}, capacity={self.capacity}")
        self._h = self._lib.ring_create(self.block_floats, self.capacity)
        if not self._h:  # C side also rejects overflow/alloc failure
            raise MemoryError(
                f"ring_create({self.block_floats}, {self.capacity}) failed")

    def push(self, block) -> bool:
        block = np.ascontiguousarray(block, np.float32)
        assert block.size == self.block_floats
        return bool(self._lib.ring_push(self._h, _f32p(block)))

    def pop(self, max_blocks: int):
        out = np.empty((max_blocks, self.block_floats), np.float32)
        n = self._lib.ring_pop(self._h, _f32p(out), max_blocks)
        return out[:n]

    def __len__(self):
        return int(self._lib.ring_size(self._h))

    @property
    def dropped(self) -> int:
        return int(self._lib.ring_dropped(self._h))

    def __del__(self):
        try:
            if self._h:
                self._lib.ring_destroy(self._h)
        except Exception:
            pass


class BlockQueue:
    """``queue.Queue``-shaped facade over :class:`SpscRing` for the plot
    taps: fixed-shape float32 blocks, drop-on-full (core.py:99-106
    semantics), lock-free across the audio-producer / sender-consumer
    thread pair.  Blocks of any other shape are dropped (raises
    ``queue.Full`` like a full queue would) so ragged test blocks can't
    corrupt the ring layout."""

    def __init__(self, block_shape, capacity: int):
        import math

        self.block_shape = tuple(int(d) for d in block_shape)
        self._ring = SpscRing(math.prod(self.block_shape), capacity)

    def put_nowait(self, block):
        import queue as _q

        block = np.asarray(block, np.float32)
        if block.shape != self.block_shape or not self._ring.push(block):
            raise _q.Full

    def get_nowait(self):
        import queue as _q

        out = self._ring.pop(1)
        if not len(out):
            raise _q.Empty
        return out[0].reshape(self.block_shape)

    def empty(self) -> bool:
        return len(self._ring) == 0

    def full(self) -> bool:
        """Producer-side capacity check (queue.Queue.full parity).  From
        the single producer this is conservative-exact: only the producer
        grows the ring, so not-full here guarantees the next push lands
        (the consumer can only make more room)."""
        return len(self._ring) >= self._ring.capacity

    def qsize(self) -> int:
        return len(self._ring)

    @property
    def dropped(self) -> int:
        return self._ring.dropped
