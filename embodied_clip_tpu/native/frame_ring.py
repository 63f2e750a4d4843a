"""ctypes binding for the C++ shared-memory frame ring (native/frame_ring.cpp).

Builds lazily with `make` on first use (g++ is in the image); if the toolchain or
shared library is unavailable, `frame_ring_available()` returns False and VectorEnv
falls back to piping frames — functionality is preserved, only the zero-copy path is
lost.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import uuid
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libframe_ring.so")

_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.fr_create.restype = ctypes.c_void_p
    lib.fr_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_long]
    lib.fr_attach.restype = ctypes.c_void_p
    lib.fr_attach.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_long]
    lib.fr_write.restype = None
    lib.fr_write.argtypes = [ctypes.c_void_p, ctypes.c_int,
                             ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long]
    lib.fr_read.restype = ctypes.c_long
    lib.fr_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long]
    lib.fr_close.restype = None
    lib.fr_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _lib = lib
    return lib


def frame_ring_available() -> bool:
    return _load() is not None


class FrameRing:
    """N fixed-size uint8 frame slots in POSIX shared memory (seqlock per slot)."""

    def __init__(self, handle, name: str, nslots: int, shape: Tuple[int, ...],
                 owner: bool):
        self._h = handle
        self.name = name
        self.nslots = nslots
        self.shape = tuple(shape)
        self.nbytes = int(np.prod(shape))
        self.owner = owner

    @classmethod
    def create(cls, nslots: int, shape: Tuple[int, ...]) -> "FrameRing":
        lib = _load()
        assert lib is not None, "native frame ring unavailable"
        name = f"/ect_ring_{os.getpid()}_{uuid.uuid4().hex[:8]}"
        nbytes = int(np.prod(shape))
        h = lib.fr_create(name.encode(), nslots, nbytes)
        assert h, "fr_create failed"
        return cls(h, name, nslots, shape, owner=True)

    @classmethod
    def attach(cls, name: str, nslots: int, shape: Tuple[int, ...]) -> "FrameRing":
        lib = _load()
        assert lib is not None
        nbytes = int(np.prod(shape))
        h = lib.fr_attach(name.encode(), nslots, nbytes)
        assert h, f"fr_attach({name}) failed"
        return cls(h, name, nslots, shape, owner=False)

    def attach_info(self):
        return (self.name, self.nslots, self.shape)

    def write(self, slot: int, frame: np.ndarray) -> None:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        assert frame.size == self.nbytes, (frame.shape, self.shape)
        ptr = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        _lib.fr_write(self._h, slot, ptr, frame.size)

    def read(self, slot: int) -> np.ndarray:
        out = np.empty(self.shape, dtype=np.uint8)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        seq = _lib.fr_read(self._h, slot, ptr, out.size)
        assert seq >= 0, "frame ring read failed"
        return out

    def read_batch(self) -> np.ndarray:
        """Assemble all slots into one contiguous (N, *shape) uint8 batch."""
        out = np.empty((self.nslots,) + self.shape, dtype=np.uint8)
        for i in range(self.nslots):
            ptr = out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            _lib.fr_read(self._h, i, ptr, out[i].size)
        return out

    def close(self) -> None:
        if self._h:
            _load().fr_close(self._h, 1 if self.owner else 0)
            self._h = None
