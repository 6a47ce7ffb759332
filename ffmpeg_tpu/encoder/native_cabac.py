"""ctypes binding to the native CABAC encoder (native/encode.cc).

Drop-in replacement for the pure-Python ``CabacEncoder`` +
``ContextTable`` pair used by the stream generator: the arithmetic
engine and the 378 adaptive contexts live in C++, and whole
residual_coding() payloads are encoded in one call.  The Python
implementation (`bitstream/cabac.py`, `encoder/residual.py`) remains
the behavioural reference; `tests/test_cabac.py` asserts bin-exact
parity between the two.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None


def get_lib():
    """Load (building on demand) libvvc_host.so with encoder symbols."""
    global _lib
    if _lib is None:
        from ..models.vvc import host

        lib = host._get_lib()  # builds the .so on demand
        lib.vvce_new.restype = ctypes.c_void_p
        lib.vvce_free.argtypes = [ctypes.c_void_p]
        lib.vvce_init_states.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_int]
        lib.vvce_bin.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.vvce_bypass.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.vvce_bypass_bits.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                         ctypes.c_int]
        lib.vvce_terminate.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.vvce_copy_states.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vvce_finish.restype = ctypes.c_int
        lib.vvce_finish.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int]
        lib.vvce_residual.restype = ctypes.c_int
        lib.vvce_residual.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int32),
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int]
        lib.vvce_residual_ts.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int32),
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int]
        _lib = lib
    return _lib


def available() -> bool:
    if os.environ.get("FFMPEG_TPU_PY_CABAC"):
        return False
    try:
        get_lib()
        return True
    except Exception:  # noqa: BLE001 - toolchain missing -> python path
        return False


class _NativeStates:
    """A snapshot of the 378 adaptive contexts (held in a spare native
    encoder handle; only its state tables are ever used)."""

    def __init__(self, lib, src_h) -> None:
        self._lib = lib
        self._h = lib.vvce_new()
        lib.vvce_copy_states(self._h, src_h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vvce_free(self._h)
            self._h = None


class NativeCabac:
    """Same interface as ``CabacEncoder`` (the ``ctxs`` argument of
    ``encode`` is ignored: context state lives inside the handle)."""

    def __init__(self, qp: int, init_type: int) -> None:
        self._lib = get_lib()
        self._h = self._lib.vvce_new()
        self._lib.vvce_init_states(self._h, qp, init_type)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.vvce_free(self._h)
            self._h = None

    def encode(self, _ctxs, ctx: int, binval: int) -> None:
        self._lib.vvce_bin(self._h, ctx, binval)

    def bypass(self, binval: int) -> None:
        self._lib.vvce_bypass(self._h, binval)

    def bypass_bits(self, value: int, n: int) -> None:
        if n:
            self._lib.vvce_bypass_bits(self._h, value, n)

    def terminate(self, binval: int) -> None:
        self._lib.vvce_terminate(self._h, binval)

    # -- WPP context inheritance ---------------------------------------
    def save_states(self) -> "_NativeStates":
        return _NativeStates(self._lib, self._h)

    def load_states(self, s: "_NativeStates") -> None:
        self._lib.vvce_copy_states(self._h, s._h)

    def finish(self) -> tuple[bytes, int]:
        cap = self._lib.vvce_finish(self._h, None, 0)
        buf = (ctypes.c_uint8 * cap)()
        n = self._lib.vvce_finish(self._h, buf, cap)
        assert n >= 0, "native finish buffer overflow"
        return bytes(buf[:n]), n * 8

    # -- bulk residual coding -----------------------------------------
    def residual(self, coeffs: np.ndarray, c_idx: int, is_intra_slice: int,
                 dep_quant: int, sign_hiding: int) -> int:
        a = np.ascontiguousarray(coeffs, dtype=np.int32)
        h, w = a.shape
        return self._lib.vvce_residual(
            self._h, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w, h, c_idx, int(is_intra_slice), int(dep_quant),
            int(sign_hiding))

    def residual_ts(self, coeffs: np.ndarray, c_idx: int,
                    bdpcm: int) -> None:
        a = np.ascontiguousarray(coeffs, dtype=np.int32)
        h, w = a.shape
        self._lib.vvce_residual_ts(
            self._h, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w, h, c_idx, int(bdpcm))
