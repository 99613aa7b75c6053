"""Native (C++) host components and their ctypes bindings.

The reference implements its procgen annealer and component labeling in C
(``speedups_src/gen_board.c``, ``wrapped_label.c``); here the equivalents
live in ``annealer.cpp`` built as a shared library. The TPU compute path
never touches this — it is host-side level-generation machinery.

The library auto-builds on first import (g++ is part of the image); set
SAFELIFE_TPU_NO_NATIVE=1 to skip and use the (slow) Python fallbacks.
"""

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "annealer.cpp")
_LIB = os.path.join(_DIR, "libsafelife_native.so")
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if necessary) the native library. Raises
    NativeUnavailable when building is impossible."""
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if os.environ.get("SAFELIFE_TPU_NO_NATIVE"):
            raise NativeUnavailable("disabled via SAFELIFE_TPU_NO_NATIVE")
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            try:
                _build()
            except (OSError, subprocess.CalledProcessError) as e:
                raise NativeUnavailable("failed to build native library: %s"
                                        % e) from e
        lib = ctypes.CDLL(_LIB)
        lib.sl_gen_pattern.restype = ctypes.c_int
        lib.sl_gen_pattern.argtypes = [
            ctypes.c_void_p,  # layers uint16*
            ctypes.c_void_p,  # mask int32*
            ctypes.c_void_p,  # seeds int32*
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # period, rows, cols
            ctypes.c_double, ctypes.c_double,  # max_iter, min_fill
            ctypes.c_double, ctypes.c_double,  # temperature, osc_bonus
            ctypes.c_void_p,  # penalties double[8]
            ctypes.c_uint64,  # seed
        ]
        lib.sl_wrapped_label.restype = ctypes.c_int
        lib.sl_wrapped_label.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available():
    try:
        load()
        return True
    except NativeUnavailable:
        return False
