"""ctypes binding for the native droplet kernels (tnax/native/droplets.c).

The shared library is compiled on first use with the system C compiler and
cached next to the source (rebuilt when the source is newer). Everything
degrades gracefully: if no compiler is available, ``lib()`` returns None
and `tnax.spectrum` keeps its NumPy implementations.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sysconfig

import numpy as np

logger = logging.getLogger("tnax")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "droplets.c")
_SO = os.path.join(_HERE, "_droplets.so")
_LIB = None
_TRIED = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")


def _build():
    cc = os.environ.get("CC") or sysconfig.get_config_var("CC") or "cc"
    # link to a temp file and rename: overwriting the .so in place would
    # truncate pages mapped by a concurrently running process (SIGBUS)
    tmp = _SO + ".%d.tmp" % os.getpid()
    cmd = cc.split() + ["-O2", "-shared", "-fPIC", "-o", tmp, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)


def lib():
    """The loaded library, building it if needed; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TNAX_NATIVE", "1") == "0":
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        L = ctypes.CDLL(_SO)
        L.tnax_hd_pair_ising.restype = ctypes.c_int64
        L.tnax_hd_pair_ising.argtypes = [_i64p, _i64p, ctypes.c_int64,
                                         _i64p, _i64p, ctypes.c_int64]
        L.tnax_hd_pair_rmf.restype = ctypes.c_int64
        L.tnax_hd_pair_rmf.argtypes = L.tnax_hd_pair_ising.argtypes
        L.tnax_merge_shapes.restype = ctypes.c_int64
        L.tnax_merge_shapes.argtypes = [_i64p, _i64p, ctypes.c_int64,
                                        _i64p, _i64p, ctypes.c_int64,
                                        _i64p, _i64p]
        L.tnax_overlap.restype = ctypes.c_int
        L.tnax_overlap.argtypes = [_u64p, _u64p, ctypes.c_int64]
        L.tnax_or_rows.restype = None
        L.tnax_or_rows.argtypes = [_u64p, ctypes.c_int64, _i64p,
                                   ctypes.c_int64, _u64p]
        L.tnax_elementary.restype = ctypes.c_int
        L.tnax_elementary.argtypes = [_u64p, ctypes.c_int64, _i64p,
                                      ctypes.c_int64]
        # raw pointers: ndpointer validation costs ~50 us/call in
        # ctypes, and this kernel is called once per droplet
        L.tnax_spins.restype = ctypes.c_int64
        L.tnax_spins.argtypes = [ctypes.c_void_p] * 5 \
            + [ctypes.c_int64, ctypes.c_void_p]
        L.tnax_elem_batch.restype = ctypes.c_int
        L.tnax_elem_batch.argtypes = [ctypes.c_void_p] * 4 \
            + [ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
               ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
               ctypes.c_void_p]
        L.tnax_unpack_v2.restype = ctypes.c_int64
        L.tnax_unpack_v2.argtypes = [ctypes.c_void_p] * 6 \
            + [ctypes.c_int64] * 3 + [ctypes.c_double, ctypes.c_int64,
                                      ctypes.c_int]
        L.tnax_unpack_flip_total.restype = ctypes.c_int64
        L.tnax_unpack_flip_total.argtypes = []
        L.tnax_unpack_fetch.restype = None
        L.tnax_unpack_fetch.argtypes = [ctypes.c_void_p] * 3
        _LIB = L
    except Exception as e:  # pragma: no cover - no toolchain
        logger.info("native droplet kernels unavailable (%s); "
                    "using NumPy fallbacks", e)
        _LIB = None
    return _LIB
