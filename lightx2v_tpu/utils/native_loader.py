"""ctypes bindings for the native safetensors reader (csrc/safetensors_reader.cpp).

``load_file_native(path)`` parses the JSON header in Python, madvise-
prefetches the data section, and materializes all tensors with the C++
thread pool (parallel memcpy / bf16 widening from the page cache).
Falls back to the pure-Python reader when the shared library is missing
(build with ``csrc/build.sh``).
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
from typing import Dict, Optional

import ml_dtypes
import numpy as np

from . import safetensors_io as st_py

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_native", "libsafetensors_reader.so")
_lib = None


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # try to build on first use
        build = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc", "build.sh")
        if os.path.exists(build):
            os.system(f"sh {build} >/dev/null 2>&1")
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_close.argtypes = [ctypes.c_void_p]
    lib.st_header_len.restype = ctypes.c_uint64
    lib.st_header_len.argtypes = [ctypes.c_void_p]
    lib.st_header_ptr.restype = ctypes.POINTER(ctypes.c_char)
    lib.st_header_ptr.argtypes = [ctypes.c_void_p]
    lib.st_data_size.restype = ctypes.c_uint64
    lib.st_data_size.argtypes = [ctypes.c_void_p]
    lib.st_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.st_read_multi.restype = ctypes.c_int
    lib.st_read_multi.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _get_lib() is not None


def load_file_native(path: str, num_threads: int = 8, widen_bf16: bool = False) -> Dict[str, np.ndarray]:
    """Parallel load of one safetensors file. With ``widen_bf16`` bf16
    tensors come back as fp32 (widened in the native pool)."""
    lib = _get_lib()
    if lib is None:
        return st_py.load_file(path)
    h = lib.st_open(path.encode())
    if not h:
        raise IOError(f"st_open failed: {path}")
    try:
        hlen = lib.st_header_len(h)
        header = json.loads(ctypes.string_at(lib.st_header_ptr(h), hlen))
        header.pop("__metadata__", None)
        lib.st_prefetch(h, 0, lib.st_data_size(h))

        data_size = lib.st_data_size(h)
        names, offs, sizes, dsts, widens, arrays = [], [], [], [], [], []
        for name, ent in header.items():
            dt = np.dtype(st_py._DTYPES[ent["dtype"]])
            begin, end = ent["data_offsets"]
            # Cross-check the header before handing raw pointers to C++: a
            # corrupt/malicious header whose data_offsets span disagrees with
            # shape*itemsize would otherwise overflow the numpy buffer.
            nbytes = int(np.prod(ent["shape"], dtype=np.int64)) * dt.itemsize
            if begin < 0 or end < begin or end - begin != nbytes or end > data_size:
                raise IOError(
                    f"corrupt safetensors header for {name!r} in {path}: "
                    f"data_offsets [{begin},{end}) vs shape {ent['shape']} dtype {ent['dtype']}"
                )
            widen = bool(widen_bf16 and dt == np.dtype(ml_dtypes.bfloat16))
            out_dt = np.float32 if widen else dt
            arr = np.empty(ent["shape"], out_dt)
            assert arr.nbytes == (nbytes * 2 if widen else nbytes)
            names.append(name)
            offs.append(begin)
            sizes.append(end - begin)
            dsts.append(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            widens.append(1 if widen else 0)
            arrays.append(arr)

        n = len(names)
        rc = lib.st_read_multi(
            h, n,
            (ctypes.c_uint64 * n)(*offs),
            (ctypes.c_uint64 * n)(*sizes),
            (ctypes.POINTER(ctypes.c_uint8) * n)(*dsts),
            (ctypes.c_int32 * n)(*widens),
            num_threads,
        )
        if rc != 0:
            raise IOError(f"st_read_multi failed: {path}")
        return dict(zip(names, arrays))
    finally:
        lib.st_close(h)
