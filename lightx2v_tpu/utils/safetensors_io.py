"""Minimal, dependency-free safetensors reader/writer.

Format: 8-byte little-endian header length N, then N bytes of JSON
(``{name: {dtype, shape, data_offsets: [begin, end]}}``, optional
``__metadata__``), then the raw tensor bytes. Reads are zero-copy views
over a single mmap; bf16/fp8 map to ml_dtypes. This mirrors the loading
surface of the reference (safetensors checkpoints, sharded index.json,
per-block split layout; reference: lightx2v/models/networks/wan/model.py:77-144)
while staying numpy-native so the arrays can be fed to ``jax.device_put``
without a torch hop.

A C++ fast-path (csrc/safetensors) provides the same parse for the native
runtime; this module is the canonical fallback.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Any, Dict, Iterator, List, Optional, Tuple

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
}
_DTYPES_INV = {np.dtype(v): k for k, v in _DTYPES.items()}


def _dtype_name(arr: np.ndarray) -> str:
    try:
        return _DTYPES_INV[arr.dtype]
    except KeyError as e:
        raise ValueError(f"unsupported dtype for safetensors: {arr.dtype}") from e


class SafetensorsFile:
    """Lazily-indexed single safetensors file backed by mmap."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        (header_len,) = struct.unpack("<Q", self._mm[:8])
        header = json.loads(self._mm[8 : 8 + header_len].decode("utf-8"))
        self.metadata: Dict[str, str] = header.pop("__metadata__", {})
        self._entries: Dict[str, dict] = header
        self._data_start = 8 + header_len

    def keys(self) -> List[str]:
        return list(self._entries.keys())

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def get_tensor(self, name: str) -> np.ndarray:
        ent = self._entries[name]
        dtype = np.dtype(_DTYPES[ent["dtype"]])
        begin, end = ent["data_offsets"]
        buf = self._mm[self._data_start + begin : self._data_start + end]
        arr = np.frombuffer(buf, dtype=dtype)
        return arr.reshape(ent["shape"])

    def get_shape_dtype(self, name: str) -> Tuple[Tuple[int, ...], np.dtype]:
        ent = self._entries[name]
        return tuple(ent["shape"]), np.dtype(_DTYPES[ent["dtype"]])

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for k in self._entries:
            yield k, self.get_tensor(k)

    def close(self):
        try:
            self._mm.close()
            self._f.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def load_file(path: str) -> Dict[str, np.ndarray]:
    if _use_native():
        from . import native_loader

        if native_loader.native_available():
            return native_loader.load_file_native(path)
    with SafetensorsFile(path) as f:
        return {k: np.array(v) for k, v in f.items()}


def _use_native() -> bool:
    """Native (C++ thread-pool) ingest is on by default; set
    LIGHTX2V_NATIVE_LOADER=0 to force the pure-Python reader."""
    return os.environ.get("LIGHTX2V_NATIVE_LOADER", "1") not in ("0", "false")


def save_file(tensors: Dict[str, np.ndarray], path: str, metadata: Optional[Dict[str, str]] = None) -> None:
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        nbytes = arr.nbytes
        header[name] = {
            "dtype": _dtype_name(arr),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        blobs.append(arr)
        offset += nbytes
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    pad = (-(8 + len(hjson))) % 8
    hjson += b" " * pad
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for arr in blobs:
            f.write(arr.tobytes())
    os.replace(tmp, path)


def load_sharded(ckpt_dir: str) -> Dict[str, np.ndarray]:
    """Load a directory of safetensors, honoring *.index.json if present
    (reference: model.py:98-126)."""
    index_files = [f for f in os.listdir(ckpt_dir) if f.endswith(".index.json")]
    out: Dict[str, np.ndarray] = {}
    if index_files:
        with open(os.path.join(ckpt_dir, index_files[0])) as f:
            index = json.load(f)
        for fname in sorted(set(index["weight_map"].values())):
            out.update(load_file(os.path.join(ckpt_dir, fname)))
        return out
    files = sorted(f for f in os.listdir(ckpt_dir) if f.endswith(".safetensors"))
    if not files:
        orig = os.path.join(ckpt_dir, "original")
        if os.path.isdir(orig):
            return load_sharded(orig)
        raise FileNotFoundError(f"No .safetensors files found in: {ckpt_dir}")
    for fname in files:
        out.update(load_file(os.path.join(ckpt_dir, fname)))
    return out
