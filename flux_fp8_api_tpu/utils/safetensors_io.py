"""Pure-Python safetensors reader/writer with mmap, bf16 and fp8 support.

The reference leans on the Rust safetensors wheel (util.py:8, flux_model.py:722); here
the format is parsed directly — 8-byte LE header length, JSON header of
``{name: {dtype, shape, data_offsets}}``, then a flat byte buffer — and tensors are
materialized as numpy views over an ``mmap`` (zero-copy until JAX transfers them to
device). This also unlocks dtypes the numpy safetensors API refuses (BF16, F8_E4M3,
F8_E5M2) via ``ml_dtypes``.
"""

from __future__ import annotations

import json
import mmap
from pathlib import Path
from typing import Dict, Iterator, Tuple

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


_NATIVE_READ_THRESHOLD = 64 << 20  # tensors ≥64MB go through the C++ data plane


class SafetensorsFile:
    """mmap-backed reader. Tensors are lazy views; ``keys()``/``get(name)``/``items()``.

    Large tensors read through the C++ parallel-pread data plane
    (native/stload.cpp via utils/native_io.py) when it's available — multi-GB
    checkpoint cold loads saturate the disk instead of faulting pages serially.
    """

    def __init__(self, path: str, use_native: bool = True):
        self.path = Path(path)
        self.use_native = use_native
        f = open(self.path, "rb")
        self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        f.close()
        (header_len,) = np.frombuffer(self._mm[:8], dtype=np.uint64)
        header = json.loads(self._mm[8 : 8 + int(header_len)].decode("utf-8"))
        self.metadata = header.pop("__metadata__", {})
        self._entries = header
        self._data_start = 8 + int(header_len)
        if use_native:
            from . import native_io

            native_io.prefetch(str(self.path))

    def keys(self):
        return self._entries.keys()

    def get(self, name: str) -> np.ndarray:
        ent = self._entries[name]
        dtype = np.dtype(_DTYPES[ent["dtype"]])
        start, end = ent["data_offsets"]
        nbytes = end - start
        if self.use_native and nbytes >= _NATIVE_READ_THRESHOLD:
            from . import native_io

            buf = native_io.parallel_read(str(self.path), self._data_start + start, nbytes)
            if buf is not None:
                return buf.view(dtype).reshape(ent["shape"])
        # frombuffer over the mmap with offset/count is a true zero-copy view;
        # slicing the mmap first (self._mm[a:b]) would copy the bytes
        count = nbytes // dtype.itemsize if dtype.itemsize else nbytes
        return np.frombuffer(
            self._mm, dtype=dtype, count=count, offset=self._data_start + start
        ).reshape(ent["shape"])

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for k in self.keys():
            yield k, self.get(k)

    def __contains__(self, name: str) -> bool:
        return name in self._entries


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Eagerly load every tensor (views over the mmap)."""
    f = SafetensorsFile(path)
    return dict(f.items())


def save_safetensors(path: str, tensors: Dict[str, np.ndarray], metadata: Dict[str, str] | None = None) -> None:
    """Write a safetensors file (used for prequantized checkpoint export)."""
    header: Dict[str, object] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    arrays = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        nbytes = arr.nbytes
        header[name] = {
            "dtype": _DTYPE_NAMES[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        arrays.append(arr)
        offset += nbytes
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad header to 8-byte alignment (spec recommendation)
    pad = (8 - (len(hjson) % 8)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(np.uint64(len(hjson)).tobytes())
        f.write(hjson)
        # stream one array at a time: buffering every blob up front would double
        # peak host RAM at 12GB-checkpoint scale (tobytes copies at most one
        # tensor transiently; ml_dtypes arrays don't expose a buffer protocol, so
        # a zero-copy memoryview isn't portable here)
        for arr in arrays:
            f.write(arr.tobytes())
