"""ctypes binding for the native mmap safetensors reader (native/safetensors_reader.cpp).

Zero-copy reads: tensors are numpy views into the file mapping; the converter's
transposes/casts then write straight into their destination buffers — one copy total
instead of read->bytes->numpy->transpose. Builds on demand with g++ (cached .so);
:func:`available` gates callers, which fall back to the ``safetensors`` package.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "safetensors_reader.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libminsdtf_st.so")

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled via uint16 bit manipulation below
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}

_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True,
        )
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native safetensors reader unavailable ({e}); using python fallback")
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(path)
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_num_tensors.restype = ctypes.c_int
    lib.st_num_tensors.argtypes = [ctypes.c_void_p]
    lib.st_tensor_name.restype = ctypes.c_char_p
    lib.st_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.st_tensor_info.restype = ctypes.c_int
    lib.st_tensor_info.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.st_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not False


def _bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    out = np.zeros(raw_u16.shape, dtype=np.uint32)
    out |= raw_u16.astype(np.uint32) << 16
    return out.view(np.float32)


class NativeSafetensors:
    """Context manager over one mmapped checkpoint."""

    def __init__(self, path: str):
        lib = _load()
        if lib is False:
            raise RuntimeError("native reader unavailable")
        self._lib = lib
        self._handle = lib.st_open(path.encode())
        if not self._handle:
            raise IOError(f"failed to open safetensors file: {path}")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._handle:
            self._lib.st_close(self._handle)
            self._handle = None

    def keys(self):
        n = self._lib.st_num_tensors(self._handle)
        return [self._lib.st_tensor_name(self._handle, i).decode() for i in range(n)]

    def get(self, name: str, copy: bool = False) -> np.ndarray:
        """Tensor as numpy. Zero-copy view into the mapping unless ``copy`` or a
        dtype conversion (f16/bf16 -> keep f16 / convert) requires materializing."""
        dtype_buf = ctypes.create_string_buffer(8)
        shape = (ctypes.c_int64 * 8)()
        ndim = ctypes.c_int()
        ptr = ctypes.c_void_p()
        nbytes = ctypes.c_int64()
        rc = self._lib.st_tensor_info(
            self._handle, name.encode(), dtype_buf, shape, ctypes.byref(ndim),
            ctypes.byref(ptr), ctypes.byref(nbytes),
        )
        if rc != 0:
            raise KeyError(f"{name} (rc={rc})")
        dims = tuple(shape[i] for i in range(ndim.value))
        dtype_str = dtype_buf.value.decode()
        buf = (ctypes.c_uint8 * nbytes.value).from_address(ptr.value)
        if dtype_str == "BF16":
            raw = np.frombuffer(buf, dtype=np.uint16).reshape(dims)
            return _bf16_to_f32(raw)
        np_dtype = _DTYPES.get(dtype_str)
        if np_dtype is None:
            raise ValueError(f"unsupported dtype {dtype_str} for {name}")
        arr = np.frombuffer(buf, dtype=np_dtype).reshape(dims)
        return arr.copy() if copy else arr


def read_state_dict_native(path: str) -> Dict[str, np.ndarray]:
    """Whole-file read matching convert.read_state_dict's contract (fp32 values).
    Values are copies (the mapping closes with the reader)."""
    with NativeSafetensors(path) as f:
        out = {}
        for key in f.keys():
            arr = f.get(key)
            if arr.dtype in (np.float16, np.float64):
                arr = arr.astype(np.float32)
            elif arr.base is not None or not arr.flags.owndata:
                arr = arr.copy()
            out[key] = arr
        return out
