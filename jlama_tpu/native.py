"""ctypes bindings for the C++ native runtime (native/blockq.cpp).

Counterpart of the reference's FFM bindings + JarSupport shared-lib loader
(/root/reference/jlama-native/.../NativeSimdTensorOperations.java:31,
util/JarSupport.java:34-70): the library is built from source on first use
(g++ is a baked-in dependency), cached next to the sources, and every entry
point falls back to the NumPy implementation when the toolchain or library
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libjlamaq.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "blockq.cpp"
    if not src.exists():
        return False
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(src), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("JLAMA_FORCE_PYTHON"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.jq4_quantize.argtypes = [f32p, u8p, f32p, i64]
    lib.jq4_dequantize.argtypes = [u8p, f32p, f32p, i64]
    lib.jq8_quantize.argtypes = [f32p, i8p, f32p, i64]
    lib.jq4_to_kernel_layout.argtypes = [u8p, u8p, i64, i64]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def q4_quantize(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Native JQ4 quantize; falls back to blockq.q4_quantize_np."""
    lib = get_lib()
    from .quant import blockq

    if lib is None:
        return blockq.q4_quantize_np(x)
    shape = x.shape
    xf = np.ascontiguousarray(x, dtype=np.float32)
    nblocks = xf.size // 32
    packed = np.empty(nblocks * 16, dtype=np.uint8)
    scales = np.empty(nblocks, dtype=np.float32)
    lib.jq4_quantize(
        _ptr(xf, ctypes.c_float), _ptr(packed, ctypes.c_uint8),
        _ptr(scales, ctypes.c_float), nblocks,
    )
    return (
        packed.reshape(*shape[:-1], shape[-1] // 2),
        scales.reshape(*shape[:-1], shape[-1] // 32),
    )


def q4_dequantize(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    lib = get_lib()
    from .quant import blockq

    if lib is None:
        return blockq.q4_dequantize_np(packed, scales)
    p = np.ascontiguousarray(packed, dtype=np.uint8)
    s = np.ascontiguousarray(scales, dtype=np.float32)
    nblocks = p.size // 16
    out = np.empty(nblocks * 32, dtype=np.float32)
    lib.jq4_dequantize(
        _ptr(p, ctypes.c_uint8), _ptr(s, ctypes.c_float),
        _ptr(out, ctypes.c_float), nblocks,
    )
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def q8_quantize(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    from .quant import blockq

    if lib is None:
        return blockq.q8_quantize_np(x)
    shape = x.shape
    xf = np.ascontiguousarray(x, dtype=np.float32)
    nblocks = xf.size // 32
    q = np.empty(nblocks * 32, dtype=np.int8)
    scales = np.empty(nblocks, dtype=np.float32)
    lib.jq8_quantize(
        _ptr(xf, ctypes.c_float), _ptr(q, ctypes.c_int8),
        _ptr(scales, ctypes.c_float), nblocks,
    )
    return q.reshape(shape), scales.reshape(*shape[:-1], shape[-1] // 32)


def q4_to_kernel_layout(packed: np.ndarray) -> np.ndarray:
    """Native q4 → q4k column repack (cf. ops/pallas_q4.kernel_column_perm)."""
    lib = get_lib()
    p = np.ascontiguousarray(packed, dtype=np.uint8)
    half_k = p.shape[-1]
    rows = p.size // half_k
    if lib is None:
        from .ops.pallas_q4 import kernel_column_perm

        return p[..., kernel_column_perm(half_k * 2)]
    out = np.empty_like(p)
    lib.jq4_to_kernel_layout(
        _ptr(p.reshape(-1), ctypes.c_uint8), _ptr(out.reshape(-1), ctypes.c_uint8),
        rows, half_k,
    )
    return out
