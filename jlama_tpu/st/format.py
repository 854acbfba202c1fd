"""SafeTensors wire format: header parse/serialize, dtype table.

Cf. reference /root/reference/jlama-core/.../safetensors/SafeTensorSupport.java:54-102
(header = u64 LE length + JSON) and TensorInfo.java / DType.java:18-50 (dtype
names incl. the non-standard "Q4" extension with half-size payload).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass

import numpy as np

try:  # bf16 comes from ml_dtypes (bundled with jax)
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

# safetensors dtype name -> (numpy dtype for raw storage, bytes per element)
# Q4 packs two elements per byte: raw payload is uint8 of size n/2.
DTYPES: dict[str, tuple[np.dtype, float]] = {
    "BOOL": (np.dtype(np.bool_), 1),
    "U8": (np.dtype(np.uint8), 1),
    "I8": (np.dtype(np.int8), 1),
    "I16": (np.dtype(np.int16), 2),
    "U16": (np.dtype(np.uint16), 2),
    "F16": (np.dtype(np.float16), 2),
    "BF16": (_BF16, 2),
    "I32": (np.dtype(np.int32), 4),
    "U32": (np.dtype(np.uint32), 4),
    "F32": (np.dtype(np.float32), 4),
    "F64": (np.dtype(np.float64), 8),
    "I64": (np.dtype(np.int64), 8),
    "U64": (np.dtype(np.uint64), 8),
    # Jlama extension: 4-bit block-quantized, payload uint8 n/2
    "Q4": (np.dtype(np.uint8), 0.5),
}

NUMPY_TO_ST = {
    np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16",
    np.dtype(np.int8): "I8",
    np.dtype(np.uint8): "U8",
    np.dtype(np.int32): "I32",
    np.dtype(np.int64): "I64",
    np.dtype(np.bool_): "BOOL",
}
if _BF16 is not None:
    NUMPY_TO_ST[_BF16] = "BF16"


@dataclass(frozen=True)
class TensorInfo:
    name: str
    dtype: str  # safetensors dtype string
    shape: tuple[int, ...]
    data_offsets: tuple[int, int]  # [start, end) relative to start of payload

    @property
    def nbytes(self) -> int:
        return self.data_offsets[1] - self.data_offsets[0]


def nbytes_for(dtype: str, shape: tuple[int, ...]) -> int:
    n = 1
    for d in shape:
        n *= d
    _, per = DTYPES[dtype]
    if dtype == "Q4":
        if n % 2:
            raise ValueError("Q4 tensor must have an even element count")
        return n // 2
    return int(n * per)


def parse_header(buf: bytes) -> tuple[dict[str, TensorInfo], dict, int]:
    """Parse a safetensors header.

    Returns (tensors, metadata, payload_start) where payload_start is the byte
    offset of the data section within the file.
    """
    if len(buf) < 8:
        raise ValueError("file too small for safetensors header")
    (hlen,) = struct.unpack("<Q", buf[:8])
    header = json.loads(buf[8 : 8 + hlen].decode("utf-8"))
    meta = header.pop("__metadata__", {})
    tensors = {}
    for name, info in header.items():
        tensors[name] = TensorInfo(
            name=name,
            dtype=info["dtype"],
            shape=tuple(info["shape"]),
            data_offsets=tuple(info["data_offsets"]),
        )
    return tensors, meta, 8 + hlen


def serialize_header(
    tensors: dict[str, TensorInfo], metadata: dict | None = None
) -> bytes:
    header: dict = {}
    if metadata:
        header["__metadata__"] = metadata
    for name, ti in tensors.items():
        header[name] = {
            "dtype": ti.dtype,
            "shape": list(ti.shape),
            "data_offsets": list(ti.data_offsets),
        }
    raw = json.dumps(header).encode("utf-8")
    # pad to 8-byte alignment with spaces, like the canonical writers
    pad = (-(len(raw) + 8)) % 8
    raw += b" " * pad
    return struct.pack("<Q", len(raw)) + raw
