"""Lazy per-tensor HTTP safetensors loading (ranged requests).

Parity with the reference's HTTPSafeTensorLoader
(/root/reference/jlama-core/.../safetensors/HTTPSafeTensorLoader.java:46-296):
fetch the header with a small ranged request, then download each tensor's
byte range on demand — optionally only a row-slice of it, so a TP worker
pulls just its shard of each weight. Parts are cached on disk and reused.
"""

from __future__ import annotations

import struct
import urllib.request
from pathlib import Path

import numpy as np

from .format import DTYPES, TensorInfo, parse_header


class HTTPSafeTensorLoader:
    def __init__(
        self,
        url: str,
        cache_dir: str | Path | None = None,
        token: str | None = None,
        header_probe_bytes: int = 8 * 1024 * 1024,
    ):
        self.url = url
        self.token = token
        self.cache = Path(cache_dir) if cache_dir else None
        if self.cache:
            self.cache.mkdir(parents=True, exist_ok=True)

        head = self._fetch_range(0, 8)
        (hlen,) = struct.unpack("<Q", head)
        raw = self._fetch_range(0, 8 + hlen)
        self.tensors, self.metadata, self.payload_start = parse_header(raw)

    # ------------------------------------------------------------------

    def _fetch_range(self, start: int, end: int) -> bytes:
        """[start, end) bytes of the remote file, disk-cached."""
        if self.cache:
            part = self.cache / f"{start}-{end}.part"
            if part.exists():
                return part.read_bytes()
        req = urllib.request.Request(self.url)
        req.add_header("Range", f"bytes={start}-{end - 1}")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        with urllib.request.urlopen(req, timeout=60) as r:
            data = r.read()
        if len(data) != end - start:
            raise IOError(
                f"ranged fetch returned {len(data)} bytes, wanted {end - start} "
                "(server may not support Range requests)"
            )
        if self.cache:
            part.write_bytes(data)
        return data

    # ------------------------------------------------------------------

    def names(self) -> list[str]:
        return list(self.tensors)

    def __contains__(self, name: str) -> bool:
        return name in self.tensors

    def info(self, name: str) -> TensorInfo:
        return self.tensors[name]

    def load(
        self, name: str, row_range: tuple[int, int] | None = None
    ) -> np.ndarray:
        """Download (a row-slice of) a tensor.

        Row slicing fetches only that byte range of the file (the reference's
        per-shard download, HTTPSafeTensorLoader.java:114-213) — rows must be
        the second-to-last dim of a 2-D tensor.
        """
        ti = self.tensors[name]
        np_dtype, _ = DTYPES[ti.dtype]
        start = self.payload_start + ti.data_offsets[0]
        shape = list(ti.shape)
        if ti.dtype == "Q4":
            shape[-1] //= 2
        if row_range is not None:
            if len(shape) != 2:
                raise ValueError("row slicing requires 2-D tensors")
            r0, r1 = row_range
            row_bytes = shape[-1] * np_dtype.itemsize
            data = self._fetch_range(start + r0 * row_bytes, start + r1 * row_bytes)
            return np.frombuffer(data, dtype=np_dtype).reshape(r1 - r0, shape[-1])
        data = self._fetch_range(start, start + ti.nbytes)
        return np.frombuffer(data, dtype=np_dtype).reshape(shape)

    def load_quantized(self, name: str, row_range=None):
        ti = self.tensors[name]
        data = self.load(name, row_range)
        scales = None
        if name + ".qb" in self.tensors:
            scales = self.load(name + ".qb", row_range)
        return data, scales, ti.dtype
