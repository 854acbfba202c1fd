"""QArray: a block-quantized weight tensor as a JAX pytree.

The TPU-native runtime representation of the reference's Q4/Q8 buffer tensors
(/root/reference/jlama-core/.../tensor/Q4ByteBufferTensor.java,
Q8ByteBufferTensor.java).

- fmt "q4": `data` is the JQ4 packed payload, uint8 [..., n/2] in the
  checkpoint's half-block layout (byte j of a 32-block holds element j in the
  low nibble and element j+16 in the high nibble) — loaded zero-copy from
  checkpoints, and consumed directly by the Pallas dequant+matmul kernel so
  HBM traffic stays at 4 bits/weight.
- fmt "q8": `data` is int8 [..., n].

`scales` is float32 [..., n/32] (block-32 along the reduction axis).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import blockq

BLOCK = blockq.BLOCK_SIZE
HALF = blockq.HALF_BLOCK


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "scales"],
    meta_fields=["fmt"],
)
@dataclass
class QArray:
    data: jnp.ndarray  # q4: uint8 [..., n/2] packed; q8: int8 [..., n]
    scales: jnp.ndarray  # float32 [..., n/32]
    fmt: str = "q4"

    @property
    def shape(self):
        """Logical (unpacked) shape."""
        if self.fmt == "q4":
            return (*self.data.shape[:-1], self.data.shape[-1] * 2)
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def unpack(self) -> jnp.ndarray:
        """Quantized integer values in original element order (int8)."""
        if self.fmt == "q4k":
            raise ValueError(
                "q4k (kernel column order) cannot be unpacked positionally; "
                "use ops.pallas_q4.from_kernel_layout first"
            )
        if self.fmt != "q4":
            return self.data
        d = self.data
        pb = d.reshape(*d.shape[:-1], d.shape[-1] // HALF, HALF)
        lo = (pb & 0x0F).astype(jnp.int8) - 8
        hi = ((pb >> 4) & 0x0F).astype(jnp.int8) - 8
        vals = jnp.concatenate([lo, hi], axis=-1)  # [..., nb, 32]
        return vals.reshape(*d.shape[:-1], d.shape[-1] * 2)

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        vals = self.unpack()
        shape = vals.shape
        v = vals.reshape(*shape[:-1], shape[-1] // BLOCK, BLOCK)
        out = v.astype(jnp.float32) * self.scales[..., None].astype(jnp.float32)
        return out.reshape(shape).astype(dtype)

    def __getitem__(self, idx) -> "QArray":
        # q4s carries a (sigma, swk) scales tuple; index each leaf
        scales = jax.tree.map(lambda s: s[idx], self.scales)
        return QArray(self.data[idx], scales, self.fmt)


def q4_from_checkpoint(packed: np.ndarray, scales: np.ndarray) -> QArray:
    """Zero-copy: the checkpoint payload IS the runtime layout."""
    return QArray(
        jnp.asarray(packed), jnp.asarray(scales, dtype=np.float32), "q4"
    )


def q8_from_checkpoint(values: np.ndarray, scales: np.ndarray) -> QArray:
    return QArray(
        jnp.asarray(values), jnp.asarray(scales, dtype=np.float32), "q8"
    )


def quantize_q4(x: np.ndarray) -> QArray:
    packed, scales = blockq.q4_quantize_np(np.asarray(x, dtype=np.float32))
    return q4_from_checkpoint(packed, scales)
