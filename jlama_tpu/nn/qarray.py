"""QArray: a quantized weight tensor as a JAX pytree.

The TPU-native runtime representation of the reference's Q4/Q8 buffer tensors
(/root/reference/jlama-core/.../tensor/Q4ByteBufferTensor.java,
Q8ByteBufferTensor.java). Unlike the SIMD-oriented nibble interleave of the
checkpoint format, the in-memory layout here is MXU-friendly:

- q4: int8 values in [-8, 7], stored UNPACKED as int8 [..., n] by default
  (2x the checkpoint bytes but directly consumable by int8 MXU paths), or
  packed uint8 [..., n/2] with *sequential* nibble order for the Pallas
  dequant kernels. `scales` is [..., n/32] (block-32 along the reduction dim).
- q8: int8 [..., n] + scales [..., n/32].

Conversion from/to the bit-exact JQ4 checkpoint layout lives in
quant.blockq (q4_unpack_np / q4_pack_np).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..quant import blockq

BLOCK = blockq.BLOCK_SIZE


@partial(jax.tree_util.register_dataclass, data_fields=["data", "scales"], meta_fields=["fmt"])
@dataclass
class QArray:
    """Block-quantized tensor: data + per-block-32 scales over the last axis.

    fmt: "q4" (int8 values in [-8,7]) or "q8" (int8 in [-127,127]).
    """

    data: jnp.ndarray  # int8 [..., n]
    scales: jnp.ndarray  # float32/bfloat16 [..., n/32]
    fmt: str = "q4"

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        shape = self.data.shape
        d = self.data.reshape(*shape[:-1], shape[-1] // BLOCK, BLOCK)
        out = d.astype(jnp.float32) * self.scales[..., None].astype(jnp.float32)
        return out.reshape(shape).astype(dtype)

    def astype_scales(self, dtype) -> "QArray":
        return QArray(self.data, self.scales.astype(dtype), self.fmt)

    def __getitem__(self, idx) -> "QArray":
        return QArray(self.data[idx], self.scales[idx], self.fmt)


def q4_from_checkpoint(packed: np.ndarray, scales: np.ndarray) -> QArray:
    """Build a QArray from the bit-exact JQ4 checkpoint payload."""
    vals = blockq.q4_unpack_np(packed)
    return QArray(jnp.asarray(vals), jnp.asarray(scales), "q4")


def q8_from_checkpoint(values: np.ndarray, scales: np.ndarray) -> QArray:
    return QArray(jnp.asarray(values), jnp.asarray(scales), "q8")


def quantize_q4(x: np.ndarray) -> QArray:
    packed, scales = blockq.q4_quantize_np(np.asarray(x, dtype=np.float32))
    return q4_from_checkpoint(packed, scales)
