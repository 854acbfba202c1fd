"""Linear/matmul dispatch over plain and quantized weights.

The TPU equivalent of the reference's TensorOperations.batchDotProduct
dispatch (/root/reference/jlama-core/.../tensor/operations/
TensorOperationsProvider.java:50-87 and PanamaTensorOperations.java:95-146):
one entry point, `linear(x, w)`, that picks the right kernel for the weight
representation. Weights follow the HF nn.Linear convention `[out, in]`; the
contraction is over the last axis of both (`y = x @ w.T`), which keeps the
block-32 quantization axis on the reduction dim.

The XLA path below is the reference implementation; `jlama_tpu.ops.pallas_q4`
provides the fused dequant+matmul kernels used on real TPUs. Dispatch is by
weight FORMAT: q4/q8 take the XLA dequant path, q4k (the kernel layout that
`prepare_params_for_pallas` repacks to at load time, the default on TPU
backends) takes the Pallas kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.qarray import QArray


def _dot_last(x: jnp.ndarray, w: jnp.ndarray, out_dtype) -> jnp.ndarray:
    return jax.lax.dot_general(
        x,
        w,
        ((( x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def linear(x: jnp.ndarray, w, bias: jnp.ndarray | None = None, out_dtype=None):
    """y = x @ w.T (+ bias). w: jnp array [out, in] or QArray [out, in]."""
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QArray):
        if w.fmt == "q4k":
            from . import pallas_q4

            y = pallas_q4.q4_matmul(x, w, out_dtype=out_dtype)
        elif w.fmt == "q4s":
            import os

            from . import pallas_w8a8

            if os.environ.get("JLAMA_Q4S_KERNEL") == "1":
                # the int8-MXU Pallas kernel (TPU: Mosaic-blocked, raises
                # with the analysis; interpret mode: exact)
                y = pallas_w8a8.q4s_matmul(x, w, out_dtype=out_dtype)
            else:
                # XLA dequant path: correct everywhere, shards under GSPMD
                y = _dot_last(
                    x.astype(jnp.float32), pallas_w8a8.q4s_dequantize(w),
                    out_dtype,
                )
        else:
            y = _quantized_matmul_xla(x, w, out_dtype)
    else:
        y = _dot_last(x, w.astype(x.dtype), out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _quantized_matmul_xla(x: jnp.ndarray, w: QArray, out_dtype) -> jnp.ndarray:
    """Reference path: exact f32 dequant + f32-accumulated matmul.

    For weight-only quantization, sum_k x_k * (v_k * s_b(k)) is identical to
    the reference's per-block scale-product accumulation
    (PanamaTensorOperations.java I8Q4 Gemmers), so plain dequant+dot is the
    correct reference semantics. The Pallas kernel keeps the blockwise form
    to exploit int8 MXU dots.
    """
    return _dot_last(x.astype(jnp.float32), w.dequantize(jnp.float32), out_dtype)
