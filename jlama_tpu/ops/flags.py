"""Runtime op-dispatch flags (the TensorOperationsProvider equivalents)."""

from __future__ import annotations

import os

import jax


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# Pallas paged-attention decode kernel: on by default on TPU, forced via env.
_env = os.environ.get("JLAMA_PAGED_ATTENTION_KERNEL")
if _env is not None:
    USE_PAGED_ATTENTION_KERNEL = _env == "1"
else:
    USE_PAGED_ATTENTION_KERNEL = _on_tpu()

# In-tree flash prefill kernel (T>1 online-softmax attention): on by default
# on TPU; the XLA dense-mask path stays the CPU/test reference.
_env = os.environ.get("JLAMA_FLASH_PREFILL")
if _env is not None:
    USE_FLASH_PREFILL = _env == "1"
else:
    USE_FLASH_PREFILL = _on_tpu()
