"""Per-layer tensor debug dumps.

Parity with the reference's DebugSupport
(/root/reference/jlama-core/.../util/DebugSupport.java): a globally-gated
`debug(name, tensor, layer)` hook that every block calls; off by default with
zero overhead. Enabled via JLAMA_DEBUG=1 or `enable()`. On TPU the dump uses
`jax.debug.callback` so it works inside jit without changing the program's
results.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_enabled = os.environ.get("JLAMA_DEBUG", "0") == "1"
_sink = None  # callable(name, layer, np.ndarray) or None -> print summary


def enabled() -> bool:
    return _enabled


def enable(sink=None) -> None:
    global _enabled, _sink
    _enabled = True
    _sink = sink


def disable() -> None:
    global _enabled
    _enabled = False


def _default_sink(name: str, layer, arr: np.ndarray) -> None:
    a = np.asarray(arr, dtype=np.float32)
    print(
        f"[debug] L{layer} {name}: shape={a.shape} "
        f"sum={a.sum():.5f} absmax={np.abs(a).max():.5f}"
    )


def debug(name: str, tensor, layer=None):
    """Dump a named tensor (no-op unless enabled). Jit-safe."""
    if not _enabled:
        return tensor

    def cb(arr):
        (_sink or _default_sink)(name, layer, arr)

    jax.debug.callback(cb, tensor)
    return tensor
