"""Persistent XLA compilation cache setup (shared by bench/CLI/scripts).

Decode-graph compiles through the remote compile service take minutes;
cached recompiles take seconds. One helper so the three call sites
(bench.py, cli.py, scripts/*) cannot drift.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = "~/.cache/jlama_tpu/xla"


def enable_persistent_cache(cache_dir: str = _DEFAULT_DIR) -> None:
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # honor JAX_PLATFORMS even where sitecustomize force-selects an
    # accelerator platform after env parsing (the axon TPU relay): a script
    # run with JAX_PLATFORMS=cpu must never land on the real chip
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
