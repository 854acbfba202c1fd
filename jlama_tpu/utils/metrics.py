"""Serving metrics and profiling hooks.

Parity with the reference's runtime metrics (prompt/generate ms-per-token in
Generator.Response, tokens/s logging in OpenAIChatService.java:143-147) plus
TPU-native extras: aggregate p50/p95 TTFT and decode tokens/s/chip counters,
and a `jax.profiler` trace context for kernel-level inspection (the
equivalent of the reference's bundled async-profiler)."""

from __future__ import annotations

import contextlib
import statistics
import threading
import time
from dataclasses import dataclass, field


@dataclass
class ServingMetrics:
    ttft_ms: list[float] = field(default_factory=list)
    decode_tok_s: list[float] = field(default_factory=list)
    prompt_tokens: int = 0
    generated_tokens: int = 0
    requests: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def record(self, resp) -> None:
        """Record a Generator Response."""
        with self._lock:
            self.requests += 1
            self.prompt_tokens += resp.prompt_tokens
            self.generated_tokens += resp.generated_tokens
            self.ttft_ms.append(resp.prompt_time_ms)
            if resp.generate_time_ms > 0 and resp.generated_tokens > 0:
                self.decode_tok_s.append(
                    resp.generated_tokens / (resp.generate_time_ms / 1000)
                )
            # bound memory
            if len(self.ttft_ms) > 10000:
                del self.ttft_ms[:5000]
            if len(self.decode_tok_s) > 10000:
                del self.decode_tok_s[:5000]

    def snapshot(self) -> dict:
        with self._lock:
            def pct(xs, p):
                if not xs:
                    return None
                return float(statistics.quantiles(xs, n=100)[p - 1]) if len(xs) > 1 else xs[0]

            return {
                "requests": self.requests,
                "prompt_tokens": self.prompt_tokens,
                "generated_tokens": self.generated_tokens,
                "p50_ttft_ms": pct(self.ttft_ms, 50),
                "p95_ttft_ms": pct(self.ttft_ms, 95),
                "p50_decode_tok_s": pct(self.decode_tok_s, 50),
            }


GLOBAL_METRICS = ServingMetrics()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jlama_profile"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    t0 = time.perf_counter()
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {log_dir} ({time.perf_counter()-t0:.1f}s)")
