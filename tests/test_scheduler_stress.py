"""Randomized scheduler stress: concurrent submissions, sessions, suspends.

The reference's race-safety story is immutable weights + per-session buffers
(SURVEY §5); ours adds a shared paged pool, async decode windows, deferred
page releases and LRU suspend. This test drives the background scheduler
loop with a deterministic random mix of requests (sampling params, sessions,
stop strings, penalties, repeated session reuse) while suspending/dropping
sessions from the submitting thread, and asserts every request completes
with sane bookkeeping (no leaked pages, no stuck slots).
"""

import time

import numpy as np
import pytest
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


def test_scheduler_stress_mixed_traffic(tmp_path):
    model_dir, _ = make_tiny_llama(tmp_path)
    from jlama_tpu.models.loader import load_params
    from jlama_tpu.runtime.scheduler import BatchScheduler, GenRequest

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    sched = BatchScheduler(
        params, cfg, n_slots=4, n_pages=48, page_size=8, max_seq_len=64,
        kv_dtype=jnp.float32, compute_dtype=jnp.float32, max_sessions=4,
        prefill_chunk=16,
    )
    sched.start()
    rng = np.random.default_rng(7)
    reqs = []
    try:
        for i in range(40):
            n = int(rng.integers(1, 30))
            kw = dict(
                prompt_ids=list(rng.integers(1, 200, n)),
                max_new_tokens=int(rng.integers(1, 8)),
                temperature=float(rng.choice([0.0, 0.8])),
                seed=int(rng.integers(0, 1 << 30)),
            )
            r = rng.random()
            if r < 0.3:
                kw["session_id"] = f"sess{int(rng.integers(0, 6))}"
            elif r < 0.4:
                kw["presence_penalty"] = 0.5
            elif r < 0.5:
                kw["top_p"] = 0.9
            req = GenRequest(**kw)
            reqs.append(req)
            sched.submit(req)
            if rng.random() < 0.2:
                sched.suspend_session(f"sess{int(rng.integers(0, 6))}")
            if rng.random() < 0.1:
                sched.drop_session(f"sess{int(rng.integers(0, 6))}")
            if rng.random() < 0.3:
                time.sleep(0.01)

        deadline = time.time() + 240
        for req in reqs:
            assert req.done_event.wait(max(1, deadline - time.time())), (
                req.state, req.prompt_ids
            )
    finally:
        sched.stop()

    # every request completed with a terminal reason and plausible output
    from jlama_tpu.runtime.engine import FinishReason

    for req in reqs:
        assert req.finish is not None
        if req.finish != FinishReason.ERROR:
            assert 0 < len(req.out_ids) <= req.max_new_tokens
    # no leaked slots; pages only held by remembered sessions
    assert all(s is None for s in sched.slots)
    live_keys = set(sched.kv.alloc.by_seq)
    known = set(sched.session_state) | {"__empty__"}
    leaked = {
        k for k in live_keys
        if k not in known and sched.kv.alloc.pages_for(k)
    }
    assert not leaked, leaked
