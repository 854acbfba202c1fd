"""Continuous batching scheduler over the paged KV cache.

NEW capability beyond the reference (which serves one request at a time per
model instance, SURVEY.md §2.6 "DP — NO"): a fixed-slot decode batch where
sequences join as they arrive and leave as they finish, vLLM-style, built on
jit-friendly static shapes:

- decode: ONE jitted call per iteration over all B slots (empty slots run a
  dummy sequence against the scratch page and are ignored on the host);
- prefill: per-request bucketed call that writes the prompt's KV into that
  sequence's pages, then the sequence joins the decode batch;
- per-row sampling params (temperature/top_p) ride through the batch.

Host-side bookkeeping (requests, pages, slots) mirrors the reference's
session map; the device only ever sees pools + page tables + id arrays.
"""

from __future__ import annotations

import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..kv.paged import PagedKVCache, PagedKVState
from ..models.base import forward_hidden, lm_logits
from ..nn.sampling import sample_token
from .engine import FinishReason, Response, _bucket


class RequestState(str, Enum):
    QUEUED = "QUEUED"
    RUNNING = "RUNNING"
    DONE = "DONE"


@dataclass
class GenRequest:
    prompt_ids: list[int]
    max_new_tokens: int = 256
    temperature: float = 0.0
    top_p: float = 1.0
    stop_ids: set[int] = field(default_factory=set)
    on_token: Callable[[int], None] | None = None
    session_id: str | None = None  # KV affinity (X-Jlama-Session semantics)
    id: str = field(default_factory=lambda: str(uuid.uuid4()))

    # filled by the scheduler
    state: RequestState = RequestState.QUEUED
    out_ids: list[int] = field(default_factory=list)
    finish: FinishReason | None = None
    position: int = 0
    cur_token: int = 0
    slot: int = -1
    t_start: float = 0.0
    t_first: float = 0.0
    t_done: float = 0.0
    done_event: threading.Event = field(default_factory=threading.Event)

    def to_response(self, tokenizer=None) -> Response:
        text = ""
        if tokenizer is not None:
            visible = [t for t in self.out_ids if t not in self.stop_ids]
            text = tokenizer.decode(visible)
        return Response(
            response_text=text,
            response_text_with_special_tokens=(
                tokenizer.decode(self.out_ids, skip_special=False)
                if tokenizer
                else ""
            ),
            finish_reason=self.finish or FinishReason.ERROR,
            prompt_tokens=len(self.prompt_ids),
            generated_tokens=len(self.out_ids),
            prompt_time_ms=(self.t_first - self.t_start) * 1000,
            generate_time_ms=(self.t_done - self.t_first) * 1000,
            token_ids=list(self.out_ids),
        )


class BatchScheduler:
    def __init__(
        self,
        params: dict,
        cfg: ModelConfig,
        tokenizer=None,
        n_slots: int = 8,
        n_pages: int = 512,
        page_size: int = 64,
        max_seq_len: int | None = None,
        kv_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
        seed: int = 0,
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.n_slots = n_slots
        max_seq = min(max_seq_len or cfg.context_length, cfg.context_length)
        self.max_seq_len = max_seq
        self.kv = PagedKVCache(
            cfg,
            n_pages=n_pages,
            page_size=page_size,
            max_pages_per_seq=-(-max_seq // page_size),
            dtype=kv_dtype,
        )
        if mesh is not None:
            # pool [L, n_kv, n_pages, ps, hd]: KV heads ride the tp axis
            # (each TP shard stores only its KV-head slice,
            # cf. KvBufferCache.java:105-110)
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(mesh, P(None, "tp", None, None, None))
            self.kv.state = jax.tree.map(
                lambda a: jax.device_put(a, s), self.kv.state
            )
        self.slots: list[GenRequest | None] = [None] * n_slots
        self.pending: queue.Queue[GenRequest] = queue.Queue()
        # session resume state: session_id -> (position, pending_token)
        # pages stay allocated under the session's kv key between requests
        # (cf. KvBufferCache session map + Coordinator.sessionPositions)
        self.session_state: dict[str, tuple[int, int | None]] = {}
        self._suspended: dict[str, tuple] = {}
        self.key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        self._running = False
        self._thread: threading.Thread | None = None

        @partial(jax.jit, donate_argnums=(1,))
        def _prefill(params, state: PagedKVState, tokens, positions, pt):
            _, cache = forward_hidden(
                params, cfg, tokens, positions, (state, pt), dtype=compute_dtype
            )
            return cache[0]

        @partial(jax.jit, donate_argnums=(1,), static_argnums=(8,))
        def _decode(params, state: PagedKVState, tokens, positions, pts, key,
                    temps, top_ps, all_top_p_one):
            hidden, cache = forward_hidden(
                params, cfg, tokens, positions, (state, pts), dtype=compute_dtype
            )
            logits = lm_logits(params, cfg, hidden[:, -1:, :])[:, 0]
            # statically skip the full-vocab nucleus sort when no request
            # uses top_p this iteration
            toks = sample_token(
                logits, key, temps, top_p=1.0 if all_top_p_one else top_ps
            )
            return toks, cache[0]

        self._prefill = _prefill
        self._decode = _decode

    # ------------------------------------------------------------------

    def submit(self, req: GenRequest) -> GenRequest:
        req.t_start = time.perf_counter()
        self.pending.put(req)
        return req

    def generate(self, prompt_ids: list[int], **kw) -> Response:
        """Blocking submit+wait (runs the loop inline if not started)."""
        req = GenRequest(prompt_ids=list(prompt_ids), **kw)
        self.submit(req)
        if self._running:
            req.done_event.wait()
        else:
            while req.state != RequestState.DONE:
                self.step()
        return req.to_response(self.tokenizer)

    # ------------------------------------------------------------------

    def _kv_key(self, req: GenRequest) -> str:
        return req.session_id or req.id

    def _admit(self) -> None:
        for i in range(self.n_slots):
            if self.slots[i] is not None:
                continue
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return

            # session resume: prepend the pending (sampled-but-unforwarded)
            # token and continue from the stored position
            prompt_ids = list(req.prompt_ids)
            start_pos = 0
            if req.session_id and req.session_id in self.session_state:
                start_pos, pending_tok = self.session_state[req.session_id]
                if pending_tok is not None:
                    prompt_ids = [pending_tok] + prompt_ids

            n = len(prompt_ids)
            if n == 0 or start_pos + n >= self.max_seq_len:
                req.finish = FinishReason.ERROR
                req.state = RequestState.DONE
                req.done_event.set()
                continue
            ps = self.kv.page_size
            key = self._kv_key(req)
            try:
                self.kv.alloc.ensure_capacity(key, start_pos + n, ps)
            except MemoryError:
                self.pending.put(req)  # retry when pages free up
                return
            # prefill all but the last prompt token (bucketed)
            if n > 1:
                ctx = prompt_ids[:-1]
                bucket = _bucket(len(ctx))
                room = self.kv.max_pages_per_seq * ps - start_pos
                if bucket > room:
                    bucket = len(ctx)
                self.kv.alloc.ensure_capacity(key, start_pos + bucket, ps)
                toks = np.zeros((1, bucket), dtype=np.int32)
                toks[0, : len(ctx)] = ctx
                pos = np.arange(start_pos, start_pos + bucket, dtype=np.int32)[
                    None, :
                ]
                pt = jnp.asarray(self.kv.page_table([key]))
                self.kv.state = self._prefill(
                    self.params, self.kv.state, jnp.asarray(toks),
                    jnp.asarray(pos), pt,
                )
            req.position = start_pos + n - 1
            req.cur_token = prompt_ids[-1]
            req.slot = i
            req.state = RequestState.RUNNING
            req.t_first = time.perf_counter()
            self.slots[i] = req

    def _finish(self, req: GenRequest, reason: FinishReason) -> None:
        req.finish = reason
        req.state = RequestState.DONE
        req.t_done = time.perf_counter()
        from ..utils.metrics import GLOBAL_METRICS

        GLOBAL_METRICS.record(req.to_response())
        if req.session_id:
            # keep the session's pages; remember where to resume
            self.session_state[req.session_id] = (req.position, req.cur_token)
        else:
            self.kv.alloc.release(self._kv_key(req))
        self.slots[req.slot] = None
        req.slot = -1
        req.done_event.set()

    def drop_session(self, session_id: str) -> None:
        self.session_state.pop(session_id, None)
        self.kv.alloc.release(session_id)
        self._suspended.pop(session_id, None)

    # ------------------------------------------------------------------
    # session offload — the TPU equivalent of the reference's disk-backed
    # KV pages (KvBufferCache.java:134-174): an idle session's pages move
    # to host RAM (or disk via np.save) and its HBM pages are freed; a
    # resume copies them back into freshly allocated pages.
    # ------------------------------------------------------------------

    def suspend_session(self, session_id: str, to_dir: str | None = None) -> bool:
        if session_id not in self.session_state:
            return False
        pages = self.kv.alloc.pages_for(session_id)
        if not pages:
            return False
        idxs = jnp.asarray(np.asarray(pages, dtype=np.int32))
        k_host = np.asarray(self.kv.state.k_pool[:, :, idxs])
        v_host = np.asarray(self.kv.state.v_pool[:, :, idxs])
        if to_dir is not None:
            import os

            os.makedirs(to_dir, exist_ok=True)
            np.save(f"{to_dir}/{session_id}.k.npy", k_host)
            np.save(f"{to_dir}/{session_id}.v.npy", v_host)
            payload = (to_dir, len(pages))
        else:
            payload = (k_host, v_host)
        self._suspended[session_id] = (payload, self.session_state[session_id])
        self.kv.alloc.release(session_id)
        self.session_state.pop(session_id)
        return True

    def resume_session(self, session_id: str) -> bool:
        if session_id not in self._suspended:
            return False
        payload, state = self._suspended.pop(session_id)
        if isinstance(payload[0], str):
            to_dir, _ = payload
            k_host = np.load(f"{to_dir}/{session_id}.k.npy")
            v_host = np.load(f"{to_dir}/{session_id}.v.npy")
        else:
            k_host, v_host = payload
        n_pages = k_host.shape[2]
        ps = self.kv.page_size
        pages = self.kv.alloc.ensure_capacity(session_id, n_pages * ps, ps)
        idxs = jnp.asarray(np.asarray(pages, dtype=np.int32))
        self.kv.state = PagedKVState(
            self.kv.state.k_pool.at[:, :, idxs].set(
                jnp.asarray(k_host, self.kv.state.k_pool.dtype)
            ),
            self.kv.state.v_pool.at[:, :, idxs].set(
                jnp.asarray(v_host, self.kv.state.v_pool.dtype)
            ),
        )
        self.session_state[session_id] = state
        return True

    def step(self) -> int:
        """One scheduler iteration. Returns number of active sequences."""
        self._admit()
        active = [r for r in self.slots if r is not None]
        if not active:
            return 0

        B = self.n_slots
        ps = self.kv.page_size
        tokens = np.zeros((B, 1), dtype=np.int32)
        positions = np.zeros((B, 1), dtype=np.int32)
        temps = np.zeros(B, dtype=np.float32)
        top_ps = np.ones(B, dtype=np.float32)
        seq_ids = ["__empty__"] * B
        for r in self.slots:
            if r is None:
                continue
            # make sure the page holding `position` exists before the write
            key = self._kv_key(r)
            self.kv.alloc.ensure_capacity(key, r.position + 1, ps)
            tokens[r.slot, 0] = r.cur_token
            positions[r.slot, 0] = r.position
            temps[r.slot] = r.temperature
            top_ps[r.slot] = r.top_p
            seq_ids[r.slot] = key

        pts = jnp.asarray(self.kv.page_table(seq_ids))
        self.key, sub = jax.random.split(self.key)
        toks, self.kv.state = self._decode(
            self.params, self.kv.state, jnp.asarray(tokens),
            jnp.asarray(positions), pts, sub, jnp.asarray(temps),
            jnp.asarray(top_ps), bool(np.all(top_ps >= 1.0)),
        )
        toks_host = np.asarray(toks)

        for r in list(self.slots):
            if r is None:
                continue
            nxt = int(toks_host[r.slot])
            r.position += 1
            r.cur_token = nxt
            r.out_ids.append(nxt)
            stops = r.stop_ids or set(self.cfg.eos_token_ids)
            if nxt in stops:
                self._finish(r, FinishReason.STOP_TOKEN)
            elif len(r.out_ids) >= r.max_new_tokens:
                self._finish(r, FinishReason.MAX_TOKENS)
            elif r.position + 1 >= self.max_seq_len:
                self._finish(r, FinishReason.MAX_TOKENS)
            elif r.on_token is not None:
                r.on_token(nxt)
        return len([r for r in self.slots if r is not None])

    # ------------------------------------------------------------------

    def start(self) -> None:
        """Run the scheduling loop on a background thread (serving mode)."""
        if self._running:
            return
        self._running = True

        def loop():
            while self._running:
                n = self.step()
                if n == 0 and self.pending.empty():
                    time.sleep(0.001)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
