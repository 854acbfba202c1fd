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
    PREFILLING = "PREFILLING"
    RUNNING = "RUNNING"
    DONE = "DONE"


@dataclass
class GenRequest:
    prompt_ids: list[int]
    max_new_tokens: int = 256
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    stop_ids: set[int] = field(default_factory=set)
    stop_strings: list[str] = field(default_factory=list)
    seed: int | None = None  # per-request sampling seed (OpenAI `seed`)
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    on_token: Callable[[int], None] | None = None
    session_id: str | None = None  # KV affinity (X-Jlama-Session semantics)
    tools: list | None = None  # Tool schemas: finished output is scanned for
    # calls and finish becomes TOOL_CALL (AbstractModel.java:653-707)
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
    # chunked-prefill progress: full token list and next index to prefill
    _pf_ids: list[int] = field(default_factory=list)
    _pf_done: int = 0
    text_override: str | None = None  # set when a stop string truncates output
    tool_calls: list = field(default_factory=list)
    error: str | None = None
    done_event: threading.Event = field(default_factory=threading.Event)

    def to_response(self, tokenizer=None) -> Response:
        text = ""
        if self.text_override is not None:
            text = self.text_override
        elif tokenizer is not None:
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
            tool_calls=list(self.tool_calls),
            error=self.error,
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
        prefill_chunk: int = 256,
        max_sessions: int = 64,
        fuse: bool = True,
        moe_ragged: bool = True,
        decode_lag: int | None = None,
        layer_mode: str = "scan",
        weight_format: str | None = None,
        step_channel=None,
    ):
        # multi-host serving: host 0 owns the scheduler and broadcasts each
        # step's program over `step_channel`; other processes replay the
        # identical device calls in run_follower() (the TPU-native form of
        # Coordinator.java:147-226 driving workers over gRPC — see
        # runtime/coordination.py)
        self._chan = step_channel
        self._multiproc = jax.process_count() > 1
        self._is_leader = jax.process_index() == 0
        if self._multiproc and mesh is None:
            raise ValueError("multi-process serving requires a mesh")
        # shard_map tensor-parallel forward (VERDICT r4 #1): under a tp mesh
        # the Pallas kernels must see per-shard operands, which GSPMD's
        # replicated-custom-call fallback cannot deliver. Decided BEFORE
        # fusing because the fused qkv/gate-up rows must be shard-interleaved
        # (models.base.fuse_params tp argument). JLAMA_SHARD_MAP=0 forces the
        # GSPMD path.
        self._sm = None  # SpmdCtx when active (parallel/tp_forward.py)
        self._sm_pspecs = None
        self._sm_cfg = cfg
        sm_tp = 1
        sm_dp = 1  # dp>1: batch slots + KV pages shard over the dp axis
        if mesh is not None and weight_format != "q4s":
            import os as _os_sm

            from ..parallel.tp_forward import can_shard_map

            qleaves = [
                leaf
                for leaf in jax.tree.leaves(
                    params, is_leaf=lambda x: hasattr(x, "fmt")
                )
                if hasattr(leaf, "fmt")
            ]
            quantized = bool(qleaves)
            # weights already in the GLOBAL q4k permutation cannot shard:
            # the per-shard layout must be chunk-repacked from canonical q4
            # by this constructor (weight_format="q4k"); a tp block slice of
            # the global permutation would contract mismatched features
            pre_permuted = any(
                leaf.fmt in ("q4k", "q4s") for leaf in qleaves
            )
            if (
                not pre_permuted
                and _os_sm.environ.get("JLAMA_SHARD_MAP", "1") != "0"
                and (
                    mesh.shape.get("tp", 1) > 1 or mesh.shape.get("dp", 1) > 1
                )
                and n_pages % mesh.shape.get("dp", 1) == 0
                and can_shard_map(cfg, mesh, n_slots, quantized=quantized)
            ):
                sm_tp = mesh.shape["tp"]
                sm_dp = mesh.shape["dp"]
        self._sm_dp = sm_dp
        self._spg = n_slots // sm_dp  # slots per dp group
        if fuse:
            from ..models.base import fuse_params

            params = fuse_params(params, tp=sm_tp)
        if moe_ragged and cfg.n_experts:
            # top-k-only grouped expert matmuls in serving (float experts;
            # quantized experts keep the dense path — see prepare_moe_ragged)
            from ..models.base import prepare_moe_ragged

            params = prepare_moe_ragged(params)
        if weight_format == "q4s":
            # w8a8 kernel format: MUST repack after fusing (q4s's group-major
            # layout cannot be concatenated along the output dim). Under a
            # mesh, shard_params knows the group-major specs (mesh.py
            # param_shardings: N over tp for row-parallel, ngrp for
            # col-parallel; sigma/swk follow).
            from ..ops.pallas_w8a8 import prepare_params_for_w8a8

            params = prepare_params_for_w8a8(params)
        elif weight_format == "q4k":
            from ..ops.pallas_q4 import prepare_params_for_pallas

            # shard_map tp: row-parallel weights (wo/w2) get the per-shard
            # chunked kernel layout so each shard's packed slice is a valid
            # q4k for its contiguous input segment
            params = prepare_params_for_pallas(params, row_chunks=sm_tp)
        if mesh is not None:
            # re-apply the wqkv/w13 PartitionSpecs AFTER fusing: the concat of
            # already-sharded wq/wk/wv would otherwise carry whatever sharding
            # GSPMD propagates (possibly replicated, inflating per-chip HBM by
            # the fused-weight size). Same fuse→shard order as Engine.
            from ..parallel.mesh import shard_params

            params = shard_params(params, cfg, mesh)
        from ..models.base import effective_layer_mode

        layer_mode = effective_layer_mode(cfg, layer_mode)
        self.mesh = mesh
        self.layer_mode = layer_mode
        if layer_mode == "unrolled":
            # per-layer weight arrays: decode reads each weight straight from
            # its own HBM buffer instead of dynamic-slicing the stacked
            # [L, ...] array every step (~2x decode HBM traffic under scan)
            from ..models.base import unstack_params

            params = unstack_params(params, cfg)
        self.params = params
        if sm_tp > 1 or sm_dp > 1:
            from ..parallel import tp_forward as _tpf
            from ..parallel.mesh import param_pspecs

            pspecs = param_pspecs(params, cfg, mesh)
            ok, embed_sh, lm_sh = _tpf.specs_ok(pspecs, sm_tp)
            if not ok:  # pragma: no cover — can_shard_map should prevent it
                raise ValueError(
                    "shard_map tp forward: a weight spec degraded to "
                    "replicated after fusing (params were interleave-fused "
                    "for shard_map, which the GSPMD fallback cannot use); "
                    "set JLAMA_SHARD_MAP=0 to force the GSPMD path"
                )
            self._sm = _tpf.SpmdCtx(
                "tp", "dp" if sm_dp > 1 else None, embed_sh, lm_sh
            )
            self._sm_pspecs = pspecs
            self._sm_cfg = _tpf.localize_cfg(cfg, sm_tp)
        # self.cfg marks the weight-tree layout for OUTSIDE consumers (the
        # embed/classify Engine shares self.params): fused_tp>1 says fused
        # rows are shard-interleaved and q4k wo/w2 are chunk-repacked
        # (nn.layers handles both given the marker)
        if sm_tp > 1:
            from dataclasses import replace as _dc_replace

            cfg = _dc_replace(cfg, fused_tp=sm_tp)
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
            groups=sm_dp,
        )
        if mesh is not None:
            # pool [L, n_kv, n_pages, ps, hd]: KV heads ride the tp axis
            # (each TP shard stores only its KV-head slice,
            # cf. KvBufferCache.java:105-110); under the shard_map dp path
            # the PAGE axis shards over dp — each dp group holds only its
            # own sequences' pages (allocator group ranges)
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(
                mesh,
                P(None, "tp", "dp" if sm_dp > 1 else None, None, None),
            )
            self.kv.state = jax.tree.map(
                lambda a: self._global_put(a, s), self.kv.state
            )
        if layer_mode == "unrolled":
            st = self.kv.state
            self.kv.state = [
                PagedKVState(
                    jax.tree.map(lambda a: a[l], st.k_pool),
                    jax.tree.map(lambda a: a[l], st.v_pool),
                )
                for l in range(cfg.n_layers)
            ]
        self.slots: list[GenRequest | None] = [None] * n_slots
        self.pending: queue.Queue[GenRequest] = queue.Queue()
        # session resume state: session_id -> (position, pending_token)
        # pages stay allocated under the session's kv key between requests
        # (cf. KvBufferCache session map + Coordinator.sessionPositions);
        # insertion order == LRU order (entries re-inserted on use)
        self.session_state: dict[str, tuple[int, int | None]] = {}
        self._suspended: dict[str, tuple] = {}
        self.max_sessions = max_sessions
        self.prefill_chunk = prefill_chunk
        # double-buffered decode windows: the undrained window's device
        # token arrays + its running-request snapshot; page releases are
        # deferred while a chained window may still write through old page
        # tables (see step())
        self._undrained: tuple | None = None
        self._release_q: list[str] = []
        self._chain_tail: dict | None = None
        # set to the failure reason when a peer process is lost (multi-host);
        # new submissions fail fast and /healthz turns 503 until restart
        self.degraded: str | None = None
        self.key = jax.random.PRNGKey(seed)
        self._rng = np.random.default_rng(seed)
        # per-slot generated-token counts for presence/frequency penalties;
        # lives on device, scatter-updated inside the decode step
        self.counts = self._dev(np.zeros((n_slots, cfg.vocab_size), np.int32))
        self._lock = threading.RLock()
        self._running = False
        self._thread: threading.Thread | None = None
        # async decode pipeline depth: when the batch is in steady state
        # (nothing pending/prefilling, every running row has headroom), up to
        # `decode_lag` decode steps are dispatched back-to-back with the
        # sampled tokens fed device-to-device, and the host consumes the
        # results one window behind. This keeps the per-token host round-trip
        # (dispatch + D2H sync) off the critical path; stop conditions are
        # checked up to `decode_lag` tokens late, and any tokens sampled past
        # a stop are discarded (their KV writes land in slots the next real
        # token overwrites).
        if decode_lag is None:
            import os

            decode_lag = int(os.environ.get("JLAMA_DECODE_LAG", "4"))
        self.decode_lag = max(1, decode_lag)
        # bound token-delivery burstiness for STREAMING requests: windows
        # cap at stream_lag when any running request has an on_token
        # callback (tokens are delivered at window drains, so inter-token
        # p95 ~ window depth x step time for SSE clients)
        import os as _os2

        self.stream_lag = max(
            1, int(_os2.environ.get("JLAMA_STREAM_LAG",
                                    str(min(4, self.decode_lag))))
        )
        # inter-token latency budget (ms): auto-tunes the async window depth
        # so the drain interval (≈ depth × step time) stays under budget.
        # Step time is an EWMA of steady-state drain spacing, so the knob
        # adapts to the model/batch instead of needing a hand-picked lag.
        self.itl_budget_ms = (
            float(_os2.environ.get("JLAMA_ITL_BUDGET_MS", "0")) or None
        )
        # prefill fairness (VERDICT r4 weak #5): cap how many requests each
        # batched prefill call advances, FIFO-ordered by arrival. Unlimited
        # batching maximizes weight-read sharing but makes EVERY burst
        # arrival wait for the whole backlog to drain (TTFT p50 = backlog /
        # prefill rate); a cap staggers completions so early arrivals serve
        # first. The measured tradeoff lives in the serving-curve artifact
        # (scripts/bench_serving_sweep.py --fair-rows).
        self.prefill_fair_rows = (
            int(_os2.environ.get("JLAMA_PREFILL_FAIR_ROWS", "0")) or None
        )
        self._step_ms: float | None = None
        self._last_drain: float | None = None
        # eviction epoch: a suspend/offload inside a drain interval would
        # pollute the step-time EWMA (ADVICE r4) — such samples are skipped
        self._evictions = 0
        self._drain_evictions = 0

        # attn_window (static, bucketed) bounds how many page-table columns
        # the attention gather touches; without it every prefill chunk reads
        # the full max-context window per layer
        def _wrap(state, pt):
            if isinstance(state, list):
                from ..nn import layers as L

                return [
                    L.PagedLayerCache(s.k_pool, s.v_pool, pt) for s in state
                ]
            return (state, pt)

        def _unwrap(cache):
            if isinstance(cache, list):
                return [PagedKVState(c.k_pool, c.v_pool) for c in cache]
            return cache[0]

        def _prefill_body(params, state, tokens, positions, pt, attn_window,
                          cfg_):
            _, cache = forward_hidden(
                params, cfg_, tokens, positions, _wrap(state, pt),
                dtype=compute_dtype, attn_window=attn_window,
            )
            return _unwrap(cache)

        def _decode_body(params, state, tokens, positions, pts,
                         seeds, steps, temps, top_ps, top_ks, counts,
                         pres_pens, freq_pens, *, all_top_p_one,
                         all_top_k_zero, use_penalties, attn_window, cfg_,
                         pin_replicated):
            hidden, cache = forward_hidden(
                params, cfg_, tokens, positions, _wrap(state, pts),
                dtype=compute_dtype, attn_window=attn_window,
            )
            logits = lm_logits(params, cfg_, hidden[:, -1:, :])[:, 0]
            if use_penalties:
                # OpenAI presence/frequency penalties over generated tokens
                cf = counts.astype(jnp.float32)
                logits = logits - freq_pens[:, None] * cf
                logits = logits - pres_pens[:, None] * (cf > 0)
            # per-row PRNG stream: key(seed) folded with the step index, so a
            # request with an explicit seed reproduces its sample sequence
            # regardless of batch composition
            keys = jax.vmap(
                lambda s, t: jax.random.fold_in(jax.random.PRNGKey(s), t)
            )(seeds, steps)
            # statically skip the full-vocab sorts when no request uses
            # top_p / top_k this iteration
            toks = sample_token(
                logits, None, temps,
                top_k=0 if all_top_k_zero else top_ks,
                top_p=1.0 if all_top_p_one else top_ps, keys=keys,
            )
            if use_penalties:
                counts = counts.at[jnp.arange(counts.shape[0]), toks].add(1)
            if pin_replicated and mesh is not None:
                # pin the sampled tokens fully-replicated so every process
                # (and the host fetch) reads the same complete array
                from jax.sharding import NamedSharding, PartitionSpec as P

                toks = jax.lax.with_sharding_constraint(
                    toks, NamedSharding(mesh, P())
                )
            return toks, _unwrap(cache), counts

        if self._sm is None:
            @partial(jax.jit, donate_argnums=(1,), static_argnums=(5,))
            def _prefill(params, state, tokens, positions, pt, attn_window):
                return _prefill_body(
                    params, state, tokens, positions, pt, attn_window, cfg
                )

            @partial(
                jax.jit, donate_argnums=(1, 10),
                static_argnums=(11, 12, 13, 16),
            )
            def _decode(params, state, tokens, positions, pts,
                        seeds, steps, temps, top_ps, top_ks, counts,
                        all_top_p_one, all_top_k_zero, use_penalties,
                        pres_pens, freq_pens, attn_window):
                return _decode_body(
                    params, state, tokens, positions, pts, seeds, steps,
                    temps, top_ps, top_ks, counts, pres_pens, freq_pens,
                    all_top_p_one=all_top_p_one,
                    all_top_k_zero=all_top_k_zero,
                    use_penalties=use_penalties, attn_window=attn_window,
                    cfg_=cfg, pin_replicated=True,
                )
        else:
            # shard_map tp forward: every device runs the SAME program on its
            # LOCAL weight/KV shard — the Pallas q4k/attention kernels read
            # 1/tp of the bytes, with explicit psum at the reference's
            # combine points (parallel/tp_forward.py). Page tables, token
            # ids and sampling params are replicated; the sampled tokens are
            # identical on every device (logits are all_gather'd), so the
            # outputs use a replicated spec.
            from jax.sharding import PartitionSpec as P

            from ..parallel import tp_forward as _tpf

            sm_ctx = self._sm
            sm_cfg = self._sm_cfg
            pspecs = self._sm_pspecs
            rep = P()
            sm_dp_n = self._sm_dp
            dp_ax = "dp" if sm_dp_n > 1 else None
            row = P(dp_ax) if dp_ax else rep          # [B] per-row arrays
            row2 = P(dp_ax, None) if dp_ax else rep   # [B, 1]/[B, P] arrays
            npl = n_pages // sm_dp_n

            def _localize_pt(pt):
                # dp: page-table entries are GLOBAL page ids from the
                # group's allocator range; each dp shard subtracts its range
                # offset so they index its local pool slice (the group's
                # scratch page g*npl maps to local 0)
                if dp_ax is None:
                    return pt
                return pt - jax.lax.axis_index(dp_ax) * npl

            def _kv_leaf_spec(a):
                # stacked pools [L, n_kv, np, ps, X] / unrolled [n_kv, ...]:
                # KV heads ride tp (KvBufferCache.java:105-110 per-shard
                # kv segment); the page axis rides dp (each dp group's
                # sequences allocate only from its page range)
                return P(
                    *([None] * (a.ndim - 4)), "tp", dp_ax, None, None
                )

            state_spec = jax.tree.map(_kv_leaf_spec, self.kv.state)
            smap = jax.shard_map

            @partial(jax.jit, donate_argnums=(1,), static_argnums=(5,))
            def _prefill(params, state, tokens, positions, pt, attn_window):
                def body(params, state, tokens, positions, pt):
                    with _tpf.spmd_context(sm_ctx):
                        _tpf.record_trace_shapes(params)
                        return _prefill_body(
                            params, state, tokens, positions,
                            _localize_pt(pt), attn_window, sm_cfg,
                        )

                return smap(
                    body, mesh=mesh,
                    in_specs=(pspecs, state_spec, row2, row2, row2),
                    out_specs=state_spec, check_vma=False,
                )(params, state, tokens, positions, pt)

            @partial(
                jax.jit, donate_argnums=(1, 10),
                static_argnums=(11, 12, 13, 16),
            )
            def _decode(params, state, tokens, positions, pts,
                        seeds, steps, temps, top_ps, top_ks, counts,
                        all_top_p_one, all_top_k_zero, use_penalties,
                        pres_pens, freq_pens, attn_window):
                def body(params, state, tokens, positions, pts, seeds, steps,
                         temps, top_ps, top_ks, counts, pres_pens, freq_pens):
                    with _tpf.spmd_context(sm_ctx):
                        _tpf.record_trace_shapes(params)
                        # per-device batch rows / pool slice (dp assertions)
                        _tpf.TRACE_SHAPES["__rows__"] = tokens.shape[0]
                        _tpf.TRACE_SHAPES["__pool__"] = tuple(
                            jax.tree.leaves(state)[0].shape
                        )
                        toks, st, cnts = _decode_body(
                            params, state, tokens, positions,
                            _localize_pt(pts), seeds,
                            steps, temps, top_ps, top_ks, counts, pres_pens,
                            freq_pens, all_top_p_one=all_top_p_one,
                            all_top_k_zero=all_top_k_zero,
                            use_penalties=use_penalties,
                            attn_window=attn_window, cfg_=sm_cfg,
                            pin_replicated=False,
                        )
                    if dp_ax is not None:
                        # each dp shard sampled its own rows: assemble the
                        # full [B] token vector on every device
                        toks = jax.lax.all_gather(toks, dp_ax, axis=0,
                                                  tiled=True)
                    return toks, st, cnts

                return smap(
                    body, mesh=mesh,
                    in_specs=(pspecs, state_spec, row2, row2, row2, row,
                              row, row, row, row, row2, row, row),
                    out_specs=(rep, state_spec, row2), check_vma=False,
                )(params, state, tokens, positions, pts, seeds, steps,
                  temps, top_ps, top_ks, counts, pres_pens, freq_pens)

        self._prefill = _prefill
        self._decode = _decode

        @partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
        def _zero_row(counts, slot):
            return counts.at[slot].set(0)

        self._zero_row = _zero_row

    # ------------------------------------------------------------------
    # multi-process plumbing: under SPMD every device call on the globally
    # sharded params/KV must be issued by ALL processes with identical
    # inputs. The leader publishes each step's numpy inputs + static args
    # over the step channel; these helpers build the matching global arrays
    # on every process.

    def _global_put(self, a, sharding):
        if not self._multiproc:
            return jax.device_put(a, sharding)
        host = np.asarray(a)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )

    def _dev(self, x):
        """Per-step host input -> device array (replicated when multihost)."""
        x = np.asarray(x)
        if not self._multiproc:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(self.mesh, P())
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    @staticmethod
    def _fetch(a) -> np.ndarray:
        """Device -> host, tolerating non-fully-addressable (replicated)
        outputs: every process's shard 0 holds the complete value."""
        try:
            return np.asarray(a)
        except Exception:  # noqa: BLE001 — multi-process global array
            return np.asarray(a.addressable_shards[0].data)

    def _call_prefill(self, toks, pos, pt, win: int) -> None:
        if self._chan is not None and self._is_leader:
            self._chan.publish(
                {"op": "prefill", "toks": toks, "pos": pos, "pt": pt,
                 "win": int(win)}
            )
        self.kv.state = self._prefill(
            self.params, self.kv.state, self._dev(toks), self._dev(pos),
            self._dev(pt), win,
        )

    def _counts_reset(self, slot: int) -> None:
        if self._chan is not None and self._is_leader:
            self._chan.publish({"op": "counts_reset", "slot": int(slot)})
        self.counts = self._zero_row(self.counts, int(slot))

    def _run_decode_window(
        self, tokens, positions, pts, seeds, steps, temps, top_ps, top_ks,
        pres, freq, all_p1: bool, all_k0: bool, use_pen: bool, win: int,
        depth: int,
    ) -> list:
        """Issue `depth` chained decode steps; identical on all processes."""
        ct = {
            "tokens": self._dev(tokens),
            "positions": self._dev(positions),
            "steps": self._dev(steps),
            "seeds": self._dev(seeds),
            "temps": self._dev(temps),
            "top_ps": self._dev(top_ps),
            "top_ks": self._dev(top_ks),
            "pres": self._dev(pres),
            "freq": self._dev(freq),
            "pts": self._dev(pts),
            "all_p1": all_p1, "all_k0": all_k0, "use_pen": use_pen,
        }
        self._chain_tail = ct
        return self._chain_steps(win, depth)

    def _chain_steps(self, win: int, depth: int, pts=None) -> list:
        """Advance the device-side decode chain `depth` steps from
        self._chain_tail (sampled tokens feed back device-to-device; the
        tail is updated so a later window can continue without any host
        round trip). `pts` replaces the tail's page tables (a chained
        window may span pages allocated after the tail was built)."""
        import os as _os

        ct = self._chain_tail
        if pts is not None:
            ct["pts"] = self._dev(pts)
        tokens_d, positions_d, steps_d = ct["tokens"], ct["positions"], ct["steps"]
        toks_windows = []
        for _ in range(depth):
            toks, self.kv.state, self.counts = self._decode(
                self.params, self.kv.state, tokens_d, positions_d, ct["pts"],
                ct["seeds"], steps_d, ct["temps"], ct["top_ps"],
                ct["top_ks"], self.counts, ct["all_p1"], ct["all_k0"],
                ct["use_pen"], ct["pres"], ct["freq"], win,
            )
            if not _os.environ.get("JLAMA_NO_ASYNC_COPY"):
                try:
                    toks.copy_to_host_async()
                except Exception:  # noqa: BLE001 — no async D2H here
                    pass
            toks_windows.append(toks)
            tokens_d = toks[:, None]
            positions_d = positions_d + 1
            steps_d = steps_d + 1
        ct["tokens"], ct["positions"], ct["steps"] = (
            tokens_d, positions_d, steps_d,
        )
        return toks_windows

    def run_follower(self) -> None:
        """Follower loop for processes > 0 in multi-host serving: replay the
        leader's device calls so the SPMD programs line up (the TPU-native
        form of the reference worker's GenerateObserver loop,
        net/Worker.java:318-350 — but only step *descriptors* cross the
        wire; activations and all-reduces stay on ICI inside the programs).
        Returns when the leader publishes "stop"."""
        if self._chan is None or self._is_leader:
            raise RuntimeError("run_follower needs a step channel on a "
                               "process with process_index > 0")
        while True:
            msg = self._chan.next()
            op = msg["op"]
            if op == "stop":
                return
            if op == "ping":  # leader idle heartbeat
                continue
            if op == "prefill":
                self._call_prefill(msg["toks"], msg["pos"], msg["pt"],
                                   msg["win"])
            elif op == "decode":
                self._run_decode_window(
                    msg["tokens"], msg["positions"], msg["pts"],
                    msg["seeds"], msg["steps"], msg["temps"],
                    msg["top_ps"], msg["top_ks"], msg["pres"], msg["freq"],
                    msg["all_p1"], msg["all_k0"], msg["use_pen"],
                    msg["win"], msg["depth"],
                )
            elif op == "decode_chain":
                self._chain_steps(msg["win"], msg["depth"], msg.get("pts"))
            elif op == "ptick":
                # pp-pipeline tick window (PipelinedScheduler followers)
                self._run_ticks(msg, publish=False, collect=False)
            elif op == "counts_reset":
                self._counts_reset(msg["slot"])
            elif op == "suspend":
                payload = self._suspend_pages(
                    msg["sid"], msg["idxs"], msg["dir"]
                )
                self._suspended[msg["sid"]] = (payload, None, 0)
            elif op == "resume":
                payload = self._suspended.pop(msg["sid"])[0]
                self._restore_pages(msg["sid"], payload, msg["idxs"])
            elif op == "sdrop":
                self._suspended.pop(msg["sid"], None)
            elif op == "embed_hidden":
                eng = getattr(self, "embed_engine", None)
                if eng is None:
                    raise RuntimeError(
                        "leader broadcast an embed step but this follower "
                        "has no embed_engine attached"
                    )
                eng.run_embed_hidden(
                    msg["toks"], msg["pos"], msg["tt"], msg.get("lens")
                )
            elif op == "embed_pool":
                eng = getattr(self, "embed_engine", None)
                if eng is None:
                    raise RuntimeError(
                        "leader broadcast an embed step but this follower "
                        "has no embed_engine attached"
                    )
                eng.run_embed_pooled(
                    msg["toks"], msg["pos"], msg["tt"], msg["lens"],
                    msg["pooling"],
                )
            else:  # pragma: no cover — future ops
                raise ValueError(f"unknown step op {op!r}")

    # ------------------------------------------------------------------

    def _window_buckets(self, max_context: int) -> list[int]:
        cap = self.kv.max_pages_per_seq * self.kv.page_size
        limit = min(max_context, cap, self.max_seq_len)
        wins: list[int] = []
        w = 16
        while True:
            b = min(_bucket(w), cap, self.max_seq_len)
            if b not in wins:
                wins.append(b)
            if b >= limit:
                break
            w = b + 1
        return wins

    def warmup(self, max_context: int | None = None,
               prefill_rows: tuple | None = None,
               decode_windows: list | None = None,
               prefill_windows: list | None = None) -> None:
        """Pre-compile every (window, prefill-rows, chunk) jit variant that
        serving traffic up to `max_context` tokens will hit, so first
        requests never stall on the request path (VERDICT r3 weak #3: TTFT
        p50 324 ms at 4-way vs 87 single-stream — first-hit compiles). The
        persistent XLA compile cache makes this one-time per config.

        Dummy inputs run against the scratch page (zero page tables), so no
        real sequence state is touched; in multi-host mode the calls are
        broadcast like any other step, warming every process.
        """
        wins = self._window_buckets(max_context or self.max_seq_len)
        decode_windows = decode_windows if decode_windows is not None else wins
        prefill_windows = (
            prefill_windows if prefill_windows is not None else wins
        )
        B = self.n_slots
        dp = self._sm_dp
        if prefill_rows is None:
            # dp: prefill row counts come in dp-blocks (see _advance_prefill)
            prefill_rows, r = [], 1
            while r <= (self._spg if dp > 1 else B):
                prefill_rows.append(r * (dp if dp > 1 else 1))
                r *= 2
        zeros = lambda *s: np.zeros(s, np.int32)  # noqa: E731
        # dummy tables point at each row's group scratch page
        dec_pt = self.kv.page_table(
            ["__empty__"] * B, groups=self._slot_groups()
        )
        for win in decode_windows:
            if self._chan is not None and self._is_leader:
                self._chan.publish(
                    {"op": "decode", "tokens": zeros(B, 1),
                     "positions": zeros(B, 1),
                     "pts": dec_pt,
                     "seeds": zeros(B), "steps": zeros(B),
                     "temps": np.zeros(B, np.float32),
                     "top_ps": np.ones(B, np.float32), "top_ks": zeros(B),
                     "pres": np.zeros(B, np.float32),
                     "freq": np.zeros(B, np.float32), "all_p1": True,
                     "all_k0": True, "use_pen": False, "win": int(win),
                     "depth": 1}
                )
            self._run_decode_window(
                zeros(B, 1), zeros(B, 1), dec_pt,
                zeros(B), zeros(B), np.zeros(B, np.float32),
                np.ones(B, np.float32), zeros(B), np.zeros(B, np.float32),
                np.zeros(B, np.float32), True, True, False, win, 1,
            )
        chunk = self.prefill_chunk
        for rows in prefill_rows:
            row_groups = (
                [i // (rows // dp) for i in range(rows)] if dp > 1 else None
            )
            pf_pt = self.kv.page_table(
                ["__empty__"] * rows, groups=row_groups
            )
            for win in prefill_windows:
                if win < chunk:
                    continue
                toks = zeros(rows, chunk)
                pos = np.broadcast_to(
                    np.arange(chunk, dtype=np.int32), (rows, chunk)
                ).copy()
                self._call_prefill(toks, pos, pf_pt, win)

    def submit(self, req: GenRequest) -> GenRequest:
        req.t_start = time.perf_counter()
        if self.degraded:
            req.error = f"cluster degraded: {self.degraded}"
            req.finish = FinishReason.ERROR
            req.state = RequestState.DONE
            req.done_event.set()
            return req
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

    def _touch_session(self, session_id: str) -> None:
        """Move a session to most-recently-used position (dict order = LRU)."""
        if session_id in self.session_state:
            self.session_state[session_id] = self.session_state.pop(session_id)

    def _idle_sessions_lru(self) -> list[str]:
        active = {
            r.session_id for r in self.slots if r is not None and r.session_id
        }
        return [s for s in self.session_state if s not in active]

    def _evict_for_pages(self, group: int = 0) -> bool:
        """Free HBM pages by suspending the least-recently-used idle session
        to host RAM. Returns True if something was evicted. Under dp only
        sessions of the SAME page group can free useful pages (the pool's
        page ranges are disjoint per dp shard)."""
        for sid in self._idle_sessions_lru():
            if (
                self._sm_dp > 1
                and self.kv.alloc.group_of.get(sid, 0) != group
            ):
                continue
            if self.suspend_session(sid):
                self._evictions += 1
                return True
        return False

    def _ensure_capacity_evicting(
        self, key: str, upto: int, ps: int, group: int = 0
    ) -> bool:
        while True:
            try:
                self.kv.alloc.ensure_capacity(key, upto, ps, group=group)
                return True
            except MemoryError:
                if not self._evict_for_pages(group):
                    return False

    def _slot_groups(self) -> list[int] | None:
        """Per-slot dp group (page-table scratch selection); None when dp=1."""
        if self._sm_dp <= 1:
            return None
        return [s // self._spg for s in range(self.n_slots)]

    def _admit(self) -> None:
        free = [i for i in range(self.n_slots) if self.slots[i] is None]
        deferred: list[GenRequest] = []
        while free:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break

            ps = self.kv.page_size
            key = self._kv_key(req)
            # dp: a session with live OR suspended pages is pinned to the dp
            # group that owns its page range — only slots of that group may
            # serve it. Slot selection runs BEFORE any suspended-session
            # restore, so a busy group never triggers restore/offload churn.
            want_g = None
            if self._sm_dp > 1:
                want_g = self.kv.alloc.group_of.get(key)
                if want_g is None and key in self._suspended:
                    want_g = self._suspended[key][2]
            slot = next(
                (
                    s for s in free
                    if want_g is None or s // self._spg == want_g
                ),
                None,
            )
            if slot is None:
                deferred.append(req)  # right-group slots busy; retry later
                continue

            # session resume: prepend the pending (sampled-but-unforwarded)
            # token and continue from the stored position
            prompt_ids = list(req.prompt_ids)
            start_pos = 0
            if req.session_id:
                if req.session_id in self._suspended and not self.resume_session(
                    req.session_id
                ):
                    deferred.append(req)  # no pages even after eviction
                    continue
                if req.session_id in self.session_state:
                    start_pos, pending_tok = self.session_state[req.session_id]
                    if pending_tok is not None:
                        prompt_ids = [pending_tok] + prompt_ids
                    self._touch_session(req.session_id)

            n = len(prompt_ids)
            if n == 0 or start_pos + n >= self.max_seq_len:
                req.finish = FinishReason.ERROR
                req.state = RequestState.DONE
                req.done_event.set()
                continue
            group = slot // self._spg if self._sm_dp > 1 else 0
            if not self._ensure_capacity_evicting(
                key, start_pos + n, ps, group
            ):
                deferred.append(req)  # retry when pages free up
                break
            if req.seed is None:
                # unseeded requests still get a fixed per-request stream so
                # batch composition never perturbs their samples
                req.seed = int(self._rng.integers(0, 2**31 - 1))
            # prefill runs in <=prefill_chunk-token chunks interleaved with
            # decode steps (cf. the reference's <=256-token batchForward
            # chunks, AbstractModel.java:295-312) so admissions do not stall
            # the running batch
            req._pf_ids = prompt_ids
            req._pf_done = 0
            req.position = start_pos
            req.slot = slot
            req.state = RequestState.PREFILLING
            self.slots[slot] = req
            free.remove(slot)
            if req.presence_penalty or req.frequency_penalty:
                self._counts_reset(slot)
        for r in deferred:
            self.pending.put(r)

    def _advance_prefill(self) -> None:
        """Run at most ONE prefill call per iteration — but batched across
        ALL requests still prefilling (beyond the reference's one-request
        batchForward, AbstractModel.java:295-312): concurrent arrivals share
        the chunk's weight reads instead of serializing their prompts.
        Decode inter-token latency stays bounded by the single call."""
        todo = []
        for req in self.slots:
            if req is None or req.state != RequestState.PREFILLING:
                continue
            remaining = len(req._pf_ids) - 1 - req._pf_done
            if remaining > 0:
                todo.append((req, remaining))
            else:
                self._promote_prefilled(req)
        if not todo:
            return
        ps = self.kv.page_size
        table_len = self.kv.max_pages_per_seq * ps
        chunk = min(self.prefill_chunk, max(rem for _, rem in todo))
        bucket = chunk if chunk == self.prefill_chunk else _bucket(chunk)
        # rows must fit pos+bucket inside their page table: pads write to
        # contiguous future positions, and past-table positions would clamp
        # onto the row's LAST real page (corrupting it). Rows near their
        # table end run alone with an exact (pad-free) bucket instead.
        fit = [rt for rt in todo if rt[0].position + bucket <= table_len]
        if not fit:
            req, rem = todo[0]
            chunk = min(self.prefill_chunk, rem)
            bucket = chunk  # exact length: no pads past the table
            fit = [(req, rem)]
        if self.prefill_fair_rows is not None:
            # FIFO fairness: only the oldest K requests advance this call
            fit = sorted(fit, key=lambda rt: rt[0].t_start)
            fit = fit[: self.prefill_fair_rows]
        batch = []
        for req, rem in fit:
            take = min(rem, bucket)
            g = req.slot // self._spg if self._sm_dp > 1 else 0
            if self._ensure_capacity_evicting(
                self._kv_key(req), req.position + take, ps, g
            ):
                batch.append((req, take))
            # rows without page capacity sit this call out; retried next step
        if not batch:
            return
        if self._sm_dp > 1:
            # dp: prefill rows are laid out in dp blocks (row spec P('dp')),
            # so each dp shard prefills only its own group's requests; pad
            # rows of block g run that group's scratch page
            dp = self._sm_dp
            by_g: dict[int, list] = {}
            for req, take in batch:
                by_g.setdefault(req.slot // self._spg, []).append((req, take))
            rpg = 1
            while rpg < max(len(v) for v in by_g.values()):
                rpg *= 2
            rows = dp * rpg
            toks = np.zeros((rows, bucket), dtype=np.int32)
            pos = np.zeros((rows, bucket), dtype=np.int32)
            seq_ids = ["__empty__"] * rows
            groups = [r // rpg for r in range(rows)]
            win = 0
            for g, items in by_g.items():
                for j, (req, take) in enumerate(items):
                    r = g * rpg + j
                    ids = req._pf_ids
                    toks[r, :take] = ids[req._pf_done : req._pf_done + take]
                    pos[r] = np.arange(req.position, req.position + bucket)
                    seq_ids[r] = self._kv_key(req)
                    win = max(win, _bucket(req.position + bucket))
            pt = self.kv.page_table(seq_ids, groups=groups)
        else:
            # row count rides power-of-two buckets so (rows, chunk, window)
            # compile variants stay bounded; pad rows run the scratch page
            rows = 1
            while rows < len(batch):
                rows *= 2
            toks = np.zeros((rows, bucket), dtype=np.int32)
            pos = np.zeros((rows, bucket), dtype=np.int32)
            seq_ids = ["__empty__"] * rows
            win = 0
            for i, (req, take) in enumerate(batch):
                ids = req._pf_ids
                toks[i, :take] = ids[req._pf_done : req._pf_done + take]
                pos[i] = np.arange(req.position, req.position + bucket)
                seq_ids[i] = self._kv_key(req)
                win = max(win, _bucket(req.position + bucket))
            pt = self.kv.page_table(seq_ids)
        win = min(win, self.kv.max_pages_per_seq * ps)
        self._call_prefill(toks, pos, pt, win)
        for req, take in batch:
            req._pf_done += take
            req.position += take
            if req._pf_done >= len(req._pf_ids) - 1:
                self._promote_prefilled(req)

    def _promote_prefilled(self, req: GenRequest) -> None:
        req.cur_token = req._pf_ids[-1] if req._pf_ids else req.cur_token
        req.state = RequestState.RUNNING
        req.t_first = time.perf_counter()
        req._pf_ids = []

    def _finish(self, req: GenRequest, reason: FinishReason) -> None:
        req.finish = reason
        if (
            req.tools
            and self.tokenizer is not None
            and reason in (FinishReason.STOP_TOKEN, FinishReason.MAX_TOKENS)
        ):
            # tool-call post-processing inside the scheduler so the
            # Response's finish_reason is authoritative (the reference sets
            # TOOL_CALL in generate itself, AbstractModel.java:653-707)
            from ..prompt import extract_tool_calls

            stops = req.stop_ids or set(self.cfg.eos_token_ids)
            text = (
                req.text_override
                if req.text_override is not None
                else self.tokenizer.decode(
                    [t for t in req.out_ids if t not in stops]
                )
            )
            calls = extract_tool_calls(text, req.tools)
            if calls:
                req.tool_calls = calls
                req.finish = FinishReason.TOOL_CALL
        req.state = RequestState.DONE
        req.t_done = time.perf_counter()
        from ..utils.metrics import GLOBAL_METRICS

        GLOBAL_METRICS.record(req.to_response())
        if req.session_id:
            # keep the session's pages; remember where to resume
            self.session_state.pop(req.session_id, None)
            self.session_state[req.session_id] = (req.position, req.cur_token)
            # bound live sessions: LRU-suspend to host beyond max_sessions
            while len(self.session_state) > self.max_sessions:
                idle = self._idle_sessions_lru()
                if not idle or not self.suspend_session(idle[0]):
                    break
        else:
            key = self._kv_key(req)
            if self._undrained is not None:
                # an in-flight chained window may still write through the
                # old page tables; release only after it drains
                self._release_q.append(key)
            else:
                self.kv.alloc.release(key)
        self.slots[req.slot] = None
        req.slot = -1
        req.done_event.set()

    def _flush_releases(self) -> None:
        while self._release_q:
            self.kv.alloc.release(self._release_q.pop())

    def drop_session(self, session_id: str) -> None:
        with self._lock:
            if any(
                r is not None and r.session_id == session_id
                for r in self.slots
            ):
                return  # active in the batch: caller retries after finish
            self.session_state.pop(session_id, None)
            self.kv.alloc.release(session_id)
            if self._suspended.pop(session_id, None) is not None:
                if self._chan is not None and self._is_leader:
                    # free the followers' mirrored payload too
                    self._chan.publish({"op": "sdrop", "sid": session_id})

    # ------------------------------------------------------------------
    # session offload — the TPU equivalent of the reference's disk-backed
    # KV pages (KvBufferCache.java:134-174): an idle session's pages move
    # to host RAM (or disk via np.save) and its HBM pages are freed; a
    # resume copies them back into freshly allocated pages.
    # ------------------------------------------------------------------

    def suspend_session(self, session_id: str, to_dir: str | None = None) -> bool:
        with self._lock:
            return self._suspend_session_locked(session_id, to_dir)

    def _suspend_session_locked(
        self, session_id: str, to_dir: str | None = None
    ) -> bool:
        if session_id not in self.session_state:
            return False
        if any(
            r is not None and r.session_id == session_id for r in self.slots
        ):
            # an ACTIVE session's pages are being written by in-flight
            # device steps; suspending them out from under the batch would
            # free pages another request could reuse mid-write
            return False
        pages = self.kv.alloc.pages_for(session_id)
        if not pages:
            return False
        idxs_np = np.asarray(pages, dtype=np.int32)
        if self._chan is not None and self._is_leader:
            # multi-host: the page gather (and the pinned_host park) is a
            # device program every process must issue — broadcast it like
            # any other step; followers mirror the payload in run_follower()
            self._chan.publish(
                {"op": "suspend", "sid": session_id, "idxs": idxs_np,
                 "dir": to_dir}
            )
        payload = self._suspend_pages(session_id, idxs_np, to_dir)
        # record the session's dp group BEFORE release pops it: a resume
        # must re-allocate pages from the same group range (its batch rows
        # live on that dp shard)
        self._suspended[session_id] = (
            payload,
            self.session_state[session_id],
            self.kv.alloc.group_of.get(session_id, 0),
        )
        self.kv.alloc.release(session_id)
        self.session_state.pop(session_id)
        return True

    def _suspend_pages(self, session_id: str, idxs_np, to_dir: str | None):
        """Device half of suspend (runs on EVERY process under multi-host):
        gather the session's pages out of the pools, then park them off-HBM —
        host numpy on one process, the pinned_host memory kind (each process
        keeps its own shard-local copy in host RAM) on a multi-process mesh.
        Tree-mapped so quantized (QArray) pools offload payload + scales."""
        idxs = jnp.asarray(idxs_np)
        k_tree, v_tree = self._pool_trees()
        unrolled = isinstance(self.kv.state, list)
        take = (lambda a: a[:, idxs]) if unrolled else (lambda a: a[:, :, idxs])
        k_dev = jax.tree.map(take, k_tree)
        v_dev = jax.tree.map(take, v_tree)
        if self._multiproc:
            if to_dir is not None:
                return self._suspend_shards_to_disk(
                    session_id, to_dir, k_dev, v_dev
                )
            # park each process's addressable shards in its own host RAM
            # (a global array cannot be pulled to one host; device_put to a
            # pinned_host sharding is rejected on the CPU test backend)
            leaves = jax.tree.leaves((k_dev, v_dev))
            _, treedef = jax.tree.flatten((k_dev, v_dev))
            shards = [
                [np.asarray(s.data) for s in a.addressable_shards]
                for a in leaves
            ]
            meta = [
                (a.shape, a.sharding, [s.device for s in a.addressable_shards])
                for a in leaves
            ]
            return ("mram", shards, treedef, meta)
        k_host = jax.tree.map(np.asarray, k_dev)
        v_host = jax.tree.map(np.asarray, v_dev)
        if to_dir is not None:
            import os

            os.makedirs(to_dir, exist_ok=True)
            # uint8 views: npz has no dtype for bf16 pools (saves as void
            # |V2 which cannot round-trip); restore views back via the pool
            # leaf's dtype
            np.savez(
                f"{to_dir}/{session_id}.kv.npz",
                *[
                    np.ascontiguousarray(a).view(np.uint8)
                    for a in jax.tree.leaves((k_host, v_host))
                ],
            )
            return ("disk", to_dir)
        return ("ram", k_host, v_host)

    def _suspend_shards_to_disk(self, session_id, to_dir, k_dev, v_dev):
        """Multi-process disk offload: each process saves only its
        addressable shards (the global arrays cannot be pulled to one host);
        sharding metadata stays in RAM for the reconstructing device_puts."""
        import os

        os.makedirs(to_dir, exist_ok=True)
        leaves = jax.tree.leaves((k_dev, v_dev))
        np.savez(
            f"{to_dir}/{session_id}.kv.p{jax.process_index()}.npz",
            *[
                np.stack(
                    [np.asarray(s.data) for s in a.addressable_shards]
                ).view(np.uint8)  # npz-safe: bf16 has no npz dtype
                for a in leaves
            ],
        )
        _, treedef = jax.tree.flatten((k_dev, v_dev))
        meta = [
            (a.shape, a.sharding, [s.device for s in a.addressable_shards])
            for a in leaves
        ]
        return ("mdisk", to_dir, treedef, meta)

    def _pool_trees(self):
        st = self.kv.state
        if isinstance(st, list):
            return [s.k_pool for s in st], [s.v_pool for s in st]
        return st.k_pool, st.v_pool

    def _payload_pages(self, session_id: str, payload) -> int:
        """Page count stored in a suspend payload."""
        unrolled = isinstance(self.kv.state, list)
        page_ax = 1 if unrolled else 2
        kind = payload[0]
        if kind == "ram":
            return jax.tree.leaves(payload[1])[0].shape[page_ax]
        if kind in ("mram", "mdisk"):
            return payload[3][0][0][page_ax]
        with np.load(f"{payload[1]}/{session_id}.kv.npz") as z:
            return z[z.files[0]].shape[page_ax]

    def resume_session(self, session_id: str) -> bool:
        with self._lock:
            return self._resume_session_locked(session_id)

    def _resume_session_locked(self, session_id: str) -> bool:
        if session_id not in self._suspended:
            return False
        payload, state, group = self._suspended[session_id]
        n_pages = self._payload_pages(session_id, payload)
        ps = self.kv.page_size
        # allocate with eviction; a full (group) pool must NOT raise out of
        # the scheduler loop (that would fail every in-flight request) —
        # the session just stays suspended and its requester retries
        while True:
            try:
                pages = self.kv.alloc.ensure_capacity(
                    session_id, n_pages * ps, ps, group=group
                )
                break
            except MemoryError:
                if not self._evict_for_pages(group):
                    self.kv.alloc.release(session_id)  # partial alloc back
                    return False
        idxs_np = np.asarray(pages, dtype=np.int32)
        if self._chan is not None and self._is_leader:
            self._chan.publish(
                {"op": "resume", "sid": session_id, "idxs": idxs_np}
            )
        self._suspended.pop(session_id)
        self._restore_pages(session_id, payload, idxs_np)
        self.session_state[session_id] = state
        return True

    def _restore_pages(self, session_id: str, payload, idxs_np) -> None:
        """Device half of resume (runs on EVERY process under multi-host):
        rebuild the parked pages as device arrays and scatter them into
        freshly allocated pool pages."""
        k_tree, v_tree = self._pool_trees()
        k_leaves, k_def = jax.tree.flatten(k_tree)
        kind = payload[0]
        # disk payloads were saved as uint8 views (npz cannot represent
        # bf16); view back via the pool leaves' dtypes (k and v pools share
        # dtypes, so the k-leaf list covers both halves)
        pool_dtypes = [np.dtype(l.dtype) for l in k_leaves] * 2
        if kind == "disk":
            with np.load(f"{payload[1]}/{session_id}.kv.npz") as z:
                arrs = [
                    z[f].view(dt) for f, dt in zip(z.files, pool_dtypes)
                ]
            k_host = jax.tree.unflatten(k_def, arrs[: len(k_leaves)])
            v_host = jax.tree.unflatten(k_def, arrs[len(k_leaves):])
        elif kind in ("mram", "mdisk"):
            _, stored, treedef, meta = payload
            if kind == "mdisk":
                path = f"{stored}/{session_id}.kv.p{jax.process_index()}.npz"
                with np.load(path) as z:
                    stored = [
                        list(z[f].view(dt))
                        for f, dt in zip(z.files, pool_dtypes)
                    ]
            leaves = [
                jax.make_array_from_single_device_arrays(
                    shape, sharding,
                    [jax.device_put(h, d) for h, d in zip(hosts, devices)],
                )
                for hosts, (shape, sharding, devices) in zip(stored, meta)
            ]
            k_host, v_host = jax.tree.unflatten(treedef, leaves)
        else:  # "ram"
            k_host, v_host = payload[1], payload[2]
        idxs = jnp.asarray(idxs_np)
        unrolled = isinstance(self.kv.state, list)
        if unrolled:
            put = lambda pool, host: pool.at[:, idxs].set(  # noqa: E731
                jnp.asarray(host).astype(pool.dtype)
            )
            new_k = jax.tree.map(put, k_tree, k_host)
            new_v = jax.tree.map(put, v_tree, v_host)
            self.kv.state = [
                PagedKVState(nk, nv) for nk, nv in zip(new_k, new_v)
            ]
        else:
            put = lambda pool, host: pool.at[:, :, idxs].set(  # noqa: E731
                jnp.asarray(host).astype(pool.dtype)
            )
            self.kv.state = PagedKVState(
                jax.tree.map(put, k_tree, k_host),
                jax.tree.map(put, v_tree, v_host),
            )

    def _check_stop_strings(self, r: GenRequest) -> bool:
        """True if one of the request's stop strings just completed; sets
        `text_override` to the text truncated at the first stop occurrence."""
        if not r.stop_strings or self.tokenizer is None:
            return False
        # a stop string of L chars spans at most L tokens, so decoding the
        # last L+2 tokens always covers an occurrence that ENDS at the
        # newest token (any earlier occurrence was caught on a prior step)
        window = max(len(s) for s in r.stop_strings) + 2
        tail = self.tokenizer.decode(r.out_ids[-window:])
        if not any(s in tail for s in r.stop_strings):
            return False
        stops = r.stop_ids or set(self.cfg.eos_token_ids)
        full = self.tokenizer.decode([t for t in r.out_ids if t not in stops])
        cut = min((i for i in (full.find(s) for s in r.stop_strings) if i >= 0),
                  default=len(full))
        r.text_override = full[:cut]
        return True

    def _try_chain_dispatch(self, und) -> tuple | None:
        """Dispatch the NEXT decode window device-chained off the undrained
        one (no host input needed), or None if membership/pages/headroom
        forbid it. Called BEFORE draining `und`, so the drain's blocking
        device fetch (~30-40 ms over a remote relay) overlaps this window's
        compute instead of serializing with it."""
        running, _, depth = und
        if not self.pending.empty():
            return None
        if any(r is not None and r.state != RequestState.RUNNING
               for r in self.slots):
            return None
        if not running:
            return None
        ps = self.kv.page_size
        # the next window may be shallower than the in-flight one when a
        # latency budget is set and the measured step time moved. Budget from
        # the CONFIGURED lag (not the in-flight depth) so a ratcheted-down
        # depth can recover upward when the step time improves (ADVICE r4)
        lag = self.decode_lag
        if any(r.on_token is not None for r in running):
            lag = min(lag, self.stream_lag)
        depth_next = self._budget_lag(lag)
        # host-side positions lag by the in-flight window's `depth` tokens
        head = min(
            min(r.max_new_tokens - len(r.out_ids) for r in running),
            min(self.max_seq_len - 1 - r.position for r in running),
        )
        if head < depth + depth_next:
            return None
        for r in running:
            if not self._ensure_capacity_evicting(
                self._kv_key(r), r.position + depth + depth_next, ps,
                r.slot // self._spg if self._sm_dp > 1 else 0,
            ):
                return None
        win = min(
            _bucket(max(r.position for r in running) + depth + depth_next),
            self.kv.max_pages_per_seq * ps,
        )
        # rebuild page tables: the capacity just ensured may have allocated
        # pages that did not exist when the tail's tables were built
        seq_ids = ["__empty__"] * self.n_slots
        for r in running:
            seq_ids[r.slot] = self._kv_key(r)
        pts = self.kv.page_table(seq_ids, groups=self._slot_groups())
        if self._chan is not None and self._is_leader:
            self._chan.publish(
                {"op": "decode_chain", "depth": int(depth_next),
                 "win": int(win), "pts": pts}
            )
        return (running, self._chain_steps(win, depth_next, pts), depth_next)

    def _budget_lag(self, lag: int) -> int:
        """Depth cap from the inter-token latency budget (identity when no
        budget is set or no step-time estimate exists yet).

        Floors at 2 (when async decode is on): depth 1 disables the
        double-buffered drain overlap entirely — every token pays a blocking
        device fetch — and depth-1 windows never drain through
        _drain_window, so one polluted step-time sample would ratchet the
        depth down with no samples left to recover from (measured on the
        remote relay: 450 -> 230 tok/s at 16-way)."""
        if self.itl_budget_ms is None or not self._step_ms:
            return max(1, lag)
        lo = 2 if self.decode_lag > 1 else 1
        # the floor applies to the BUDGET, never raising depth above the
        # explicitly requested lag (JLAMA_STREAM_LAG=1 must stay 1)
        return min(max(1, lag), max(lo, int(self.itl_budget_ms / self._step_ms)))

    def _drain_window(self, und) -> None:
        running, toks_windows, depth = und
        self._apply_sampled(running, [self._fetch(t) for t in toks_windows])
        # EWMA of per-step time from drain spacing; only back-to-back
        # chained drains are a valid sample (idle gaps would inflate it),
        # and an interval containing a session eviction/suspend (a full page
        # gather + host transfer) is skipped — it measures the offload, not
        # the step (ADVICE r4)
        now = time.perf_counter()
        if (
            self._last_drain is not None
            and self._evictions == self._drain_evictions
        ):
            ms = (now - self._last_drain) * 1000.0 / max(1, depth)
            self._step_ms = (
                ms if self._step_ms is None
                else 0.8 * self._step_ms + 0.2 * ms
            )
        self._drain_evictions = self._evictions
        self._last_drain = now if self._undrained is not None else None

    def step(self) -> int:
        """One scheduler iteration: admit, one prefill chunk, one decode.

        Decode windows are double-buffered: when the batch is steady, the
        next window is dispatched (device-chained) BEFORE the previous
        window's tokens are fetched, hiding the per-window host drain.

        Serialized with the public session ops (suspend/resume/drop may be
        called from request threads) via the scheduler RLock."""
        with self._lock:
            return self._step_locked()

    def _step_locked(self) -> int:
        und = self._undrained
        if und is not None:
            self._undrained = None
            nxt = self._try_chain_dispatch(und)
            self._undrained = nxt  # set before drain: page releases defer
            self._drain_window(und)
            if self._undrained is not None:
                return len([r for r in self.slots if r is not None])
        self._flush_releases()
        self._admit()
        self._advance_prefill()
        running = [r for r in self.slots
                   if r is not None and r.state == RequestState.RUNNING]
        if not running:
            # nothing decoding: let prefills catch up without idling
            return len([r for r in self.slots if r is not None])

        B = self.n_slots
        ps = self.kv.page_size
        tokens = np.zeros((B, 1), dtype=np.int32)
        positions = np.zeros((B, 1), dtype=np.int32)
        temps = np.zeros(B, dtype=np.float32)
        top_ps = np.ones(B, dtype=np.float32)
        top_ks = np.zeros(B, dtype=np.int32)
        seeds = np.zeros(B, dtype=np.int32)
        steps = np.zeros(B, dtype=np.int32)
        pres = np.zeros(B, dtype=np.float32)
        freq = np.zeros(B, dtype=np.float32)
        seq_ids = ["__empty__"] * B
        stalled: list[GenRequest] = []
        for r in list(running):
            # make sure the page holding `position` exists before the write
            key = self._kv_key(r)
            if not self._ensure_capacity_evicting(
                key, r.position + 1, ps,
                r.slot // self._spg if self._sm_dp > 1 else 0,
            ):
                # out of pages even after eviction: this row sits the step
                # out (its slot runs the dummy sequence on the scratch page)
                stalled.append(r)
                running.remove(r)
                continue
            tokens[r.slot, 0] = r.cur_token
            positions[r.slot, 0] = r.position
            temps[r.slot] = r.temperature
            top_ps[r.slot] = r.top_p
            top_ks[r.slot] = r.top_k
            seeds[r.slot] = r.seed or 0
            steps[r.slot] = len(r.out_ids)
            pres[r.slot] = r.presence_penalty
            freq[r.slot] = r.frequency_penalty
            seq_ids[r.slot] = key

        use_pen = bool(np.any(pres != 0.0) or np.any(freq != 0.0))

        # async pipeline depth (see __init__): several decode steps dispatch
        # back-to-back with device-fed tokens when the batch is steady.
        # Page capacity for the whole window is ensured BEFORE the page
        # tables are built, so every window step's KV writes land in mapped
        # pages.
        depth = 1
        if (
            self.decode_lag > 1
            and not use_pen
            and self.pending.empty()
            and all(
                r is None or r.state == RequestState.RUNNING for r in self.slots
            )
        ):
            head = min(
                min(r.max_new_tokens - len(r.out_ids) for r in running),
                min(self.max_seq_len - 1 - r.position for r in running),
            )
            lag = self.decode_lag
            if any(r.on_token is not None for r in running):
                lag = min(lag, self.stream_lag)
            depth = max(1, min(self._budget_lag(lag), head))
            for r in running:
                if not self._ensure_capacity_evicting(
                    self._kv_key(r), r.position + depth, ps,
                    r.slot // self._spg if self._sm_dp > 1 else 0,
                ):
                    depth = 1
                    break

        pts = self.kv.page_table(seq_ids, groups=self._slot_groups())
        win = min(
            _bucket(int(positions.max()) + depth),
            self.kv.max_pages_per_seq * ps,
        )
        all_p1 = bool(np.all(top_ps >= 1.0))
        all_k0 = bool(np.all(top_ks <= 0))
        if self._chan is not None and self._is_leader:
            self._chan.publish(
                {"op": "decode", "tokens": tokens, "positions": positions,
                 "pts": pts, "seeds": seeds, "steps": steps, "temps": temps,
                 "top_ps": top_ps, "top_ks": top_ks, "pres": pres,
                 "freq": freq, "all_p1": all_p1, "all_k0": all_k0,
                 "use_pen": use_pen, "win": int(win), "depth": int(depth)}
            )
        toks_windows = self._run_decode_window(
            tokens, positions, pts, seeds, steps, temps, top_ps, top_ks,
            pres, freq, all_p1, all_k0, use_pen, win, depth,
        )

        if depth > 1:
            # steady state (the depth>1 guard vetted membership/penalties):
            # defer the drain — next step dispatches a chained window first
            self._undrained = (running, toks_windows, depth)
        else:
            self._apply_sampled(
                running, [self._fetch(t) for t in toks_windows]
            )
        return len([r for r in self.slots if r is not None])

    def _apply_sampled(self, running, windows) -> None:
        """Apply sampled-token windows ([B]-indexed host arrays, oldest
        first) to the running requests: stop checks, finishes, callbacks.
        Tokens sampled past a request's stop are discarded."""
        for toks_host in windows:
            for r in running:
                if r.state != RequestState.RUNNING:
                    continue  # finished earlier in this window; discard
                nxt = int(toks_host[r.slot])
                if not r.out_ids:
                    # honest TTFT: the first token is "served" when the host
                    # actually has it (prefill completion is just an async
                    # dispatch boundary and measures ~nothing)
                    r.t_first = time.perf_counter()
                r.position += 1
                r.cur_token = nxt
                r.out_ids.append(nxt)
                stops = r.stop_ids or set(self.cfg.eos_token_ids)
                if nxt in stops:
                    self._finish(r, FinishReason.STOP_TOKEN)
                elif self._check_stop_strings(r):
                    self._finish(r, FinishReason.STOP_TOKEN)
                elif len(r.out_ids) >= r.max_new_tokens:
                    self._finish(r, FinishReason.MAX_TOKENS)
                elif r.position + 1 >= self.max_seq_len:
                    self._finish(r, FinishReason.MAX_TOKENS)
                elif r.on_token is not None:
                    r.on_token(nxt)

    # ------------------------------------------------------------------

    def _fail_active(self, message: str) -> None:
        """Finish every in-flight request with ERROR + message (the serving
        loop must survive a failed step; cf. Coordinator.java:222-225)."""
        self._undrained = None  # drop any half-dispatched window
        for r in list(self.slots):
            if r is None:
                continue
            r.error = message
            self._finish(r, FinishReason.ERROR)
        while True:
            try:
                r = self.pending.get_nowait()
            except queue.Empty:
                break
            r.error = message
            r.finish = FinishReason.ERROR
            r.state = RequestState.DONE
            r.done_event.set()
        self._flush_releases()

    def start(self) -> None:
        """Run the scheduling loop on a background thread (serving mode)."""
        if self._running:
            return
        self._running = True

        def loop():
            last_ping = time.monotonic()
            while self._running:
                try:
                    n = self.step()
                except Exception as e:  # noqa: BLE001 — surface, don't die
                    import traceback

                    traceback.print_exc()
                    if isinstance(e, ConnectionError) and self._chan is not None:
                        # a follower process is gone: the next SPMD collective
                        # would hang every surviving process, so stop serving
                        # (healthz flips to 503 so an orchestrator restarts
                        # the set; cf. the reference's worker ERROR surfacing)
                        self.degraded = str(e)
                    self._fail_active(f"{type(e).__name__}: {e}")
                    continue
                if n == 0 and self.pending.empty():
                    if self._chan is not None and self._is_leader:
                        # idle heartbeat so followers can distinguish "leader
                        # is quiet" from "leader is dead" (JLAMA_STEP_TIMEOUT)
                        now = time.monotonic()
                        if now - last_ping > 5.0:
                            last_ping = now
                            try:
                                self._chan.publish({"op": "ping"})
                            except ConnectionError as e:
                                self.degraded = str(e)
                    time.sleep(0.001)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
