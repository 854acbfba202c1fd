"""Pipeline-parallel serving: BatchScheduler decoding through the pp ring.

The reference SERVES through its pipeline — the gRPC worker ring IS the
serving path (/root/reference/jlama-net/.../Worker.java:226-248,
JlamaService.proto:85-87). Here the ring is `parallel.pipeline
.make_pipelined_decode` (ppermute over ICI inside one jitted shard_map tick),
and this scheduler maps batch slots onto its microbatches so `serve
--mesh dp,pp,tp` with pp>1 keeps every pipeline stage computing during
decode instead of serializing over the layer-sharded weights.

Slot -> microbatch mapping: slot s belongs to microbatch s // b, row s % b,
with b = n_slots / pp rows per microbatch. Each scheduler step runs one
self-contained window of (pp-1) fill ticks + M*W sampling ticks (W = the
async decode depth): the fill cost is amortized over W tokens per slot and
no pipeline state is carried across steps, so admissions/finishes never
interact with in-flight activations. Garbage KV written by zero-activation
fill ticks is overwritten when the real activation reaches that stage
(positions only advance with sampled tokens).

KV is a dense per-slot cache [L, n_slots, n_kv, S, hd] with the layer axis
sharded over pp (each stage holds only its layers' KV — the reference's
per-worker KvBufferCache) and heads over tp. Prefill runs row-at-a-time
through the storage-sharded stack (stages serialize during prefill; the
pipeline overlap is the decode win, like the reference's ring).

Not supported in this mode (requests fail with a clear ERROR rather than
silently misbehaving): session KV reuse, presence/frequency penalties,
multi-host step broadcast. Suspend/offload is a no-op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import KVCache, forward_hidden
from ..nn.sampling import sample_token
from .engine import FinishReason, _bucket
from .scheduler import BatchScheduler, GenRequest, RequestState


class _DenseAlloc:
    """Host-capacity shim: dense rows always hold max_seq positions."""

    def __init__(self, max_seq: int):
        self.max_seq = max_seq

    def ensure_capacity(self, seq_id, n_tokens, page_size, group=0):
        if n_tokens > self.max_seq:
            raise MemoryError("sequence exceeds dense KV row")
        return []

    def pages_for(self, seq_id):
        return []

    def release(self, seq_id):
        pass

    @property
    def n_free(self):
        return 0


class _DenseKVShim:
    """Satisfies the base scheduler's paged-cache surface for bookkeeping."""

    def __init__(self, max_seq: int):
        self.page_size = 1
        self.max_pages_per_seq = max_seq
        self.alloc = _DenseAlloc(max_seq)
        self.state = None

    def page_table(self, seq_ids):
        return np.zeros((len(seq_ids), 1), np.int32)


class PipelinedScheduler(BatchScheduler):
    def __init__(self, params, cfg, tokenizer=None, *, mesh, n_slots=8,
                 max_seq_len=None, kv_dtype=jnp.bfloat16,
                 compute_dtype=jnp.bfloat16, seed=0, decode_lag=None,
                 prefill_chunk=256, fuse=True, moe_ragged=True,
                 weight_format=None, step_channel=None):
        if mesh is None or mesh.shape["pp"] < 2:
            raise ValueError("PipelinedScheduler needs a mesh with pp >= 2")
        if step_channel is not None:
            raise ValueError(
                "pp pipeline + multi-host step broadcast not supported yet"
            )
        if kv_dtype == "q8":
            # quantized pages belong to the paged pool; the pipeline's dense
            # per-stage rows stay a float dtype for now
            kv_dtype = jnp.bfloat16
        pp = mesh.shape["pp"]
        if n_slots % pp:
            raise ValueError(f"n_slots ({n_slots}) must divide by pp ({pp})")
        # base init: params fuse/shard (stacked layout — the pipeline splits
        # the layer axis), step jits (unused here), tiny paged pool
        # (replaced below by the dense per-stage cache)
        super().__init__(
            params, cfg, tokenizer, n_slots=n_slots, n_pages=2, page_size=64,
            max_seq_len=max_seq_len, kv_dtype=kv_dtype,
            compute_dtype=compute_dtype, seed=seed, mesh=mesh,
            prefill_chunk=prefill_chunk, fuse=fuse, moe_ragged=moe_ragged,
            decode_lag=decode_lag, layer_mode="scan",
            weight_format=weight_format,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.pp = pp
        self.M = pp  # microbatches == stages (full pipeline occupancy)
        self.b = n_slots // pp
        S = self.max_seq_len
        self.kv = _DenseKVShim(S)
        kv_shape = (cfg.n_layers, n_slots, cfg.n_kv_heads, S, cfg.head_size)
        kv_sh = NamedSharding(mesh, P("pp", None, "tp", None, None))
        zeros = jax.jit(
            lambda: jnp.zeros(kv_shape, kv_dtype), out_shardings=kv_sh
        )
        self._k = zeros()
        self._v = zeros()
        infl_sh = NamedSharding(mesh, P("pp", None, None, None))
        self._infl_zero = jax.jit(
            lambda: jnp.zeros(
                (pp, self.b, 1, cfg.embedding_length), compute_dtype
            ),
            out_shardings=infl_sh,
        )

        from ..parallel.pipeline import make_pipelined_decode

        base_tick, _ = make_pipelined_decode(cfg, mesh)
        M, b = self.M, self.b

        @partial(jax.jit, donate_argnums=(1, 2, 3))
        def _tick(params, k, v, inflight, tokens, positions, t, seeds, steps,
                  temps, top_ps, top_ks):
            k, v, inflight, logits = base_tick(
                params, k, v, inflight, tokens, positions, t
            )
            # microbatch whose logits just emerged from the last stage
            mb = (t - (pp - 1)) % M
            r0 = mb * b
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, r0, b)  # noqa: E731
            keys = jax.vmap(
                lambda s, st: jax.random.fold_in(jax.random.PRNGKey(s), st)
            )(sl(seeds), sl(steps))
            toks = sample_token(
                logits, None, sl(temps), top_k=sl(top_ks), top_p=sl(top_ps),
                keys=keys,
            ).astype(jnp.int32)
            # feed back: this microbatch enters stage 0 next tick. During
            # the pipeline-fill ticks (t < pp-1) the emerged logits are
            # garbage (zero activations) — do NOT advance that microbatch.
            valid = t >= (pp - 1)
            tokens = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(tokens, toks, mb, 0),
                tokens,
            )
            pos_mb = jax.lax.dynamic_index_in_dim(
                positions, mb, 0, keepdims=False
            )
            positions = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(
                    positions, pos_mb + 1, mb, 0
                ),
                positions,
            )
            steps = jnp.where(
                valid,
                jax.lax.dynamic_update_slice_in_dim(steps, sl(steps) + 1, r0, 0),
                steps,
            )
            return k, v, inflight, tokens, positions, steps, toks

        self._tick = _tick

        @partial(jax.jit, donate_argnums=(1, 2), static_argnums=(6,))
        def _prefill_row(params, k, v, toks, pos, slot, attn_window):
            row = KVCache(
                jax.lax.dynamic_slice_in_dim(k, slot, 1, axis=1),
                jax.lax.dynamic_slice_in_dim(v, slot, 1, axis=1),
            )
            _, cache = forward_hidden(
                params, cfg, toks, pos, row, dtype=compute_dtype,
                attn_window=attn_window,
            )
            k = jax.lax.dynamic_update_slice_in_dim(k, cache.k, slot, 1)
            v = jax.lax.dynamic_update_slice_in_dim(v, cache.v, slot, 1)
            return k, v

        self._prefill_row = _prefill_row

    # -- admission tweaks ----------------------------------------------

    def submit(self, req: GenRequest) -> GenRequest:
        if req.session_id is not None:
            req.error = "session KV reuse is not supported with the pp " \
                        "pipeline (slot-bound dense KV rows)"
            req.finish = FinishReason.ERROR
            req.state = RequestState.DONE
            req.done_event.set()
            return req
        if req.presence_penalty or req.frequency_penalty:
            req.error = "presence/frequency penalties are not supported " \
                        "with the pp pipeline"
            req.finish = FinishReason.ERROR
            req.state = RequestState.DONE
            req.done_event.set()
            return req
        return super().submit(req)

    def suspend_session(self, session_id, to_dir=None) -> bool:
        return False

    def warmup(self, max_context=None, prefill_rows=None) -> None:
        """Compile the tick (one variant) and the prefill-row variants."""
        B, M, b = self.n_slots, self.M, self.b
        zeros = lambda *s: np.zeros(s, np.int32)  # noqa: E731
        k, v, infl = self._k, self._v, self._infl_zero()
        k, v, infl, *_ = self._tick(
            self.params, k, v, infl, jnp.zeros((M, b), jnp.int32),
            jnp.zeros((M, b), jnp.int32), jnp.asarray(0, jnp.int32),
            zeros(B), zeros(B), np.zeros(B, np.float32),
            np.ones(B, np.float32), zeros(B),
        )
        self._k, self._v = k, v
        for win in self._window_buckets(max_context or self.max_seq_len):
            if win < self.prefill_chunk:
                continue
            toks = zeros(1, self.prefill_chunk)
            pos = np.arange(self.prefill_chunk, dtype=np.int32)[None, :]
            self._k, self._v = self._prefill_row(
                self.params, self._k, self._v, jnp.asarray(toks),
                jnp.asarray(pos), 0, win,
            )
        # warmup wrote garbage into slot 0 / microbatch KV; zero it back
        zjit = jax.jit(lambda a: jnp.zeros_like(a), donate_argnums=0)
        self._k, self._v = zjit(self._k), zjit(self._v)

    # -- prefill over dense rows ---------------------------------------

    def _advance_prefill(self) -> None:
        """One chunk for the earliest prefilling request, written into its
        slot's dense KV row (stages serialize here — the ring is decode)."""
        for req in self.slots:
            if req is None or req.state != RequestState.PREFILLING:
                continue
            ids = req._pf_ids
            remaining = len(ids) - 1 - req._pf_done
            if remaining > 0:
                chunk = min(self.prefill_chunk, remaining)
                bucket = chunk if chunk == self.prefill_chunk else _bucket(chunk)
                if req.position + bucket > self.max_seq_len:
                    bucket = chunk
                toks = np.zeros((1, bucket), dtype=np.int32)
                toks[0, :chunk] = ids[req._pf_done : req._pf_done + chunk]
                pos = np.arange(
                    req.position, req.position + bucket, dtype=np.int32
                )[None, :]
                win = min(_bucket(req.position + bucket), self.max_seq_len)
                self._k, self._v = self._prefill_row(
                    self.params, self._k, self._v, jnp.asarray(toks),
                    jnp.asarray(pos), req.slot, win,
                )
                req._pf_done += chunk
                req.position += chunk
            if req._pf_done >= len(ids) - 1:
                self._promote_prefilled(req)
            return

    # -- the pipelined decode window -----------------------------------

    def step(self) -> int:
        self._admit()
        self._advance_prefill()
        running = [r for r in self.slots
                   if r is not None and r.state == RequestState.RUNNING]
        if not running:
            return len([r for r in self.slots if r is not None])

        B, M, b, pp = self.n_slots, self.M, self.b, self.pp
        # W tokens per slot per window; the (pp-1)-tick fill is amortized
        # over M*W samples. Shrink to 1 when work is waiting so admissions
        # and prefills stay responsive.
        W = self.decode_lag
        if not self.pending.empty() or any(
            r is not None and r.state != RequestState.RUNNING
            for r in self.slots
        ):
            W = 1
        head = min(
            min(r.max_new_tokens - len(r.out_ids) for r in running),
            min(self.max_seq_len - 1 - r.position for r in running),
        )
        W = max(1, min(W, head))

        tokens = np.zeros((M, b), dtype=np.int32)
        positions = np.zeros((M, b), dtype=np.int32)
        temps = np.zeros(B, dtype=np.float32)
        top_ps = np.ones(B, dtype=np.float32)
        top_ks = np.zeros(B, dtype=np.int32)
        seeds = np.zeros(B, dtype=np.int32)
        steps = np.zeros(B, dtype=np.int32)
        for r in running:
            mb, j = divmod(r.slot, b)
            tokens[mb, j] = r.cur_token
            positions[mb, j] = r.position
            temps[r.slot] = r.temperature
            top_ps[r.slot] = r.top_p
            top_ks[r.slot] = r.top_k
            seeds[r.slot] = r.seed or 0
            steps[r.slot] = len(r.out_ids)

        k, v = self._k, self._v
        infl = self._infl_zero()
        tokens_d = jnp.asarray(tokens)
        positions_d = jnp.asarray(positions)
        seeds_d = jnp.asarray(seeds)
        steps_d = jnp.asarray(steps)
        temps_d = jnp.asarray(temps)
        top_ps_d = jnp.asarray(top_ps)
        top_ks_d = jnp.asarray(top_ks)

        n_ticks = (pp - 1) + M * W
        sampled = []
        for t in range(n_ticks):
            k, v, infl, tokens_d, positions_d, steps_d, toks = self._tick(
                self.params, k, v, infl, tokens_d, positions_d,
                jnp.asarray(t, jnp.int32), seeds_d, steps_d, temps_d,
                top_ps_d, top_ks_d,
            )
            if t >= pp - 1:
                sampled.append(((t - (pp - 1)) % M, toks))
        self._k, self._v = k, v

        # regroup per-tick microbatch samples into [B]-wide windows (sample
        # w of slot s sits at tick pp-1 + w*M + s//b)
        windows = [np.zeros(B, dtype=np.int64) for _ in range(W)]
        for i, (mb, toks) in enumerate(sampled):
            w = i // M
            windows[w][mb * b : (mb + 1) * b] = np.asarray(toks)
        self._apply_sampled(running, windows)
        return len([r for r in self.slots if r is not None])
