"""True pipeline parallelism: GPipe-style microbatching over the pp axis.

The reference's layer-shard "ring" (/root/reference/jlama-net/.../Worker.java
:226-248: each worker runs its layer range and forwards activations to the
next stage over gRPC) re-designed TPU-first: every pp device holds its stage's
layer stack; microbatches flow stage-to-stage via `jax.lax.ppermute` over ICI
inside one jitted `shard_map` program. With M microbatches and S stages the
schedule runs M+S-1 ticks; stage s processes microbatch (t-s) at tick t, so
all stages compute concurrently once the pipeline fills.

This complements the GSPMD layer-axis sharding in parallel/mesh.py (which is
storage partitioning); use this when stage *compute* should overlap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def _stage_forward(stage_params, cfg: ModelConfig, x, positions):
    """Run this stage's layers on x [B, T, D] (dense, no KV cache)."""
    from ..models.base import _block

    n_stage_layers = jax.tree.leaves(stage_params)[0].shape[0]
    from ..nn.rope import rope_cos_sin, rope_frequencies

    if cfg.rope_theta:
        inv_freq = jnp.asarray(rope_frequencies(cfg))
        cos, sin = rope_cos_sin(positions, inv_freq)
    else:
        cos = sin = None

    def body(x, layer_params):
        x, _ = _block(x, layer_params, cfg, positions, None, cos, sin, None)
        return x, None

    x, _ = jax.lax.scan(body, x, stage_params)
    return x


def make_pipelined_forward(cfg: ModelConfig, mesh, n_microbatches: int):
    """Build fn(params, tokens [B,T], positions) -> hidden, running the
    transformer stack as a microbatched pipeline over the mesh's pp axis.

    params must use the stacked-layer layout; the layer axis is split across
    pp stages (cfg.n_layers % pp == 0). Embedding runs replicated before the
    pipeline; the caller applies final norm/lm_head after.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    pp = mesh.shape["pp"]
    assert cfg.n_layers % pp == 0, "n_layers must divide by pp"

    def pipeline(stage_params, x_micro, positions):
        """Inside shard_map: stage_params are THIS stage's layers
        [L/pp, ...]; x_micro [M, b, T, D] microbatches (replicated input).
        Returns [M, b, T, D] fully-processed microbatches."""
        stage = jax.lax.axis_index("pp")
        M = x_micro.shape[0]
        n_ticks = M + pp - 1

        def tick(carry, t):
            x_micro, inflight = carry
            # which microbatch this stage works on at tick t
            mb = t - stage
            valid = (mb >= 0) & (mb < M)
            # stage 0 pulls from the input buffer; later stages use the
            # activation handed over from the previous stage
            mb_idx = jnp.clip(mb, 0, M - 1)
            x_in = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(x_micro, mb_idx, 0, keepdims=False),
                inflight,
            )
            y = _stage_forward(stage_params, cfg, x_in, positions)
            y = jnp.where(valid, y, x_in)
            # last stage writes its finished microbatch back to the buffer
            done = valid & (stage == pp - 1)
            x_micro = jax.lax.cond(
                done,
                lambda buf: jax.lax.dynamic_update_index_in_dim(
                    buf, y, mb_idx, 0
                ),
                lambda buf: buf,
                x_micro,
            )
            # hand activations to the next stage over ICI
            inflight = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % pp) for i in range(pp)]
            )
            return (x_micro, inflight), None

        inflight0 = jnp.zeros_like(x_micro[0])
        (x_micro, _), _ = jax.lax.scan(
            tick, (x_micro, inflight0), jnp.arange(n_ticks)
        )
        # only the last stage holds the finished buffer; broadcast it
        x_micro = jax.lax.psum(
            jnp.where(stage == pp - 1, x_micro, jnp.zeros_like(x_micro)), "pp"
        )
        return x_micro

    smapped = shard_map(
        pipeline,
        mesh=mesh,
        in_specs=(P("pp"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def forward(params, tokens, positions, dtype=jnp.float32):
        from ..models.base import _embed

        B, T = tokens.shape
        M = n_microbatches
        assert B % M == 0, "batch must divide into microbatches"
        x = _embed(params, cfg, tokens, positions, None, dtype)
        x_micro = x.reshape(M, B // M, T, -1)
        pos_b = positions[: B // M]
        out = smapped(params["layers"], x_micro, pos_b)
        return out.reshape(B, T, -1)

    return forward
