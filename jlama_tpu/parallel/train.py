"""Sharded training step (used by the multi-chip dry run and fine-tuning).

One jitted step over the (dp, pp, tp) mesh: forward (same scan-based model as
inference), causal-LM cross-entropy, grad, SGD update. GSPMD handles the
tensor-parallel psums (the reference's `combine` RPC) and the stage
boundaries (the reference's `pass` ring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig


def loss_fn(params, cfg: ModelConfig, tokens, positions, hidden_sharding=None):
    from ..models.base import forward_hidden, lm_logits

    hidden, _ = forward_hidden(
        params, cfg, tokens, positions, None, hidden_sharding=hidden_sharding
    )
    logits = lm_logits(params, cfg, hidden)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_train_step(cfg: ModelConfig, mesh: Mesh, lr: float = 1e-4):
    data_sharding = NamedSharding(mesh, P("dp", None))
    # sequence parallelism: activations' token axis sharded over tp between
    # blocks (gathered by GSPMD only where attention needs the full sequence)
    seq_sharding = NamedSharding(mesh, P("dp", "tp", None))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(params, tokens, positions):
        tokens = jax.lax.with_sharding_constraint(tokens, data_sharding)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, tokens, positions, seq_sharding
        )
        params = jax.tree.map(
            lambda p, g: (p - lr * g.astype(p.dtype)) if g is not None else p,
            params,
            grads,
        )
        return params, loss

    return train_step
