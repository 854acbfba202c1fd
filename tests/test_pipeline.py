"""Microbatched pipeline parallelism: equivalence with the plain forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_llama

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tiny_llama_pipe")
    model_dir, _ = make_tiny_llama(tmp, {"num_hidden_layers": 4})
    from jlama_tpu.models.loader import load_params

    params, cfg = load_params(model_dir, float_dtype=jnp.float32)
    return params, cfg


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4), (4, 2)])
def test_pipelined_forward_matches(tiny, pp, n_micro):
    params, cfg = tiny
    from jlama_tpu.models.base import forward_hidden
    from jlama_tpu.parallel.mesh import make_mesh
    from jlama_tpu.parallel.pipeline import make_pipelined_forward

    B, T = n_micro * 2, 6
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 256, (B, T)), dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    ref, _ = forward_hidden(params, cfg, tokens, positions, None,
                            dtype=jnp.float32)

    mesh = make_mesh(jax.devices()[:pp], dp=1, pp=pp, tp=1)
    fwd = make_pipelined_forward(cfg, mesh, n_microbatches=n_micro)
    with mesh:
        got = fwd(params, tokens, positions, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
