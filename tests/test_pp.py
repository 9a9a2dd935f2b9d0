"""Pipeline parallelism: GPipe schedule must match the sequential model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.parallel.mesh import make_mesh_named
from sparsebit_tpu.parallel.pp import (
    densify_llama_params,
    pp_llama_loss,
    stack_llama_stages,
)

CFG = L.llama_tiny(
    vocab_size=128, dim=64, n_layers=4, n_heads=4, n_kv_heads=2,
    ffn_dim=128, max_seq_len=64, dtype="float32",
)


@pytest.fixture(scope="module")
def setup():
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 17), 0, CFG.vocab_size)
    ref = L.llama_loss(params, tokens, CFG)
    return params, tokens, ref


@pytest.mark.parametrize("dp,pp,M", [(1, 4, 4), (2, 2, 2), (1, 2, 4)])
def test_pp_loss_matches_sequential(setup, dp, pp, M):
    params, tokens, ref = setup
    mesh = make_mesh_named(dp=dp, pp=pp)
    params_pp = stack_llama_stages(densify_llama_params(params), pp)
    loss = pp_llama_loss(params_pp, tokens, CFG, mesh, M)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)


def test_pp_training_step(setup):
    """Grads flow through the pipeline (autodiff reverse schedule)."""
    params, tokens, ref = setup
    mesh = make_mesh_named(dp=2, pp=2)
    params_pp = stack_llama_stages(densify_llama_params(params), 2)

    @jax.jit
    def step(p):
        loss, grads = jax.value_and_grad(
            lambda p: pp_llama_loss(p, tokens, CFG, mesh, 2)
        )(p)
        return loss, jax.tree.map(lambda a, g: a - 1e-2 * g, p, grads)

    loss1, params2 = step(params_pp)
    loss2, _ = step(params2)
    assert jnp.isfinite(loss1) and jnp.isfinite(loss2)
    assert float(loss2) < float(loss1)  # one SGD step reduces loss
