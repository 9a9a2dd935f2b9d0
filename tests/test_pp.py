"""Pipeline parallelism: GPipe schedule must match the sequential model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.qlora import qlora_loss_fn, wrap_llama_lora
from sparsebit_tpu.llm.quant import QuantLinear
from sparsebit_tpu.parallel.mesh import make_mesh_named
from sparsebit_tpu.parallel.pp import (
    densify_llama_params,
    pp_extract_lora,
    pp_llama_loss,
    pp_merge_lora,
    pp_qlora_loss,
    pp_qlora_train_step,
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


def _quantize(params, skip=("lm_head",)):
    return L.quantize_llama_params(
        params,
        lambda path, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=4, groupsize=32
        ),
        skip=skip,
    )


def test_pp_quantized_backbone_matches_sequential(setup):
    """PP over packed QuantLinear layers == single-device quantized loss
    (reference pipelines a make_quant-ed model, model_pp.py:173-191)."""
    params, tokens, _ = setup
    qparams = _quantize(params)
    ref = L.llama_loss(qparams, tokens, CFG)
    mesh = make_mesh_named(dp=2, pp=2)
    params_pp = stack_llama_stages(qparams, 2)
    loss = pp_llama_loss(params_pp, tokens, CFG, mesh, 2)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)


def test_pp_qlora_matches_single_device(setup):
    """finetune_pp parity: LoRA over a quantized pipelined backbone — loss
    equals the single-device QLoRA loss, and one train step moves only the
    adapters and reduces the loss."""
    import optax

    params, tokens, _ = setup
    qparams = wrap_llama_lora(_quantize(params), r=4, key=jax.random.PRNGKey(7))
    # make the adapters nonzero so the LoRA term participates in the loss
    qparams = jax.tree.map(
        lambda x: x, qparams
    )
    from sparsebit_tpu.llm.qlora import LoraLinear

    def bump(x):
        if isinstance(x, LoraLinear):
            return LoraLinear(
                x.base, x.lora_A,
                x.lora_B + 0.01 * jnp.ones_like(x.lora_B),
                x.alpha, x.dropout,
            )
        return x

    qparams = jax.tree.map(bump, qparams, is_leaf=lambda x: isinstance(x, LoraLinear))

    from sparsebit_tpu.llm.qlora import extract_lora

    ref = qlora_loss_fn(extract_lora(qparams), qparams, tokens, CFG)

    mesh = make_mesh_named(dp=2, pp=2)
    params_pp = stack_llama_stages(qparams, 2)
    lora = pp_extract_lora(params_pp)
    loss_fn = jax.jit(lambda l: pp_qlora_loss(l, params_pp, tokens, CFG, mesh, 2))
    loss = loss_fn(lora)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)

    # one optimizer step through the pipeline reduces the loss
    opt = optax.adam(1e-2)
    opt_state = opt.init(lora)
    step = jax.jit(
        lambda l, s: pp_qlora_train_step(
            l, s, params_pp, tokens, CFG, mesh, 2, opt
        )
    )
    lora2, opt_state, loss1 = step(lora, opt_state)
    loss2 = loss_fn(lora2)
    assert float(loss2) < float(loss1)
    # adapters actually moved; the frozen packed backbone cannot move
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), lora, lora2
    )
    assert max(jax.tree.leaves(moved)) > 0

    merged = pp_merge_lora(params_pp, lora2)
    loss3 = jax.jit(
        lambda p: pp_llama_loss(p, tokens, CFG, mesh, 2)
    )(merged)
    np.testing.assert_allclose(float(loss3), float(loss2), rtol=1e-5)


def test_dp_tp_pp_quantized(setup):
    """Composed 3-axis mesh (dp x tp x pp), packed TP-sharded backbone:
    loss == single-device quantized loss. Sharded quantization equals
    unsharded because col splits keep per-column group stats and row splits
    land on group boundaries (parallel/tp.py pack-time sharding)."""
    from sparsebit_tpu.parallel.pp import pp_tp_llama_loss
    from sparsebit_tpu.parallel.tp import shard_llama_params_tp

    params, tokens, _ = setup
    # shard_llama_params_tp packs the lm_head too; quantize it in the ref
    qref = _quantize(params, skip=())
    ref = L.llama_loss(qref, tokens, CFG)

    mesh = make_mesh_named(dp=2, tp=2, pp=2)
    params_tp = shard_llama_params_tp(params, CFG, 2, bits=4, groupsize=32)
    params_pp = stack_llama_stages(params_tp, 2)
    loss = jax.jit(
        lambda p: pp_tp_llama_loss(p, tokens, CFG, mesh, 2)
    )(params_pp)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)


def test_dp_tp_pp_qlora_train(setup):
    """QLoRA on the composed mesh: LoRA shards ride col/row TP sharding,
    loss matches single-device QLoRA, train step reduces it."""
    import optax

    from sparsebit_tpu.llm.qlora import LoraLinear, extract_lora
    from sparsebit_tpu.parallel.pp import pp_tp_qlora_loss
    from sparsebit_tpu.parallel.tp import shard_llama_params_tp

    params, tokens, _ = setup

    def bump(x):
        if isinstance(x, LoraLinear):
            return LoraLinear(
                x.base, x.lora_A,
                x.lora_B + 0.01 * jnp.ones_like(x.lora_B),
                x.alpha, x.dropout,
            )
        return x

    is_lora = lambda x: isinstance(x, LoraLinear)  # noqa: E731

    # single-device reference: quantize then wrap (same RTN per group;
    # head quantized to match shard_llama_params_tp)
    qref = wrap_llama_lora(
        _quantize(params, skip=()), r=4, key=jax.random.PRNGKey(7)
    )
    qref = jax.tree.map(bump, qref, is_leaf=is_lora)
    ref = qlora_loss_fn(extract_lora(qref), qref, tokens, CFG)

    # composed mesh: wrap dense, bump identically, shard+pack
    lparams = wrap_llama_lora(params, r=4, key=jax.random.PRNGKey(7))
    lparams = jax.tree.map(bump, lparams, is_leaf=is_lora)
    mesh = make_mesh_named(dp=2, tp=2, pp=2)
    params_tp = shard_llama_params_tp(lparams, CFG, 2, bits=4, groupsize=32)
    params_pp = stack_llama_stages(params_tp, 2)
    lora = pp_extract_lora(params_pp)
    loss_fn = jax.jit(
        lambda l: pp_tp_qlora_loss(l, params_pp, tokens, CFG, mesh, 2)
    )
    loss = loss_fn(lora)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)

    opt = optax.adam(1e-2)
    opt_state = opt.init(lora)

    @jax.jit
    def step(l, s):
        lo, grads = jax.value_and_grad(pp_tp_qlora_loss)(
            l, params_pp, tokens, CFG, mesh, 2
        )
        updates, s = opt.update(grads, s, l)
        return jax.tree.map(lambda p, u: p + u, l, updates), s, lo

    lora2, opt_state, loss1 = step(lora, opt_state)
    loss2 = loss_fn(lora2)
    assert float(loss2) < float(loss1)
