"""Parallelism tests on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.quant import QuantLinear
from sparsebit_tpu.parallel import (
    make_mesh,
    shard_llama_params_tp,
    tp_llama_forward,
    tp_llama_loss,
)

CFG = L.llama_tiny(
    vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
    ffn_dim=128, max_seq_len=64, dtype="float32",
)


@pytest.fixture(scope="module")
def params():
    return L.init_llama_params(CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def tokens():
    return jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, CFG.vocab_size)


def test_tp_forward_matches_single_device(params, tokens):
    mesh = make_mesh(dp=2, tp=2)
    params_tp = shard_llama_params_tp(params, CFG, 2)
    ref = L.llama_forward(params, tokens, CFG)
    out = tp_llama_forward(params_tp, tokens, CFG, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tp_loss_matches_single_device(params, tokens):
    mesh = make_mesh(dp=2, tp=2)
    params_tp = shard_llama_params_tp(params, CFG, 2)
    ref = L.llama_loss(params, tokens, CFG)
    loss = tp_llama_loss(params_tp, tokens, CFG, mesh)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)


def test_tp_quantized_forward(params, tokens):
    """Per-shard packing: quantize each TP shard independently, forward
    still close to the single-device RTN-quantized model."""
    mesh = make_mesh(dp=1, tp=2)
    params_tp = shard_llama_params_tp(params, CFG, 2, bits=8, groupsize=16)
    out = tp_llama_forward(params_tp, tokens, CFG, mesh)
    ref = L.llama_forward(params, tokens, CFG)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel


def test_tp_grads_flow(params, tokens):
    mesh = make_mesh(dp=2, tp=2)
    params_tp = shard_llama_params_tp(params, CFG, 2)
    grads = jax.grad(lambda p: tp_llama_loss(p, tokens, CFG, mesh))(params_tp)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


@pytest.mark.parametrize("kv_quantized", [False, True])
def test_tp_decode_matches_single_device(params, kv_quantized):
    from sparsebit_tpu.llm.decode import decode_step, prefill
    from sparsebit_tpu.llm.kv_cache import init_kv_cache
    from sparsebit_tpu.parallel.tp import shard_kv_cache_tp, tp_decode_step

    mesh = make_mesh(dp=1, tp=2)
    params_tp = shard_llama_params_tp(params, CFG, 2)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 5), 0, CFG.vocab_size)

    cache = init_kv_cache(CFG, 2, 16, quantized=kv_quantized)
    logits, cache = prefill(params, tokens, cache, CFG)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    ref_logits, ref_cache = decode_step(params, tok, cache, CFG)

    # TP path shares the same prefilled cache, head-sharded
    cache_tp = shard_kv_cache_tp(cache, mesh)
    out_logits, out_cache = tp_decode_step(params_tp, tok, cache_tp, CFG, mesh)
    tol = 0.05 if kv_quantized else 1e-3
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=tol, atol=tol
    )
    assert int(out_cache.length[0]) == int(ref_cache.length[0])
    # two more steps stay in agreement
    tok2 = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    r2, _ = decode_step(params, tok2, ref_cache, CFG)
    o2, _ = tp_decode_step(params_tp, tok2, out_cache, CFG, mesh)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(r2), rtol=tol, atol=tol)


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.parametrize("ring", [False, True])
def test_sp_loss_matches_single_device(params, tokens, ring):
    """Sequence-parallel loss (K/V all-gather and exact RING attention
    with online-softmax accumulators) == unsharded llama_loss."""
    from sparsebit_tpu.parallel.mesh import make_mesh_named
    from sparsebit_tpu.parallel.sp import sp_llama_loss

    mesh = make_mesh_named(sp=8)
    ref = L.llama_loss(params, tokens, CFG)
    loss = sp_llama_loss(params, tokens, CFG, mesh, ring=ring)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-4)


def test_sp_dp_composed_loss_and_grads(params, tokens):
    """dp x sp composed mesh: batch sharded over dp, sequence over sp;
    loss == single-device, and grads flow through shard_map (the sp
    training step the dryrun certifies)."""
    from sparsebit_tpu.parallel.mesh import make_mesh_named
    from sparsebit_tpu.parallel.sp import sp_llama_loss

    mesh = make_mesh_named(dp=2, sp=4)
    ref = L.llama_loss(params, tokens, CFG)
    loss_fn = lambda p: sp_llama_loss(
        p, tokens, CFG, mesh, dp_axis="dp")
    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-4)
    ref_grads = jax.grad(lambda p: L.llama_loss(p, tokens, CFG))(params)
    g1 = jax.tree.leaves(grads)
    g2 = jax.tree.leaves(ref_grads)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )
