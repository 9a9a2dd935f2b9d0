"""lm_head decode matvec streamer (ops/matvec.py).

The kernel replaces XLA's dot for the unquantized head at decode
(reference keeps lm_head in fp16/cuBLAS — llama quantization leaves the
head dense). Correctness is checked in Pallas interpret mode on CPU;
the TPU win is measured in experiments/exp14_lm_head.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.ops.matvec import (
    bf16_matvec,
    matvec,
    matvec_supported,
    use_matvec,
    _pick_tiles,
)


@pytest.mark.parametrize("B", [1, 4, 8])
@pytest.mark.parametrize("K,N", [(256, 512), (512, 1280)])
def test_matvec_matches_dense(B, K, N):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, K), jnp.float32)
    w = (jax.random.normal(kw, (K, N)) * 0.05).astype(jnp.bfloat16)
    out = bf16_matvec(x, w, interpret=True)
    ref = jnp.dot(x.astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    assert out.shape == (B, N) and out.dtype == jnp.float32
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_pick_tiles_covers_7b_head():
    # LLaMA-7B head: K=4096, N=32000 — whole-K blocks, 128-aligned N tile
    tiles = _pick_tiles(4096, 32000)
    assert tiles is not None
    KB, NT = tiles
    assert 4096 % KB == 0 and 32000 % NT == 0 and NT % 128 == 0
    assert matvec_supported(1, 4096, 32000)


def test_unsupported_shapes_rejected():
    assert not matvec_supported(16, 4096, 32000)  # batch too large
    assert not matvec_supported(1, 4100, 32000)  # K not lane-aligned
    assert not matvec_supported(1, 4096, 31999)  # N not lane-aligned


def test_use_matvec_gates_on_backend():
    # tests run on CPU: the dispatch must decline so DenseLinear keeps
    # the plain dot (the kernel only runs on real TPU)
    x = jnp.zeros((1, 4096), jnp.bfloat16)
    w = jnp.zeros((4096, 32000), jnp.bfloat16)
    assert jax.default_backend() == "cpu"
    assert not use_matvec(x, w, None)


def test_matvec_vjp_matches_dense():
    # the backward pair must equal the dense dot's vjp (kernel is
    # forward-only; _matvec_bwd supplies dx/dw for QLoRA-style losses)
    from sparsebit_tpu.ops.matvec import _matvec_bwd

    kx, kw, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (2, 256), jnp.float32)
    w = (jax.random.normal(kw, (256, 512)) * 0.05).astype(jnp.float32)
    g = jax.random.normal(kg, (2, 512), jnp.float32)
    dx, dw = _matvec_bwd((x, w), g)
    ref_dx, ref_dw = jax.vjp(lambda x, w: jnp.dot(x, w), x, w)[1](g)
    np.testing.assert_allclose(dx, ref_dx, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dw, ref_dw, rtol=1e-5, atol=1e-5)
