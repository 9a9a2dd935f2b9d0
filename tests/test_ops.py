"""Kernel-layer tests.

Port of the reference's kernel oracle (test_cuda_kernel.py:21-126):
pack-then-matmul must equal dequantized-dense matmul, across bits
{2,3,4,8}, irregular shapes, groupsize variants. Pallas kernels run in
interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.ops import (
    int8_matmul_dynamic,
    pack_columns,
    quant_matmul,
    tokenwise_quant,
    unpack_columns,
)
from sparsebit_tpu.ops.int8_matmul import requantize_per_input_channel
from sparsebit_tpu.ops.quant_matmul import dequant_weights, _quant_matmul_pallas


def _rand_quantized(key, K, N, bits, gs):
    """Random packed weights + qparams + the dense f32 oracle W."""
    k1, k2, k3 = jax.random.split(key, 3)
    qmax = 2**bits - 1
    q = jax.random.randint(k1, (K, N), 0, qmax + 1, jnp.int32)
    G = K // gs if gs > 0 else 1
    scales = jax.random.uniform(k2, (G, N), jnp.float32, 0.01, 0.1)
    zeros = jax.random.randint(k3, (G, N), 0, qmax + 1).astype(jnp.float32)
    packed = pack_columns(q, bits)
    gs_eff = gs if gs > 0 else K
    W = (q.astype(jnp.float32) - jnp.repeat(zeros, gs_eff, axis=0)[:K]) * (
        jnp.repeat(scales, gs_eff, axis=0)[:K]
    )
    return packed, scales, zeros, W


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_roundtrip(bits):
    key = jax.random.PRNGKey(0)
    q = jax.random.randint(key, (16, 64), 0, 2**bits, jnp.int32).astype(jnp.uint8)
    packed = pack_columns(q, bits)
    back = unpack_columns(packed, bits, 64)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(q))
    # packed size is the whole point
    total_bytes = sum(int(np.prod(v.shape)) for v in packed.values())
    assert total_bytes == 16 * 64 * bits // 8


@pytest.mark.parametrize("bits,gs", [(2, 32), (3, 32), (4, 32), (4, -1), (8, 64)])
def test_quant_matmul_xla_matches_oracle(bits, gs):
    K, N = 64, 64
    packed, scales, zeros, W = _rand_quantized(jax.random.PRNGKey(1), K, N, bits, gs)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, K))
    ref = x @ W
    out = quant_matmul(x, packed, scales, zeros, bits, gs, N, "xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "bits,gs,K,N,B",
    [
        (4, 128, 256, 256, 4),
        (4, 128, 512, 256, 1),
        (2, 128, 256, 512, 8),
        (8, 128, 256, 256, 3),
        (4, -1, 256, 256, 4),
    ],
)
def test_quant_matmul_pallas_interpret(bits, gs, K, N, B, monkeypatch):
    packed, scales, zeros, W = _rand_quantized(jax.random.PRNGKey(3), K, N, bits, gs)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, K))
    ref = x @ W
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out = _quant_matmul_pallas(x, packed["w"], scales, zeros, bits, gs, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bits,gs,K,N,B", [(4, 128, 256, 256, 2), (2, 64, 256, 512, 8)])
def test_quant_matmul_a8_close_to_f32(bits, gs, K, N, B):
    """W4A8 path: int8 activation quant adds <~1% relative error."""
    from sparsebit_tpu.ops.quant_matmul import quant_matmul_a8

    packed, scales, zeros, W = _rand_quantized(jax.random.PRNGKey(11), K, N, bits, gs)
    x = jax.random.normal(jax.random.PRNGKey(12), (B, K))
    ref = x @ W
    out = quant_matmul_a8(x, packed, scales, zeros, bits, gs, N)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


@pytest.mark.parametrize("bits,gs,K,N,B", [(4, 128, 256, 256, 2)])
def test_quant_matmul_a8_pallas_matches_fallback(bits, gs, K, N, B):
    from jax.experimental.pallas import tpu as pltpu

    from sparsebit_tpu.ops.int8_matmul import tokenwise_quant
    from sparsebit_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_a8,
        dequant_weights,
    )

    packed, scales, zeros, W = _rand_quantized(jax.random.PRNGKey(13), K, N, bits, gs)
    x = jax.random.normal(jax.random.PRNGKey(14), (B, K))
    xq, x_scale = tokenwise_quant(x)
    ref = (xq.astype(jnp.float32) @ W) * x_scale
    with pltpu.force_tpu_interpret_mode():
        out = _quant_matmul_pallas_a8(
            xq, packed["w"], scales, zeros, bits, gs, N
        ) * x_scale
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("gs,a8", [(128, False), (128, True), (-1, False)])
def test_quant_matmul_3bit_pallas_interpret(gs, a8):
    from jax.experimental.pallas import tpu as pltpu

    from sparsebit_tpu.ops.int8_matmul import tokenwise_quant
    from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_3bit

    K, N, B = 256, 1024, 4
    packed, scales, zeros, W = _rand_quantized(
        jax.random.PRNGKey(21), K, N, 3, gs
    )
    x = jax.random.normal(jax.random.PRNGKey(22), (B, K))
    if a8:
        xq, xs = tokenwise_quant(x)
        ref = (xq.astype(jnp.float32) @ W)
        with pltpu.force_tpu_interpret_mode():
            out = _quant_matmul_pallas_3bit(xq, packed, scales, zeros, gs, N, a8=True)
    else:
        ref = x @ W
        with pltpu.force_tpu_interpret_mode():
            out = _quant_matmul_pallas_3bit(x, packed, scales, zeros, gs, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_quant_matmul_grad_is_dense_grad():
    K, N, gs, bits = 64, 64, 32, 4
    packed, scales, zeros, W = _rand_quantized(jax.random.PRNGKey(5), K, N, bits, gs)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, K))

    def f(x):
        return jnp.sum(quant_matmul(x, packed, scales, zeros, bits, gs, N, "xla") ** 2)

    def f_ref(x):
        return jnp.sum((x @ W) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(f_ref)(x)), rtol=1e-4, atol=1e-4
    )


def test_tokenwise_quant_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 128)) * 3
    q, s = tokenwise_quant(x)
    deq = q.astype(jnp.float32) * s
    # max error is half a quantization step per token
    step = np.asarray(s)[:, 0]
    err = np.max(np.abs(np.asarray(deq - x)), axis=1)
    assert (err <= step * 0.5 + 1e-6).all()


def test_int8_matmul_dynamic_close_to_dense():
    K, N = 128, 64
    key = jax.random.PRNGKey(8)
    w = jax.random.normal(key, (K, N)) * 0.05
    w_absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    w_scale = w_absmax / 127.0
    wq = jnp.clip(jnp.round(w / w_scale), -128, 127).astype(jnp.int8)
    bwd_wq, bwd_scale = requantize_per_input_channel(wq, w_scale)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, K))
    out = int8_matmul_dynamic(x, wq, w_scale, bwd_wq, bwd_scale)
    ref = x @ (wq.astype(jnp.float32) * w_scale)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel

    # backward: dx close to g @ W^T
    def f(x):
        return jnp.sum(int8_matmul_dynamic(x, wq, w_scale, bwd_wq, bwd_scale))

    g = jnp.ones((4, N))
    dx_ref = g @ (wq.astype(jnp.float32) * w_scale).T
    dx = jax.grad(f)(x)
    rel = float(jnp.linalg.norm(dx - dx_ref) / jnp.linalg.norm(dx_ref))
    assert rel < 0.02, rel


def test_pallas_n_pad_covers_7b_ffn():
    """VERDICT #5: LLaMA-7B ffn_dim=11008 must hit the Pallas path for all
    bit-widths after pack-time padding (the round-1 3-bit kernel silently
    fell back to dense dequant there)."""
    from sparsebit_tpu.ops.packing import pallas_n_pad
    from sparsebit_tpu.ops.quant_matmul import _supports_pallas

    for bits in (2, 3, 4, 8):
        Np = 11008 + pallas_n_pad(11008, bits)
        assert _supports_pallas(bits, 4096, Np, 128), (bits, Np)
    assert pallas_n_pad(11008, 3) == 256  # 11008 -> 11264
    assert pallas_n_pad(11008, 4) == 0  # already aligned


@pytest.mark.parametrize("bits,N", [(3, 344), (3, 1000), (4, 200), (2, 300)])
def test_quantlinear_irregular_n_padded(bits, N):
    """QuantLinear at irregular out_features: pack-time padding keeps the
    kernel shape legal; output slices back to the logical width and equals
    the dense-dequant oracle."""
    from sparsebit_tpu.llm.quant import QuantLinear
    from sparsebit_tpu.ops.packing import pallas_n_pad

    K = 64
    w = jax.random.normal(jax.random.PRNGKey(31), (K, N), jnp.float32)
    ql = QuantLinear.from_dense(w, bits=bits, groupsize=32)
    assert ql.out_features == N
    assert ql.n_padded == N + pallas_n_pad(N, bits)
    x = jax.random.normal(jax.random.PRNGKey(32), (3, K))
    ref = x @ ql.dequantize()
    out = ql(x)
    assert out.shape == (3, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_quantlinear_padded_pallas_interpret():
    """The padded 3-bit weight actually runs the Pallas kernel (interpret
    mode) and matches the sliced oracle."""
    from jax.experimental.pallas import tpu as pltpu

    from sparsebit_tpu.llm.quant import QuantLinear
    from sparsebit_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_3bit,
        _supports_pallas,
    )

    # groupsize must be a 128-lane multiple (or == K) for real Mosaic
    # lowering — the x block's last dim is K_BLK = groupsize. gs=32 at
    # K=128 passes interpret mode but fails on hardware (round-2 fix).
    K, N, gs = 256, 344, 128  # N pads to 1024
    w = jax.random.normal(jax.random.PRNGKey(33), (K, N), jnp.float32)
    ql = QuantLinear.from_dense(w, bits=3, groupsize=gs)
    assert _supports_pallas(3, K, ql.n_padded, gs)
    assert not _supports_pallas(3, 128, 1024, 32)  # sub-lane K_BLK rejected
    x = jax.random.normal(jax.random.PRNGKey(34), (2, K))
    ref = x @ ql.dequantize()
    with pltpu.force_tpu_interpret_mode():
        out = _quant_matmul_pallas_3bit(
            x, ql.packed, ql.scales, ql.zeros, gs, ql.n_padded
        )[:, :N]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_u4_kernel_interpret():
    """u4-native kernel (serving layout: uint4 codes -> int8 MXU, zero
    unpack) matches the dequant-dense oracle across bits in interpret
    mode. 3/2-bit codes also ride the u4 array (values < 8/4)."""
    from sparsebit_tpu.ops.packing import pack_columns
    from sparsebit_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_u4,
        codes_to_u4,
    )

    K, N, gs, B = 256, 512, 128, 3
    G = K // gs
    key = jax.random.PRNGKey(40)
    for bits in (4, 3, 2):
        kc, ks, kz, kx = jax.random.split(jax.random.fold_in(key, bits), 4)
        codes = jax.random.randint(kc, (K, N), 0, 2**bits, jnp.int32)
        scales = jax.random.uniform(ks, (G, N), jnp.float32, 0.001, 0.01)
        zeros = jax.random.randint(kz, (G, N), 0, 2**bits, jnp.int32).astype(
            jnp.float32
        )
        x8 = jax.random.randint(kx, (B, K), -127, 127, jnp.int8)
        W = (codes.astype(jnp.float32) - jnp.repeat(zeros, gs, 0)) * jnp.repeat(
            scales, gs, 0
        )
        ref = jnp.dot(x8.astype(jnp.float32), W)
        packed = pack_columns(codes, bits)

        @jax.jit
        def f(packed, x8, scales, zeros, bits=bits):
            u4 = codes_to_u4(packed, bits, N)
            return _quant_matmul_pallas_u4(
                x8, u4, scales, zeros, gs, N, interpret=True
            )

        out = f(packed, x8, scales, zeros)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3
        )


def test_with_u4_quantlinear_parity():
    """QuantLinear.with_u4() (in-jit) preserves forward semantics: the a8
    dispatcher result with the u4 entry present equals the plain a8 path
    (on CPU both use the XLA fallback; the dispatch itself is exercised —
    and the u4 array round-trips the packed codes exactly)."""
    from sparsebit_tpu.llm.quant import QuantLinear
    from sparsebit_tpu.ops.packing import unpack_columns

    K, N = 256, 384
    w = jax.random.normal(jax.random.PRNGKey(41), (K, N), jnp.float32)
    ql = QuantLinear.from_dense(w, bits=4, groupsize=128, impl="a8")
    x = jax.random.normal(jax.random.PRNGKey(42), (2, K), jnp.float32)

    @jax.jit
    def with_u4_forward(ql, x):
        q2 = ql.with_u4()
        return q2(x), q2.packed["u4"].astype(jnp.uint8)

    out_u4, u4_codes = with_u4_forward(ql, x)
    ref = ql(x)
    np.testing.assert_allclose(
        np.asarray(out_u4), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(u4_codes),
        np.asarray(unpack_columns(ql.packed, 4, ql.n_padded)),
    )


def test_u4_pairs_bitcast_roundtrip():
    """pack_u4_pairs -> u4_from_pairs reproduces the codes exactly (the
    free-bitcast serving layout), including with leading stack axes."""
    from sparsebit_tpu.ops.packing import pack_u4_pairs, u4_from_pairs

    codes = jax.random.randint(
        jax.random.PRNGKey(7), (3, 16, 256), 0, 16, jnp.int32
    )
    pairs = pack_u4_pairs(codes)
    assert pairs.shape == (3, 16, 128) and pairs.dtype == jnp.uint8

    @jax.jit
    def back(p):
        return u4_from_pairs(p).astype(jnp.uint8)

    np.testing.assert_array_equal(np.asarray(back(pairs)), np.asarray(codes))


def test_pack_u4_rows_roundtrip():
    from sparsebit_tpu.ops.packing import pack_u4_rows, unpack_u4_rows

    codes = jax.random.randint(jax.random.PRNGKey(51), (3, 8, 256), 0, 16,
                               jnp.int32).astype(jnp.uint8)
    u8r = pack_u4_rows(codes)
    assert u8r.shape == (3, 4, 256) and u8r.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(unpack_u4_rows(u8r)), np.asarray(codes)
    )


def test_u4r_kernel_interpret_parity():
    """Row-pair u8 weights through the u4 kernel (interpret: the in-kernel
    pltpu.bitcast sublane unpack) == dequant-dense oracle."""
    from sparsebit_tpu.ops.packing import pack_u4_rows
    from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_u4

    K, N, gs, B = 256, 384, 128, 2
    G = K // gs
    kc, ks, kz, kx = jax.random.split(jax.random.PRNGKey(52), 4)
    codes = jax.random.randint(kc, (K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(ks, (G, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.randint(kz, (G, N), 0, 16, jnp.int32).astype(
        jnp.float32)
    x8 = jax.random.randint(kx, (B, K), -127, 127, jnp.int32).astype(jnp.int8)
    u8r = pack_u4_rows(codes)
    out = _quant_matmul_pallas_u4(
        x8, u8r, scales, zeros, gs, N, interpret=True
    )
    W = (codes.astype(jnp.float32) - jnp.repeat(zeros, gs, 0)) * jnp.repeat(
        scales, gs, 0)
    ref = x8.astype(jnp.float32) @ W
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_with_u4_rows_quantlinear_parity():
    """with_u4_rows(drop_fold=True): forward (dense-fallback path through
    the u4r unpack), dequantize, and with_k_pad all keep exact parity with
    the fold container."""
    from sparsebit_tpu.llm.quant import QuantLinear

    K, N = 256, 384
    w = jax.random.normal(jax.random.PRNGKey(53), (K, N), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(54), (2, K), jnp.float32)
    ql = QuantLinear.from_dense(w, bits=4, groupsize=128, impl="a8")
    qlr = ql.with_u4_rows(drop_fold=True)
    assert set(qlr.packed) == {"u4r"}
    assert qlr.in_features == K
    np.testing.assert_allclose(np.asarray(qlr(x)), np.asarray(ql(x)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(qlr.dequantize()),
                                  np.asarray(ql.dequantize()))
    qlrp = qlr.with_k_pad(256)
    # padded K=256 -> u4r stores K//2 = 128 row-pair sublanes
    assert "u4r" in qlrp.packed and qlrp.packed["u4r"].shape[0] == 128
    np.testing.assert_allclose(np.asarray(qlrp(x)), np.asarray(ql(x)),
                               rtol=1e-4, atol=1e-5)


def test_u4p_only_dispatch_no_fold_container(monkeypatch):
    """quant_matmul_a8 with a pairs-ONLY packed dict (with_u4_pairs
    drop_fold=True: no "w" fold) must dispatch cleanly on the TPU branch
    selector at every batch regime. Regression: the prefill-size branch
    (rows > 64, u4 kernel gated off) used to fall into the folded-weight
    Pallas branch and KeyError on packed["w"]."""
    import importlib

    # attribute lookup via the ops package returns the rebound custom_vjp
    # function, not the module — resolve the module itself
    qm = importlib.import_module("sparsebit_tpu.ops.quant_matmul")
    from sparsebit_tpu.llm.quant import QuantLinear

    K, N = 256, 384
    w = jax.random.normal(jax.random.PRNGKey(47), (K, N), jnp.float32)
    ql = QuantLinear.from_dense(w, bits=4, groupsize=128, impl="a8")
    qlp = ql.with_u4_pairs(drop_fold=True)
    assert "w" not in qlp.packed
    x = jax.random.normal(jax.random.PRNGKey(48), (80, K), jnp.float32)
    ref = ql(x)  # same A8 semantics, computed before the backend patch
    # pretend we're on TPU for branch selection, but keep every kernel off
    # (CPU can't run compiled Pallas) — the dense fallback must be chosen
    # without touching packed["w"]
    monkeypatch.setattr(qm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(qm, "_supports_pallas_u4", lambda *a, **k: False)
    out = qm.quant_matmul_a8(
        x, qlp.packed, qlp.scales, qlp.zeros, 4, 128, qlp.n_padded
    )[..., : ql.out_features]
    # the >64-row TPU branch is now the int8-MXU group dot — same A8
    # semantics, f32 accumulation order differs from the dense oracle
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_with_u4_pairs_quantlinear_parity():
    """with_u4_pairs (host-side) + with_u4 (in-jit bitcast) produces the
    same u4 codes and forward output as the shift/mask unpack path."""
    from sparsebit_tpu.llm.quant import QuantLinear
    from sparsebit_tpu.ops.packing import unpack_columns

    K, N = 256, 384
    w = jax.random.normal(jax.random.PRNGKey(43), (K, N), jnp.float32)
    ql = QuantLinear.from_dense(w, bits=4, groupsize=128, impl="a8")
    qlp = ql.with_u4_pairs()  # outside jit: uint8 crosses the boundary
    assert "u4p" in qlp.packed
    x = jax.random.normal(jax.random.PRNGKey(44), (2, K), jnp.float32)

    @jax.jit
    def fwd(ql, x):
        q2 = ql.with_u4()
        return q2(x), q2.packed["u4"].astype(jnp.uint8)

    out_p, u4_codes = fwd(qlp, x)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ql(x)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(u4_codes),
        np.asarray(unpack_columns(ql.packed, 4, ql.n_padded)),
    )


def test_with_k_pad_forward_parity():
    """with_k_pad (zero rows, scale 1) preserves forward semantics exactly:
    callers' x is zero-padded to the packed K and pad rows contribute 0 in
    both the dense-dequant and A8 epilogues."""
    from sparsebit_tpu.llm.quant import QuantLinear

    K, N = 384, 256
    w = jax.random.normal(jax.random.PRNGKey(45), (K, N), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(46), (2, K), jnp.float32)
    for impl in ("auto", "a8"):
        ql = QuantLinear.from_dense(w, bits=4, groupsize=128, impl=impl)
        qlp = ql.with_k_pad(256)
        assert qlp.k_padded == 512 and qlp.scales.shape == (4, N)
        # K-grouping changes the summation order: tiny fp drift only
        np.testing.assert_allclose(
            np.asarray(qlp(x)), np.asarray(ql(x)), rtol=1e-4, atol=1e-5
        )
    # pairs container round-trips through the pad too
    qlp2 = ql.with_u4_pairs(drop_fold=True).with_k_pad(256)
    assert "u4p" in qlp2.packed and qlp2.packed["u4p"].shape[0] == 512
    np.testing.assert_allclose(
        np.asarray(qlp2(x)), np.asarray(ql(x)), rtol=1e-4, atol=1e-5
    )


def test_u4_stacked_kernel_interpret():
    """Layer-indexed scalar-prefetch kernel: for every layer index, the
    stacked kernel equals the per-layer dequant-dense oracle."""
    from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_u4_stacked

    L_, K, N, gs, B = 3, 256, 384, 128, 2
    G = K // gs
    key = jax.random.PRNGKey(50)
    kc, ks, kz, kx = jax.random.split(key, 4)
    codes = jax.random.randint(kc, (L_, K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(ks, (L_, G, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.randint(kz, (L_, G, N), 0, 16, jnp.int32).astype(
        jnp.float32
    )
    x8 = jax.random.randint(kx, (B, K), -127, 127, jnp.int8)

    @jax.jit
    def f(codes, x8, scales, zeros, li):
        u4 = codes.astype(jnp.uint4)
        return _quant_matmul_pallas_u4_stacked(
            x8, u4, scales, zeros,
            li, gs, N, interpret=True,
        )

    for li in range(L_):
        W = (codes[li].astype(jnp.float32) - jnp.repeat(zeros[li], gs, 0)) * (
            jnp.repeat(scales[li], gs, 0)
        )
        ref = jnp.dot(x8.astype(jnp.float32), W)
        out = f(codes, x8, scales, zeros, jnp.int32(li))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3, err_msg=str(li)
        )


def test_call_stacked_matches_unstacked():
    """QuantLinear.call_stacked (stacked leaves + layer index) equals the
    plain per-layer forward, through BOTH the interpret-Pallas path and the
    XLA fallback."""
    from sparsebit_tpu.llm.quant import QuantLinear
    from sparsebit_tpu.ops.quant_matmul import quant_matmul_a8_stacked

    L_, K, N = 3, 256, 384
    qls = []
    for i in range(L_):
        w = jax.random.normal(jax.random.PRNGKey(60 + i), (K, N), jnp.float32)
        qls.append(QuantLinear.from_dense(w, bits=4, groupsize=128, impl="a8"))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qls)
    x = jax.random.normal(jax.random.PRNGKey(70), (2, K), jnp.float32)

    for li in range(L_):
        ref = qls[li](x)
        # XLA fallback (no u4 entry)
        out_f = stacked.call_stacked(x, jnp.int32(li))
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

        # interpret-Pallas path with the u4 entry present
        @jax.jit
        def f(stacked, x, li):
            s2 = stacked.with_u4()
            return quant_matmul_a8_stacked(
                x, s2.packed, s2.scales, s2.zeros, li, 4, 128, s2.n_padded,
                interpret=True,
            )[..., :N]

        out_p = f(stacked, x, jnp.int32(li))
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_pack_s4_rows_roundtrip():
    from sparsebit_tpu.ops.packing import (
        pack_s4_rows, pack_u4_rows, unpack_s4_rows)

    codes = jax.random.randint(jax.random.PRNGKey(61), (3, 8, 256), 0, 16,
                               jnp.int32).astype(jnp.uint8)
    s8r = pack_s4_rows(codes)
    assert s8r.shape == (3, 4, 256) and s8r.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(unpack_s4_rows(s8r)), np.asarray(codes)
    )
    # bit identity: (c - 8) & 0xF == c ^ 8 on both nibbles
    np.testing.assert_array_equal(
        np.asarray(s8r), np.asarray(pack_u4_rows(codes) ^ 0x88)
    )


def test_s4r_kernel_interpret_parity():
    """Signed row-pair weights through the u4 kernel (signed=True: int4
    bitcast + (zero - 8) epilogue) == the unsigned path EXACTLY (same
    codes, integer dots, identical f32 epilogue order)."""
    from sparsebit_tpu.ops.packing import pack_s4_rows, pack_u4_rows
    from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_u4

    K, N, gs, B = 256, 384, 128, 2
    G = K // gs
    kc, ks, kz, kx = jax.random.split(jax.random.PRNGKey(62), 4)
    codes = jax.random.randint(kc, (K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(ks, (G, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.randint(kz, (G, N), 0, 16, jnp.int32).astype(
        jnp.float32)
    x8 = jax.random.randint(kx, (B, K), -127, 127, jnp.int32).astype(jnp.int8)
    out_u = _quant_matmul_pallas_u4(
        x8, pack_u4_rows(codes), scales, zeros, gs, N, interpret=True
    )
    out_s = _quant_matmul_pallas_u4(
        x8, pack_s4_rows(codes), scales, zeros, gs, N, interpret=True,
        signed=True,
    )
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))


def test_with_s4_rows_quantlinear_parity():
    """with_s4_rows(drop_fold=True): forward (dense-fallback through the
    s4r unpack), dequantize, and with_k_pad keep exact parity; zeros stay
    in the unsigned-code convention."""
    from sparsebit_tpu.llm.quant import QuantLinear

    K, N = 256, 384
    w = jax.random.normal(jax.random.PRNGKey(63), (K, N), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(64), (2, K), jnp.float32)
    ql = QuantLinear.from_dense(w, bits=4, groupsize=128, impl="a8")
    qls = ql.with_s4_rows(drop_fold=True)
    assert set(qls.packed) == {"s4r"}
    assert qls.in_features == K
    np.testing.assert_allclose(np.asarray(qls(x)), np.asarray(ql(x)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(qls.dequantize()),
                                  np.asarray(ql.dequantize()))
    qlsp = qls.with_k_pad(256)
    assert "s4r" in qlsp.packed and qlsp.packed["s4r"].shape[0] == 128
    np.testing.assert_allclose(np.asarray(qlsp(x)), np.asarray(ql(x)),
                               rtol=1e-4, atol=1e-5)


def test_s4r_stacked_kernel_interpret():
    """Stacked scalar-prefetch kernel with signed containers == unsigned."""
    from sparsebit_tpu.ops.packing import pack_s4_rows, pack_u4_rows
    from sparsebit_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_u4_stacked)

    Lx, K, N, gs, B = 2, 256, 384, 128, 2
    G = K // gs
    kc, ks, kz, kx = jax.random.split(jax.random.PRNGKey(65), 4)
    codes = jax.random.randint(kc, (Lx, K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(ks, (Lx, G, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.randint(kz, (Lx, G, N), 0, 16, jnp.int32).astype(
        jnp.float32)
    x8 = jax.random.randint(kx, (B, K), -127, 127, jnp.int32).astype(jnp.int8)
    for li in (0, 1):
        out_u = _quant_matmul_pallas_u4_stacked(
            x8, pack_u4_rows(codes), scales, zeros, jnp.int32(li), gs, N,
            interpret=True,
        )
        out_s = _quant_matmul_pallas_u4_stacked(
            x8, pack_s4_rows(codes), scales, zeros, jnp.int32(li), gs, N,
            interpret=True, signed=True,
        )
        np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_u))


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_a8_groupdot_int8_matches_densify(bits):
    """The large-B (prefill) int8-MXU fallback == xq @ dequant(W) exactly
    (same group-factored epilogue the Pallas kernels compute): every
    term is an exact s32 integer dot, only the f32 accumulation order
    differs from the densify oracle."""
    from sparsebit_tpu.ops.packing import pack_columns, pack_s4_rows
    from sparsebit_tpu.ops.quant_matmul import (
        _a8_groupdot_int8,
        dequant_weights,
    )

    K, N, gs, B = 256, 128, 64, 80  # B > the kernels' 64-row cap
    G = K // gs
    kc, ks, kz, kx = jax.random.split(jax.random.PRNGKey(77), 4)
    codes = jax.random.randint(kc, (K, N), 0, 2**bits, jnp.int32)
    scales = jax.random.uniform(ks, (G, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.randint(kz, (G, N), 0, 2**bits, jnp.int32).astype(
        jnp.float32)
    packed = {"s4r": pack_s4_rows(codes)} if bits == 4 else pack_columns(
        codes, bits)
    xq = jax.random.randint(kx, (B, K), -127, 128, jnp.int32).astype(jnp.int8)

    got = _a8_groupdot_int8(xq, packed, scales, zeros, bits, gs, N)
    W = dequant_weights(packed, scales, zeros, bits, N, gs)
    ref = jnp.dot(xq.astype(jnp.float32), W,
                  preferred_element_type=jnp.float32)
    # only f32 accumulation order differs (group-major vs K-major);
    # 8-bit's larger per-term magnitudes show the most rounding spread
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("B", [80, 300])
def test_u4_kernel_big_b_interpret_parity(B):
    """B-tiled (prefill-regime) u4 kernel grid == densify oracle: B > 64
    engages the (b, i, k) grid (single b-step at 80, multi at 300 with
    row padding)."""
    from sparsebit_tpu.ops.packing import pack_s4_rows
    from sparsebit_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_u4,
        _supports_pallas_u4,
        dequant_weights,
    )

    K, N, gs = 256, 256, 64
    G = K // gs
    kc, ks, kz, kx = jax.random.split(jax.random.PRNGKey(88), 4)
    codes = jax.random.randint(kc, (K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(ks, (G, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.randint(kz, (G, N), 0, 16, jnp.int32).astype(
        jnp.float32)
    packed = {"s4r": pack_s4_rows(codes)}
    xq = jax.random.randint(kx, (B, K), -127, 128, jnp.int32).astype(jnp.int8)

    assert _supports_pallas_u4(K, N, gs, B)
    got = _quant_matmul_pallas_u4(
        xq, packed["s4r"], scales, zeros, gs, N, interpret=True, signed=True
    )
    W = dequant_weights(packed, scales, zeros, 4, N, gs)
    ref = jnp.dot(xq.astype(jnp.float32), W,
                  preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_u4_stacked_kernel_big_b_interpret_parity():
    """B-tiled STACKED u4 kernel (the flash-prefill matmul path: layer
    index scalar-prefetched, weights addressed in place) == per-layer
    densify oracle."""
    from sparsebit_tpu.ops.packing import pack_s4_rows
    from sparsebit_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_u4_stacked,
        dequant_weights,
    )

    Lx, K, N, gs, B = 2, 256, 256, 64, 96
    G = K // gs
    kc, ks, kz, kx = jax.random.split(jax.random.PRNGKey(89), 4)
    codes = jax.random.randint(kc, (Lx, K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(ks, (Lx, G, N), jnp.float32, 0.001, 0.01)
    zeros = jax.random.randint(kz, (Lx, G, N), 0, 16, jnp.int32).astype(
        jnp.float32)
    s4r = jnp.stack([pack_s4_rows(codes[i]) for i in range(Lx)])
    xq = jax.random.randint(kx, (B, K), -127, 128, jnp.int32).astype(jnp.int8)

    for li in range(Lx):
        got = _quant_matmul_pallas_u4_stacked(
            xq, s4r, scales, zeros, li, gs, N, interpret=True, signed=True
        )
        W = dequant_weights({"s4r": s4r[li]}, scales[li], zeros[li], 4, N, gs)
        ref = jnp.dot(xq.astype(jnp.float32), W,
                      preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3, err_msg=str(li))
