"""Fake-quant forward/backward semantics vs the reference formulas
(fake_quant_tensor.cu:97-167 / quant_tensor.py MySTE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.quantization.fake_quant import (
    dequantize,
    fake_quant,
    grad_scale,
    quantize,
)


def ref_fake_quant(x, s, zp, qmin, qmax):
    zp = np.round(zp)
    xq = np.clip(np.round(x / s) + zp, qmin, qmax)
    return (xq - zp) * s


def test_forward_pertensor():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 16).astype(np.float32) * 3
    s, zp = np.float32(0.1), np.float32(3.0)
    out = fake_quant(jnp.asarray(x), jnp.asarray(s), jnp.asarray(zp), -128, 127)
    np.testing.assert_allclose(out, ref_fake_quant(x, s, zp, -128, 127), atol=1e-6)


def test_forward_perchannel():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 5).astype(np.float32)
    s = rng.rand(8, 1).astype(np.float32) * 0.2 + 0.01
    zp = np.zeros((8, 1), np.float32)
    out = fake_quant(jnp.asarray(x), jnp.asarray(s), jnp.asarray(zp), -8, 7)
    np.testing.assert_allclose(out, ref_fake_quant(x, s, zp, -8, 7), atol=1e-6)


def test_backward_matches_reference_formulas():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(64).astype(np.float32) * 2)
    s = jnp.asarray(0.05, jnp.float32)
    zp = jnp.asarray(2.0, jnp.float32)
    qmin, qmax = 0, 255
    gy = jnp.asarray(rng.randn(64).astype(np.float32))

    def f(x, s, zp):
        return jnp.vdot(fake_quant(x, s, zp, qmin, qmax), gy)

    gx, gs, gzp = jax.grad(f, argnums=(0, 1, 2))(x, s, zp)

    xs = np.asarray(x) / float(s)
    vq = np.round(xs) + float(zp)
    in_range = (vq >= qmin) & (vq <= qmax)
    exp_gx = np.where(in_range, np.asarray(gy), 0.0)
    exp_gs = np.where(
        in_range,
        (np.round(xs) - xs) * np.asarray(gy),
        np.where(vq > qmax, (qmax - float(zp)) * np.asarray(gy), (qmin - float(zp)) * np.asarray(gy)),
    ).sum()
    exp_gzp = np.where(in_range, 0.0, -float(s) * np.asarray(gy)).sum()

    np.testing.assert_allclose(gx, exp_gx, atol=1e-5)
    np.testing.assert_allclose(gs, exp_gs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gzp, exp_gzp, rtol=1e-4, atol=1e-4)


def test_grad_scale():
    g = jax.grad(lambda s: (grad_scale(s, 0.25) * 3.0))(jnp.asarray(2.0))
    assert np.isclose(g, 0.75)
    assert np.isclose(grad_scale(jnp.asarray(2.0), 0.25), 2.0)


def test_quantize_dequantize_roundtrip():
    rng = np.random.RandomState(3)
    x = rng.randn(32).astype(np.float32)
    s = jnp.asarray(0.02, jnp.float32)
    zp = jnp.asarray(0.0, jnp.float32)
    q = quantize(jnp.asarray(x), s, zp, -128, 127)
    assert q.dtype == jnp.int8
    dq = dequantize(q, s, zp)
    np.testing.assert_allclose(dq, ref_fake_quant(x, 0.02, 0.0, -128, 127), atol=1e-6)
