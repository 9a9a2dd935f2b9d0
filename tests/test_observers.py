"""Observer numerics vs reference formulas (observers/*.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.quantization.common import QuantTarget
from sparsebit_tpu.quantization.observers import build_observer
from sparsebit_tpu.quantization.quant_descriptor import QuantDescriptor
from sparsebit_tpu.utils.config import CfgNode


def make_cfg(
    qscheme="per-tensor-affine",
    bit=8,
    observer="minmax",
    target=QuantTarget.FEATURE,
    layout="NCHW",
    **obs_kwargs,
):
    cfg = CfgNode(
        {
            "TARGET": [target],
            "QSCHEME": qscheme,
            "QUANTIZER": {"TYPE": "uniform", "BIT": bit, "GROUPSIZE": -1},
            "OBSERVER": {
                "TYPE": observer,
                "PERCENTILE": {"ALPHA": obs_kwargs.get("alpha", 0.001)},
                "MOVING_AVERAGE": {"EMA_RATIO": obs_kwargs.get("ema_ratio", 0.9)},
                "ACIQ": {"DISTRIBUTION": obs_kwargs.get("distribution", "GAUS")},
            },
        }
    )
    if target == QuantTarget.FEATURE:
        cfg.OBSERVER.LAYOUT = layout
    return cfg


def build(observer, qscheme="per-tensor-affine", bit=8, target=QuantTarget.FEATURE, **kw):
    cfg = make_cfg(qscheme=qscheme, bit=bit, observer=observer, target=target, **kw)
    qdesc = QuantDescriptor(cfg)
    return build_observer(cfg, qdesc), qdesc


def test_minmax_pertensor_affine():
    obs, qdesc = build("minmax")
    x = np.array([[-1.0, 2.0], [0.5, 4.0]], np.float32).reshape(1, 2, 1, 2)
    obs.update(jnp.asarray(x))
    scale, zp = obs.calc_qparams()
    # scale = (4 - (-1)) / 255
    np.testing.assert_allclose(scale, 5.0 / 255, rtol=1e-6)
    np.testing.assert_allclose(zp, np.round(1.0 / (5.0 / 255)), rtol=1e-6)


def test_minmax_perchannel_symmetric_weight():
    obs, qdesc = build(
        "minmax", qscheme="per-channel-symmetric", target=QuantTarget.WEIGHT
    )
    w = np.stack([np.linspace(-1, 1, 10), np.linspace(-4, 2, 10)]).astype(np.float32)
    obs.update(jnp.asarray(w))
    scale, zp = obs.calc_qparams()
    np.testing.assert_allclose(scale, [2.0 / 255, 8.0 / 255], rtol=1e-5)
    np.testing.assert_allclose(zp, [0.0, 0.0])


def test_mse_beats_or_ties_minmax():
    rng = np.random.RandomState(0)
    x = np.concatenate([rng.randn(10000), np.array([50.0])]).astype(np.float32)
    x4 = x.reshape(1, 1, -1, 1)

    def mse_of(observer):
        obs, qdesc = build(observer, qscheme="per-tensor-symmetric")
        obs.update(jnp.asarray(x4))
        scale, zp = obs.calc_qparams()
        from sparsebit_tpu.quantization.fake_quant import fake_quant

        dq = fake_quant(jnp.asarray(x), scale, zp, qdesc.qmin, qdesc.qmax)
        return float(jnp.mean((dq - x) ** 2))

    assert mse_of("mse") <= mse_of("minmax") + 1e-9


def test_percentile_clips_outlier():
    rng = np.random.RandomState(1)
    x = np.concatenate([rng.rand(9999), np.array([1000.0])]).astype(np.float32)
    obs, _ = build("percentile", alpha=0.001)
    obs.update(jnp.asarray(x.reshape(1, 1, -1, 1)))
    mn, mx = obs.calc_minmax()
    assert float(mx) < 100.0


def test_moving_average_ema():
    obs, _ = build("moving_average")
    x = np.stack([np.full((4,), 1.0), np.full((4,), 3.0)]).astype(np.float32)
    obs.update(jnp.asarray(x.reshape(2, 1, 2, 2)))
    mn, mx = obs.calc_minmax()
    # EMA: start 1.0, then 0.9*1 + 0.1*3 = 1.2
    np.testing.assert_allclose(mx, 1.2, rtol=1e-6)


def test_aciq_gaus_smaller_than_minmax_on_gaussian():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 32, 32).astype(np.float32)
    obs, _ = build("aciq", qscheme="per-tensor-symmetric")
    obs.update(jnp.asarray(x))
    mn, mx = obs.calc_minmax()
    assert 0 < float(mx) < np.abs(x).max()


def test_kl_histogram_reasonable_threshold():
    rng = np.random.RandomState(3)
    x = rng.randn(20000).astype(np.float32)
    obs, _ = build("kl_histogram", qscheme="per-tensor-symmetric")
    obs.update(jnp.asarray(x.reshape(1, 1, -1, 1)))
    mn, mx = obs.calc_minmax()
    assert 1.0 < float(mx) <= np.abs(x).max() + 1e-5
    assert float(mn) == -float(mx)


def test_kl_device_matches_numpy_oracle():
    """The on-device KL search (jit fori_loop + one-hot-matmul segment
    sums, kl_device.py) must pick the same candidate widths as the numpy
    reference implementation across distributions and bits."""
    from sparsebit_tpu.quantization.observers.kl_device import (
        kl_thresholds_device,
    )
    from sparsebit_tpu.quantization.observers.kl_histogram import kl_thresholds

    rng = np.random.RandomState(7)
    cases = [
        ("gauss", rng.randn(3, 4096).astype(np.float32)),
        ("laplace", rng.laplace(size=(2, 4096)).astype(np.float32)),
        ("outliers", np.concatenate(
            [rng.randn(1, 4000), 20 * rng.randn(1, 96)], axis=1
        ).astype(np.float32)),
    ]
    for bit in (4, 8):
        for name, data in cases:
            ref = kl_thresholds(data, bit, bins=512)
            dev = np.asarray(kl_thresholds_device(jnp.asarray(data), bit, bins=512))
            np.testing.assert_allclose(
                dev, ref, rtol=1e-5,
                err_msg=f"{name} bit={bit}",
            )


def test_kl_histogram_perchannel():
    rng = np.random.RandomState(4)
    w = rng.randn(4, 64).astype(np.float32)
    obs, _ = build(
        "kl_histogram", qscheme="per-channel-symmetric", target=QuantTarget.WEIGHT
    )
    obs.update(jnp.asarray(w))
    mn, mx = obs.calc_minmax()
    assert mx.shape == (4,)
    assert np.all(np.asarray(mx) > 0)
