"""QuantModel integration tests, mirroring the reference CI suite:
- calibration in 4 modes (ci/regular_tests/test_calibration.py:72-93)
- rewrite-is-identity for an attention block (test_MHSA.py:31-58)
- QAdd input identity insertion (test_qadd.py:31-68)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparsebit_tpu.nn as nn
from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.nn import functional as F
from sparsebit_tpu.quantization.modules.math import QAdd
from sparsebit_tpu.quantization.modules.unary import QIdentity


def cnn_config(**kw):
    cfg = {
        "BACKEND": "virtual",
        "W": {"QSCHEME": "per-channel-symmetric", "QUANTIZER": {"BIT": 8}},
        "A": {
            "QSCHEME": "per-tensor-affine",
            "QUANTIZER": {"BIT": 8},
            "OBSERVER": {"LAYOUT": "NHWC"},
        },
    }
    for k, v in kw.items():
        cfg[k] = v
    return parse_qconfig(cfg)


class ResBlockNet(nn.Module):
    """conv-bn-relu + residual add + fc: exercises QAdd, BN fusing, pooling."""

    def __init__(self):
        super().__init__()
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        self.conv1 = nn.Conv2d(3, 8, 3, padding=1, key=ks[0])
        self.bn1 = nn.BatchNorm2d(8)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(8, 8, 3, padding=1, key=ks[1])
        self.bn2 = nn.BatchNorm2d(8)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten()
        self.fc = nn.Linear(8, 4, key=ks[2])

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        z = self.bn2(self.conv2(y)) + y
        return self.fc(self.flatten(self.pool(z)))


def rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


x_small = None


def get_x():
    global x_small
    if x_small is None:
        x_small = rand((2, 8, 8, 3))
    return x_small


@pytest.mark.parametrize(
    "asym,w_quant,a_quant",
    [(False, False, False), (True, True, False), (True, False, True), (True, True, True)],
)
def test_calibration_modes(asym, w_quant, a_quant):
    """4-mode calibration on a residual CNN (reference test_calibration.py)."""
    model = ResBlockNet().eval()
    q = QuantModel(model, cnn_config(), (get_x(),))
    q.prepare_calibration()
    q(get_x())
    q.calc_qparams(asym=asym, w_quant=w_quant, a_quant=a_quant)
    q.set_quant(w_quant=True, a_quant=True)
    out = q(get_x())
    assert out.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_rewrite_is_identity_mhsa():
    """Graph rewrite of an attention block is semantics-preserving with
    quantizers disabled (reference test_MHSA.py allclose 1e-4)."""

    class MHSA(nn.Module):
        def __init__(self, dim=16, heads=2):
            super().__init__()
            ks = jax.random.split(jax.random.PRNGKey(3), 2)
            self.dim, self.heads = dim, heads
            self.qkv = nn.Linear(dim, dim * 3, key=ks[0])
            self.softmax = nn.Softmax(dim=-1)
            self.proj = nn.Linear(dim, dim, key=ks[1])

        def forward(self, x):
            b, l, d = x.shape[0], x.shape[1], self.dim
            h = self.heads
            qkv = F.permute(
                F.reshape(self.qkv(x), (b, l, 3, h, d // h)), (2, 0, 3, 1, 4)
            )
            q, k, v = F.getitem(qkv, 0), F.getitem(qkv, 1), F.getitem(qkv, 2)
            attn = self.softmax(
                F.matmul(q, F.transpose(k, -2, -1)) * (1.0 / (d // h) ** 0.5)
            )
            out = F.reshape(F.transpose(F.matmul(attn, v), 1, 2), (b, l, d))
            return self.proj(out)

    model = MHSA().eval()
    x = rand((2, 6, 16), seed=5)
    float_out = model(x)
    cfg = parse_qconfig(
        {
            "BACKEND": "virtual",
            "W": {"QSCHEME": "per-channel-symmetric", "QUANTIZER": {"BIT": 8}},
            "A": {
                "QSCHEME": "per-tensor-affine",
                "QUANTIZER": {"BIT": 8},
                "OBSERVER": {"LAYOUT": "NLC"},
            },
        }
    )
    q = QuantModel(model, cfg, (x,))
    out = q(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(float_out), atol=1e-4)


def test_qadd_identity_insertion():
    """QAdd inputs get QIdentity quantizer nodes when enabled
    (reference test_qadd.py:31-68)."""
    model = ResBlockNet().eval()
    cfg = cnn_config(A={
        "QSCHEME": "per-tensor-affine",
        "QUANTIZER": {"BIT": 8},
        "OBSERVER": {"LAYOUT": "NHWC"},
        "QADD": {"ENABLE_QUANT": True},
    })
    q = QuantModel(model, cfg, (get_x(),))
    add_nodes = [n for n in q.graph.op_nodes if isinstance(n.op, QAdd)]
    assert len(add_nodes) == 1
    for p in add_nodes[0].input_nodes:
        assert isinstance(p.op, QIdentity), "QAdd input missing QIdentity"

    # disabled by default: no identities inserted
    q2 = QuantModel(ResBlockNet().eval(), cnn_config(), (get_x(),))
    add2 = [n for n in q2.graph.op_nodes if isinstance(n.op, QAdd)][0]
    assert not any(isinstance(p.op, QIdentity) for p in add2.input_nodes)


def test_fuse_bn_preserves_output():
    model = ResBlockNet().eval()
    x = get_x()
    float_out = model(x)
    cfg = cnn_config(SCHEDULE={"FUSE_BN": True, "BN_TUNING": False,
                               "DISABLE_UNNECESSARY_QUANT": True})
    q = QuantModel(model, cfg, (x,))
    from sparsebit_tpu.quantization.modules.normalization import QBatchNorm2d

    assert not any(
        isinstance(n.op, QBatchNorm2d) for n in q.graph.op_nodes
    ), "BN nodes should be fused away"
    out = q(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(float_out), atol=1e-4)


def test_export(tmp_path):
    """StableHLO + quant metadata export smoke (reference test_add_extra_info.py)."""
    model = ResBlockNet().eval()
    x = get_x()
    q = QuantModel(model, cnn_config(), (x,))
    q.prepare_calibration()
    q(x)
    q.calc_qparams()
    out_dir = q.export(str(tmp_path / "exported"), x, extra_info=True)
    import os

    assert os.path.exists(os.path.join(out_dir, "model.stablehlo"))
    assert os.path.exists(os.path.join(out_dir, "quant_meta.json"))


def test_batchnorm_tuning():
    """BN-tuning context (arXiv 2006.10518): re-estimate BN stats under
    quantization, then fuse (reference quant_model.py:160-179)."""
    model = ResBlockNet().eval()
    cfg = cnn_config(SCHEDULE={"BN_TUNING": True, "FUSE_BN": True})
    x = get_x()
    qmodel = QuantModel(model, cfg, (x,))
    # BN_TUNING defers fusion: BN nodes still present
    from sparsebit_tpu.quantization.modules.normalization import QBatchNorm2d

    assert any(isinstance(n.op, QBatchNorm2d) for n in qmodel.graph.op_nodes)
    qmodel.prepare_calibration()
    qmodel(x)
    qmodel.calc_qparams()
    before = np.asarray(qmodel.get_qmodule("bn1").module._buffers["running_mean"])
    with qmodel.batchnorm_tuning():
        for seed in range(3):
            qmodel(rand((2, 8, 8, 3), seed))
    # stats moved, BN now fused away, quant off again
    assert not any(isinstance(n.op, QBatchNorm2d) for n in qmodel.graph.op_nodes)
    out = qmodel(x)
    assert out.shape == (2, 4)


def test_quantization_error_profiler():
    """Errors are nonzero at 4 bits regardless of the caller's quant state,
    and async(layer-isolated) != sync(propagated) in general."""
    from sparsebit_tpu.quantization.tools.errors_profiler import cosine_checker

    model = ResBlockNet().eval()
    cfg = cnn_config()
    for w in (cfg.W, cfg.A):
        w.defrost() if hasattr(w, "defrost") else None
    cfg.defrost()
    cfg.W.QUANTIZER.BIT = 4
    cfg.A.QUANTIZER.BIT = 4
    cfg.freeze()
    x = get_x()
    qmodel = QuantModel(model, cfg, (x,))
    qmodel.prepare_calibration()
    qmodel(x)
    qmodel.calc_qparams()
    qmodel.set_quant(True, True)  # the profiler must still measure vs float
    e_async = qmodel.get_quantization_error(x)
    e_sync = qmodel.get_quantization_error(x, is_async=False)
    e_cos = qmodel.get_quantization_error(x, checker=cosine_checker)
    assert any(v > 0 for v in e_async.values())
    assert any(v > 0 for v in e_sync.values())
    assert any(v > 0 for v in e_cos.values())
    # the caller's quant state survives profiling
    out_q = qmodel(x)
    qmodel.set_quant(False, False)
    assert not np.allclose(np.asarray(out_q), np.asarray(qmodel(x)))


@pytest.mark.parametrize("name", ["efficientnet_lite0", "regnetx_600mf"])
def test_imagenet_zoo_ptq_flow(name):
    """EfficientNet-Lite0 / RegNetX-600MF (reference PTQ README table,
    basecase README.md:27-33) through the full PTQ pipeline: the rewrite
    is exact with quantizers off, and calibrate+quantize perturbs the
    output only slightly at 8 bits."""
    from sparsebit_tpu.models import create_model

    model = create_model(name, num_classes=16).eval()
    x = rand((2, 64, 64, 3), seed=3)
    float_out = model(x)
    qmodel = QuantModel(model, cnn_config(), (x,))
    np.testing.assert_allclose(
        np.asarray(qmodel(x)), np.asarray(float_out), atol=1e-4
    )
    qmodel.prepare_calibration()
    qmodel(x)
    qmodel.calc_qparams()
    qmodel.set_quant(True, True)
    q_out = np.asarray(qmodel(x))
    rel = np.mean((q_out - np.asarray(float_out)) ** 2) / (
        np.mean(np.asarray(float_out) ** 2) + 1e-12
    )
    assert 0 < rel < 5e-2
