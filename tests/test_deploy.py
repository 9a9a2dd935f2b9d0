"""INT8 deploy pass: integer compute must equal the fake-quant forward."""

import jax
import jax.numpy as jnp
import numpy as np

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.quantization.deploy import deploy
from sparsebit_tpu.quantization.quant_config import _C
from sparsebit_tpu.quantization.quant_model import QuantModel


class Net(nn.Module):
    def __init__(self, key):
        super().__init__()
        ks = jax.random.split(key, 3)
        self.conv1 = nn.Conv2d(3, 16, 3, padding=1, key=ks[0])
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(16, 16, 3, stride=2, padding=1, key=ks[1])
        self.relu2 = nn.ReLU()
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.flat = nn.Flatten()
        self.fc = nn.Linear(16, 10, key=ks[2])

    def forward(self, x):
        y = self.relu(self.conv1(x))
        y = self.relu2(self.conv2(y))
        return self.fc(self.flat(self.pool(y)))


def _cfg():
    cfg = _C.clone()
    cfg.defrost()
    cfg.BACKEND = "tpu"
    cfg.W.QSCHEME = "per-channel-symmetric"
    cfg.W.QUANTIZER.BIT = 8
    cfg.A.QSCHEME = "per-tensor-affine"
    cfg.A.QUANTIZER.BIT = 8
    cfg.freeze()
    return cfg


def test_deploy_matches_fake_quant():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    model = Net(jax.random.PRNGKey(1)).eval()
    qmodel = QuantModel(model, _cfg(), (x,))
    qmodel.prepare_calibration()
    qmodel(x)
    qmodel.calc_qparams()
    qmodel.set_quant(w_quant=True, a_quant=True)
    fq = qmodel(x)

    dm = deploy(qmodel)
    out = dm(x)
    # same math, different arithmetic path: f32 rounding only
    np.testing.assert_allclose(np.asarray(out), np.asarray(fq), rtol=2e-5, atol=2e-5)
    # and the QuantModel itself is untouched
    np.testing.assert_allclose(np.asarray(qmodel(x)), np.asarray(fq), rtol=0, atol=0)


def test_deploy_integer_path_really_int8():
    """The deployed graph's conv weights are int8 buffers."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    qmodel = QuantModel(Net(jax.random.PRNGKey(1)).eval(), _cfg(), (x,))
    qmodel.prepare_calibration()
    qmodel(x)
    qmodel.calc_qparams()
    qmodel.set_quant(True, True)
    dm = deploy(qmodel)
    wqs = [
        n.op._buffers["wq"]
        for n in dm.graph.op_nodes
        if "wq" in getattr(n.op, "_buffers", {})
    ]
    assert len(wqs) == 3
    assert all(w.dtype == jnp.int8 for w in wqs)


def test_deploy_transformer_block():
    """deploy() on a transformer graph: Linears go int8, matmul/softmax
    stay fake-quant/float — mixed graphs execute correctly."""
    from sparsebit_tpu.models.vit import Attention

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 64))
    attn = Attention(64, num_heads=4, key=jax.random.PRNGKey(4))
    attn.eval()

    cfg = _cfg()
    cfg.defrost()
    cfg.A.OBSERVER.LAYOUT = "NLC"
    cfg.freeze()
    qmodel = QuantModel(attn, cfg, (x,))
    qmodel.prepare_calibration()
    qmodel(x)
    qmodel.calc_qparams()
    qmodel.set_quant(True, True)
    fq = qmodel(x)

    dm = deploy(qmodel)
    out = dm(x)
    rel = float(jnp.linalg.norm(out - fq) / jnp.linalg.norm(fq))
    assert rel < 5e-3, rel
    n_int8 = sum(
        1 for n in dm.graph.op_nodes if "wq" in getattr(n.op, "_buffers", {})
    )
    assert n_int8 == 2  # qkv + proj
