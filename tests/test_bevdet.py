"""BEVDet-lite: multi-camera BEV detection through the quant flow.

Reference: examples/quantization_aware_training/nuscenes/bevdet —
BEVDetTraced quantizes submodules around an unquantized LSS view
transform (qbevdet.py:19-28); here the transform is a leaf by
construction (models/bevdet.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.models import create_model
from sparsebit_tpu.quantization.modules.base import QuantOpr

N_CAMS = 4


def _cfg(bit=8, qtype="uniform"):
    return parse_qconfig({
        "BACKEND": "tpu",
        "W": {"QSCHEME": "per-channel-symmetric",
              "QUANTIZER": {"TYPE": qtype, "BIT": bit},
              "OBSERVER": {"TYPE": "MINMAX", "LAYOUT": "NHWC"}},
        "A": {"QSCHEME": "per-tensor-affine",
              "QUANTIZER": {"TYPE": qtype, "BIT": bit},
              "OBSERVER": {"TYPE": "MINMAX", "LAYOUT": "NHWC"}},
    })


def _model_and_input(B=2):
    m = create_model("bevdet_lite", n_cams=N_CAMS, num_classes=6,
                     img_hw=(32, 48))
    imgs = jax.random.normal(
        jax.random.PRNGKey(0), (B * N_CAMS, 32, 48, 3), jnp.float32)
    return m, imgs


def test_lss_pooling_matches_dense_oracle():
    """Segment-sum lift-splat == explicit per-point accumulation."""
    from sparsebit_tpu.models.bevdet import LSSViewTransform

    D, C, Hb, Wb = 4, 3, 8, 8
    lss = LSSViewTransform(2, (4, 6), D, C, (Hb, Wb))
    x = jax.random.normal(jax.random.PRNGKey(1), (2 * 2, 4, 6, D + C))
    out = lss(x)
    assert out.shape == (2, Hb, Wb, C)

    ids = np.asarray(lss.cell_ids)  # (n_cams*h*w*D,)
    depth = jax.nn.softmax(x[..., :D], -1)
    ctx = x[..., D:]
    feat = np.asarray(depth[..., :, None] * ctx[..., None, :])  # (BN,h,w,D,C)
    B = 2
    ref = np.zeros((B, Hb * Wb + 1, C), np.float32)
    flat = feat.reshape(B, -1, C)  # (B, n_cams*h*w*D, C) same order as ids
    for b in range(B):
        for p, cid in enumerate(ids):
            ref[b, cid] += flat[b, p]
    np.testing.assert_allclose(
        np.asarray(out), ref[:, :-1].reshape(B, Hb, Wb, C),
        rtol=1e-5, atol=1e-5)


def test_bevdet_quant_flow():
    """Trace -> convert -> calibrate -> quantized forward; the view
    transform stays an unquantized leaf; quantizers-off == float."""
    m, imgs = _model_and_input()
    hm_f, box_f = m(imgs)
    qm = QuantModel(m, _cfg(8), (imgs,))

    lss_nodes = [n for n in qm.graph.op_nodes if n.name == "view_transform"]
    assert len(lss_nodes) == 1
    assert not isinstance(lss_nodes[0].op, QuantOpr)  # float leaf

    hm0, box0 = qm(imgs)
    np.testing.assert_allclose(np.asarray(hm0), np.asarray(hm_f),
                               rtol=1e-5, atol=1e-5)

    qm.prepare_calibration()
    qm(imgs)
    qm.calc_qparams()
    qm.set_quant(True, True)
    hm_q, box_q = qm(imgs)
    rel = float(jnp.mean((hm_q - hm_f) ** 2) / jnp.mean(hm_f ** 2))
    assert 0 < rel < 1e-3, rel


def test_bevdet_qat_step_decreases_loss():
    """LSQ init + two QAT steps on the CenterPoint-lite loss run and
    reduce it (examples/quantization_aware_training/nuscenes_bevdet)."""
    import optax

    import sys, os
    sys.path.insert(0, os.path.join(
        os.path.dirname(__file__), "..",
        "examples", "quantization_aware_training", "nuscenes_bevdet"))
    from main import centerpoint_loss

    from sparsebit_tpu.quantization.tools import (
        init_qat_state, make_qat_step)

    m, imgs = _model_and_input()
    qm = QuantModel(m, _cfg(4, "lsq"), (imgs,))
    # LSQ flow: calibration forwards then init_QAT (which derives the
    # learnable scales from observer stats) — cifar10_resnet20/main.py
    qm.prepare_calibration()
    qm(imgs)
    qm.init_QAT()

    rng = np.random.default_rng(0)
    hm_q, box_q = qm(imgs)
    hm_t = (rng.random(hm_q.shape) > 0.97).astype(np.float32)
    box_t = rng.normal(size=box_q.shape).astype(np.float32)
    targets = (jnp.asarray(hm_t), jnp.asarray(box_t))

    opt = optax.adam(5e-3)
    step = make_qat_step(qm, centerpoint_loss, opt)
    trainable, opt_state = init_qat_state(qm, opt)
    qm.train()
    trainable, opt_state, l0 = step(trainable, opt_state, imgs, targets)
    for _ in range(3):
        trainable, opt_state, l1 = step(trainable, opt_state, imgs, targets)
    assert float(l1) < float(l0), (float(l0), float(l1))
