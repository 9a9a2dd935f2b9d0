"""Round-4 example-breadth coverage: the full-YOLOv3 zoo model through the
PTQ harness, and the SQuAD-regime QA prune flow (iterative magnitude
ratchet). Reference counterparts:
examples/post_training_quantization/coco2017/yolo_series/models/yolov3.py
and examples/unstructured_prune/SQuAD/main.py."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import QuantModel, SparseModel, parse_qconfig, parse_sconfig
from sparsebit_tpu.models import create_model


def _qcfg():
    return parse_qconfig({
        "BACKEND": "virtual",
        "W": {"QSCHEME": "per-channel-symmetric",
              "QUANTIZER": {"TYPE": "uniform", "BIT": 8},
              "OBSERVER": {"TYPE": "MINMAX"}},
        "A": {"QSCHEME": "per-tensor-affine",
              "QUANTIZER": {"TYPE": "uniform", "BIT": 8},
              "OBSERVER": {"TYPE": "MINMAX", "LAYOUT": "NHWC"}},
    })


def test_yolov3_full_three_scales_and_ptq():
    """Darknet-FPN topology parity: three stride-8/16/32 maps with
    anchors*(5+classes) channels; residual ResLayers + route/concat trace
    through QuantModel and int8 PTQ stays close to float."""
    m = create_model("yolov3_darknet21", num_classes=4).eval()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32)
    p0, p1, p2 = m(x)
    assert p0.shape == (1, 2, 2, 27)   # stride 32
    assert p1.shape == (1, 4, 4, 27)   # stride 16
    assert p2.shape == (1, 8, 8, 27)   # stride 8

    qm = QuantModel(m, _qcfg(), (x,))
    y_off = qm(x)
    for a, b in zip(y_off, m(x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    qm.prepare_calibration()
    qm(x)
    qm.calc_qparams()
    qm.set_quant(True, True)
    y_q = qm(x)
    for a, b in zip(y_q, y_off):
        rel = float(jnp.mean((a - b) ** 2) / (jnp.mean(b ** 2) + 1e-9))
        assert rel < 1e-2, rel


def test_bert_qa_span_heads_prune_ratchet():
    """QA span model: per-token start/end logits; unstructured prune with
    an iterative RATIO ratchet (0.2 -> 0.5) recomputing masks from current
    weights; embeddings + qa head stay dense via SPECIFIC."""
    m = create_model(
        "bert_qa_tiny", vocab_size=64, dim=32, depth=1, num_heads=2,
        ffn_dim=64).eval()
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 12)), jnp.int32)
    start, end = m(x)
    assert start.shape == (2, 12) and end.shape == (2, 12)

    cfg = parse_sconfig({
        "SPARSER": {"TYPE": "l1norm", "STRATEGY": "unstructure",
                    "RATIO": 0.2,
                    "SPECIFIC": [{"embeddings*": ["RATIO", "0.0"],
                                  "qa_outputs": ["RATIO", "0.0"]}]},
    })
    sm = SparseModel(m, cfg, (x,))
    sm.calc_params()
    s1 = sm.sparsity()
    assert 0.1 < s1 < 0.3, s1
    # ratchet: raise every encoder sparser's ratio, recompute masks
    for _, op in sm.smodules():
        if getattr(op, "sparser", None) is not None and op.sparser.ratio > 0:
            op.sparser.ratio = 0.5
    sm.calc_params()
    s2 = sm.sparsity()
    assert s2 > s1 and 0.4 < s2 < 0.6, (s1, s2)
    out = sm(x)
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in out)
    # dense overrides held: qa head weights unmasked (mask lives in the
    # module buffers as "w_mask")
    qa = dict(sm.smodules()).get("qa_outputs")
    assert qa is not None, list(dict(sm.smodules()))
    wmask = qa._buffers.get("w_mask")
    assert wmask is not None and float(jnp.mean(wmask)) == 1.0


def test_yolov4_csp_three_scales_and_trace():
    """CSP regime (reference yolo_series/models/yolov4.py): Mish CSP
    stages with route splits + SPP maxpool pyramid trace through
    QuantModel."""
    m = create_model("yolov4_small", num_classes=4).eval()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 64, 64, 3)), jnp.float32)
    p0, p1, p2 = m(x)
    assert (p0.shape, p1.shape, p2.shape) == (
        (1, 2, 2, 27), (1, 4, 4, 27), (1, 8, 8, 27))
    qm = QuantModel(m, _qcfg(), (x,))
    for a, b in zip(qm(x), m(x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_yolov5_c3_sppf_pan_trace():
    """YOLOv5 regime (reference coco2017/yolov5/models.py): C3 blocks,
    chained-maxpool SPPF, PAN top-down + bottom-up concats, SiLU."""
    m = create_model("yolov5n", num_classes=4).eval()
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 64, 64, 3)), jnp.float32)
    pl_, pm_, ps_ = m(x)
    assert (pl_.shape, pm_.shape, ps_.shape) == (
        (1, 2, 2, 27), (1, 4, 4, 27), (1, 8, 8, 27))
    qm = QuantModel(m, _qcfg(), (x,))
    for a, b in zip(qm(x), m(x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
