"""BEVDet-lite QAT: multi-camera BEV detection through the quant flow.

Reference: examples/quantization_aware_training/nuscenes/bevdet
(dist_qat_train.sh -> tools/qat_train; BEVDetTraced + qconfig_r50_lsq_*).
The reference trains against nuScenes via the vendored mmdet3d stack;
this example runs the same QuantModel -> calibrate -> init_QAT ->
train-step flow on the first-party bevdet_lite model, with a
CenterPoint-style loss (heatmap focal + box L1 on positives). Pass
--data an npz with imgs (N, n_cams, H, W, 3), heatmap (N, Hb, Wb, C),
boxes (N, Hb, Wb, 8) to train on real targets; without it the flow runs
on random tensors (demo of the pipeline, like the other examples here).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.models import create_model
from sparsebit_tpu.quantization.tools import (
    commit_qat_params,
    init_qat_state,
    make_qat_step,
)

N_CAMS = 4


def centerpoint_loss(outputs, targets):
    """Heatmap focal (alpha=2, beta=4 penalty-reduced) + L1 on positives
    (CenterPoint; the reference delegates to pts_bbox_head.loss)."""
    hm_pred, box_pred = outputs
    hm_t, box_t = targets
    p = jax.nn.sigmoid(hm_pred.astype(jnp.float32))
    pos = (hm_t >= 0.999).astype(jnp.float32)
    neg_w = jnp.power(1.0 - hm_t, 4.0)
    eps = 1e-6
    pos_loss = -jnp.log(p + eps) * jnp.power(1 - p, 2.0) * pos
    neg_loss = -jnp.log(1 - p + eps) * jnp.power(p, 2.0) * neg_w * (1 - pos)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    hm_loss = (pos_loss.sum() + neg_loss.sum()) / n_pos
    cell_pos = (hm_t.max(-1, keepdims=True) >= 0.999).astype(jnp.float32)
    l1 = jnp.abs(box_pred.astype(jnp.float32) - box_t) * cell_pos
    box_loss = l1.sum() / jnp.maximum(cell_pos.sum() * 8.0, 1.0)
    return hm_loss + 0.25 * box_loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig_lsq_4w4f.yaml"))
    ap.add_argument("--data", default=None)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    num_classes, bev_hw = 10, (32, 32)
    if args.data:
        z = np.load(args.data)
        imgs, hm_t, box_t = z["imgs"], z["heatmap"], z["boxes"]
    else:
        print("[warn] no --data; random tensors (flow demo)")
        rng = np.random.default_rng(0)
        n = 8
        imgs = rng.normal(size=(n, N_CAMS, 64, 96, 3)).astype(np.float32)
        hm_t = (rng.random((n,) + bev_hw + (num_classes,)) > 0.98).astype(
            np.float32)
        box_t = rng.normal(size=(n,) + bev_hw + (8,)).astype(np.float32)

    model = create_model(
        "bevdet_lite", n_cams=N_CAMS, num_classes=num_classes
    ).eval()
    cfg = parse_qconfig(args.qconfig)
    xb0 = jnp.asarray(imgs[: args.batch]).reshape(
        (-1,) + imgs.shape[2:])  # (B*N, H, W, 3), qbevdet.py:33-40
    qmodel = QuantModel(model, cfg, (xb0,))

    qmodel.prepare_calibration()
    qmodel(xb0)
    qmodel.calc_qparams()
    qmodel.init_QAT()

    opt = optax.adam(args.lr)
    step = make_qat_step(qmodel, centerpoint_loss, opt)
    trainable, opt_state = init_qat_state(qmodel, opt)
    qmodel.train()
    for epoch in range(args.epochs):
        for i in range(0, len(imgs), args.batch):
            xb = jnp.asarray(imgs[i: i + args.batch])
            xb = xb.reshape((-1,) + xb.shape[2:])
            tb = (jnp.asarray(hm_t[i: i + args.batch]),
                  jnp.asarray(box_t[i: i + args.batch]))
            trainable, opt_state, loss = step(trainable, opt_state, xb, tb)
        print("epoch {} loss {:.4f}".format(epoch, float(loss)))
    commit_qat_params(qmodel, trainable)
    qmodel.eval()


if __name__ == "__main__":
    main()
