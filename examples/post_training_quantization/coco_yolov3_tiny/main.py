"""Detection PTQ (reference: examples/post_training_quantization/coco2017/
yolo_series/main.py — YOLOv3/v4 over Darknet). Quantizes the detector
graph; box decode/NMS/mAP are downstream of the quantized network.

    python main.py --model yolov3 [--data coco_imgs.npz] [--ckpt yolo.npz]

Models: yolov3 (full Darknet-53 + FPN, the reference yolo_series scale),
yolov4 (CSPDarknet + SPP, Mish), yolov5s (C3/SPPF + PAN, SiLU),
yolov3_darknet21/yolov4_small/yolov5n (shallow variants), yolov3_tiny.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.models import create_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3_tiny",
                    choices=["yolov3", "yolov3_darknet21", "yolov3_tiny",
                             "yolov4", "yolov4_small", "yolov5s",
                             "yolov5n"])
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig.yaml"))
    ap.add_argument("--data", default=None, help="npz x (N,H,W,3) float")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--imgsize", type=int, default=416)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calib-batches", type=int, default=8)
    args = ap.parse_args()

    model = create_model(args.model)
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    if args.data:
        x = np.load(args.data)["x"].astype(np.float32)
    else:
        print("[warn] no --data; random tensors (flow demo)")
        x = np.random.default_rng(0).normal(
            size=(args.calib_batches * args.batch, args.imgsize, args.imgsize, 3)
        ).astype(np.float32)

    cfg = parse_qconfig(args.qconfig)
    qmodel = QuantModel(model, cfg, (jnp.asarray(x[: args.batch]),))
    qmodel.prepare_calibration()
    for i in range(args.calib_batches):
        qmodel(jnp.asarray(x[i * args.batch : (i + 1) * args.batch]))
    qmodel.calc_qparams()
    qmodel.set_quant(True, True)
    preds = qmodel(jnp.asarray(x[: args.batch]))
    print("quantized prediction maps:", [tuple(p.shape) for p in preds])
    err = qmodel.get_quantization_error(jnp.asarray(x[: args.batch]))
    print("mean per-layer quant error:", float(np.mean(list(err.values()))))


if __name__ == "__main__":
    main()
