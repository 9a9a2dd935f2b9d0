"""BEVDet-lite: multi-camera bird's-eye-view 3D detection, NHWC.

Reference: examples/quantization_aware_training/nuscenes/bevdet —
``qbevdet.py`` (BEVDetTraced) splits BEVDet into quantizable submodules
(image backbone/neck, depthnet, BEV encoder, CenterPoint-style head)
around a NON-quantized lift-splat view transform (the reference hacks an
``nn.Identity`` after the depthnet so the LSS *input* is quantized while
the transform itself stays float, qbevdet.py:19-28). The reference
vendors the whole mmdet3d stack; this is a first-party model with the
same architectural split so the PTQ/QAT flows exercise the BEV family
end-to-end.

TPU-first view transform: the camera->BEV assignment is STATIC (pinhole
geometry fixed at build time), so the lift-splat "scatter" is a
segment-sum over precomputed int32 cell ids — static shapes, one XLA
scatter-add, no data-dependent control flow. It is a LEAF module
(execute-only): the tracer records one opaque float node, exactly the
quantization boundary the reference draws.

Heads follow CenterPoint-lite: shared conv -> heatmap (classes) + box
regression (dx, dy, z, w, l, h, sin, cos), raw maps returned; decoding/
NMS are post-processing outside the quantized graph (same convention as
models/yolo.py and the reference's qat_test.py --eval=bbox tooling).
"""

import numpy as np

import jax
import jax.numpy as jnp

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model


class ConvBNReLU(nn.Module):
    def __init__(self, c_in, c_out, k=3, stride=1, key=None):
        super().__init__()
        self.conv = nn.Conv2d(
            c_in, c_out, k, stride=stride, padding=k // 2, bias=False,
            key=key,
        )
        self.bn = nn.BatchNorm2d(c_out)
        self.act = nn.ReLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


def _lss_cell_ids(n_cams, feat_h, feat_w, depth_bins, bev_h, bev_w,
                  fov_deg=90.0, d0=1.0, d_step=1.0, bev_range=12.0):
    """Static pinhole ring geometry -> BEV cell id per (cam, v, u, d).

    Cameras sit at the ego origin, yawed 360/n_cams degrees apart, each
    with a horizontal FOV ``fov_deg``. Depth bin j is at metric depth
    d0 + j*d_step along the optical axis. The (x, y) ego-frame hit is
    binned on a (bev_h, bev_w) grid spanning [-bev_range, bev_range].
    Out-of-grid points map to the drop cell bev_h*bev_w (sliced off).
    Returns (n_cams * feat_h * feat_w * depth_bins,) int32 in
    [0, bev_h*bev_w], ordered (cam, v, u, d) to match the flattened
    (BN, h, w, D) feature layout."""
    f = (feat_w / 2.0) / np.tan(np.radians(fov_deg) / 2.0)
    cx, cy = (feat_w - 1) / 2.0, (feat_h - 1) / 2.0
    u = np.arange(feat_w)
    v = np.arange(feat_h)
    d = d0 + d_step * np.arange(depth_bins)
    # camera frame: +z optical axis, +x right; rays through pixel centers
    vv, uu, dd = np.meshgrid(v, u, d, indexing="ij")  # (h, w, D)
    x_cam = (uu - cx) / f * dd
    z_cam = dd.astype(np.float64)
    ids = []
    for i in range(n_cams):
        yaw = 2.0 * np.pi * i / n_cams
        x_ego = np.cos(yaw) * z_cam - np.sin(yaw) * x_cam
        y_ego = np.sin(yaw) * z_cam + np.cos(yaw) * x_cam
        res_x = 2.0 * bev_range / bev_w
        res_y = 2.0 * bev_range / bev_h
        col = np.floor((x_ego + bev_range) / res_x).astype(np.int64)
        row = np.floor((y_ego + bev_range) / res_y).astype(np.int64)
        ok = (col >= 0) & (col < bev_w) & (row >= 0) & (row < bev_h)
        cid = np.where(ok, row * bev_w + col, bev_h * bev_w)
        ids.append(cid.reshape(-1))  # (h*w*D,) in (v, u, d) order
    return np.concatenate(ids).astype(np.int32)


class LSSViewTransform(nn.Module):
    """Lift-splat: softmax depth distribution x context outer product,
    pooled onto the BEV grid via a STATIC segment-sum (see module
    docstring). Leaf module — one opaque float node in the quant graph,
    mirroring the reference's unquantized img_view_transformer
    (qbevdet.py:19-28, 44-50)."""

    def __init__(self, n_cams, feat_hw, depth_bins, ctx_ch, bev_hw,
                 **geom_kw):
        super().__init__()
        self.n_cams = n_cams
        self.feat_hw = tuple(feat_hw)
        self.depth_bins = depth_bins
        self.ctx_ch = ctx_ch
        self.bev_hw = tuple(bev_hw)
        h, w = self.feat_hw
        self.buffer(
            "cell_ids",
            _lss_cell_ids(n_cams, h, w, depth_bins, *self.bev_hw,
                          **geom_kw),
        )

    def execute(self, x, params=None, training=False):
        # x (B*n_cams, h, w, depth_bins + ctx_ch) — the depthnet output
        # (its input-side quantizer is the reference's LSS-input quant)
        D, C = self.depth_bins, self.ctx_ch
        Hb, Wb = self.bev_hw
        BN, h, w, _ = x.shape
        B = BN // self.n_cams
        depth = jax.nn.softmax(x[..., :D].astype(jnp.float32), axis=-1)
        ctx = x[..., D:].astype(jnp.float32)
        # frustum features: (BN, h, w, D, C)
        feat = depth[..., :, None] * ctx[..., None, :]
        P = self.n_cams * h * w * D
        flat = feat.reshape(B, P, C)
        ids = self.get(params, "cell_ids")  # (P,) int32, drop cell = Hb*Wb
        G = Hb * Wb + 1
        off = ids[None, :] + jnp.arange(B, dtype=jnp.int32)[:, None] * G
        pooled = jax.ops.segment_sum(
            flat.reshape(B * P, C), off.reshape(-1), num_segments=B * G
        ).reshape(B, G, C)[:, : Hb * Wb]
        return pooled.reshape(B, Hb, Wb, C).astype(x.dtype)


class BEVDetLite(nn.Module):
    """Input: (B * n_cams, H, W, 3) — multi-camera images flattened onto
    the batch axis, exactly the reference's ``imgs.view(B*N, C, H, W)``
    (qbevdet.py:33-40). Returns (heatmap (B, Hb, Wb, num_classes),
    boxes (B, Hb, Wb, 8))."""

    def __init__(self, n_cams=4, num_classes=10, img_hw=(64, 96),
                 depth_bins=16, ctx_ch=32, bev_hw=(32, 32), key=None):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 10)
        self.n_cams = n_cams
        # image encoder: stride-8 conv stack (reference: ResNet-50 / VoVNet)
        self.img_backbone = nn.Sequential(
            ConvBNReLU(3, 32, stride=2, key=ks[0]),
            ConvBNReLU(32, 64, stride=2, key=ks[1]),
            ConvBNReLU(64, 64, stride=2, key=ks[2]),
        )
        self.img_neck = ConvBNReLU(64, 64, k=1, key=ks[3])
        feat_hw = (img_hw[0] // 8, img_hw[1] // 8)
        # depthnet: 1x1 conv -> depth logits + context (LSS)
        self.depthnet = nn.Conv2d(64, depth_bins + ctx_ch, 1, key=ks[4])
        self.view_transform = LSSViewTransform(
            n_cams, feat_hw, depth_bins, ctx_ch, bev_hw
        )
        # BEV encoder (reference: img_bev_encoder_backbone + neck)
        self.bev_backbone = nn.Sequential(
            ConvBNReLU(ctx_ch, 64, key=ks[5]),
            ConvBNReLU(64, 64, key=ks[6]),
        )
        self.bev_neck = ConvBNReLU(64, 64, k=1, key=ks[7])
        # CenterPoint-lite head (reference: shared_conv + task_heads)
        self.shared_conv = ConvBNReLU(64, 64, key=ks[8])
        self.heatmap_head = nn.Conv2d(64, num_classes, 1, key=ks[9])
        self.box_head = nn.Conv2d(64, 8, 1, key=ks[9])

    def forward(self, imgs):
        x = self.img_backbone(imgs)
        x = self.img_neck(x)
        x = self.depthnet(x)
        bev = self.view_transform(x)
        bev = self.bev_backbone(bev)
        bev = self.bev_neck(bev)
        s = self.shared_conv(bev)
        return self.heatmap_head(s), self.box_head(s)


@register_model
def bevdet_lite(n_cams=4, num_classes=10, img_hw=(64, 96), key=None):
    return BEVDetLite(n_cams=n_cams, num_classes=num_classes,
                      img_hw=img_hw, key=key)
