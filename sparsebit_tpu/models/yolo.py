"""YOLOv3-tiny, NHWC — detection-family coverage for PTQ
(reference: examples/post_training_quantization/coco2017/yolo_series).

Returns raw per-scale prediction maps (B, H, W, anchors*(5+classes));
box decode/NMS are post-processing outside the quantized graph (as in the
reference, which quantizes the network and evaluates via the repo's
detector tooling).
"""

import jax

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model
from sparsebit_tpu.nn import functional as F


class ConvBNLeaky(nn.Module):
    def __init__(self, c_in, c_out, k=3, stride=1, key=None):
        super().__init__()
        self.conv = nn.Conv2d(
            c_in, c_out, k, stride=stride, padding=k // 2, bias=False, key=key
        )
        self.bn = nn.BatchNorm2d(c_out)
        self.act = nn.LeakyReLU(0.1)

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class YoloV3Tiny(nn.Module):
    def __init__(self, num_classes=80, key=None):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 13)
        chs = (16, 32, 64, 128, 256, 512)
        self.stem = nn.ModuleList(
            [ConvBNLeaky(3 if i == 0 else chs[i - 1], chs[i], key=ks[i]) for i in range(6)]
        )
        self.pools = nn.ModuleList(
            [nn.MaxPool2d(2, stride=2) for _ in range(5)]
        )
        self.conv7 = ConvBNLeaky(512, 1024, key=ks[6])
        self.conv8 = ConvBNLeaky(1024, 256, k=1, key=ks[7])
        out_ch = 3 * (5 + num_classes)
        # scale 1 (coarse)
        self.conv9 = ConvBNLeaky(256, 512, key=ks[8])
        self.head1 = nn.Conv2d(512, out_ch, 1, key=ks[9])
        # scale 2 (fine, after upsample + concat with stem feature)
        self.conv10 = ConvBNLeaky(256, 128, k=1, key=ks[10])
        self.up = nn.Upsample(scale_factor=2, mode="nearest")
        self.conv11 = ConvBNLeaky(128 + 256, 256, key=ks[11])
        self.head2 = nn.Conv2d(256, out_ch, 1, key=ks[12])

    def forward(self, x):
        feats = []
        for i in range(6):
            x = self.stem[i](x)
            feats.append(x)
            if i < 5:
                x = self.pools[i](x)
        x = self.conv8(self.conv7(x))
        p1 = self.head1(self.conv9(x))
        y = self.up(self.conv10(x))
        y = self.conv11(F.concat([y, feats[4]], axis=-1))
        p2 = self.head2(y)
        return p1, p2


@register_model
def yolov3_tiny(num_classes=80, key=None):
    return YoloV3Tiny(num_classes, key)
