"""EfficientNet-Lite0, NHWC.

The reference's PTQ/QAT README tables include EfficientNet-Lite0
(examples/post_training_quantization/imagenet1k/basecase/README.md:27-33);
it loads the model from torchvision/timm. Here it is first-party so the
tracer sees every op. Lite variants drop squeeze-excite and swap
SiLU->ReLU6 (exactly the quantization-friendly changes the Lite family
was made for), so the block zoo is Conv2d/BatchNorm2d/ReLU6 only.
"""

import jax

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model


class ConvBNAct(nn.Module):
    def __init__(self, in_ch, out_ch, kernel=3, stride=1, groups=1, act=True,
                 key=None):
        super().__init__()
        self.conv = nn.Conv2d(
            in_ch, out_ch, kernel, stride=stride, padding=(kernel - 1) // 2,
            groups=groups, bias=False, key=key,
        )
        self.bn = nn.BatchNorm2d(out_ch)
        self.act = nn.ReLU6() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class MBConvLite(nn.Module):
    """MBConv without squeeze-excite: expand 1x1 -> depthwise kxk -> project
    1x1, residual when stride 1 and channels match."""

    def __init__(self, in_ch, out_ch, kernel, stride, expand, key=None):
        super().__init__()
        ks = jax.random.split(key, 3)
        hidden = in_ch * expand
        self.use_res = stride == 1 and in_ch == out_ch
        layers = []
        if expand != 1:
            layers.append(ConvBNAct(in_ch, hidden, kernel=1, key=ks[0]))
        layers.append(
            ConvBNAct(hidden, hidden, kernel=kernel, stride=stride,
                      groups=hidden, key=ks[1])
        )
        layers.append(ConvBNAct(hidden, out_ch, kernel=1, act=False, key=ks[2]))
        self.body = nn.Sequential(*layers)

    def forward(self, x):
        y = self.body(x)
        if self.use_res:
            y = x + y
        return y


class EfficientNetLite0(nn.Module):
    # expand, out_ch, repeats, stride, kernel — the B0 trunk; Lite keeps the
    # B0 multipliers (1.0/1.0) and fixes stem=32 / head=1280.
    CFG = [
        (1, 16, 1, 1, 3),
        (6, 24, 2, 2, 3),
        (6, 40, 2, 2, 5),
        (6, 80, 3, 2, 3),
        (6, 112, 3, 1, 5),
        (6, 192, 4, 2, 5),
        (6, 320, 1, 1, 3),
    ]

    def __init__(self, num_classes=1000, key=None):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, len(self.CFG) + 3)
        self.stem = ConvBNAct(3, 32, stride=2, key=ks[0])
        in_ch = 32
        blocks = []
        for i, (t, c, n, s, k) in enumerate(self.CFG):
            bkeys = jax.random.split(ks[i + 1], n)
            for j in range(n):
                blocks.append(
                    MBConvLite(in_ch, c, k, s if j == 0 else 1, t, key=bkeys[j])
                )
                in_ch = c
        self.blocks = nn.Sequential(*blocks)
        self.head = ConvBNAct(in_ch, 1280, kernel=1, key=ks[-2])
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten()
        self.classifier = nn.Linear(1280, num_classes, key=ks[-1])

    def forward(self, x):
        y = self.head(self.blocks(self.stem(x)))
        return self.classifier(self.flatten(self.avgpool(y)))


@register_model
def efficientnet_lite0(num_classes=1000, key=None):
    return EfficientNetLite0(num_classes, key)
