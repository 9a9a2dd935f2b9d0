"""RegNetX-600MF, NHWC.

The reference's PTQ README table includes RegNetX-600MF
(examples/post_training_quantization/imagenet1k/basecase/README.md:27-33),
loaded from torchvision. First-party implementation: X-block = 1x1 reduce
-> 3x3 group conv -> 1x1 expand with a residual, ReLU, no squeeze-excite
(that's the Y family). 600MF design: depths [1,3,5,7], widths
[48,96,240,528], group width 24, bottleneck ratio 1.
"""

import jax

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model


class XBlock(nn.Module):
    def __init__(self, in_ch, out_ch, stride, group_width, key=None):
        super().__init__()
        ks = jax.random.split(key, 4)
        groups = out_ch // group_width
        self.a = nn.Conv2d(in_ch, out_ch, 1, bias=False, key=ks[0])
        self.a_bn = nn.BatchNorm2d(out_ch)
        self.b = nn.Conv2d(
            out_ch, out_ch, 3, stride=stride, padding=1, groups=groups,
            bias=False, key=ks[1],
        )
        self.b_bn = nn.BatchNorm2d(out_ch)
        self.c = nn.Conv2d(out_ch, out_ch, 1, bias=False, key=ks[2])
        self.c_bn = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU()
        self.proj = None
        if stride != 1 or in_ch != out_ch:
            self.proj = nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False,
                                  key=ks[3])
            self.proj_bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        y = self.relu(self.a_bn(self.a(x)))
        y = self.relu(self.b_bn(self.b(y)))
        y = self.c_bn(self.c(y))
        sc = self.proj_bn(self.proj(x)) if self.proj is not None else x
        return self.relu(sc + y)


class RegNetX600MF(nn.Module):
    DEPTHS = (1, 3, 5, 7)
    WIDTHS = (48, 96, 240, 528)
    GROUP_W = 24

    def __init__(self, num_classes=1000, key=None):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, len(self.DEPTHS) + 2)
        self.stem = nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False,
                              key=ks[0])
        self.stem_bn = nn.BatchNorm2d(32)
        self.stem_relu = nn.ReLU()
        in_ch = 32
        blocks = []
        for i, (d, w) in enumerate(zip(self.DEPTHS, self.WIDTHS)):
            bkeys = jax.random.split(ks[i + 1], d)
            for j in range(d):
                blocks.append(
                    XBlock(in_ch, w, 2 if j == 0 else 1, self.GROUP_W,
                           key=bkeys[j])
                )
                in_ch = w
        self.blocks = nn.Sequential(*blocks)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten()
        self.fc = nn.Linear(in_ch, num_classes, key=ks[-1])

    def forward(self, x):
        y = self.stem_relu(self.stem_bn(self.stem(x)))
        y = self.blocks(y)
        return self.fc(self.flatten(self.avgpool(y)))


@register_model
def regnetx_600mf(num_classes=1000, key=None):
    return RegNetX600MF(num_classes, key)
