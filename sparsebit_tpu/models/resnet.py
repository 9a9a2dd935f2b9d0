"""ResNet family, NHWC (TPU-native layout).

Capability parity with the reference's PTQ/QAT basecase examples, which use
torchvision resnet18/34/50 and a cifar resnet20
(examples/post_training_quantization/imagenet1k/basecase/main.py:152,
ci/regular_tests/test_add_extra_info.py resnet20). Architecture follows the
standard He et al. definition, written against sparsebit_tpu.nn so the
tracer captures the full graph including residual adds.
"""

import jax

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_ch, out_ch, stride=1, key=None):
        super().__init__()
        ks = jax.random.split(key, 3)
        self.conv1 = nn.Conv2d(
            in_ch, out_ch, 3, stride=stride, padding=1, bias=False, key=ks[0]
        )
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.relu1 = nn.ReLU()
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False, key=ks[1])
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.relu2 = nn.ReLU()
        if stride != 1 or in_ch != out_ch:
            self.down_conv = nn.Conv2d(
                in_ch, out_ch, 1, stride=stride, bias=False, key=ks[2]
            )
            self.down_bn = nn.BatchNorm2d(out_ch)
        else:
            self.down_conv = None

    def forward(self, x):
        idt = x
        y = self.relu1(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.down_conv is not None:
            idt = self.down_bn(self.down_conv(x))
        return self.relu2(y + idt)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_ch, out_ch, stride=1, key=None):
        super().__init__()
        ks = jax.random.split(key, 4)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 1, bias=False, key=ks[0])
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.relu1 = nn.ReLU()
        self.conv2 = nn.Conv2d(
            out_ch, out_ch, 3, stride=stride, padding=1, bias=False, key=ks[1]
        )
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.relu2 = nn.ReLU()
        self.conv3 = nn.Conv2d(out_ch, out_ch * 4, 1, bias=False, key=ks[2])
        self.bn3 = nn.BatchNorm2d(out_ch * 4)
        self.relu3 = nn.ReLU()
        if stride != 1 or in_ch != out_ch * 4:
            self.down_conv = nn.Conv2d(
                in_ch, out_ch * 4, 1, stride=stride, bias=False, key=ks[3]
            )
            self.down_bn = nn.BatchNorm2d(out_ch * 4)
        else:
            self.down_conv = None

    def forward(self, x):
        idt = x
        y = self.relu1(self.bn1(self.conv1(x)))
        y = self.relu2(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.down_conv is not None:
            idt = self.down_bn(self.down_conv(x))
        return self.relu3(y + idt)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, key=None):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False, key=ks[0])
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        stages = []
        for i, (n, out_ch, stride) in enumerate(
            zip(layers, (64, 128, 256, 512), (1, 2, 2, 2))
        ):
            blocks = []
            bkeys = jax.random.split(ks[i + 1], n)
            for j in range(n):
                blocks.append(
                    block(in_ch, out_ch, stride if j == 0 else 1, key=bkeys[j])
                )
                in_ch = out_ch * block.expansion
            stages.append(nn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = stages
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten()
        self.fc = nn.Linear(in_ch, num_classes, key=ks[5])

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        return self.fc(self.flatten(self.avgpool(y)))


class CifarResNet(nn.Module):
    """resnet20-style cifar net (3 stages of n BasicBlocks)."""

    def __init__(self, n=3, num_classes=10, key=None):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        self.conv1 = nn.Conv2d(3, 16, 3, padding=1, bias=False, key=ks[0])
        self.bn1 = nn.BatchNorm2d(16)
        self.relu = nn.ReLU()
        in_ch = 16
        stages = []
        for i, (out_ch, stride) in enumerate(zip((16, 32, 64), (1, 2, 2))):
            blocks = []
            bkeys = jax.random.split(ks[i + 1], n)
            for j in range(n):
                blocks.append(
                    BasicBlock(in_ch, out_ch, stride if j == 0 else 1, key=bkeys[j])
                )
                in_ch = out_ch
            stages.append(nn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3 = stages
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.flatten = nn.Flatten()
        self.fc = nn.Linear(64, num_classes, key=ks[4])

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.layer3(self.layer2(self.layer1(y)))
        return self.fc(self.flatten(self.avgpool(y)))


@register_model
def resnet18(num_classes=1000, key=None):
    return ResNet(BasicBlock, (2, 2, 2, 2), num_classes, key)


@register_model
def resnet34(num_classes=1000, key=None):
    return ResNet(BasicBlock, (3, 4, 6, 3), num_classes, key)


@register_model
def resnet50(num_classes=1000, key=None):
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes, key)


@register_model
def resnet20(num_classes=10, key=None):
    return CifarResNet(3, num_classes, key)
