"""DeiT/ViT family, NLC layout.

Parity target: the reference's PTQ DeiT example and MHSA CI test
(examples/post_training_quantization/imagenet1k/deit/main.py,
ci/regular_tests/test_MHSA.py:31-58). Attention is written with the
functional ops (F.matmul/F.softmax/...) so the tracer records every matmul
for quantization — mirroring how fx captures operator.matmul.
"""

import jax

import sparsebit_tpu.nn.modules as nn
from sparsebit_tpu.models import register_model
from sparsebit_tpu.nn import functional as F


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, key=None):
        super().__init__()
        ks = jax.random.split(key, 2)
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, key=ks[0])
        self.proj = nn.Linear(dim, dim, key=ks[1])

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x)
        qkv = F.reshape(qkv, (B, N, 3, self.num_heads, self.head_dim))
        qkv = F.permute(qkv, (2, 0, 3, 1, 4))  # (3, B, H, N, hd)
        q = F.getitem(qkv, 0)
        k = F.getitem(qkv, 1)
        v = F.getitem(qkv, 2)
        attn = F.matmul(q, F.transpose(k, 2, 3)) * self.scale
        attn = F.softmax(attn, axis=-1)
        y = F.matmul(attn, v)  # (B, H, N, hd)
        y = F.reshape(F.permute(y, (0, 2, 1, 3)), (B, N, C))
        return self.proj(y)


class Mlp(nn.Module):
    def __init__(self, dim, hidden, key=None):
        super().__init__()
        ks = jax.random.split(key, 2)
        self.fc1 = nn.Linear(dim, hidden, key=ks[0])
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim, key=ks[1])

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4, key=None):
        super().__init__()
        ks = jax.random.split(key, 2)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attention(dim, num_heads, key=ks[0])
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), key=ks[1])

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class PatchEmbed(nn.Module):
    def __init__(self, img_size, patch_size, dim, key=None):
        super().__init__()
        self.num_patches = (img_size // patch_size) ** 2
        self.proj = nn.Conv2d(3, dim, patch_size, stride=patch_size, key=key)
        self.dim = dim

    def forward(self, x):
        y = self.proj(x)  # (B, H', W', C)
        B = y.shape[0]
        return F.reshape(y, (B, self.num_patches, self.dim))


class VisionTransformer(nn.Module):
    def __init__(
        self,
        img_size=224,
        patch_size=16,
        dim=192,
        depth=12,
        num_heads=3,
        num_classes=1000,
        key=None,
    ):
        super().__init__()
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, depth + 3)
        self.patch_embed = PatchEmbed(img_size, patch_size, dim, key=ks[0])
        n_tok = self.patch_embed.num_patches + 1
        self.param(
            "cls_token", jax.random.normal(ks[1], (1, 1, dim)) * 0.02
        )
        self.param("pos_embed", jax.random.normal(ks[1], (1, n_tok, dim)) * 0.02)
        self.blocks = nn.Sequential(
            *[Block(dim, num_heads, key=ks[i + 2]) for i in range(depth)]
        )
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, num_classes, key=ks[-1])
        self.dim = dim

    def forward(self, x):
        y = self.patch_embed(x)
        B = y.shape[0]
        cls = F.expand(self._params["cls_token"], (B, 1, self.dim))
        y = F.concat([cls, y], axis=1) + self._params["pos_embed"]
        y = self.norm(self.blocks(y))
        return self.head(F.getitem(y, (slice(None), 0)))


@register_model
def deit_tiny(num_classes=1000, img_size=224, key=None):
    return VisionTransformer(img_size, 16, 192, 12, 3, num_classes, key)


@register_model
def deit_small(num_classes=1000, img_size=224, key=None):
    return VisionTransformer(img_size, 16, 384, 12, 6, num_classes, key)


@register_model
def deit_base(num_classes=1000, img_size=224, key=None):
    return VisionTransformer(img_size, 16, 768, 12, 12, num_classes, key)
